package graft.expressions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}

/** Bounded-heap top-k aggregate.
  *
  * The window-rank idiom (`row_number().over(partitionBy(q).orderBy
  * (score desc)) <= k`) shuffles EVERY scored row and fully sorts each
  * partition. This aggregator keeps a k-bounded min-heap per group, so
  * partial aggregation reduces each map partition to ≤ k rows per
  * group before the shuffle — at 100 TB the shuffle carries
  * k × #groups rows instead of #corpus rows.
  *
  * Ordering: score DESC, id ASC (deterministic tie-break, matching
  * the engine's ANN contract). Ids may be integral (`topK`) or string
  * (`topKString`) — `topKFor` dispatches on the id column's DataType so
  * the output struct keeps the caller's id type.
  */
object TopKAgg {

  final case class Scored[T](id: T, score: Double)

  /** Min-heap entry ordering: the WORST element (lowest score, then
    * highest id) sits at the head for O(log k) eviction.
    */
  private def worstFirst[T](implicit ord: Ordering[T]): Ordering[Scored[T]] =
    new Ordering[Scored[T]] {
      override def compare(a: Scored[T], b: Scored[T]): Int = {
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c else ord.compare(b.id, a.id)
      }
    }

  final class TopK[T: Ordering](k: Int)(implicit out: Encoder[Seq[Scored[T]]])
      extends Aggregator[Scored[T], scala.collection.mutable.PriorityQueue[Scored[T]], Seq[Scored[T]]] {
    type Heap = scala.collection.mutable.PriorityQueue[Scored[T]]

    private val wf = worstFirst[T]

    // PriorityQueue dequeues the MAX by its ordering; reverse worstFirst
    // so the head is the worst element
    override def zero: Heap = new Heap()(wf.reverse)

    private def push(h: Heap, s: Scored[T]): Heap = {
      if (h.size < k) h.enqueue(s)
      else if (wf.gt(s, h.head)) { h.dequeue(); h.enqueue(s) }
      h
    }

    override def reduce(h: Heap, s: Scored[T]): Heap = push(h, s)
    override def merge(a: Heap, b: Heap): Heap = { b.foreach(push(a, _)); a }
    override def finish(h: Heap): Seq[Scored[T]] =
      h.toSeq.sorted(wf.reverse)
    override def bufferEncoder: Encoder[Heap] = Encoders.kryo[Heap]
    override def outputEncoder: Encoder[Seq[Scored[T]]] = out
  }

  /** Untyped-column form usable in `df.groupBy(...).agg(topK(k)(id,
    * score))`; returns an array of (id, score) structs, best first.
    * Integral (long) ids — the historical default.
    */
  def topK(k: Int)(id: Column, score: Column): Column = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val agg = new TopK[Long](k)(implicitly, ExpressionEncoder[Seq[Scored[Long]]]())
    udaf(agg, ExpressionEncoder[Scored[Long]]()).apply(id, score)
  }

  /** String-id twin: same ordering contract with lexicographic
    * tie-break (the ordering the window-rank form gives string ids).
    */
  def topKString(k: Int)(id: Column, score: Column): Column = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val agg = new TopK[String](k)(implicitly, ExpressionEncoder[Seq[Scored[String]]]())
    udaf(agg, ExpressionEncoder[Scored[String]]()).apply(id, score)
  }

  /** Dispatch on the id column's type so callers keep their id type in
    * the output struct (string ids were silently unsupported before).
    */
  def topKFor(idType: DataType, k: Int)(id: Column, score: Column): Column =
    idType match {
      case StringType => topKString(k)(id, score)
      case _          => topK(k)(id, score)
    }

  /** Explode a top-k result column into (rank, id, score) rows. */
  def explodeRanked(c: Column): Column = posexplode(c)
}
