package graft.expressions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

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
  * the engine's ANN contract).
  */
object TopKAgg {

  final case class Scored(id: Long, score: Double)

  /** Min-heap entry ordering: the WORST element (lowest score, then
    * highest id) sits at the head for O(log k) eviction.
    */
  private val worstFirst: Ordering[Scored] =
    Ordering.by[Scored, (Double, Long)](s => (s.score, -s.id))

  final class TopK(k: Int) extends Aggregator[Scored, scala.collection.mutable.PriorityQueue[Scored], Seq[Scored]] {
    type Heap = scala.collection.mutable.PriorityQueue[Scored]

    // PriorityQueue dequeues the MAX by its ordering; reverse worstFirst
    // so the head is the worst element
    override def zero: Heap = new Heap()(worstFirst.reverse)

    private def push(h: Heap, s: Scored): Heap = {
      if (h.size < k) h.enqueue(s)
      else if (worstFirst.gt(s, h.head)) { h.dequeue(); h.enqueue(s) }
      h
    }

    override def reduce(h: Heap, s: Scored): Heap = push(h, s)
    override def merge(a: Heap, b: Heap): Heap = { b.foreach(push(a, _)); a }
    override def finish(h: Heap): Seq[Scored] =
      h.toSeq.sorted(worstFirst.reverse)
    override def bufferEncoder: Encoder[Heap] = Encoders.kryo[Heap]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Untyped-column form usable in `df.groupBy(...).agg(topK(k)(id,
    * score))`; returns an array of (id, score) structs, best first.
    */
  def topK(k: Int)(id: Column, score: Column): Column = {
    val agg = new TopK(k)
    udaf(agg, org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Scored]())
      .apply(id, score)
  }

  /** Explode a top-k result column into (rank, id, score) rows. */
  def explodeRanked(c: Column): Column = posexplode(c)
}
