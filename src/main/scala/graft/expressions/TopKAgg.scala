package graft.expressions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.reflect.runtime.universe.TypeTag

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
  * the engine's ANN contract). `topKFor` dispatches on the id
  * column's DataType so the output struct keeps the caller's exact id
  * type; string ids tie-break in UTF-8 BYTE order — the ordering
  * Spark's own sort gives strings — not UTF-16 `String.compareTo`
  * (they differ for supplementary-plane code points).
  */
object TopKAgg {

  final case class Scored[T](id: T, score: Double)

  /** Unsigned-byte lexicographic UTF-8 comparison = Spark's
    * UTF8String.compareTo = code-point order.
    */
  private val utf8Ordering: Ordering[String] = new Ordering[String] {
    // delegate to the exact implementation being imitated instead of
    // re-rolling byte comparison (and allocating two byte[] copies per
    // comparison in the heap's hot path)
    override def compare(a: String, b: String): Int =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
  }

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
    require(k >= 1, s"top-k needs k >= 1, got $k") // k<=0 would NoSuchElement in push
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

  private def make[T: TypeTag](k: Int, ord: Ordering[T])(id: Column, score: Column): Column = {
    val agg = new TopK[T](k)(ord, ExpressionEncoder[Seq[Scored[T]]]())
    udaf(agg, ExpressionEncoder[Scored[T]]()).apply(id, score)
  }

  /** Untyped-column form usable in `df.groupBy(...).agg(topK(k)(id,
    * score))`; returns an array of (id, score) structs, best first.
    * Integral (long) ids — the historical default.
    */
  def topK(k: Int)(id: Column, score: Column): Column =
    make[Long](k, Ordering.Long)(id, score)

  /** Dispatch on the id column's type: the output struct keeps the
    * caller's id type exactly (no silent int→bigint widening). Exotic
    * id types (decimal, date, binary…) are rejected — use a
    * window-rank there.
    */
  def topKFor(idType: DataType, k: Int)(id: Column, score: Column): Column =
    idType match {
      case ByteType    => make[Byte](k, Ordering.Byte)(id, score)
      case ShortType   => make[Short](k, Ordering.Short)(id, score)
      case IntegerType => make[Int](k, Ordering.Int)(id, score)
      case LongType    => make[Long](k, Ordering.Long)(id, score)
      case FloatType   => make[Float](k, Ordering.Float.TotalOrdering)(id, score)
      case DoubleType  => make[Double](k, Ordering.Double.TotalOrdering)(id, score)
      case StringType  => make[String](k, utf8Ordering)(id, score)
      case other => throw new IllegalArgumentException(
        s"topKFor: unsupported id type $other — use a window-rank form for exotic id types")
    }

  /** Explode a top-k result column into (rank, id, score) rows. */
  def explodeRanked(c: Column): Column = posexplode(c)
}
