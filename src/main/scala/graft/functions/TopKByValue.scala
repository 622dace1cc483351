package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` keeping the top-k `(id, value)` pairs per group,
  * ordered by value descending with id as the deterministic tie-break.
  *
  * This is per-group top-k as a BOUNDED-STATE aggregate: the buffer
  * never exceeds k entries, `merge` is associative/commutative, so
  * Spark runs it as a partial (map-side) aggregate and the shuffle
  * carries at most k rows per (group × partition) — versus the window
  * `row_number` formulation (j04), which shuffles EVERY row and sorts
  * whole partitions. Same contract Spark itself exploits in
  * `TakeOrderedAndProject`, lifted to per-group granularity; the shape
  * that makes "top purchases per category" a one-pass aggregate at
  * 100 TB. Sibling of [[VectorCentroid]] (mergeable partials over
  * unbounded groups, bounded buffer).
  *
  * The buffer is kept sorted and trimmed on every `reduce`/`merge`; at
  * k ≤ a few hundred the re-sort of k+1 elements is cheaper than a
  * heap's constant factors in JVM practice.
  */
class TopKByValue(k: Int) extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
  require(k > 0, s"k must be positive: $k")

  private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
    s.sortBy { case (id, v) => (-v, id) }.take(k)

  override def zero: Seq[(Long, Double)] = Nil

  override def reduce(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] =
    trim(b :+ a)

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(a ++ b)

  override def finish(r: Seq[(Long, Double)]): Seq[(Long, Double)] = r

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
