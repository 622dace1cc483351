package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector primitives over `ArrayType(FloatType)` embedding
  * columns.
  *
  * All folds are sequential left-folds (`aggregate`) in `double`, so the
  * result is bit-identical to the DuckDB oracle's `list_sum(list_transform
  * (list_zip(...)))` — IEEE-754 double arithmetic in the same order on the
  * same operands. Everything stays inside WholeStageCodegen (no UDFs) and
  * is per-row narrow work: at 100 TB the cost is one pass over the data,
  * no shuffle.
  */
object VectorFns {

  /** float[] → double[] (element-exact widening). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product as a sequential left fold over zip_with products. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity of two double[] columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-random-projection LSH bucket: the sign pattern of the first
    * `bits` coordinates, as a '0'/'1' string key. Deterministic (the
    * "hyperplanes" are the coordinate axes), trivially reproducible in the
    * oracle, and a proper ANN blocking key at scale: the self-join /
    * query-probe joins on this key touch only ~N/2^bits candidates per
    * bucket instead of the full corpus. */
  def srpBucket(v: Column, bits: Int): Column =
    concat((1 to bits).map(j =>
      // try_element_at: vectors shorter than `bits` read as sign-0 bits
      // instead of throwing (element_at errors out of bounds under ANSI)
      when(try_element_at(v, lit(j)) >= 0, lit("1")).otherwise(lit("0"))): _*)
}
