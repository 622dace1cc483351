package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the hand tools for the cases AQE's
  * skew-join splitting does not reach (shuffled joins it can split it
  * handles alone; aggregation skew and broadcast-ineligible dimension
  * joins it does not).
  *
  * Both utilities implement classic salting: spread one hot key over
  * `buckets` synthetic sub-keys so no single task owns the whole key,
  * then (for aggregates) merge the per-salt partials. Salts are
  * deterministic (hash of a caller-chosen uniqueness column), so reruns
  * and task retries see identical data placement.
  */
object Skew {

  /** Deterministic salt in [0, buckets). `uniq` should vary per row
    * (an id column); determinism keeps retries/replays consistent. */
  def salt(uniq: Column, buckets: Int): Column =
    pmod(xxhash64(uniq), lit(buckets.toLong)).cast("int")

  /** Salted equi-join of a skewed fact against a non-broadcastable
    * dimension: the fact side gets a per-row salt, the dimension is
    * replicated `buckets`× with every salt value, and the join runs on
    * (key, salt) — a hot fact key now lands on `buckets` reducers
    * instead of one. Cost: dim shuffle volume × buckets (the standard
    * trade). Results are identical to the unsalted join. */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      uniq: Column, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(uniq, buckets))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** Two-phase salted aggregation for algebraic functions over skewed
    * group keys: phase 1 aggregates (keys, salt) — the hot key's rows
    * split across `buckets` parallel partial groups — phase 2 merges the
    * partials per key. `aggs` maps column → one of sum|count|min|max
    * (avg = derive sum/count at the call site; output columns are named
    * `fn_col`). */
  def twoPhaseAgg(
      df: DataFrame, keys: Seq[String], uniq: Column, buckets: Int,
      aggs: Map[String, String]): DataFrame =
    twoPhaseAgg(df, keys, uniq, buckets, aggs.toSeq)

  /** Seq-of-pairs variant: allows several aggregates over the SAME column
    * (a Map key can't repeat), e.g. `Seq("v" -> "sum", "v" -> "min")`. */
  def twoPhaseAgg(
      df: DataFrame, keys: Seq[String], uniq: Column, buckets: Int,
      aggs: Seq[(String, String)]): DataFrame = {
    val phase1Cols = aggs.map {
      case (c, "sum")   => sum(col(c)).as(s"sum_$c")
      case (c, "count") => count(col(c)).as(s"count_$c")
      case (c, "min")   => min(col(c)).as(s"min_$c")
      case (c, "max")   => max(col(c)).as(s"max_$c")
      case (c, fn)      => throw new IllegalArgumentException(s"unsupported agg $fn($c)")
    }
    val phase2Cols = aggs.map {
      case (c, "sum")   => sum(col(s"sum_$c")).as(s"sum_$c")
      case (c, "count") => sum(col(s"count_$c")).as(s"count_$c")
      case (c, "min")   => min(col(s"min_$c")).as(s"min_$c")
      case (c, "max")   => max(col(s"max_$c")).as(s"max_$c")
      case (c, fn)      => throw new IllegalArgumentException(s"unsupported agg $fn($c)")
    }
    df.withColumn("__salt", salt(uniq, buckets))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(phase1Cols.head, phase1Cols.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(phase2Cols.head, phase2Cols.tail: _*)
  }
}
