package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers shared by the declared queries. */
object Num {

  /** Oracle-aligned double rounding: round in PRODUCT space —
    * `round(x·10^d, 0) / 10^d` — instead of `round(x, d)`.
    *
    * Spark's `round(x, d)` takes the exact decimal expansion of the
    * double (`BigDecimal(x)`) and applies HALF_UP, so an average like
    * 28.794999999999999 (the double nearest 28.795) rounds DOWN to 28.79.
    * DuckDB — the correctness oracle — rounds the double PRODUCT
    * `x·10^d`, where the same value becomes exactly 2879.5 and rounds UP
    * to 28.80. Midpoints are common, not rare: the mean of two 2-dp
    * inputs is a .xx5 midpoint half the time (343 of q05's 5427 groups
    * differed at sf0.01). Doing the multiply first makes both engines
    * round the identical IEEE-754 double, and HALF_UP == C `round()` for
    * the positive-and-away-from-zero cases both use. */
  def oround(c: Column, d: Int): Column =
    if (d == 0) round(c, 0)
    else {
      val p = math.pow(10, d)
      round(c * p, 0) / p
    }
}
