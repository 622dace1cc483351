package graft.examples

import org.apache.spark.sql.DataFrame

import graft.Engine

/** d17's growth axis: the benchmark PANEL. The probed screen's cost is
  * |panel| probe keys (broadcast strings) joined against the corpus —
  * it should grow sub-linearly in |panel| (corpus scan dominates); the
  * EXACT audit — |corpus|·|panel| brute force by construction — is
  * since round 11 PLAN-ENFORCED onto the `vec_id % 3` corpus slice,
  * so its growth rides a 3×-smaller corpus side. Drives the SAME
  * [[graft.queries.DedupQueries.semanticDecontam]] plan at panel
  * modulus 97 (the declared d17, ~1% panel) and 9 (~11%), reports
  * wall-clock α normalized to the actual panel growth.
  *
  * Post-cap re-run (sf0.1, quiet): 1.41 s → 1.16 s across the 10.8×
  * panel — α ≈ 0 (scan-dominated; before the cap the blended α
  * carried the audit's linear term). The remaining |panel| linearity
  * is the broadcast itself, nowhere near binding at this range.
  *
  * Run: `sbt "runMain graft.examples.D17PanelProbe"` (sf0.1).
  */
object D17PanelProbe {
  private val Base = "/root/testdata/sf0.1"

  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val nAll = graft.sources.VectorIndex.corpusCount(spark, Base)
    val growth = (nAll / 9.0) / (nAll / 97.0) // ≈ 97/9 ≈ 10.8
    def run(mod: Long): DataFrame =
      graft.queries.DedupQueries.semanticDecontam(spark, Base, mod)
    def time(mk: () => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    val t97 = time(() => run(97L))
    val t9 = time(() => run(9L))
    val a = math.log(t9 / t97) / math.log(growth)
    println(f"panel x$growth%.1f (mod 97 -> 9): ${t97}%.2f s -> ${t9}%.2f s, alpha=$a%.2f")
    println("(both halves in one query: probed screen sub-linear, exact audit " +
      "linear in |panel| — alpha blends them; > 1 would be a scale bug)")
    spark.stop()
  }
}
