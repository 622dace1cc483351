package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Engine

/** Separates v16 (plain IVF-PQ) from v26 (residual IVF-PQ) on an
  * estate where the separation is POSSIBLE. On the driver's isotropic
  * synthetic embeddings both pipelines' recall flags read the
  * nprobe/|labels| coarse-coverage ceiling (PLANS.md round-12) — no
  * cluster structure, nothing for residual encoding to win. This probe
  * stages a CLUSTERED estate: 10 label blobs with deterministic
  * hash-derived centers (spread ±1.0) and per-vector noise at a swept
  * amplitude (±0.15/±0.30/±0.60 — tight to loose clusters), then runs
  * the UNCHANGED v16/v26 queries and reads their own
  * `in_exhaustive_topk` audit flags plus the summed top-10 cosine. The
  * residual claim predicts: the tighter the clusters (within-cell
  * variance ≪ corpus variance), the more the residual codebook's
  * effective resolution beats the plain one — and the coarse probe
  * stops being the binding constraint because the query's true
  * neighbors share its cell.
  *
  * Probe-only estate (no DuckDB twin needed — the probe consumes the
  * queries' own oracle-checked output shape); construction is pure
  * column arithmetic over xxhash64, so it is deterministic across runs
  * and JVMs. Usage: `sbt "runMain graft.examples.ResidualPqProbe"`. */
object ResidualPqProbe {
  private val Dim = 64
  private val N = 2000L

  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")

    println(f"${"noise"}%6s ${"query"}%22s ${"recall@10"}%10s ${"sum_cos"}%8s")
    for (noise <- Seq(0.15, 0.30, 0.60)) {
      val dir = stage(spark, noise)
      for (name <- Seq("v16_ivfpq_pipeline", "v26_ivfpq_residual")) {
        val rows = graft.SparkEntry.queries(name)(spark, dir).collect()
        val recall = rows.count(_.getBoolean(3))
        val sumCos = rows.map(_.getDouble(2)).sum
        println(f"$noise%6.2f $name%22s $recall%7d/10 $sumCos%8.3f")
      }
    }
    spark.stop()
  }

  /** 10 hash-centered Gaussian-ish blobs; vector = center(label) +
    * noise(vec_id) · amplitude. Everything derives from xxhash64, so
    * the estate is a pure function of (noise). */
  private def stage(s: SparkSession, noise: Double): String = {
    val dir = java.nio.file.Files.createTempDirectory(
      s"graft_respq_${(noise * 100).toInt}").toString
    def unit(seed: org.apache.spark.sql.Column*) =
      pmod(xxhash64(seed: _*), lit(1000L)).cast("double") / 500.0 - 1.0
    s.range(N)
      .select(col("id").as("vec_id"), (col("id") % 10).cast("int").as("label"))
      .select(col("vec_id"), col("label"),
        transform(sequence(lit(0), lit(Dim - 1)), i =>
          (unit(col("label"), i) + unit(col("vec_id"), i, lit(7L)) * noise)
            .cast("float")).as("embedding"))
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }
}
