package graft
/** Benchmark main (driver contract): run every declared query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * The action is a `noop`-format write — it executes the FULL physical
  * plan and materializes every output row (unlike `.count()`, under which
  * Catalyst prunes all projected columns and the bench measures row
  * counting, not the query). Failures are surfaced on stderr and as -1
  * timings, never swallowed. Session via [[Engine.session]] (UTC, AQE,
  * nanosAsLong, shuffle partitions = cores). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session()
    val errs = scala.collection.mutable.ArrayBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          errs += s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}"
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    errs.foreach(e => System.err.println(s"[bench] FAILED $e"))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
