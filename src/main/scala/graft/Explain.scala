package graft

/** Plan-audit aid: print `explain("formatted")` for the named queries
  * (or all) against a scale dir. With `-exec`, run each query first and
  * print the FINAL adaptive plan (AQE re-plans at runtime, and codegen
  * ids / reused exchanges only appear in the executed plan). Usage:
  * `sbt "runMain graft.Explain /root/testdata/sf0.01 [-exec] q13_join_tpch_q3"` */
object Explain {
  def main(args: Array[String]): Unit = {
    val exec = args.contains("-exec")
    val rest = args.filterNot(_ == "-exec")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.001")
    val names = rest.drop(1)
    val spark = Engine.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected =
      if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.filter(q => names.contains(q._1)).toSeq
    selected.foreach { case (name, fn) =>
      println(s"\n########## $name ##########")
      val df = fn(spark, sfDir)
      if (exec) {
        // collect() drives THIS DataFrame's QueryExecution so the printed
        // adaptive plan is the final one (a .write would execute a
        // separate QueryExecution and leave this one unplanned)
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
