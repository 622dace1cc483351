package graft

/** Plan-audit aid: print `explain("formatted")` for the named queries
  * (or all) against a scale dir. Usage:
  * `sbt "runMain graft.Explain /root/testdata/sf0.01 q13_join_tpch_q3"` */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    val spark = Engine.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected =
      if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.filter(q => names.contains(q._1)).toSeq
    selected.foreach { case (name, fn) =>
      println(s"\n########## $name ##########")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
