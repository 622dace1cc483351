package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Engine
import graft.functions.TextFns

/** Stage breakdown for d13_containment's sf10 α=1.18/decade (round-13
  * sweep): times cumulative prefixes of the production pipeline at one
  * SF dir so two runs (sf1, sf10) yield a per-stage exponent table.
  * Width was already ruled out (49.3 s at 128 shuffle partitions vs
  * 49.5 at 32), so the suspect list is the explode/checkpoint mass,
  * the pre-cap df aggregate, the join-back, and the pair enumeration.
  *
  * Stages (each timed as a full plan from the scan — subtract
  * neighbors to attribute):
  *   s1 explode      — tokenize + trigram explode, no materialization
  *   s2 checkpoint   — s1 + the pipeline's localCheckpoint of `sh`
  *   s3 df-agg       — s2 + groupBy(sh).count.filter(df<=20)
  *   s4 join-back    — s3 + sh⋈rare-sh + the second checkpoint
  *   s5 full         — the whole d13 (na + pair join + rollup + top20)
  *
  * Run: `sbt "runMain graft.examples.D13StageProbe /tmp/sf1"` then
  * again with /tmp/sf10; results in PLANS.md round-14.
  */
object D13StageProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")

    def tokenized: DataFrame = graft.Tables.rebalance(spark,
        spark.read.parquet(s"$d/documents.parquet"))
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    def shRaw: DataFrame = tokenized
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(TextFns.shinglesOf(col("toks"), 3)).as("sh"))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-12s $sec%8.2f s")
      sec
    }

    time("s1_explode") { noop(shRaw) }
    time("s2_ckpt") { shRaw.localCheckpoint().unpersist(true) }
    val sh = shRaw.localCheckpoint()
    time("s3_dfagg") {
      noop(sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 20).select("sh"))
    }
    val rareSh = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 20).select("sh")
    time("s4_joinback") { sh.join(rareSh, "sh").localCheckpoint().unpersist(true) }
    val rs = sh.join(rareSh, "sh").localCheckpoint()
    time("s5_rest") {
      val na = rs.groupBy("doc_id").agg(count(lit(1)).as("n"))
      noop(rs.select(col("sh"), col("doc_id").as("da"))
        .join(rs.select(col("sh"), col("doc_id").as("db")), "sh")
        .filter(col("da") < col("db"))
        .groupBy("da", "db").agg(count(lit(1)).as("ni"))
        .join(na.select(col("doc_id").as("da"), col("n").as("nda")), "da")
        .join(na.select(col("doc_id").as("db"), col("n").as("ndb")), "db")
        .select(col("da"), col("db"), col("ni"),
          graft.functions.Num.oround(
            col("ni").cast("double") / least(col("nda"), col("ndb")), 3)
            .as("containment"))
        .orderBy(col("containment").desc, col("da"), col("db"))
        .limit(20))
    }
    spark.stop()
  }
}
