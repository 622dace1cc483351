package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The HASHED-DSIR receipt (round-12 verdict item 2): t26's scaladoc
  * claims that at web scale the only change is `term` →
  * `xxhash64(term) % 10⁴`, bounding the feature table at 10⁴ rows
  * "with the same plan" — a claim the sf estates cannot exercise
  * (31-term vocabulary: the hashed run is indistinguishable). This
  * stages a WIDE-VOCAB corpus (50k terms, two lang-biased slices so
  * the importance weights carry real signal), runs BOTH spellings of
  * the per-doc weight dataflow, and reports:
  *
  *   - feature-table rows: |V| for exact vs ≤10⁴ hashed (the bound);
  *   - Pearson correlation of the per-doc weights + top-100 overlap
  *     (what feature hashing costs in fidelity — DSIR's own recipe is
  *     the hashed one, Xie et al. 2023 §3);
  *   - wall seconds for each;
  *   - plan-shape equality: the hashed spelling must add NO operator —
  *     same aggregate/join/broadcast skeleton, the projection is the
  *     only difference.
  *
  * Usage: runMain graft.examples.DsirHashProbe [nDocs] [vocab]
  */
object DsirHashProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val vocab = args.lift(1).map(_.toInt).getOrElse(50000)
    val docLen = 100
    val spark = graft.Engine.session()

    // lang l0 = 70% majority (the target domain); terms drawn from a
    // lang-biased slice of the vocabulary: target docs from [0, 3V/4),
    // the rest from [V/4, V) — the central half overlaps, the outer
    // quarters separate the distributions (deterministic, no RNG)
    val docs = spark.range(nDocs).select(
        col("id").as("doc_id"),
        when(col("id") % 10 < 7, "l0")
          .otherwise(concat(lit("l"), (col("id") % 3 + 1))).as("lang"),
        array_join(
          transform(sequence(lit(1), lit(docLen)), i =>
            concat(lit("w"),
              when(col("id") % 10 < 7,
                pmod(col("id") * 31 + i * 17 + i * i, lit(3L * vocab / 4)))
                .otherwise(
                  pmod(col("id") * 31 + i * 17 + i * i, lit(3L * vocab / 4))
                    + lit(vocab / 4)))),
          " ").as("text"))
      .localCheckpoint()

    /** t26's per-doc weight dataflow (no top-30 cut — the probe
      * correlates ALL docs), with the term key either exact or hashed.
      * `eagerCp = false` builds the frame WITHOUT materializing the
      * feature-table checkpoint — the plan-shape comparison needs only
      * planning, and an eager checkpoint there would re-run the full
      * aggregate a third/fourth time just to read node names. */
    def weights(hashed: Boolean, eagerCp: Boolean = true): DataFrame = {
      val tgt = docs.groupBy("lang").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("lang")).limit(1)
        .select(col("lang").as("tlang"))
      val key =
        if (hashed) pmod(xxhash64(col("term0")), lit(10000L)).cast("string")
        else col("term0")
      val tok = docs
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("term0"))
        .select(col("doc_id"), col("lang"), key.as("term"))
      val tc = tok.crossJoin(broadcast(tgt))
        .groupBy("term")
        .agg(
          count(lit(1)).as("c_all"),
          sum(when(col("lang") === col("tlang"), 1L).otherwise(0L)).as("c_t"))
        .localCheckpoint(eagerCp)
      val tot = tc.agg(
        sum("c_all").cast("double").as("tot_all"),
        sum("c_t").cast("double").as("tot_t"),
        count(lit(1)).cast("double").as("v"))
      val lr = log((col("c_t") + lit(1.0)) / (col("tot_t") + col("v"))) -
        log((col("c_all") + lit(1.0)) / (col("tot_all") + col("v")))
      tok.join(tc, Seq("term"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("lang"), lr.as("lr"))
        .groupBy("doc_id", "lang")
        .agg(avg("lr").as("dsir"))
    }

    def planShape(df: DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect {
        case n => n.nodeName
      }.filterNot(_.contains("WholeStageCodegen"))

    def timed(df: DataFrame): (DataFrame, Double, Long) = {
      val t0 = System.nanoTime()
      val out = df.localCheckpoint()
      ((out, (System.nanoTime() - t0) / 1e9, out.count()))
    }

    val (we, te, ne) = timed(weights(hashed = false))
    val (wh, th, nh) = timed(weights(hashed = true))
    val featExact = docs
      .select(explode(split(col("text"), " ")).as("t")).agg(countDistinct("t"))
      .head().getLong(0)
    val featHashed = docs
      .select(explode(split(col("text"), " ")).as("t0"))
      .select(pmod(xxhash64(col("t0")), lit(10000L)).as("t"))
      .agg(countDistinct("t")).head().getLong(0)

    val joined = we.select(col("doc_id"), col("dsir").as("de"))
      .join(wh.select(col("doc_id"), col("dsir").as("dh")), "doc_id")
      .localCheckpoint()
    val corrV = joined.agg(corr(col("de"), col("dh"))).head().getDouble(0)
    def top100(df: DataFrame, c: String) = df
      .orderBy(col(c).desc, col("doc_id")).limit(100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val overlap = (top100(joined, "de") & top100(joined, "dh")).size

    println(f"docs=$nDocs vocab(actual)=$featExact hashed_features=$featHashed")
    println(f"exact:  wall=$te%6.2f s  rows=$ne")
    println(f"hashed: wall=$th%6.2f s  rows=$nh")
    println(f"weight correlation (Pearson, all docs) = $corrV%8.5f")
    println(f"top-100 overlap = $overlap/100")
    val (pe, ph) = (
      planShape(weights(false, eagerCp = false)),
      planShape(weights(true, eagerCp = false)))
    println(s"plan shapes equal = ${pe == ph}")
    if (pe != ph) {
      println("exact plan:  " + pe.mkString(" > "))
      println("hashed plan: " + ph.mkString(" > "))
    }
    spark.stop()
  }
}
