package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.queries.DedupQueries

/** The ×10 EMBEDDING-COUNT scale probe (round 10; the ANN family's axis —
  * round 9 measured document count): the sf0.1 embeddings staged as
  * `copies` vec_id-offset copies with DIVERSIFIED vectors (deterministic
  * per-(vec_id, copy, dim) sin-hash coordinates in [−1, 1]) — so every
  * SRP bucket and every IVF label partition deepens ×copies with novel
  * vectors, the growth mode a real embedding corpus has. This drives
  * exactly the structures whose 100 TB claims were plan-asserted but
  * never measured under corpus growth:
  *
  *  - v02/v05 probe the PERSISTED bucket-partitioned corpus: the scan
  *    stays 1 (or 5) of 2^SrpBits directories, so probe time should
  *    grow no faster than the probed bucket (α ≤ 1), never like the
  *    corpus-wide brute force (v01, the α = 1 full-scan yardstick);
  *  - v03/v16 probe nprobe=2 of |labels| IVF partitions — |labels| is
  *    fixed, each partition deepens ×copies, so the probed fraction is
  *    constant and α ≤ 1;
  *  - v10 amortizes 5 queries over ONE pruned scan — its α must match
  *    v02's, not 5× it;
  *  - d05's sign-LSH blocking: at a FIXED key width, buckets deepen
  *    ×copies and within-bucket pair work grows ×copies² (α ≈ 2 — the
  *    hazard twin, measured here with `forceBits = 4`); the shipped
  *    [[DedupQueries.adaptiveSrpBits]] width grows with the corpus
  *    count so expected bucket occupancy stays ≤ ~64 and α stays ≈ 1.
  *
  * Index-build cost (ensureSrp/ensureIvf on the staged corpus) lands in
  * each family's FIRST cold run and is reported separately — min-of-2 is
  * the warm probe a serving deployment pays per query.
  *
  * Usage: `sbt "runMain graft.examples.EmbCountProbe [copies]"`
  * (default 10). α = log(t_big / t_base) / log(copies); α = 1 is linear
  * in corpus size, α > 1 super-linear (a scale bug on this axis). */
object EmbCountProbe {
  private val Base = "/root/testdata/sf0.1"

  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = stage(spark, copies)
    println(s"probe estate: $dir (sf0.1 embeddings x $copies diversified copies)")

    // structure census first — the counts the α story is about
    census(spark, dir, copies)

    val names = Seq(
      "v01_cosine_topk", // brute force: the α = 1 full-scan yardstick
      "v02_srp_ann", "v05_srp_multiprobe", "v10_batch_ann",
      "v03_ivf_centroid", "v16_ivfpq_pipeline", "v22_multitable_ann",
      "d05_embedding_near_dup",
      "v25_pca_power", // one-pass covariance: the scan IS the cost, α→1
      "v26_ivfpq_residual") // DPP-pruned probe: reads nprobe/|labels| of any corpus
    val rows = names.map { n =>
      val (b1, b2) = cold2(query(spark, Base, n))
      val (g1, g2) = cold2(query(spark, dir, n))
      (n, math.min(b1, b2), math.min(g1, g2), g1)
    } :+ {
      // the fixed-width hazard twin of d05 (probe-only, never a query) —
      // with d05's full output shape (round + global sort) so the two
      // variants differ ONLY in blocking-key width
      def fixed(d: String) = () => DedupQueries
        .cosineEdges(spark, d, forceBits = Some(4))
        .select(col("va"), col("vb"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("va", "vb")
      val (b1, b2) = cold2(fixed(Base))
      val (g1, g2) = cold2(fixed(dir))
      ("d05_FIXED4BITS_hazard", math.min(b1, b2), math.min(g1, g2), g1)
    }
    println(f"${"query"}%-24s ${"base"}%8s ${"x" + copies}%8s ${"alpha"}%7s ${"x" + copies + "cold"}%10s")
    rows.foreach { case (n, t1, t10, cold) =>
      val a = math.log(t10 / t1) / math.log(copies.toDouble)
      println(f"$n%-24s $t1%8.2f $t10%8.2f $a%7.2f $cold%10.2f")
    }
    spark.stop()
  }

  /** Probed-fraction census: SRP bucket occupancy of the query vector's
    * bucket vs the corpus, and the two probed IVF labels vs the corpus —
    * the fractions the partition-pruning claims are about. They must
    * stay ≈ constant as the corpus deepens. */
  private def census(s: SparkSession, dir: String, copies: Int): Unit = {
    for ((d, tag) <- Seq((Base, "base"), (dir, s"x$copies"))) {
      // Bucket occupancy from a DIRECT corpus scan at the index's width
      // — deliberately NOT via ensureSrp: the census must not pre-build
      // the index, or the v02/v05/v10 cold column below would exclude
      // the SRP build cost it claims to report (the IVF/L-table colds
      // include theirs, and the cross-family comparison relies on it).
      val bits = graft.sources.VectorIndex.srpBitsFor(s, d)
      val bq = graft.Tables.embeddings(s, d).select(
        col("vec_id"),
        graft.sources.VectorIndex.pbucketOf(
          graft.functions.VectorFns.toDouble(col("embedding")), bits).as("pbucket"))
      val n = bq.count()
      val qb = bq.filter(col("vec_id") === 0).select(col("pbucket")).first().getString(0)
      val inB = bq.filter(col("pbucket") === qb).count()
      val nb = bq.select("pbucket").distinct().count()
      println(f"[census] $tag%-5s corpus=$n%,9d srp_buckets=$nb%3d " +
        f"query_bucket=$inB%,8d (${100.0 * inB / n}%.1f%% of corpus)")
    }
  }

  /** `copies` offset copies of the sf0.1 embeddings; copy 0 verbatim
    * (vec_id 0 stays the query vector), copies ≥ 1 with vec_id offset
    * and coordinates replaced by a deterministic per-(id, copy, dim)
    * sin-hash — novel directions spread across all sign buckets, the
    * way a growing corpus actually fills an index. Labels are KEPT, so
    * IVF's |labels| is fixed and each coarse cell deepens ×copies. */
  private def stage(s: SparkSession, copies: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_embcount").toString
    val base = s.read.parquet(s"$Base/embeddings.parquet")
    val fanned = (0 until copies).map { i =>
      if (i == 0) base
      else base
        .withColumn("embedding", transform(col("embedding"), (_, j) =>
          // xxhash64 decorrelates (id, copy, dim) → uniform [−1, 1):
          // a stride-based formula (sin of a linear index) produces
          // massively correlated directions — 11.7M spurious near-dup
          // pairs at ×10, measured — and would turn the probe into an
          // output-size benchmark instead of a work benchmark
          ((pmod(xxhash64(col("vec_id"), lit(i), j), lit(2000001L)) - lit(1000000L))
            / lit(1000000.0)).cast("float")))
        .withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
    }.reduce(_ unionByName _)
    fanned.coalesce(8).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def query(s: SparkSession, dir: String, name: String): () => DataFrame =
    () => graft.SparkEntry.queries(name)(s, dir)

  /** Two noop-write runs, both returned: run 1 carries index build +
    * codegen (the cold number), run 2 is the warm probe. */
  private def cold2(mk: () => DataFrame): (Double, Double) = {
    def once(): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (once(), once())
  }
}
