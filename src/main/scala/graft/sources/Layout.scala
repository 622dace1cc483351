package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest layout utilities — the storage half of the 100 TB design.
  *
  * The engine's queries are declarative, so the *only* thing that changes
  * between sf0.01 and 100 TB is how the data is laid out at rest:
  *
  *  - **Bucketing** fact tables by their join key makes fact⋈fact joins
  *    exchange-free: both sides arrive hash-partitioned by the bucket
  *    key, so EnsureRequirements inserts no shuffle. At 100 TB the
  *    orders⋈lineitem edge (TPC-H Q3 / q13) is THE dominant shuffle;
  *    bucketing both by orderkey removes it entirely. (The reference has
  *    no analogous concept — its "table" is an in-memory HashMap,
  *    `/root/reference/src/main.rs:72`.)
  *
  *  - **Partitioning** an event table by day turns every time-bounded
  *    query (the 30-min windows of OP-08 over any bounded range) into a
  *    partition-pruned scan: the filter is resolved against directory
  *    names, and unneeded days are never opened.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed parquet table. Joins and
    * aggregations keyed on `key` against other tables bucketed the same
    * way (same key, same bucket count) plan without a shuffle. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Materialize (once per JVM) the orderkey-bucketed orders⋈lineitem
    * fact pair for `sfDir` and return the two table names. Bucket
    * metadata lives in the catalog, not the files, so bucketed tables
    * MUST go through `saveAsTable`; this session's catalog is in-memory,
    * so each process builds its own copy — at deployment the metastore
    * persists and the build is a one-time indexing job, exactly like
    * [[graft.sources.VectorIndex]]'s artifacts. Table names carry the
    * pid so concurrent Verify/Bench/test JVMs sharing a warehouse dir
    * never collide on a managed-table location. */
  def ensureBucketedFacts(s: SparkSession, sfDir: String, buckets: Int = 8): (String, String) =
    (ensureBucketedArtifact(s, "orders_bkt", sfDir, "o_orderkey", buckets)(
      graft.Tables.orders(s, sfDir).select("o_orderkey", "o_custkey")),
      ensureBucketedArtifact(s, "lineitem_bkt", sfDir, "l_orderkey", buckets)(
        graft.Tables.lineitem(s, sfDir)
          .select("l_orderkey", "l_extendedprice", "l_discount")))

  /** Materialize (once per JVM) a DERIVED bucketed artifact table —
    * `build` evaluated lazily, written bucketed+sorted by `key` — and
    * return its name: the ensureBucketedFacts discipline generalized to
    * computed artifacts (signature indexes, pre-joined projections).
    * Table names carry the pid (concurrent Verify/Bench/test JVMs
    * sharing a warehouse dir never collide on a managed-table location)
    * plus the sfDir hash (one JVM may query several scale factors). */
  def ensureBucketedArtifact(
      s: SparkSession, name: String, sfDir: String, key: String, buckets: Int = 8)(
      build: => DataFrame): String = synchronized {
    // the bucket spec is part of the cache identity: same name re-requested
    // with a different key/count must build a NEW table, not silently
    // serve one bucketed the wrong way
    val tag = java.lang.Long.toHexString(ProcessHandle.current().pid()) +
      "_" + java.lang.Integer.toHexString((sfDir, key, buckets).hashCode)
        .replace('-', 'm')
    val t = s"graft_${name}_$tag"
    if (!s.catalog.tableExists(t)) writeBucketed(build, t, key, buckets)
    t
  }

  /** Write an event table partitioned by the date of `tsCol` — queries
    * filtering on `p_date` scan only the matching directories. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write
      .partitionBy("p_date")
      .mode("overwrite")
      .parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write `df` range-clustered on `key`: rows are range-partitioned
    * into `files` output files and sorted within each, so every file
    * covers one narrow, non-overlapping key range. Parquet records
    * per-column min/max in footers and row groups; a point or range
    * predicate on `key` then skips every non-overlapping file/row-group
    * at scan time — directory-free data skipping, the complement of
    * [[writeDatePartitioned]] for high-cardinality keys where one
    * directory per value is unworkable. (The same idea generalizes to
    * multi-column Z-ordering; one clustered column covers the dominant
    * predicate.) */
  def writeRangeClustered(df: DataFrame, key: String, files: Int, path: String): Unit =
    df.repartitionByRange(files, col(key))
      .sortWithinPartitions(key)
      .write
      .mode("overwrite")
      .parquet(path)

  /** Write `df` Z-ORDER clustered on two numeric columns: each row's
    * 16-bit-normalized (a, b) coordinates are bit-interleaved into one
    * Morton code, and the data is range-partitioned + sorted on that
    * code. Every output file then covers a small BOUNDING BOX in BOTH
    * dimensions (a range-cluster on `a` alone leaves each file spanning
    * the full `b` range), so parquet footer min/max skip files for
    * predicates on either column or both — the multi-dimensional
    * complement of [[writeRangeClustered]], and the at-rest layout for
    * the two-predicate scan pattern (user × time, key × metric) a
    * single clustering column cannot serve. Normalization bounds come
    * from one tiny min/max aggregate of the input (at deployment:
    * maintained table stats). LayoutSpec measures the property rather
    * than trusting the math: per-file extents of BOTH columns shrink
    * vs the single-column layout. */
  def writeZOrdered(
      df: DataFrame, a: String, b: String, files: Int, path: String): Unit = {
    val r = df.agg(
      min(col(a)).cast("double"), max(col(a)).cast("double"),
      min(col(b)).cast("double"), max(col(b)).cast("double")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) {
      // empty input / all-null clustering column: no coordinates to
      // interleave — write as-is, matching writeRangeClustered's
      // behavior on the same degenerate input
      df.write.mode("overwrite").parquet(path)
      return
    }
    val (aMin, aMax, bMin, bMax) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    def norm16(c: Column, lo: Double, hi: Double): Column =
      least(
        floor((c.cast("double") - lit(lo)) / lit(math.max(hi - lo, 1e-12)) * 65536.0),
        lit(65535.0)).cast("long")
    // Morton code: bit j of a → bit 2j, bit j of b → bit 2j+1
    def interleave(x: Column, y: Column): Column =
      aggregate(
        sequence(lit(0), lit(15)), lit(0L),
        (acc, j) => acc
          + call_function("shiftleft",
            call_function("shiftright", x, j).bitwiseAND(lit(1L)), j * 2)
          + call_function("shiftleft",
            call_function("shiftright", y, j).bitwiseAND(lit(1L)), j * 2 + 1))
    df.withColumn("__z",
        interleave(norm16(col(a), aMin, aMax), norm16(col(b), bMin, bMax)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(path)
  }

  /** Compact a small-files table into size-targeted files — the
    * maintenance pass every long-lived 100 TB table needs: streaming
    * sinks and fine-grained partition writes accrete thousands of tiny
    * files, and each one costs a task launch, a footer read, and a
    * metastore entry on every subsequent scan. Partition directories
    * (`key=value/`) are recursed into and compacted IN PLACE — each
    * leaf rewrites independently, preserving the partition layout (and
    * bounding the blast radius of any one failure to one partition).
    * Sizing is from the ACTUAL bytes on disk per leaf, so output stays
    * at `targetBytes`/file as the table grows.
    *
    * Each leaf rewrite goes through a staging directory and two
    * renames; the unreadable window is the instant between them (a
    * true atomic swap needs a metastore pointer or RENAME_EXCHANGE —
    * at deployment, route readers through the catalog). Stale staging
    * from a dead run is cleaned up; a stale backup dir means the
    * previous run died MID-SWAP and the call refuses until an operator
    * restores it (the data is intact in `<path>.compact-old`).
    *
    * Streaming-sink directories (`_spark_metadata` commit log) are
    * refused: the log names the files it committed, and rewriting them
    * would break the sink's exactly-once read contract.
    *
    * Returns (filesBefore, filesAfter) summed over leaves. */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L << 20): (Int, Int) = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    def ls(p: Path): Seq[Path] = {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq
      finally s.close() // Files.list leaks the directory fd unless closed
    }
    def compactLeaf(dir: Path): (Int, Int) = {
      val before = ls(dir).filter(_.getFileName.toString.endsWith(".parquet"))
      if (before.size <= 1) return (before.size, before.size) // nothing to gain
      val totalBytes = before.map(Files.size).sum
      val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
      val staging = dir.resolveSibling(dir.getFileName.toString + ".compact-staging")
      val old = dir.resolveSibling(dir.getFileName.toString + ".compact-old")
      if (Files.exists(old))
        throw new IllegalStateException(
          s"$old exists: a previous compaction died mid-swap; restore it to $dir first")
      deleteTree(staging) // stale staging from a dead run is safe to drop
      spark.read.parquet(dir.toString).repartition(nOut).write.mode("overwrite")
        .parquet(staging.toString)
      // replace source only after the staged write fully succeeded
      Files.move(dir, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(staging, dir, StandardCopyOption.ATOMIC_MOVE)
      deleteTree(old)
      (before.size, ls(dir).count(_.getFileName.toString.endsWith(".parquet")))
    }
    def deleteTree(p: Path): Unit =
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
        finally walk.close()
      }
    def walk(dir: Path): (Int, Int) = {
      val entries = ls(dir)
      if (entries.exists(_.getFileName.toString == "_spark_metadata"))
        throw new IllegalArgumentException(
          s"$dir is a streaming-sink directory (_spark_metadata names its files); " +
            "compacting it would break the exactly-once read contract")
      val partDirs = entries.filter(p =>
        Files.isDirectory(p) && p.getFileName.toString.contains("="))
      if (partDirs.nonEmpty) {
        val results = partDirs.map(walk)
        (results.map(_._1).sum, results.map(_._2).sum)
      } else compactLeaf(dir)
    }
    walk(Paths.get(path).toAbsolutePath.normalize)
  }
}
