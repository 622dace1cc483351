package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE shared-artifact cache discipline (generalized from the
  * round-10..16 `DedupQueries.cachedLabels`): compute-once-per-
  * (session, dataset) materialization of an intermediate several
  * queries share — the component labelings d06/d14/p14 and d16 read,
  * and the graph family's supplier↔customer edge table. At deployment
  * each of these is a one-time indexing job whose artifact downstream
  * queries read; here the localCheckpoint'd table stands in for that
  * artifact. Properties, all load-bearing:
  *
  *  - **Content-stamp keyed** (round-10 advisory): entries key on the
  *    `(name, length, mtime)` listing of the source table(s), not just
  *    the path — a restaged directory yields a new stamp, so stale
  *    artifacts can never be served and the superseded entry drops at
  *    that moment. Stamping is driver-side metadata only (one
  *    `listStatus` per table, no job).
  *  - **LRU-bounded**: a long-lived session staging many datasets
  *    evicts least-recently-USED entries past `bound`.
  *  - **Checkpoint-liveness self-healing** (round-16): a locally-
  *    checkpointed Dataset cannot recompute (lineage truncated), so a
  *    served entry is validated against the live persistent-RDD set
  *    and silently rebuilt when its blocks are gone — the cache is a
  *    compute-once optimization, never a correctness dependency.
  *  - **PINNED out of the harness storage sweep** (round-17 verdict
  *    task 1 — the fix the ledger called `Engine.pinnedRDDs`): Bench
  *    and Verify run a blocking unpersist of all persistent RDDs
  *    between queries to keep dead checkpoint blocks from bleeding
  *    into later queries' memory headroom; that sweep was ALSO killing
  *    these live artifacts, so every consumer after the first paid a
  *    full rebuild (sf10: d14 2.0 → 21.7 s, p14 0.9 → 21.7 s). Each
  *    artifact's RDD id is registered in [[graft.Engine.pinnedRDDs]]
  *    on materialization and unregistered on eviction/stale-drop, so
  *    retirement makes the blocks sweepable again.
  *
  * `synchronized` throughout: concurrent test suites sharing the
  * session must not race two builds of one artifact.
  */
final class ArtifactCache(bound: Int = 8) {
  private val cache = scala.collection.mutable.LinkedHashMap
    .empty[(SparkSession, String, String), DataFrame]

  /** The dataset content stamp: flat listing of each source table's
    * files as `name:length:mtime`, tables joined by `;`. */
  private def stampOf(s: SparkSession, d: String, tables: Seq[String]): String =
    tables.map { t =>
      val p = new org.apache.hadoop.fs.Path(d, t)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      val files = if (st.isDirectory) fs.listStatus(p).toSeq else Seq(st)
      files.map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
        .sorted.mkString(",")
    }.mkString(";")

  /** The checkpoint's persistent RDD id — a localCheckpoint'd Dataset
    * analyzes to a [[org.apache.spark.sql.execution.LogicalRDD]];
    * anything else has no single block-backed id (treated as always
    * alive and never pinned). */
  private def rddIdOf(df: DataFrame): Option[Int] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd.id)
      case _ => None
    }

  private def alive(s: SparkSession, df: DataFrame): Boolean =
    rddIdOf(df).forall(s.sparkContext.getPersistentRDDs.contains)

  private def pin(df: DataFrame): Unit =
    rddIdOf(df).foreach(id => graft.Engine.pinnedRDDs.add(id))

  private def unpin(df: DataFrame): Unit =
    rddIdOf(df).foreach(id => graft.Engine.pinnedRDDs.remove(id))

  /** Serve the artifact for `(s, d, tables-stamp)`, building (and
    * localCheckpoint-materializing, and pinning) it on first touch,
    * stale stamp, or dead checkpoint. */
  def artifact(s: SparkSession, d: String, tables: Seq[String])(
      build: => DataFrame): DataFrame =
    cache.synchronized {
      val stamp = stampOf(s, d, tables)
      cache.keys.filter(k => k._1 == s && k._2 == d && k._3 != stamp)
        .toSeq.foreach(k => cache.remove(k).foreach(unpin))
      val key = (s, d, stamp)
      // remove-then-insert keeps the LinkedHashMap in access order, so
      // the eviction below is least-recently-USED, not just oldest
      val prev = cache.remove(key)
      val df = prev.filter(alive(s, _)).getOrElse {
        prev.foreach(unpin) // dead checkpoint: release the stale pin
        val built = build.localCheckpoint()
        pin(built)
        built
      }
      cache.put(key, df)
      while (cache.size > bound) {
        val (k, v) = cache.head
        cache.remove(k)
        unpin(v)
      }
      df
    }
}
