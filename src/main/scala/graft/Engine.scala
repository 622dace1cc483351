package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the engine.
  *
  * Every session the engine creates goes through here so that batch jobs,
  * the verify/bench mains, and the test suites agree on the semantics that
  * matter for oracle parity and scale:
  *
  *  - `spark.sql.session.timeZone=UTC` — the reference stamps aggregates in
  *    UTC (`/root/reference/src/utils.rs:82`); the DuckDB oracle also runs
  *    in UTC.
  *  - `spark.sql.legacy.parquet.nanosAsLong=true` — the driver's
  *    `events.parquet` carries `timestamp[ns]`, which Spark's Parquet reader
  *    otherwise rejects (PARQUET_TYPE_ILLEGAL). We read nanos as a long and
  *    convert with integer division (see [[Tables.events]]), matching
  *    DuckDB's own ns→µs truncation.
  *  - AQE on — at the 100 TB design point, runtime coalescing, skew-join
  *    splitting and dynamic join-strategy switching are the difference
  *    between a plan that survives and one that doesn't. Locally it also
  *    keeps the tiny SFs from producing thousands of empty tasks.
  *  - shuffle partitions default to the local core count (32), not 200 —
  *    on a real cluster this is the one knob that must be re-tuned
  *    (rule of thumb: 2–3× total executor cores, or rely on AQE's
  *    coalescing from a higher initial number).
  */
object Engine {
  def defaultParallelism: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** RDD ids EXEMPT from the harness inter-query storage sweep
    * ([[sweepPersistentRDDs]]) — the registry the round-17 ledger
    * promised as `Engine.pinnedRDDs`. The Bench/Verify hygiene sweep
    * (blocking `unpersist(true)` of every persistent RDD between
    * queries) exists to stop DEAD localCheckpoint blocks from one
    * query bleeding into the next query's memory headroom; but it was
    * also destroying the LIVE shared-artifact checkpoints
    * ([[graft.ops.ArtifactCache]]: d06/d14/p14's component labels,
    * d16's semantic labels, the graph family's edge table), forcing
    * each consumer query to recompute the artifact from scratch
    * (measured sf10: d14 2.0 → 21.7 s, p14 0.9 → 21.7 s; sf0.1
    * 0.41 → 3.3 s each). Pinned ids survive the sweep; the
    * ArtifactCache unpins on eviction so a retired artifact is
    * releasable again. Deployment analogy: the sweep models per-job
    * JVM teardown, the pins model the at-rest index artifacts a
    * teardown does NOT delete.
    *
    * Entries are `applicationId:rddId` ([[pinKey]]), not bare ids
    * (round-18 advisory): RDD ids restart from 0 in every new
    * SparkContext, so a bare id pinned by a stopped session would
    * silently exempt an UNRELATED RDD of a later session from the
    * sweep. Scoping by applicationId makes a stale pin inert. */
  val pinnedRDDs: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The pin-registry key for `rddId` in `spark`'s context. */
  def pinKey(spark: SparkSession, rddId: Int): String =
    s"${spark.sparkContext.applicationId}:$rddId"

  /** The ONE inter-query storage-hygiene sweep Bench and Verify run:
    * blocking-unpersist every persistent RDD EXCEPT the pinned
    * shared-artifact checkpoints (see [[pinnedRDDs]]). */
  def sweepPersistentRDDs(spark: SparkSession): Unit = {
    val app = spark.sparkContext.applicationId
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!pinnedRDDs.contains(s"$app:$id")) rdd.unpersist(true)
    }
  }

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft-engine")
      // SPARK_GRAFT_SHUFFLE_PARTITIONS decouples shuffle WIDTH from
      // local thread count — the knob a cluster sizes by data volume
      // but local[32] otherwise holds constant across decade steps
      // (the round-13 suspicion for p06/d13/g04's super-linear
      // wall-clock: fixed 32-way shuffles spilling at ×100 data). AQE
      // coalesces unused width away, so oversizing is cheap.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          shufflePartitions.toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // JOIN-STRATEGY POLICY (round-18 verdict task 1; guide §3.1/§9):
      // let the planner pick shuffled-hash over sort-merge when its size
      // conditions hold — every SMJ pays an O(n log n) sort per side
      // that SHJ skips, and the estate-sized shuffle width (widthFor:
      // ≤96 MiB of input per partition) bounds the per-partition build
      // map SHJ must hold. Static selection still requires the build
      // side to fit canBuildLocalHashMap (< autoBroadcastJoinThreshold
      // × shuffle width); the AQE threshold below additionally rewrites
      // SMJ→SHJ at runtime when every post-shuffle build partition is
      // under it — sized to the AQE advisory partition target (64 MB):
      // a ≤64 MB on-wire partition builds a hash map of a few hundred
      // MB, within one task's execution-memory share on any executor
      // profile this engine targets (local[32]/8g at sf0.1 up to
      // 96g at sf100; a cluster sizes SPARK_GRAFT_SHJ_THRESHOLD to its
      // own per-task memory budget — 0 disables the rewrite).
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "64m"))
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.parquet.filterPushdown", "true")
      // NOTE: do NOT swap fs.file.impl to RawLocalFileSystem to skip the
      // .crc sidecars (tempting for micro-batch small-file overhead) —
      // the RocksDB state store used by transformWithState casts the
      // local filesystem to o.a.h.fs.LocalFileSystem and crashes every
      // TWS checkpoint commit (measured: ~5% bench win, five failed
      // streaming suites).
      .config("spark.ui.enabled", "false")

  /** Local session sized from SPARK_GRAFT_CPUS (driver contract). */
  def session(): SparkSession = {
    val cpus = defaultParallelism
    val spark = builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Estate-per-shuffle-partition target for [[tuneForEstate]].
    * 96 MiB of COMPRESSED estate parquet per partition keeps the
    * worst measured expansion (d02's carry shape: 905 MB of documents
    * parquet → ~52 GB of band-exploded shingle payload, a ~57×
    * blow-up) near ~200 MB of in-flight sort data per partition —
    * single-pass external sort territory. Chosen from the round-16
    * d02 sf100 A/B: width 32 → 501.7 s, width 256 → 240.7 s (same
    * answer, same spill total, half the wall — the multi-pass
    * sort-merge + GC term, not data volume). */
  private val EstateBytesPerPartition: Long = 96L << 20

  /** SF-AWARE SHUFFLE WIDTH (round-15 verdict task 4: "the knob a
    * cluster sizes by data volume but local[32] holds constant across
    * decade steps"). The core-count default is right through the
    * second decade (sf10 = 2.3 GiB estate → the 96 MiB/partition rule
    * lands back on 32); at sf100 a 32-way shuffle carries ×1000 the
    * sf0.1 rows per partition and d02's external sort went multi-pass
    * (α 1.44/decade). Width = max(cores, estate/96 MiB), AQE coalesces
    * unused width away (advisoryPartitionSizeInBytes folds the
    * post-shuffle reads back toward 64 MB), so the only cost of the
    * larger initial number is scheduler overhead AQE already absorbs.
    *
    * An explicit `SPARK_GRAFT_SHUFFLE_PARTITIONS` always wins (the
    * probe A/B knob). On a real cluster the deployment sets this conf
    * from its own estate stats — this helper is the local-mode
    * spelling of that sizing rule, reading the estate directory's
    * parquet bytes (a driver-side listing, no job). Returns the width
    * it set. Called by the Bench/Verify mains once the estate dir is
    * known; `spark.sql.shuffle.partitions` is runtime-settable, so
    * every plan built afterwards picks it up. */
  def tuneForEstate(spark: SparkSession, dir: String): Int = {
    val width = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS") match {
      case Some(w) => w.toInt
      // Floor at the SESSION's actual parallelism, not the env default:
      // Verify sizes its session from SPARK_GRAFT_CPUS with default 4
      // while the env default here is 32 — reading the env again would
      // silently widen a 4-core Verify session to 32 even at sf0.01
      // (round-16 advisory).
      case None =>
        widthFor(estateBytes(dir), spark.sparkContext.defaultParallelism)
    }
    spark.conf.set("spark.sql.shuffle.partitions", width.toString)
    width
  }

  /** The sizing rule [[tuneForEstate]] applies: ceil(bytes / 96 MiB),
    * floored at `cores` (the session's parallelism — healthy through
    * sf10), capped at 4096 (scheduler-overhead guard for a one-box
    * session — a real cluster raises it with its executor count). */
  private[graft] def widthFor(bytes: Long, cores: Int): Int = {
    val byData = ((bytes + EstateBytesPerPartition - 1) /
      EstateBytesPerPartition).toInt
    math.max(cores, math.min(byData, 4096))
  }

  /** Total bytes of `dir`'s PARQUET estate (recursive size sum over
    * `*.parquet` files — local driver-side listing; 0 if the dir is
    * absent). Non-parquet co-residents (logs, JSON dumps, .crc
    * sidecars) are excluded so they can't inflate the width. */
  private def estateBytes(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(root)) return 0L
    val s = java.nio.file.Files.walk(root)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }
}
