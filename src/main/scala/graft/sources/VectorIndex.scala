package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns._

/** Persisted ANN index artifacts — the offline half of the similarity
  * search story.
  *
  * At 100 TB the coarse quantizer (IVF centroids) and the at-rest
  * partitioning of the corpus by its blocking key are OFFLINE artifacts:
  * built once by an indexing job, read by every query. Training the
  * quantizer inside the query (as v03 did through round 3) re-scans and
  * re-explodes the full corpus per execution — correct, but the wrong
  * plan at scale.
  *
  * Two artifacts, both derived from `embeddings` and cached per
  * source-fingerprint under /tmp:
  *
  *  - **IVF**: per-label mean vectors (`centroids/`: label, ce) plus the
  *    corpus re-written `partitionBy(label)` (`corpus/`). A probe reads
  *    the tiny centroid table, picks the nprobe nearest labels, and joins
  *    them against the partitioned corpus — the join key IS the partition
  *    column, so dynamic partition pruning opens only the probed
  *    directories. Scan cost: nprobe/|labels| of the data.
  *
  *  - **SRP**: the corpus re-written `partitionBy(pbucket)` where
  *    pbucket = 'b' + the 4-bit sign-random-projection bucket (the 'b'
  *    prefix keeps partition-value inference from reading "0110" as the
  *    integer 110). v02/v05 probe it with the query vector's bucket(s) —
  *    again partition-pruned to probes/2^bits of the corpus.
  *
  * The cache key fingerprints the source file (size + mtime), so a
  * regenerated testdata dir invalidates the artifact instead of silently
  * serving stale vectors.
  */
object VectorIndex {

  /** Number of sign bits in the SRP blocking key (16 buckets). */
  val SrpBits = 4

  private def fingerprint(sfDir: String): String = {
    val p = Paths.get(sfDir, "embeddings.parquet")
    val key = s"$sfDir:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
    // stable short hash for a filesystem-safe cache dir name
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
  }

  private def indexRoot(sfDir: String): String =
    s"/tmp/graft_index/${fingerprint(sfDir)}"

  private def built(dir: String): Boolean =
    Files.exists(Paths.get(dir, "_SUCCESS"))

  /** Build into a process-private staging dir, then ATOMIC-rename onto
    * the final path. The JVM-level `synchronized` on the ensure methods
    * only serializes one process; Verify/Bench/forked-test JVMs can race
    * the same /tmp cache — with the rename, a reader either sees no
    * `_SUCCESS` (and builds its own staging copy) or a complete
    * artifact, never a half-written directory. The rename loser simply
    * discards its staging copy. */
  private def buildAtomic(finalDir: String)(write: String => Unit): Unit = {
    if (built(finalDir)) return
    val staging = s"$finalDir.build-${ProcessHandle.current().pid()}"
    write(staging)
    try Files.move(
      Paths.get(staging), Paths.get(finalDir), StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: FileAlreadyExistsException | _: java.nio.file.FileSystemException =>
        // lost the race — a concurrent builder finished first; use theirs
        Files.walk(Paths.get(staging)).sorted(Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
    }
  }

  /** Build (once) and return (centroidsPath, corpusPath) for the IVF
    * index over `sfDir`'s embeddings. Synchronized: suites running in
    * parallel in one JVM must not race the build. */
  def ensureIvf(s: SparkSession, sfDir: String): (String, String) = synchronized {
    val root = indexRoot(sfDir)
    val cent = s"$root/ivf_centroids"
    val corp = s"$root/ivf_corpus"
    buildAtomic(cent) { dst =>
      val e = graft.Tables.embeddings(s, sfDir)
        .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("e"))
      // per-label mean vector: posexplode → per-(label,dim) avg → sorted
      // re-assembly. One bounded shuffle (|labels|·64 rows out).
      e.select(col("label"), posexplode(col("e")).as(Seq("i", "x")))
        .groupBy("label", "i")
        .agg(avg("x").as("cx"))
        .groupBy("label")
        .agg(
          transform(
            sort_array(collect_list(struct(col("i"), col("cx")))),
            p => p.getField("cx")).as("ce"))
        .coalesce(1)
        .write.mode("overwrite").parquet(dst)
    }
    // the corpus at rest, one directory per coarse cell
    buildAtomic(corp) { dst =>
      graft.Tables.embeddings(s, sfDir)
        .write.partitionBy("label").mode("overwrite").parquet(dst)
    }
    (cent, corp)
  }

  /** Build (once) and return the path of the SRP-bucket-partitioned
    * corpus: columns (vec_id, embedding, label, pbucket), partitioned by
    * pbucket. */
  def ensureSrp(s: SparkSession, sfDir: String): String = synchronized {
    val root = indexRoot(sfDir)
    val corp = s"$root/srp_corpus"
    buildAtomic(corp) { dst =>
      graft.Tables.embeddings(s, sfDir)
        .withColumn("pbucket", pbucketOf(toDouble(col("embedding"))))
        .write.partitionBy("pbucket").mode("overwrite").parquet(dst)
    }
    corp
  }

  /** The partition-safe SRP bucket key for a (double-widened) embedding
    * column — both the writer and every probe MUST derive the key through
    * this one definition or the partition join silently misses. */
  def pbucketOf(e: Column): Column =
    concat(lit("b"), srpBucket(e, SrpBits))

  /** Multi-probe key set for a query embedding: its own bucket plus the
    * SrpBits one-bit-flip neighbors, as partition-safe pbucket strings —
    * the probe side of v05, derived from the SAME SrpBits/prefix
    * definition as the writer (a probe building its own keys drifts the
    * moment SrpBits changes, and the partition join then silently
    * matches nothing). */
  def multiProbeKeys(e: Column): Column = {
    val qb = srpBucket(e, SrpBits)
    val flips = (1 to SrpBits).map(j =>
      concat(
        substring(qb, 1, j - 1),
        when(substring(qb, j, 1) === "1", "0").otherwise("1"),
        substring(qb, j + 1, SrpBits - j)))
    transform(array(qb +: flips: _*), b => concat(lit("b"), b))
  }
}
