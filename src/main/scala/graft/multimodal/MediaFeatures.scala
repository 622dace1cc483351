package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal feature extraction over opaque binary media columns via
  * `mapPartitions` — the Scala analogue of a Pandas-UDF/`mapInPandas`
  * stage: typed rows in, per-partition batched iteration, typed feature
  * rows out. This is preference order (d) from the brief — used here
  * because a real media codec is imperative per-blob work that no
  * Column expression expresses.
  *
  * The container ships no image/audio codecs, so [[MediaCodec.Stub]] is
  * a clearly-marked deterministic fake; the Spark-side plumbing —
  * schema, encoders, partition-wise batching, codec reuse across a
  * partition (the expensive init is amortized exactly like a Pandas UDF
  * amortizes model load per batch), narrow one-pass shape — is the real
  * thing, and is what carries over unchanged when a JNI/JavaCV codec
  * replaces the stub at deployment.
  */
object MediaFeatures {

  /** One media blob: id, declared kind ("image" | "audio" | …), payload. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features: byte stats + stubbed decode outputs. */
  case class MediaFeature(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      header: String,
      width: Int,
      height: Int,
      mean_luma: Double)

  /** The decode seam. A production deployment plugs a real codec in;
    * [[Stub]] derives deterministic pseudo-features from the bytes so
    * the pipeline is testable end-to-end without native libraries. */
  trait MediaCodec extends Serializable {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Double)

    /** Luma grid for perceptual hashing: `cells` cell values in
      * row-major order. The DEFAULT is the stub grid — cell j is the
      * unsigned byte sum of the payload's contiguous range
      * [⌊j·n/cells⌋, ⌊(j+1)·n/cells⌋) (integer arithmetic, so the
      * DuckDB oracle reproduces it exactly); a real codec overrides
      * with the downsampled decoded frame's luminance and everything
      * downstream ([[dhash]], the m10 banding) is unchanged. */
    def lumaCells(kind: String, payload: Array[Byte], cells: Int): Array[Long] = {
      val n = payload.length
      val out = new Array[Long](cells)
      var j = 0
      while (j < cells) {
        val hi = ((j + 1).toLong * n / cells).toInt
        var p = (j.toLong * n / cells).toInt
        var sum = 0L
        while (p < hi) { sum += (payload(p) & 0xFF); p += 1 }
        out(j) = sum
        j += 1
      }
      out
    }
  }

  /** One perceptual signature: 60-bit difference hash (see [[dhash]]). */
  case class MediaHash(media_id: Long, kind: String, dhash: Long)

  /** Difference hash (dHash) over the codec's 9×8 luma grid: bit
    * r·8+c is set iff cell(r,c) < cell(r,c+1) — brightness-invariant
    * by construction (a constant shift moves both sides of every
    * comparison). 60 bits, not the textbook 64: the repo-wide 60-bit
    * signature width (hash60 / simhashed60) that keeps the top bits
    * clear of BIGINT sign trouble on both engines — 4 bands × 15 bits
    * then gives the same Manku-style pigeonhole as d08 (Hamming ≤ 3 ⇒
    * exact agreement on ≥ 1 band). Same mapPartitions seam as
    * [[extract]]: codec init amortized per partition, payload never
    * crosses a shuffle — only the 8-byte signature does. */
  def dhash(media: Dataset[MediaRow], codec: MediaCodec = Stub): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.payload == null) Array.emptyByteArray else r.payload
        val cells = codec.lumaCells(r.kind, payload, 72)
        var h = 0L
        var bit = 0
        while (bit < 60) {
          val row = bit / 8
          val c = bit % 8
          if (cells(row * 9 + c) < cells(row * 9 + c + 1)) h |= 1L << bit
          bit += 1
        }
        MediaHash(r.media_id, r.kind, h)
      }
    }
  }

  object Stub extends MediaCodec {
    /** STUB — not a real decoder. Width/height/luma are deterministic
      * functions of the payload bytes (length and byte sums), standing
      * in for a decoded frame's shape and mean luminance. */
    override def decode(kind: String, payload: Array[Byte]): (Int, Int, Double) = {
      val n = payload.length
      var sum = 0L
      var i = 0
      while (i < n) { sum += (payload(i) & 0xFF); i += 1 }
      val w = 16 + (n % 64)
      val h = 16 + ((n / 64) % 64)
      val luma = if (n == 0) 0.0 else sum.toDouble / n / 255.0
      (w, h, luma)
    }
  }

  /** Per-partition feature extraction. The codec is instantiated once
    * per partition (not per row) — the mapInPandas batching property. */
  def extract(media: Dataset[MediaRow], codec: MediaCodec = Stub): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec setup would happen here (e.g. native init)
      rows.map { r =>
        val payload = if (r.payload == null) Array.emptyByteArray else r.payload
        val (w, h, luma) = codec.decode(r.kind, payload)
        val header = payload.take(4).map(b => f"${b & 0xFF}%02x").mkString
        MediaFeature(r.media_id, r.kind, payload.length.toLong, header, w, h, luma)
      }
    }
  }

  /** A planned resize for one blob: source dims (stub-decoded), target
    * dims (integer box fit), and the output payload size the resized
    * frame would occupy (1 byte/pixel grayscale stand-in). */
  case class ResizePlan(
      media_id: Long,
      kind: String,
      w: Int,
      h: Int,
      rw: Int,
      rh: Int,
      out_bytes: Long,
      downscaled: Boolean)

  /** Aspect-preserving fit of (w, h) into a `box`×`box` square, in
    * INTEGER arithmetic only (floor division on the scaled minor side)
    * so the DuckDB oracle reproduces it exactly — never upscales. */
  def fitBox(w: Int, h: Int, box: Int): (Int, Int) =
    if (math.max(w, h) <= box) (w, h)
    else if (w >= h) (box, h * box / w)
    else (w * box / h, box)

  /** The RESIZE stage of the media pipeline: decode (stub codec — a
    * real deployment swaps in the native library, same seam as
    * [[extract]]) then plan the aspect-preserving fit into `box`. Same
    * mapPartitions discipline: codec init amortized per partition, one
    * narrow typed pass, the payload itself never crosses a shuffle —
    * downstream decides from the PLAN (out_bytes, downscaled) which
    * blobs are worth re-encoding before the expensive write. */
  def resizePlan(
      media: Dataset[MediaRow], box: Int,
      codec: MediaCodec = Stub): Dataset[ResizePlan] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.payload == null) Array.emptyByteArray else r.payload
        val (w, h, _) = codec.decode(r.kind, payload)
        val (rw, rh) = fitBox(w, h, box)
        ResizePlan(r.media_id, r.kind, w, h, rw, rh,
          rw.toLong * rh.toLong, math.max(w, h) > box)
      }
    }
  }

  /** Documents table → synthetic media rows (text bytes standing in for
    * media payloads; kind alternates image/audio deterministically). */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        when(pmod(col("doc_id"), lit(2)) === 0, "image").otherwise("audio").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }
}
