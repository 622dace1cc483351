package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaFeatures
import graft.multimodal.MediaFeatures.{MediaFeature, MediaRow}

/** The mapPartitions multimodal stage: typed plumbing, deterministic
  * stub decode, partition-count invariance (the batch shape is an
  * implementation detail, not a semantic one). */
class MediaFeaturesSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("feature extraction over the documents-as-media corpus") {
    val media = MediaFeatures.fromDocuments(spark, "/root/testdata/sf0.001")
    val features = MediaFeatures.extract(media).collect().sortBy(_.media_id)
    assert(features.length == media.count())
    features.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.header.length == 8) // 4 bytes hex
      assert(f.width >= 16 && f.width < 80 && f.height >= 16 && f.height < 80)
      assert(f.mean_luma > 0.0 && f.mean_luma <= 1.0)
      assert(f.kind == (if (f.media_id % 2 == 0) "image" else "audio"))
    }
  }

  test("results are invariant to partitioning (batch shape is not semantic)") {
    val media = MediaFeatures.fromDocuments(spark, "/root/testdata/sf0.001")
    val one = MediaFeatures.extract(media.repartition(1)).collect().sortBy(_.media_id).toSeq
    val many = MediaFeatures.extract(media.repartition(7)).collect().sortBy(_.media_id).toSeq
    assert(one == many)
  }

  test("empty and null payloads are handled, not thrown") {
    val rows = Seq(
      MediaRow(1L, "image", Array.emptyByteArray),
      MediaRow(2L, "audio", null)).toDS()
    val out = MediaFeatures.extract(rows).collect().sortBy(_.media_id)
    assert(out.map(_.n_bytes).toSeq == Seq(0L, 0L))
    assert(out.forall(_.mean_luma == 0.0))
    assert(out.forall(_.header == ""))
  }

  test("fitBox: never upscales, bounds both sides, keeps aspect within floor error") {
    for (w <- 1 to 120; h <- 1 to 120; box <- Seq(16, 48, 64)) {
      val (rw, rh) = MediaFeatures.fitBox(w, h, box)
      assert(rw <= math.max(w, box) && rh <= math.max(h, box))
      assert(rw <= box && rh <= box, s"($w,$h,$box) -> ($rw,$rh) exceeds box")
      assert(rw <= w && rh <= h, s"($w,$h,$box) -> ($rw,$rh) upscaled")
      if (math.max(w, h) <= box) assert((rw, rh) == (w, h), "in-box must be identity")
      else {
        // aspect preserved up to integer floor on the minor side
        val exact = if (w >= h) h.toDouble * box / w else w.toDouble * box / h
        val minor = if (w >= h) rh else rw
        assert(minor == math.floor(exact).toInt, s"($w,$h,$box) minor side $minor != floor($exact)")
      }
    }
  }

  test("dhash: brightness-invariant, locality-sensitive, 60-bit") {
    // 288 = 72 cells × exactly 4 bytes each — equal cell sizes make the
    // constant +4 shift move both sides of every comparison identically
    val base = Array.tabulate(288)(i => ((i * 37) % 251).toByte)
    val shifted = base.map(b => (((b & 0xFF) / 2) + 4).toByte)
    val baseline = base.map(b => ((b & 0xFF) / 2).toByte)
    val rows = Seq(
      MediaRow(1L, "image", baseline),
      MediaRow(2L, "image", shifted), // +4 per byte: identical hash
      MediaRow(3L, "image", base), // 2× contrast: ALSO identical (order-preserving)
      MediaRow(4L, "image", baseline.reverse)) // reversed content: differs
      .toDS()
    val out = MediaFeatures.dhash(rows).collect().map(h => h.media_id -> h.dhash).toMap
    assert(out(1L) == out(2L), "a constant luma shift must not change the dhash")
    assert(out(1L) == out(3L), "an order-preserving contrast scale must not either")
    assert(out(1L) != out(4L), "reversed content must differ")
    out.values.foreach(h => assert(h >= 0L && h < (1L << 60), s"60-bit range: $h"))
    // and the hand-computable tiny case: 72 one-byte cells
    val inc = Array.tabulate(72)(i => i.toByte) // strictly increasing cells
    val all = MediaFeatures.dhash(Seq(MediaRow(9L, "image", inc)).toDS()).collect()
    assert(all.head.dhash == (1L << 60) - 1, "every row-wise comparison ascends")
  }

  test("resizePlan: out_bytes = rw*rh; downscaled iff source exceeds the box") {
    val media = MediaFeatures.fromDocuments(spark, "/root/testdata/sf0.001")
    val plans = MediaFeatures.resizePlan(media, 48).collect()
    assert(plans.nonEmpty)
    plans.foreach { p =>
      assert(p.out_bytes == p.rw.toLong * p.rh)
      assert(p.downscaled == (math.max(p.w, p.h) > 48))
      if (!p.downscaled) assert((p.rw, p.rh) == (p.w, p.h))
    }
    assert(plans.exists(_.downscaled) && plans.exists(!_.downscaled),
      "the stub corpus must exercise both branches")
  }
}
