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
}
