package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorCentroid

/** The typed centroid Aggregator must agree with the declarative
  * posexplode-based centroid (the v03 IVF path) and be partitioning-
  * invariant (i.e. `merge` is correct). */
class VectorCentroidSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def typedCentroids(repart: Int): Map[Int, Seq[Double]] =
    Tables.embeddings(spark, sf)
      .repartition(repart)
      .select(col("label"), col("embedding"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new VectorCentroid().toColumn.name("centroid"))
      .collect()
      .map { case (label, c) => label -> c.toSeq }
      .toMap

  private def declarativeCentroids(): Map[Int, Seq[Double]] =
    Tables.embeddings(spark, sf)
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("label", "i")
      .agg(avg("x").as("c"))
      .groupBy("label")
      .agg(transform(
        sort_array(collect_list(struct(col("i"), col("c")))),
        p => p.getField("c")).as("centroid"))
      .as[(Int, Array[Double])]
      .collect()
      .map { case (label, c) => label -> c.toSeq }
      .toMap

  test("typed aggregator matches the declarative posexplode centroid") {
    val typed = typedCentroids(4)
    val decl = declarativeCentroids()
    assert(typed.keySet == decl.keySet && typed.nonEmpty)
    typed.foreach { case (label, c) =>
      val d = decl(label)
      assert(c.size == d.size)
      c.zip(d).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label $label: $a vs $b")
      }
    }
  }

  test("centroids are invariant to partitioning up to float-sum ulps") {
    val a = typedCentroids(1)
    val b = typedCentroids(13)
    assert(a.keySet == b.keySet)
    a.foreach { case (label, c) =>
      c.zip(b(label)).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9, s"label $label: $x vs $y")
      }
    }
  }

  test("dimension mismatch fails loudly, not silently") {
    val bad = Seq((0, Array(1.0f, 2.0f)), (0, Array(1.0f))).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      bad.groupByKey(_._1).mapValues(_._2)
        .agg(new VectorCentroid().toColumn.name("c"))
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
