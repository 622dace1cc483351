package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for d15_source_overlap, independent of the
  * DuckDB oracle: the union-set MinHash signature must be EXACT at the
  * extremes — two sources with identical shingle unions share every
  * signature component (est = 1), and the exact-audit column must agree
  * with ground truth on identical (J = 1) and vocabulary-disjoint
  * (J = 0) source pairs. A disjoint pair's ESTIMATE may collide per
  * component (P ≈ 1/|union| per permutation), so it is bounded, not
  * pinned. */
class D15OverlapSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def stage(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_d15").toString
    val latin = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "iota kappa lam mu nu xi omicron pi",
      "rho sigma tau upsilon phi chi psi omega")
    val nordic = Seq(
      "fjord saga rune skald berserk valkyrie mead longship",
      "thor odin loki freya heimdall balder tyr njord")
    val docs =
      latin.zipWithIndex.map { case (t, i) => (100L + i, t, "mirror_a") } ++
        latin.zipWithIndex.map { case (t, i) => (200L + i, t, "mirror_b") } ++
        nordic.zipWithIndex.map { case (t, i) => (300L + i, t, "other") }
    docs.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS LONG) AS n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("identical unions estimate 1.0 exactly; disjoint vocab audits 0.0") {
    val rows = SparkEntry.queries("d15_source_overlap")(spark, stage())
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(rows.size == 3, s"3 source pairs expected, got ${rows.keySet}")

    val (estMirror, jacMirror, _) = rows(("mirror_a", "mirror_b"))
    assert(estMirror == 1.0, "identical shingle unions share every component")
    assert(jacMirror == 1.0, "exact audit must report full overlap")

    Seq(("mirror_a", "other"), ("mirror_b", "other")).foreach { k =>
      val (est, jac, ni) = rows(k)
      assert(jac == 0.0 && ni == 0L, s"disjoint vocab must audit 0, got $k -> $jac")
      assert(est <= 0.25, s"disjoint estimate must stay near 0 (collisions only), got $est")
      // the two mirrors carry the SAME signature, so their estimates
      // against any third source are forced equal — a cheap functional
      // check that the sketch really is a function of the union set
      assert(rows(("mirror_a", "other"))._1 == rows(("mirror_b", "other"))._1)
    }
  }
}
