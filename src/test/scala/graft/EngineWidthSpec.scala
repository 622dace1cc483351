package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Engine.widthFor]] / [[Engine.tuneForEstate]] — the SF-aware
  * shuffle-width policy (round-15 verdict task 4). The d02 sf100
  * receipt behind the rule: width 32 → 501.7 s, width 256 → 240.7 s,
  * same answer (BASELINE.md round-16 table). */
class EngineWidthSpec extends AnyFunSuite {
  private val cores = Engine.defaultParallelism.toInt
  private val MiB = 1L << 20

  test("small estates keep the core-count default (sf≤10 unchanged)") {
    assert(Engine.widthFor(0L) == cores)
    // sf0.1 ≈ 23 MiB, sf10 ≈ 2.3 GiB — both under cores × 96 MiB
    assert(Engine.widthFor(23 * MiB) == cores)
    assert(Engine.widthFor(2355 * MiB) == cores)
  }

  test("the third decade scales: 22.9 GiB (sf100) → ceil(/96 MiB) = 245") {
    assert(Engine.widthFor(23450 * MiB) == 245)
  }

  test("ceil semantics and the 4096 one-box cap") {
    assert(Engine.widthFor(96 * MiB * 400L) == 400)
    assert(Engine.widthFor(96 * MiB * 400L + 1) == 401)
    assert(Engine.widthFor(Long.MaxValue / 4) == 4096)
  }

  test("tuneForEstate sets the session conf and returns the width") {
    val s = SparkTestSession.spark
    val before = s.conf.get("spark.sql.shuffle.partitions")
    try {
      // a dir that doesn't exist → estate 0 → core default (env
      // override would win, but the test env doesn't set it)
      val w = Engine.tuneForEstate(s, "/nonexistent-estate-dir")
      assert(sys.env.contains("SPARK_GRAFT_SHUFFLE_PARTITIONS") ||
        w == cores)
      assert(s.conf.get("spark.sql.shuffle.partitions") == w.toString)
    } finally s.conf.set("spark.sql.shuffle.partitions", before)
  }
}
