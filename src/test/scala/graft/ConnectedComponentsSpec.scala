package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ConnectedComponents

/** Min-label propagation on hand graphs: multi-hop chains (floods one
  * hop per iteration — exercises real iteration), cycles, disjoint
  * components, and duplicate/reversed edges. */
class ConnectedComponentsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def components(edges: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.run(edges.toSeq.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("chain floods the minimum across multiple hops") {
    // 5–4–3–2–1: label 1 needs 4 iterations to reach vertex 5
    val c = components(5L -> 4L, 4L -> 3L, 3L -> 2L, 2L -> 1L)
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("cycle, disjoint components, duplicate and reversed edges") {
    val c = components(
      10L -> 11L, 11L -> 12L, 12L -> 10L, // triangle
      20L -> 21L, 21L -> 20L, 20L -> 21L, // pair with dup + reversed edges
      30L -> 31L)                         // isolated pair
    assert(c(10L) == 10L && c(11L) == 10L && c(12L) == 10L)
    assert(c(20L) == 20L && c(21L) == 20L)
    assert(c(30L) == 30L && c(31L) == 30L)
    assert(c.size == 7)
  }

  test("two stars joined by a bridge merge into one component") {
    val star1 = Seq(100L -> 101L, 100L -> 102L, 100L -> 103L)
    val star2 = Seq(200L -> 201L, 200L -> 202L)
    val c = components((star1 ++ star2 :+ (103L -> 202L)): _*)
    assert(c.values.toSet == Set(100L), s"bridged stars must share one label, got $c")
  }

  private def starComponents(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.runStar(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("runStar: a 60-node chain (diameter 59) converges in O(log n) rounds") {
    // min-label propagation would need 60 one-hop rounds for this graph;
    // the alternating star contraction collapses it within the default
    // round budget and labels everything with the chain minimum
    val chain = (1L until 60L).map(i => (i + 1) -> i)
    val c = starComponents(chain)
    assert(c.keySet == (1L to 60L).toSet)
    assert(c.values.toSet == Set(1L), s"chain must collapse to min=1, got $c")
  }

  test("runStar ≡ run on randomized graphs") {
    val rnd = new scala.util.Random(1234)
    (1 to 3).foreach { _ =>
      val edges = Seq.fill(150)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      val viaLabels = components(edges: _*)
      val viaStars = starComponents(edges)
      assert(viaLabels == viaStars,
        s"disagreement: ${viaLabels.toSet.diff(viaStars.toSet)} vs ${viaStars.toSet.diff(viaLabels.toSet)}")
    }
  }
}
