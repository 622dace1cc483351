package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for d16_semantic_dedup, independent of the
  * DuckDB oracle, on the real sf0.001 corpus:
  *
  *  - the keeper IS the minimum member of its cluster (the min-label
  *    component id doubles as the keeper under the lowest-id rule — the
  *    representative needs no second pass);
  *  - clusters are disjoint and non-singleton (singletons are kept by
  *    definition and carry no row), so pruning Σ n_pruned docs keeps
  *    exactly |corpus| − Σ n_pruned;
  *  - d16's cluster membership equals the transitive closure of d05's
  *    edge set — the pair query and the dedup query can never disagree
  *    about what is a near-duplicate (they share cosineEdges).
  */
class D16SemanticDedupSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val d = "/root/testdata/sf0.001"

  test("keeper = min member; clusters disjoint, non-singleton, closure of d05 edges") {
    val rows = SparkEntry.queries("d16_semantic_dedup")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2, s"singleton cluster row: $r")       // n_members
      assert(r.getLong(2) == r.getLong(1) - 1, s"n_pruned mismatch: $r")
    }
    val keepers = rows.map(_.getLong(0))
    assert(keepers.distinct.length == keepers.length)

    // independent closure over d05's pairs (driver-side union-find on
    // the sf0.001 edge list — small by construction)
    val edges = SparkEntry.queries("d05_embedding_near_dup")(spark, d)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expected = vertices.groupBy(find).map { case (root, vs) =>
      (vs.min, vs.length.toLong) // min member is the keeper
    }.toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"cluster set diverged from d05 closure: extra=${got -- expected} missing=${expected -- got}")
  }
}
