package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the step that turns
  * near-duplicate PAIRS (MinHash-LSH output) into duplicate CLUSTERS:
  * transitively-linked docs form one group, and dedup keeps one
  * representative per group. Spark has no built-in whole-graph operator,
  * so this composes existing ops per the preference order: iterative
  * min-label propagation as a driver-side loop of joins + aggregations
  * (the Pregel pattern — each iteration is a bounded dataflow, all data
  * stays distributed; the driver holds only the convergence flag).
  *
  * Convergence: every vertex adopts the minimum label among itself and
  * its neighbors each round, so the component minimum floods outward one
  * hop per iteration — O(diameter) rounds (near-dup clusters are
  * shallow; for adversarial long-chain graphs the large-star/small-star
  * variant gets O(log n), same skeleton). Each round `localCheckpoint`s
  * its result: the plan stays O(1) deep instead of growing by two joins
  * per iteration, and the convergence check reuses the materialized
  * partitions.
  *
  * Scale shape per iteration: one shuffle join (edges ⋈ labels on the
  * edge endpoint) + one partial-aggregated groupBy on vertex — both hash
  * partitioned on vertex ids; no collects, no per-vertex driver state.
  */
object ConnectedComponents {

  /** @param edges (src, dst) long pairs, undirected semantics (either
    *              orientation may be present; duplicates are fine)
    * @return (v, component) — `component` is the minimum vertex id
    *         reachable from `v`; vertices not on any edge are absent
    *         (callers union isolated vertices back if needed) */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val und = edges
      .select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .unionByName(edges.select(
        col("dst").cast("long").as("a"), col("src").cast("long").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = und.select(col("a").as("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborLabels = und
        .join(labels.withColumnRenamed("v", "b2"), col("b") === col("b2"))
        .select(col("a").as("v"), col("lbl"))
      val next = labels.unionByName(neighborLabels)
        .groupBy("v")
        .agg(min("lbl").as("lbl"))
        .localCheckpoint() // eager: materialized BEFORE prev is released
      val changed = next
        .join(labels.withColumnRenamed("lbl", "prev"), "v")
        .filter(col("lbl") =!= col("prev"))
        .limit(1)
        .count()
      // release the superseded round's checkpoint blocks now instead of
      // waiting for driver GC — otherwise up to maxIter stale label
      // tables accumulate in executor storage on large graphs
      labels.unpersist()
      labels = next
      converged = changed == 0L
      i += 1
    }
    und.unpersist() // the result reads from its own checkpoint only
    require(converged,
      s"label propagation did not converge in $maxIter iterations — " +
        "component diameter exceeds the bound; raise maxIter or use " +
        "runStar (polylog rounds independent of diameter)")
    labels.select(col("v"), col("lbl").as("component"))
  }

  /** Alternating large-star/small-star connected components (the
    * two-phase algorithm of Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14, the "Alternating"
    * variant with a proven O(log² n) round bound, O(log n) observed in
    * practice): rounds depend on graph SIZE, not diameter — the variant
    * for adversarial chain/path graphs where [[run]]'s one-hop flooding
    * needs O(diameter) rounds. Same contract as [[run]].
    *
    * Each operation rewrites the edge set from every node's symmetric
    * neighborhood, connecting neighbors to `m(u) = min(Γ(u) ∪ u)`:
    * large-star moves the STRICTLY LARGER neighbors to m(u) (halving
    * long tails), small-star the smaller-or-equal ones plus u itself
    * (flattening toward the minimum). Both preserve connectivity and
    * never bridge components (m(u) is in u's component by construction);
    * alternating them contracts every component into a star rooted at
    * its minimum. Per round: one groupBy + one join per star operation,
    * hash partitioned on node id — the same bounded-dataflow shape as
    * [[run]], in polylog-many rounds. */
  def runStar(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    def sym(e: DataFrame): DataFrame =
      e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    // m(u) over the symmetric view; join back and re-point the selected
    // neighbors at m; drop self-loops and duplicates
    def star(e: DataFrame, large: Boolean): DataFrame = {
      val nbrs = sym(e)
      val m = nbrs.groupBy("u").agg(least(min(col("v")), min(col("u"))).as("m"))
      val selected =
        if (large) nbrs.filter(col("v") > col("u"))
          .join(m, "u").select(col("v").as("u"), col("m").as("v"))
        else nbrs.filter(col("v") <= col("u"))
          .join(m, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .unionByName(m.select(col("u"), col("m").as("v")))
      selected.filter(col("u") =!= col("v")).distinct()
    }
    var cur = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = star(star(cur, large = true), large = false).localCheckpoint()
      // converged when one large+small round is a no-op on the edge set;
      // both sides are distinct, so equal counts + an empty one-direction
      // anti-join imply set equality (one shuffle, not two exceptAlls)
      val changed =
        if (next.count() != cur.count()) 1L
        else next.join(cur, Seq("u", "v"), "left_anti").limit(1).count()
      cur.unpersist()
      cur = next
      converged = changed == 0L
      i += 1
    }
    require(converged, s"star contraction did not converge in $maxIter rounds")
    // the converged set is a star per component: every node points at its
    // minimum; the roots themselves label each member (and themselves).
    // cur's checkpoint must stay live — the returned (lazy) plan reads it.
    sym(cur).groupBy("u").agg(least(min(col("v")), min(col("u"))).as("m"))
      .select(col("u").as("v"), col("m").as("component"))
  }
}
