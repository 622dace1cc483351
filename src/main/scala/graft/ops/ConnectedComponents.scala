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
        "component diameter exceeds the bound; raise maxIter (or switch " +
        "to the large-star/small-star O(log n) variant for chain-shaped graphs)")
    labels.select(col("v"), col("lbl").as("component"))
  }
}
