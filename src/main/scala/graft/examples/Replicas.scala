package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE copy of the probe-staging replica algebra (round-13 review:
  * three probes carried verbatim copies of the doc-suffix replica and
  * two files carried the vector-mix replica — a fix to one copy would
  * silently miss the others).
  *
  *  - [[docReplicas]]: replica r of a (doc_id, text) corpus shifts
  *    doc_id a block per replica and SUFFIXES a replica-unique token —
  *    each copy stays in the probe's key space as a NEAR-dup of its
  *    original (realistic index load) while byte-identical cross-copy
  *    texts (which would collapse into exact-dup classes and distort
  *    bucket mass) cannot occur. Used by Q54GrowthProbe /
  *    ColdStartProbe / D09StreamProbe.
  *  - The VECTOR-mix replica (stride-rotated 50/50 mixes, so replicas
  *    are genuinely new points ~0.7 cosine from both parents) lives in
  *    [[Sf1Stage]] and [[AnnStreamProbe]] with slightly different
  *    projections (label carried vs not) — see those sites; they
  *    cross-reference each other and this note.
  */
private[examples] object Replicas {

  /** Replicas [from, until) of `docs` (doc_id, text), `nDocs` = corpus
    * size (the id-block stride). */
  def docReplicas(
      docs: DataFrame, nDocs: Long)(from: Int, until: Int): DataFrame =
    docs.crossJoin(
        docs.sparkSession.range(from, until).select(col("id").as("rep")))
      .select(
        (col("doc_id") + col("rep") * nDocs).as("doc_id"),
        concat(col("text"), lit(" z"), col("rep")).as("text"))
}
