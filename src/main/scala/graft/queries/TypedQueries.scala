package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.Num.oround

/** The TYPED `Dataset[T]` API surface — case-class Encoders,
  * `groupByKey`, and `mapGroups` — under the same DuckDB oracle as the
  * untyped DataFrame queries.
  *
  * Everything else in the engine is deliberately DataFrame-first
  * (Catalyst sees through Column expressions; a typed lambda is opaque
  * bytecode it can neither push down nor prune through). q41 pins the
  * one place the typed API earns its cost: imperative PER-GROUP logic
  * that would be contorted as window functions — while documenting the
  * price (deserialization to JVM objects, no codegen inside the lambda,
  * the whole group materialized in memory). The batch sibling of the
  * streaming `Sessionize` runtime, which makes the same tradeoff for
  * the same reason.
  *
  * Scale rule of thumb: mapGroups holds ONE GROUP at a time in memory —
  * fine for per-user groups bounded in the thousands of rows, wrong for
  * unbounded groups (those want the mergeable-partials `Aggregator`
  * shape, see `functions.VectorCentroid`).
  */
object TypedQueries {

  /** One event row as the typed lambda sees it. `value` is Option:
    * nullable column → Option field is the Encoder null contract. */
  final case class UserEvent(
      user_id: Long, event_id: Long, event_type: String, value: Option[Double])

  /** Per-user profile computed imperatively inside mapGroups. */
  final case class UserProfile(
      user_id: Long, n_events: Long, n_types: Long,
      total_value: Double, longest_streak: Long)

  /** Q41 — typed per-user profile: counts, distinct types, value total,
    * and the longest STREAK of consecutive same-type events in
    * event_id order — the sequential scan that is natural imperative
    * code and painful SQL (a gaps-and-islands windowing exercise; the
    * oracle below pays it). One shuffle on the group key; rows sorted
    * in-lambda by event_id so the fold is replay-deterministic. */
  private def q41(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        val evs = it.toIndexedSeq.sortBy(_.event_id)
        var streak = 0L; var best = 0L; var prev: String = null
        evs.foreach { e =>
          streak = if (e.event_type == prev) streak + 1 else 1L
          if (streak > best) best = streak
          prev = e.event_type
        }
        UserProfile(uid, evs.size.toLong, evs.map(_.event_type).distinct.size.toLong,
          evs.iterator.flatMap(_.value).sum, best)
      }
      .toDF()
      .select(col("user_id"), col("n_events"), col("n_types"),
        oround(col("total_value"), 2).as("total_value"), col("longest_streak"))
      .orderBy("user_id")
  }

  /** The streak is gaps-and-islands in SQL: runs keyed by
    * (rn − rn_within_type), longest run length per user. */
  private val oq41 =
    """WITH e AS (SELECT user_id, event_id, event_type, value FROM events),
      |r AS (SELECT user_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id)
      |      - row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS isl
      |  FROM e),
      |runs AS (SELECT user_id, event_type, isl, count(*) AS len
      |  FROM r GROUP BY 1, 2, 3)
      |SELECT e.user_id,
      |  count(*) AS n_events,
      |  count(DISTINCT e.event_type) AS n_types,
      |  ROUND(sum(e.value), 2) AS total_value,
      |  any_value(m.best) AS longest_streak
      |FROM e JOIN (SELECT user_id, max(len) AS best FROM runs GROUP BY 1) m
      |  ON e.user_id = m.user_id
      |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin

  /** Q49 — per-group top-k through the typed `Aggregator` UDAF
    * ([[graft.functions.TopKByValue]]): top-3 events by value per
    * event_type, as a BOUNDED-STATE mergeable aggregate instead of
    * j04's window `row_number` formulation. The plan difference is the
    * point: the window path shuffles and sorts EVERY row; this path
    * map-side-combines to ≤k rows per (group × partition) before the
    * shuffle — per-group top-k at 100 TB is an aggregate, not a sort.
    * The oracle is the window formulation, so the two plans are pinned
    * to identical results. */
  private def q49(s: SparkSession, d: String): DataFrame = {
    val topk = udaf(
      new graft.functions.TopKByValue(3),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Double)]())
    events(s, d)
      .filter(col("value").isNotNull)
      .groupBy("event_type")
      .agg(topk(col("event_id"), col("value")).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(
        col("event_type"),
        (col("pos") + 1L).cast("long").as("rank"),
        col("col._1").as("event_id"),
        col("col._2").as("value"))
      .orderBy("event_type", "rank")
  }

  private val oq49 =
    """SELECT event_type, rn AS rank, event_id, value FROM (
      |  SELECT event_type, event_id, value,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY value DESC, event_id) AS rn
      |  FROM events WHERE value IS NOT NULL)
      |WHERE rn <= 3 ORDER BY event_type, rank""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q41_typed_mapgroups", q41, Some(oq41)),
    QueryDef("q49_typed_topk", q49, Some(oq49)))
}
