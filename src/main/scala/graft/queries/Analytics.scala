package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product/event analytics shapes — funnel, cohort retention, and
  * gaps-and-islands — the recurring session-and-sequence questions every
  * event warehouse answers. All oracle-checked: each is window/aggregate
  * composition both engines evaluate identically.
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // -- ordered funnel -------------------------------------------------
    // view → click (at/after the first view) → purchase (at/after that
    // click): each stage is a per-user MIN over events no earlier than
    // the previous stage, so ordering is enforced, not just presence.
    // Stage aggregates are user-cardinality (tiny next to the event
    // log); each level is one groupBy + one join keyed on user_id.
    "funnel_stages" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("ts1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, "user_id").filter(col("ts") >= col("ts1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("ts2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, "user_id").filter(col("ts") >= col("ts2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("ts3"))
      t1.agg(count(lit(1)).as("n_view"))
        .crossJoin(t2.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(t3.agg(count(lit(1)).as("n_full_funnel")))
    },

    // -- weekly cohort retention ---------------------------------------
    // Cohort = ISO week of a user's FIRST event; a (cohort, offset)
    // cell counts users active `offset` weeks later. Both engines
    // Monday-truncate weeks, so the day-difference is always a multiple
    // of 7 and the integer division is exact.
    "user_retention" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val cohort = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
      val activity = ev
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
        .distinct()
      activity.join(cohort, "user_id")
        .groupBy(col("cohort_week"),
          (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    // -- gaps and islands ----------------------------------------------
    // Per user: consecutive SAME-TYPE event runs via the classic
    // row_number difference (global rank minus per-type rank is
    // constant within a run). Output per (user, type): run count and
    // longest run — 2 window passes + 2 aggregations, no self-join.
    "win_islands" -> { (s, dir) =>
      val ord = Seq(col("ts"), col("event_id"))
      val all = Window.partitionBy(col("user_id")).orderBy(ord: _*)
      val byType = Window.partitionBy(col("user_id"), col("event_type")).orderBy(ord: _*)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          (row_number().over(all) - row_number().over(byType)).as("island"))
        .groupBy(col("user_id"), col("event_type"), col("island"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_runs"), max(col("run_len")).as("max_run"))
        .orderBy(col("user_id"), col("event_type"))
    }
  )

  val oracle: Map[String, String] = Map(
    "funnel_stages" ->
      """WITH t1 AS (
        |  SELECT user_id, MIN(ts::TIMESTAMP) AS ts1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (
        |  SELECT e.user_id, MIN(e.ts::TIMESTAMP) AS ts2
        |  FROM events e JOIN t1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts::TIMESTAMP >= t1.ts1
        |  GROUP BY e.user_id),
        |t3 AS (
        |  SELECT e.user_id, MIN(e.ts::TIMESTAMP) AS ts3
        |  FROM events e JOIN t2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP >= t2.ts2
        |  GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM t1) AS n_view,
        |       (SELECT COUNT(*) FROM t2) AS n_view_click,
        |       (SELECT COUNT(*) FROM t3) AS n_full_funnel""".stripMargin,

    "user_retention" ->
      """WITH cohort AS (
        |  SELECT user_id,
        |    CAST(date_trunc('week', MIN(ts::TIMESTAMP)) AS DATE) AS cohort_week
        |  FROM events GROUP BY user_id),
        |activity AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts::TIMESTAMP) AS DATE) AS week
        |  FROM events)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS week_offset,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM activity JOIN cohort USING (user_id)
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "win_islands" ->
      """WITH marked AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts::TIMESTAMP, event_id)
        |    - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts::TIMESTAMP, event_id) AS island
        |  FROM events),
        |runs AS (
        |  SELECT user_id, event_type, island, COUNT(*) AS run_len
        |  FROM marked GROUP BY user_id, event_type, island)
        |SELECT user_id, event_type, COUNT(*) AS n_runs, MAX(run_len) AS max_run
        |FROM runs GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin
  )
}
