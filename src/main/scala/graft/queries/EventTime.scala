package graft.queries

import graft.{Oracle, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing in batch form (SURVEY.md §2.3 `win_tumbling`,
  * `win_sliding`, `win_session`). The same `window`/`session_window`
  * functions run unchanged under Structured Streaming — the streaming
  * harness ([[graft.streaming.StreamOps]], StreamingSpec) reuses these
  * transforms verbatim, so the oracle indirectly covers the streaming
  * logic too (SURVEY.md §7.5).
  *
  * All event times are µs-truncated on both engine sides (hazard §7.4.1).
  */
object EventTime {
  type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-hour aggregation — shared verbatim with the streaming
    * harness.
    */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), Oracle.out(sum(Oracle.dec(col("value")))).as("total"))
      .select(col("w.start").as("wstart"), col("w.end").as("wend"),
        col("n"), col("total"))

  /** Regular-grid hourly resample with LOCF gap fill (unsorted — the form
    * a production caller writes to a partitioned sink; the registered
    * `ts_resample` adds the oracle contract's total ORDER BY). See the
    * query entry below for the plan discipline.
    */
  def resampleHourly(events: DataFrame): DataFrame = {
    // cache(): the hourly aggregate feeds BOTH the grid bounds and the
    // grid join — uncached, each consumer re-runs the events scan+agg
    // (the tpch_q15 materialisation argument: the cached relation is
    // user-hour-sized, the saved second scan grows with events).
    val hourly = events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg((Oracle.out(sum(Oracle.dec(col("value")))) / count(lit(1)))
          .as("v_avg"),
        count(lit(1)).as("n_events"))
      .cache()
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hour")).as("t0"), max(col("hour")).as("t1"))
      .select(col("user_id"),
        explode(sequence(col("t0"), col("t1"), expr("interval 1 hour")))
          .as("hour"))
    val locf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"), col("v_avg"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("v_avg").isNull.as("is_gap"),
        last(col("v_avg"), ignoreNulls = true).over(locf).as("v_filled"))
  }

  /** Session windows (30-min gap) per user — shared with streaming. */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), Oracle.out(sum(Oracle.dec(col("value")))).as("total"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"), col("total"))

  val queries: Map[String, Q] = Map(
    "win_tumbling" -> { (s, dir) =>
      tumblingHourly(Tables(s, dir, "events")).orderBy(col("wstart"))
    },

    // Sliding 1h windows every 30min — each event lands in exactly 2
    // windows; the oracle reproduces the assignment with a 2-offset union.
    "win_sliding" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), Oracle.out(sum(Oracle.dec(col("value")))).as("total"))
        .select(col("w.start").as("wstart"), col("w.end").as("wend"),
          col("n"), col("total"))
        .orderBy(col("wstart"))
    },

    // Session windows: Spark's session_window end = last event + gap; the
    // DuckDB lag/cumsum oracle mirrors exactly that (gap boundary: an
    // event exactly `gap` after the previous one STARTS a new session in
    // both formulations — SURVEY.md §7.5 item 2).
    "win_session" -> { (s, dir) =>
      sessions(Tables(s, dir, "events"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // Regular-grid resample + gap fill — the telemetry normalisation every
    // sensor pipeline runs before modeling: per user, an hourly grid from
    // first to last event (sequence+explode — grid size is span-bounded,
    // ~720 rows/user for the 30-day fixture), the hour's exact-decimal
    // mean where events exist, and last-observation-carried-forward
    // (`last(_, ignoreNulls)`) across the gaps. Scales by user: the grid
    // join and the LOCF window both hash on user_id — no global sort,
    // no driver-side series materialisation. The mean divides the exact
    // decimal sum as DOUBLE on both engines (avg() directly would drift:
    // engines disagree on double summation order).
    "ts_resample" -> { (s, dir) =>
      resampleHourly(Tables(s, dir, "events"))
        .orderBy(col("user_id"), col("hour"))
    }
  )

  val oracle: Map[String, String] = Map(
    "win_tumbling" ->
      """SELECT date_trunc('hour', ts::TIMESTAMP) AS wstart,
        |date_trunc('hour', ts::TIMESTAMP) + INTERVAL 1 HOUR AS wend,
        |COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY wstart""".stripMargin,

    "win_sliding" ->
      """WITH e AS (
        |  SELECT TIMESTAMP '1970-01-01 00:00:00'
        |           + to_microseconds(epoch_us(ts::TIMESTAMP) // 1800000000
        |                             * 1800000000) AS w0, value
        |  FROM events),
        |assigned AS (
        |  SELECT w0 AS wstart, value FROM e
        |  UNION ALL
        |  SELECT w0 - INTERVAL 30 MINUTE, value FROM e)
        |SELECT wstart, wstart + INTERVAL 1 HOUR AS wend,
        |       COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM assigned GROUP BY wstart ORDER BY wstart""".stripMargin,

    "win_session" ->
      """WITH e AS (SELECT user_id, ts::TIMESTAMP t, value FROM events),
        |d AS (
        |  SELECT user_id, t, value,
        |    CASE WHEN LAG(t) OVER w IS NULL
        |           OR t - LAG(t) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |s AS (
        |  SELECT user_id, t, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, MIN(t) AS session_start,
        |       MAX(t) + INTERVAL 30 MINUTE AS session_end,
        |       COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "ts_resample" ->
      """WITH b AS (
        |  SELECT user_id, date_trunc('hour', ts::TIMESTAMP) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v_avg,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT user_id,
        |    unnest(generate_series(MIN(hour), MAX(hour), INTERVAL 1 HOUR)) AS hour
        |  FROM b GROUP BY user_id)
        |SELECT g.user_id, g.hour, b.v_avg,
        |  COALESCE(b.n_events, 0) AS n_events,
        |  (b.v_avg IS NULL) AS is_gap,
        |  LAST_VALUE(b.v_avg IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM g LEFT JOIN b ON g.user_id = b.user_id AND g.hour = b.hour
        |ORDER BY g.user_id, g.hour""".stripMargin
  )
}
