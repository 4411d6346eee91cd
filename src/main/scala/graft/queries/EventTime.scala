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
        |ORDER BY user_id, session_start""".stripMargin
  )
}
