package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed sort-merge as-of join — the scale escalation path for
  * `join_asof` (SURVEY.md §2.3; PERF.md).
  *
  * The window formulation (candidate equi-join + row_number()=1)
  * materialises every (left, qualifying-right) candidate pair before
  * discarding all but one — O(left × right/key) intermediate. This
  * implementation is the single-pass merge: union both sides, hash
  * repartition by key, sort within partitions by (key, time, side), and
  * walk each partition carrying the latest right row per key —
  * O(left + right) with exactly one shuffle per side and no candidate
  * blow-up. Ties: right rows at the same timestamp are ordered by id so
  * the LAST seen (highest id) wins, matching the window tiebreak
  * (`o_orderdate DESC, o_orderkey DESC` ⇒ rn=1).
  */
object AsOfJoin {
  /** Merged-row shape: side 0 = right (state), 1 = left (probe).
    * Public: encoder-generated code must be able to instantiate it.
    */
  case class Merged(key: Long, t: java.sql.Timestamp, side: Int,
                    leftId: Long, rightId: Long)

  /** Output: one row per left row that has a matching as-of right row. */
  case class AsOf(event_id: Long, user_id: Long, o_orderkey: Long,
                  o_orderdate: java.sql.Timestamp)

  /** events(event_id, user_id, ts) as-of orders(o_orderkey, o_custkey,
    * o_orderdate): latest order with orderdate <= ts per user.
    */
  def eventsAsOfOrders(events: DataFrame, orders: DataFrame): Dataset[AsOf] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    val l = events.select(
      col("user_id").as("key"), col("ts").as("t"), lit(1).as("side"),
      col("event_id").as("leftId"), lit(-1L).as("rightId")).as[Merged]
    val r = orders.select(
      col("o_custkey").as("key"), col("o_orderdate").as("t"), lit(0).as("side"),
      lit(-1L).as("leftId"), col("o_orderkey").as("rightId")).as[Merged]
    l.unionByName(r)
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("t"), col("side"), col("rightId"))
      .mapPartitions { rows =>
        var curKey = Long.MinValue
        var haveOrder = false
        var orderKey = -1L
        var orderDate: java.sql.Timestamp = null
        rows.flatMap { m =>
          if (m.key != curKey) { curKey = m.key; haveOrder = false }
          if (m.side == 0) {
            // right row: becomes the latest state (sorted so later beats
            // earlier; same-timestamp higher id arrives last)
            haveOrder = true; orderKey = m.rightId; orderDate = m.t
            None
          } else if (haveOrder) {
            Some(AsOf(m.leftId, m.key, orderKey, orderDate))
          } else None
        }
      }
  }
}
