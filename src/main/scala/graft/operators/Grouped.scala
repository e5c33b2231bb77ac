package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Arbitrary per-group computation via the typed Dataset API —
  * `groupByKey.cogroup` / `mapGroups`. This is the extension point for
  * logic no SQL aggregate expresses (per-user model state, custom
  * sequence alignment); here the group function computes relationally
  * checkable stats so the DuckDB oracle can prove the path end-to-end.
  *
  * Scale shape: cogroup shuffles each side once on the key (same hash
  * partitioning), then streams both sorted iterators per key — memory is
  * O(one group), not O(partition). The same code runs per-executor at any
  * fleet size; skewed keys are the caller's salting concern (q53).
  */
object Grouped {

  /** q61 — typed cogroup of events with orders per user key: for each
    * user with events, event count, exact max value, and order count from
    * the other side (0 when absent). Equivalent to a left join of two
    * aggregates — which is exactly what the oracle checks. */
  def q61(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val ev = t.events.select(col("user_id"), col("value")).as[(Long, Double)]
    val ord = t.orders.select(col("o_custkey"), col("o_orderkey")).as[(Long, Long)]
    ev.groupByKey(_._1)
      .cogroup(ord.groupByKey(_._1)) { (k, evs, ords) =>
        var n = 0L
        var mx = Double.NegativeInfinity
        evs.foreach { e => n += 1; if (e._2 > mx) mx = e._2 }
        if (n == 0) Iterator.empty
        else Iterator((k, n, mx, ords.size.toLong))
      }
      .toDF("user_id", "n_events", "max_value", "n_orders")
      .orderBy("user_id")
  }

  val queries: Map[String, Tables => DataFrame] = Map(
    "q61_cogroup" -> q61)

  val oracles: Map[String, String] = Map(
    "q61_cogroup" ->
      """SELECT u.user_id, u.n_events, u.max_value,
        | coalesce(o.n_orders, 0) AS n_orders
        |FROM (SELECT user_id, count(*) AS n_events, max(value) AS max_value
        |      FROM events GROUP BY user_id) u
        |LEFT JOIN (SELECT o_custkey, count(*) AS n_orders
        |           FROM orders GROUP BY o_custkey) o
        |  ON u.user_id = o.o_custkey
        |ORDER BY user_id""".stripMargin)
}
