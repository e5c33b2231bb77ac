package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's taxi-analysis surface re-expressed over the TPC-H-ish
  * testdata (see SURVEY.md §1 for the column mapping).
  *
  * Reference: /root/reference/Surabhi_Srinath_NYC_Taxi_Assignment_FInal.txt
  * (cited per-query below by line).
  *
  * Scale notes (100 TB): every query here is a single scan + hash aggregate
  * whose shuffle key is a low-cardinality group key, so map-side partial
  * aggregation collapses the shuffle to ~K rows per task. Percent-of-total
  * is computed by cross-joining the (tiny, broadcast) grand total onto the
  * aggregated rows rather than an `OVER ()` window on raw data, which would
  * serialize through one task. The lineitem⨝orders join is a shuffle join
  * on the natural key; dims would be broadcast.
  */
object Reference {

  /** duration-hours between order date and ship date (the reference's
    * pickup→dropoff trip duration, ref lines 92–97). */
  private def withDuration(t: Tables): DataFrame =
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .withColumn(
        "dh",
        (unix_timestamp(col("l_shipdate")) - unix_timestamp(col("o_orderdate"))) / 3600.0)

  /** Allowed l_tax values (the reference's extra ∈ {0, 0.5, 1} check,
    * ref lines 127–144). */
  private val allowedTax = Seq(0.0, 0.02, 0.04, 0.06, 0.08)

  /** The reference's combined validity predicate (ref lines 231–244 / the
    * ETL filter at lines 264–271), mapped onto testdata columns. */
  private def isClean = {
    val dhOk = col("dh") >= 0 && col("dh") <= 8760
    val taxOk = col("l_tax").isin(allowedTax: _*)
    dhOk && taxOk && col("l_quantity") > 0 && col("l_discount") >= 0 &&
      col("l_extendedprice") >= 0 && year(col("l_shipdate")) === 1996
  }

  /** q01 — records per provider (ref lines 62–67). */
  def q01(t: Tables): DataFrame =
    t.lineitem
      .groupBy(col("l_returnflag").as("grp"))
      .agg(count(lit(1)).as("total"))
      .orderBy("grp")

  /** q02 — percent-of-total share per provider (ref lines 69–74).
    * Scale: grand total cross-joined (broadcast) instead of OVER(). */
  def q02(t: Tables): DataFrame = {
    val counts = t.lineitem.groupBy(col("l_returnflag").as("grp"))
      .agg(count(lit(1)).as("total"))
    val grand = counts.agg(sum("total").as("grand"))
    counts.crossJoin(broadcast(grand))
      .select(col("grp"), col("total"),
        round(col("total") * 100.0 / col("grand"), 2).as("pct"))
      .orderBy("grp")
  }

  /** q03 — min/max of the two timestamps per provider (ref lines 84–89). */
  def q03(t: Tables): DataFrame =
    withDuration(t)
      .groupBy(col("l_returnflag").as("grp"))
      .agg(
        min(col("o_orderdate")).as("min_order_ts"),
        max(col("o_orderdate")).as("max_order_ts"),
        min(col("l_shipdate")).as("min_ship_ts"),
        max(col("l_shipdate")).as("max_ship_ts"))
      .orderBy("grp")

  /** q04 — min/max/avg derived duration per provider (ref lines 92–97). */
  def q04(t: Tables): DataFrame =
    withDuration(t)
      .groupBy(col("l_returnflag").as("grp"))
      .agg(
        round(min(col("dh")), 2).as("min_hours"),
        round(max(col("dh")), 2).as("max_hours"),
        round(avg(col("dh")), 2).as("avg_hours"))
      .orderBy("grp")

  /** q05 — invalid-duration records per provider (ref lines 99–104). */
  def q05(t: Tables): DataFrame =
    withDuration(t)
      .filter(col("dh") < 0 || col("dh") > 8760)
      .groupBy(col("l_returnflag").as("grp"))
      .agg(count(lit(1)).as("n_invalid"))
      .orderBy("grp")

  /** q06 — negative/low-value scan + per-group count (ref lines 106–122). */
  def q06(t: Tables): DataFrame =
    t.events
      .filter(col("value") < 20)
      .groupBy(col("event_type").as("grp"))
      .agg(count(lit(1)).as("n_low"))
      .orderBy("grp")

  /** q07 — disallowed-value distribution per (group, value)
    * (ref lines 127–136). */
  def q07(t: Tables): DataFrame =
    t.lineitem
      .filter(!col("l_tax").isin(allowedTax: _*))
      .groupBy(col("l_returnflag").as("grp"), col("l_tax").as("val"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("grp", "val")

  /** q08 — two-column categorical distribution (ref lines 197–209,
    * payment_type / store_and_fwd_flag checks). */
  def q08(t: Tables): DataFrame =
    t.lineitem
      .groupBy(col("l_returnflag").as("grp"), col("l_linestatus").as("status"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("grp", "status")

  /** q09 — combined OR-of-all-rules quality summary per provider
    * (ref lines 231–244). */
  def q09(t: Tables): DataFrame =
    withDuration(t)
      .filter(!isClean)
      .groupBy(col("l_returnflag").as("grp"))
      .agg(count(lit(1)).as("n_bad"))
      .orderBy("grp")

  /** q10 — the ETL clean filter + derived partition columns (yr, mnth)
    * with per-partition counts (ref lines 252–278). The actual
    * partitioned+bucketed write lives in sources.PartitionedWriter. */
  def q10(t: Tables): DataFrame =
    withDuration(t)
      .filter(isClean)
      .groupBy(
        year(col("l_shipdate")).cast("long").as("yr"),
        month(col("l_shipdate")).cast("long").as("mnth"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("yr", "mnth")

  /** q11 — average fare by month (ref lines 292–297, Analysis I Q1). */
  def q11(t: Tables): DataFrame =
    t.lineitem
      .groupBy(month(col("l_shipdate")).cast("long").as("mnth"))
      .agg(round(avg(col("l_extendedprice")), 2).as("avg_price"))
      .orderBy("mnth")

  /** q12 — trips per passenger-count level with pct share, ordered
    * (ref lines 299–304, Analysis I Q2). */
  def q12(t: Tables): DataFrame = {
    val counts = t.lineitem
      .groupBy(col("l_quantity").cast("long").as("level"))
      .agg(count(lit(1)).as("n_trips"))
    val grand = counts.agg(sum("n_trips").as("grand"))
    counts.crossJoin(broadcast(grand))
      .select(col("level"), col("n_trips"),
        round(col("n_trips") * 100.0 / col("grand"), 2).as("pct"))
      .orderBy(col("n_trips").desc, col("level"))
  }

  /** q13 — preferred category with pct share (ref lines 306–311,
    * Analysis I Q3: payment type). */
  def q13(t: Tables): DataFrame = {
    val counts = t.orders
      .groupBy(col("o_orderpriority").as("category"))
      .agg(count(lit(1)).as("cnt"))
    val grand = counts.agg(sum("cnt").as("grand"))
    counts.crossJoin(broadcast(grand))
      .select(col("category"), col("cnt"),
        round(col("cnt") * 100.0 / col("grand"), 2).as("pct"))
      .orderBy(col("cnt").desc, col("category"))
  }

  /** q14 — average vs exact p25/p50/p75 percentiles (ref lines 313–324,
    * Analysis I Q4). Exact `percentile` here for the bit-exact oracle; at
    * 100 TB the scale path is percentile_approx (mergeable t-digest). */
  def q14(t: Tables): DataFrame =
    t.orders.agg(
      round(avg(col("o_totalprice")), 2).as("avg_val"),
      round(percentile(col("o_totalprice"), lit(0.25)), 2).as("p25"),
      round(percentile(col("o_totalprice"), lit(0.50)), 2).as("p50"),
      round(percentile(col("o_totalprice"), lit(0.75)), 2).as("p75"))

  /** q15 — fraction of trips with an extra charge: two scalar aggregates
    * combined (ref lines 326–330, Analysis I Q5). */
  def q15(t: Tables): DataFrame = {
    val charged = t.lineitem.filter(col("l_tax") > 0)
      .agg(count(lit(1)).as("n_charged"))
    val total = t.lineitem.agg(count(lit(1)).as("n_total"))
    charged.crossJoin(total)
      .select(col("n_charged"), col("n_total"),
        round(col("n_charged") * 1.0 / col("n_total"), 2).as("frac"))
  }

  /** q16 — Pearson correlation of two columns (ref lines 337–339,
    * Analysis II Q1). */
  def q16(t: Tables): DataFrame =
    t.lineitem.agg(
      round(corr(col("l_quantity"), col("l_extendedprice")), 2)
        .as("corr_qty_price"))

  /** q17 — average tip per passenger level, ordered desc (ref lines
    * 341–346, Analysis II Q1b). */
  def q17(t: Tables): DataFrame =
    t.lineitem
      .groupBy(col("l_quantity").cast("long").as("level"))
      .agg(round(avg(col("l_extendedprice") * col("l_discount")), 2)
        .as("avg_tip"))
      .orderBy(col("avg_tip").desc, col("level"))

  /** q18 — CASE-based tip segmentation with pct share (ref lines 348–366,
    * Analysis II Q2). */
  def q18(t: Tables): DataFrame = {
    val tip = col("l_extendedprice") * col("l_discount")
    val seg = when(tip < 1000, "[0-1000)")
      .when(tip >= 1000 && tip < 2500, "[1000-2500)")
      .when(tip >= 2500 && tip < 5000, "[2500-5000)")
      .when(tip >= 5000 && tip < 7500, "[5000-7500)")
      .otherwise(">=7500")
    val counts = t.lineitem.groupBy(seg.as("segment"))
      .agg(count(lit(1)).as("cnt"))
    val grand = counts.agg(sum("cnt").as("grand"))
    counts.crossJoin(broadcast(grand))
      .select(col("segment"),
        round(col("cnt") * 100.0 / col("grand"), 2).as("pct"))
      .orderBy(col("pct").desc, col("segment"))
  }

  /** q19 — derived-metric (speed analog) average by month (ref lines
    * 368–376, Analysis II Q3). */
  def q19(t: Tables): DataFrame =
    withDuration(t)
      .filter(col("dh") > 0)
      .groupBy(month(col("l_shipdate")).cast("long").as("mnth"))
      .agg(round(avg(col("l_extendedprice") / col("dh")), 2).as("avg_speed"))
      .orderBy("mnth")

  /** q20 — special-dates analysis: per-date average on Dec 25/31
    * (ref lines 378–389, Analysis II Q4). */
  def q20(t: Tables): DataFrame =
    t.lineitem
      .filter(month(col("l_shipdate")) === 12 &&
        dayofmonth(col("l_shipdate")).isin(25, 31))
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(round(avg(col("l_extendedprice")), 2).as("avg_price"))
      .orderBy("d")

  /** q34 — the reference's literal percentile_approx (ref line 322): the
    * mergeable-sketch scale path of q14 (single pass, no global sort).
    * Rows-only: sketch internals differ across engines by design. */
  def q34(t: Tables): DataFrame =
    t.orders.agg(
      round(element_at(percentile_approx(col("o_totalprice"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)), 1), 2).as("p25"),
      round(element_at(percentile_approx(col("o_totalprice"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)), 2), 2).as("p50"),
      round(element_at(percentile_approx(col("o_totalprice"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)), 3), 2).as("p75"))

  /** q35 — salted two-stage aggregation: partial agg on (salt, key) then
    * final on key. The skew guard for heavy-hitter group keys (one key
    * dominating a shuffle partition): salt fans a hot key across 16
    * reducers, the final stage combines 16 tiny partials. Result is
    * identical to the direct groupBy (SQL oracle proves it). */
  def q35(t: Tables): DataFrame =
    t.events
      .groupBy(pmod(hash(col("event_id")), lit(16)).as("salt"),
        col("event_type"))
      // partials in exact integer cents: the two-stage sum is then truly
      // associative — identical to the direct groupBy at any scale (a
      // double partial-sum would make the salted result order-dependent)
      .agg(count(lit(1)).as("pc"),
        sum(expr("cast(round(value * 100) as bigint)")).as("ps"))
      .groupBy(col("event_type"))
      .agg(sum("pc").as("cnt"), sum("ps").as("sum_value_cents"))
      .orderBy("event_type")

  val queries: Map[String, Tables => DataFrame] = Map(
    "q34_percentile_approx" -> q34,
    "q35_salted_agg" -> q35,
    "q01_count_by_group" -> q01,
    "q02_pct_share" -> q02,
    "q03_minmax_dates" -> q03,
    "q04_duration_stats" -> q04,
    "q05_invalid_duration" -> q05,
    "q06_negative_value_check" -> q06,
    "q07_disallowed_values_dist" -> q07,
    "q08_value_set_check" -> q08,
    "q09_quality_summary" -> q09,
    "q10_clean_etl_stats" -> q10,
    "q11_avg_by_month" -> q11,
    "q12_level_distribution" -> q12,
    "q13_category_pref" -> q13,
    "q14_avg_vs_percentiles" -> q14,
    "q15_fraction_with_charge" -> q15,
    "q16_correlation" -> q16,
    "q17_avg_by_level" -> q17,
    "q18_case_bucketing" -> q18,
    "q19_derived_metric_avg" -> q19,
    "q20_specific_dates" -> q20)

  private val durSql =
    """FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""
  private val dhExpr = "(date_diff('second', o_orderdate, l_shipdate)/3600.0)"
  private val cleanSql =
    s"""$dhExpr >= 0 AND $dhExpr <= 8760
       | AND l_tax IN (0.0, 0.02, 0.04, 0.06, 0.08)
       | AND l_quantity > 0 AND l_discount >= 0 AND l_extendedprice >= 0
       | AND year(l_shipdate) = 1996""".stripMargin

  val oracles: Map[String, String] = Map(
    "q35_salted_agg" ->
      """SELECT event_type, count(*) AS cnt,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |   AS sum_value_cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q01_count_by_group" ->
      "SELECT l_returnflag AS grp, count(*) AS total FROM lineitem GROUP BY grp ORDER BY grp",
    "q02_pct_share" ->
      """SELECT grp, total, round(total*100.0/(SUM(total) OVER ()), 2) AS pct
        |FROM (SELECT l_returnflag AS grp, count(*) AS total FROM lineitem GROUP BY grp)
        |ORDER BY grp""".stripMargin,
    "q03_minmax_dates" ->
      s"""SELECT l_returnflag AS grp,
         | min(o_orderdate) AS min_order_ts, max(o_orderdate) AS max_order_ts,
         | min(l_shipdate) AS min_ship_ts, max(l_shipdate) AS max_ship_ts
         |$durSql GROUP BY grp ORDER BY grp""".stripMargin,
    "q04_duration_stats" ->
      s"""SELECT l_returnflag AS grp,
         | round(min($dhExpr), 2) AS min_hours,
         | round(max($dhExpr), 2) AS max_hours,
         | round(avg($dhExpr), 2) AS avg_hours
         |$durSql GROUP BY grp ORDER BY grp""".stripMargin,
    "q05_invalid_duration" ->
      s"""SELECT l_returnflag AS grp, count(*) AS n_invalid
         |$durSql WHERE $dhExpr < 0 OR $dhExpr > 8760
         |GROUP BY grp ORDER BY grp""".stripMargin,
    "q06_negative_value_check" ->
      """SELECT event_type AS grp, count(*) AS n_low FROM events
        |WHERE value < 20 GROUP BY grp ORDER BY grp""".stripMargin,
    "q07_disallowed_values_dist" ->
      """SELECT l_returnflag AS grp, l_tax AS val, count(*) AS cnt FROM lineitem
        |WHERE l_tax NOT IN (0.0, 0.02, 0.04, 0.06, 0.08)
        |GROUP BY grp, val ORDER BY grp, val""".stripMargin,
    "q08_value_set_check" ->
      """SELECT l_returnflag AS grp, l_linestatus AS status, count(*) AS cnt
        |FROM lineitem GROUP BY grp, status ORDER BY grp, status""".stripMargin,
    "q09_quality_summary" ->
      s"""SELECT l_returnflag AS grp, count(*) AS n_bad
         |$durSql WHERE NOT ($cleanSql)
         |GROUP BY grp ORDER BY grp""".stripMargin,
    "q10_clean_etl_stats" ->
      s"""SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
         | CAST(month(l_shipdate) AS BIGINT) AS mnth, count(*) AS cnt
         |$durSql WHERE $cleanSql
         |GROUP BY yr, mnth ORDER BY yr, mnth""".stripMargin,
    "q11_avg_by_month" ->
      """SELECT CAST(month(l_shipdate) AS BIGINT) AS mnth,
        | round(avg(l_extendedprice), 2) AS avg_price
        |FROM lineitem GROUP BY mnth ORDER BY mnth""".stripMargin,
    "q12_level_distribution" ->
      """SELECT level, n_trips, round(n_trips*100.0/(SUM(n_trips) OVER ()), 2) AS pct
        |FROM (SELECT CAST(l_quantity AS BIGINT) AS level, count(*) AS n_trips
        |      FROM lineitem GROUP BY level)
        |ORDER BY n_trips DESC, level""".stripMargin,
    "q13_category_pref" ->
      """SELECT category, cnt, round(cnt*100.0/(SUM(cnt) OVER ()), 2) AS pct
        |FROM (SELECT o_orderpriority AS category, count(*) AS cnt
        |      FROM orders GROUP BY category)
        |ORDER BY cnt DESC, category""".stripMargin,
    "q14_avg_vs_percentiles" ->
      """SELECT round(avg(o_totalprice), 2) AS avg_val,
        | round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
        | round(quantile_cont(o_totalprice, 0.50), 2) AS p50,
        | round(quantile_cont(o_totalprice, 0.75), 2) AS p75
        |FROM orders""".stripMargin,
    "q15_fraction_with_charge" ->
      """SELECT n_charged, n_total, round(n_charged*1.0/n_total, 2) AS frac
        |FROM (SELECT count(*) AS n_charged FROM lineitem WHERE l_tax > 0) a,
        |     (SELECT count(*) AS n_total FROM lineitem) b""".stripMargin,
    "q16_correlation" ->
      "SELECT round(corr(l_quantity, l_extendedprice), 2) AS corr_qty_price FROM lineitem",
    "q17_avg_by_level" ->
      """SELECT CAST(l_quantity AS BIGINT) AS level,
        | round(avg(l_extendedprice * l_discount), 2) AS avg_tip
        |FROM lineitem GROUP BY level ORDER BY avg_tip DESC, level""".stripMargin,
    "q18_case_bucketing" ->
      """SELECT segment, round(cnt*100.0/(SUM(cnt) OVER ()), 2) AS pct
        |FROM (SELECT CASE
        |        WHEN l_extendedprice*l_discount < 1000 THEN '[0-1000)'
        |        WHEN l_extendedprice*l_discount < 2500 THEN '[1000-2500)'
        |        WHEN l_extendedprice*l_discount < 5000 THEN '[2500-5000)'
        |        WHEN l_extendedprice*l_discount < 7500 THEN '[5000-7500)'
        |        ELSE '>=7500' END AS segment, count(*) AS cnt
        |      FROM lineitem GROUP BY segment)
        |ORDER BY pct DESC, segment""".stripMargin,
    "q19_derived_metric_avg" ->
      s"""SELECT CAST(month(l_shipdate) AS BIGINT) AS mnth,
         | round(avg(l_extendedprice / $dhExpr), 2) AS avg_speed
         |$durSql WHERE $dhExpr > 0
         |GROUP BY mnth ORDER BY mnth""".stripMargin,
    "q20_specific_dates" ->
      """SELECT CAST(l_shipdate AS DATE) AS d,
        | round(avg(l_extendedprice), 2) AS avg_price
        |FROM lineitem
        |WHERE month(l_shipdate) = 12 AND day(l_shipdate) IN (25, 31)
        |GROUP BY d ORDER BY d""".stripMargin)
}
