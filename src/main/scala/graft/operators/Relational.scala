package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator pack — the SQL-expressible core of SURVEY §2
  * (filters F1-F10, joins J1-J11 kinds, aggregations A4/A5, windows
  * W1-W5, top-k T1-T8, set ops U1-U6) exercised over the TPC-H-ish
  * testdata so the driver's DuckDB oracle can verify every one.
  *
  * Determinism rules (oracle hash-parity):
  *  - money aggregates are summed as DECIMAL(18,4) (exact, order
  *    independent) and cast to DOUBLE only at the end, so Spark's and
  *    DuckDB's results are bit-identical;
  *  - every query ends in a total ORDER BY (ties broken by keys);
  *  - counts stay BIGINT on both sides.
  *
  * Scale notes: all joins here are dim-to-fact (broadcast-able; AQE
  * picks broadcast-hash automatically), aggregations are partial+final
  * hash aggs, and top-k compiles to TakeOrderedAndProject — no full
  * sort at 100 TB.
  */
object Relational {

  private val D = "decimal(18,4)"

  /** TPC-H Q1-shaped pricing summary (SURVEY A4/A5: stats rollups). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "lineitem")
      .filter($"l_shipdate" <= lit("2000-12-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        // round the decimal sums to scale 2 BEFORE the double cast: a
        // scale-2 unscaled value stays inside double's 53-bit exact
        // range far longer, and DuckDB's decimal->double (int128 cast +
        // division, two roundings) picks the ulp-adjacent double for
        // wider sums while Spark's BigDecimal conversion rounds once
        round(sum($"l_quantity".cast(D)), 2).cast("double").as("sum_qty"),
        round(sum($"l_extendedprice".cast(D)), 2).cast("double").as("sum_base_price"),
        round(sum(($"l_extendedprice".cast(D) * (lit(1).cast(D) - $"l_discount".cast(D)))), 2)
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Filter + projection + top-k (F1/F4/T1): pushed-down predicates,
    * TakeOrderedAndProject physical plan. */
  def filterTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "lineitem")
      .filter($"l_returnflag" === "R" &&
        $"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_quantity" > 25)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      .limit(100)
  }

  /** Multi-way dim join + revenue rollup (J9: FK joins in stats views).
    * region/nation/customer are dims → broadcast-hash joins; the only
    * shuffle is the final aggregation. */
  def joinRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        round(sum(($"l_extendedprice".cast(D) * (lit(1).cast(D) - $"l_discount".cast(D)))), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }

  /** Semi join (U-family / J semi): customers having a high-value order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders").filter($"o_totalprice" > 150000.0)
    c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** Anti join (U4/U6: seen-id exclusion, delete_by_ids semantics):
    * customers with no open ('P') order. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders").filter($"o_orderstatus" === "P")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** Ranking window (W1/W4): top-3 orders per customer, deterministic
    * tie-break by order key. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  /** Pagination (F4/T7): offset 100 limit 50. A bare global row_number
    * would drag every row into one partition; instead take the first
    * offset+limit rows via TakeOrderedAndProject (distributed top-k)
    * and only rank that tiny result. */
  def pagination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"o_orderdate".desc, $"o_orderkey")
    Tables(spark, dir, "orders")
      .orderBy($"o_orderdate".desc, $"o_orderkey")
      .limit(150)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" > 100)
      .select($"rn", $"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
      .orderBy($"rn")
  }

  /** Union + distinct (U1/U5): nations present via customers or suppliers. */
  def unionDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, dir, "customer").select($"c_nationkey".as("nationkey"))
    val s = Tables(spark, dir, "supplier").select($"s_nationkey".as("nationkey"))
    c.union(s).distinct().orderBy($"nationkey")
  }

  /** Events rollup (A4/A7-shaped: counts, distincts, extrema). */
  def eventsAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        round(sum($"value".cast("decimal(25,6)")), 2).cast("double").as("sum_value"),
        min($"value").as("min_value"),
        max($"value").as("max_value"))
      .orderBy($"event_type")
  }

  /** As-of join (J10/W5: page-number assignment semantics): for each
    * purchase event, the most recent click timestamp at-or-before it for
    * the same user. Implemented as a running max over the event stream —
    * the sort-based as-of pattern that scales (one shuffle on user_id,
    * no range cross product). */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "events")
      .withColumn("last_click_ts",
        max(when($"event_type" === "click", $"ts")).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"last_click_ts")
      .orderBy($"event_id")
  }

  /** Tumbling-window event-time aggregation (§2.9 streaming analytics
    * shape, runnable in batch for the oracle; the streaming path reuses
    * the same logic in graft.streaming). */
  def streamWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("window_start"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum($"value".cast("decimal(25,6)")), 2).cast("double").as("sum_value"))
      .orderBy($"window_start", $"event_type")
  }

  /** Cube rollup over documents (A4's by-type/by-status/total stats as a
    * single grouping-sets pass). */
  def cubeRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .cube($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .select(
        coalesce($"lang", lit("ALL")).as("lang"),
        coalesce($"source", lit("ALL")).as("source"),
        $"n_docs", $"sum_chars")
      .orderBy($"lang", $"source")
  }

  /** Gaps-and-islands sessionization (q54): the batch twin of the
    * streaming flatMapGroupsWithState operator — per-user sessions
    * split at >30 min gaps. Partitioned windows only (scales by user
    * key; no global window). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.streaming.EventStream.sessionizeBatch(Tables(spark, dir, "events"), 1800)
      .orderBy($"user_id", $"session_start")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_filter_topk" -> (filterTopK _),
    "q03_join_revenue" -> (joinRevenue _),
    "q04_semi_join" -> (semiJoin _),
    "q05_anti_join" -> (antiJoin _),
    "q06_window_rank" -> (windowRank _),
    "q07_pagination" -> (pagination _),
    "q08_union_dedup" -> (unionDedup _),
    "q09_events_agg" -> (eventsAgg _),
    "q10_asof_join" -> (asofJoin _),
    "q11_stream_window" -> (streamWindowAgg _),
    "q12_cube_rollup" -> (cubeRollup _),
    "q54_sessionize" -> (sessionize _),
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_quantity > 25
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,
    "q03_join_revenue" ->
      """SELECT r_name, n_name,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q04_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q06_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q07_pagination" ->
      """SELECT rn, o_orderkey, o_custkey, o_orderdate, o_totalprice FROM (
        | SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
        |   row_number() OVER (ORDER BY o_orderdate DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn > 100 AND rn <= 150
        |ORDER BY rn""".stripMargin,
    "q08_union_dedup" ->
      """SELECT DISTINCT nationkey FROM (
        | SELECT c_nationkey AS nationkey FROM customer
        | UNION ALL
        | SELECT s_nationkey AS nationkey FROM supplier) t
        |ORDER BY nationkey""".stripMargin,
    "q09_events_agg" ->
      """SELECT event_type,
        | COUNT(*) AS n_events,
        | COUNT(DISTINCT user_id) AS n_users,
        | CAST(ROUND(SUM(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE) AS sum_value,
        | MIN(value) AS min_value,
        | MAX(value) AS max_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q10_asof_join" ->
      """SELECT event_id, user_id, ts, last_click_ts FROM (
        | SELECT event_id, user_id, ts, event_type,
        |   MAX(CASE WHEN event_type = 'click' THEN ts END)
        |     OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
        | FROM events) t
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "q11_stream_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        | COUNT(*) AS n_events,
        | CAST(ROUND(SUM(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
    "q54_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events),
        |g AS (SELECT user_id, event_id, es, value,
        |  CASE WHEN es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) > 1800
        |       THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |s AS (SELECT user_id, es, value,
        |  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY es, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
        |  FROM g)
        |SELECT user_id, MIN(es) AS session_start, MAX(es) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sess_no
        |ORDER BY user_id, session_start""".stripMargin,
    "q12_cube_rollup" ->
      """SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
        | COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY CUBE(lang, source)
        |ORDER BY lang, source""".stripMargin,
  )
}
