package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational queries over the testdata star schema.
  *
  * These exercise the Spark-side plumbing the adtl-derived operators build on
  * (scan, projection pushdown, broadcast joins, shuffle aggregation, window
  * functions, top-k) and are designed to hash-match a DuckDB oracle exactly:
  *
  *  - money sums go through DECIMAL so results are order-independent and
  *    bit-exact regardless of partial-aggregation order, then a single final
  *    cast to double (deterministic) for a stable comparable type;
  *  - every float-producing step is a single IEEE op on identical inputs
  *    (never a multi-row double accumulation);
  *  - every result has a deterministic total ORDER BY with a unique key.
  */
object Relational {

  /** sum(CAST(c AS DECIMAL(p,2))) → double: order-insensitive exact sum. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(14,2)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.5-adjacent: shuffle aggregation with map-side partial agg (TPC-H Q1 shape).
    "q1_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"), // integer-valued doubles: exact
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(14,2)") *
            (lit(1).cast("decimal(14,2)") - col("l_discount").cast("decimal(14,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    // Top-k with unique tie-break: total sort, LIMIT pushed into TakeOrdered.
    "q2_topk" -> { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },
    // Broadcast dimension join + shuffle agg: revenue per nation.
    "q3_join_agg" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("n_name")
    },
    // Anti join (NOT EXISTS): customers with no orders.
    "q4_anti_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      // restrict the right side: in this synthetic corpus every customer
      // has at least one order, so an unrestricted anti-join returns 0
      // rows at every sf — a no-output==no-output compare proves little
      val o = Tables.orders(s, d)
        .filter(col("o_orderkey") % 3 === 0).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    // Semi join (EXISTS): nations that have suppliers.
    "q5_semi_join" -> { (s, d) =>
      val n = Tables.nation(s, d)
      val sup = Tables.supplier(s, d).select(col("s_nationkey"))
      n.join(sup, n("n_nationkey") === sup("s_nationkey"), "left_semi")
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    },
    // Window rank with unique tie-break key.
    "q6_window_rank" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .select("user_id", "event_id", "rn")
        .orderBy("user_id", "rn")
    },
    // Running sum over a window: DECIMAL accumulation keeps it exact.
    "q7_running_sum" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("running_value",
          sum(col("value").cast("decimal(14,2)")).over(w).cast("double"))
        .select("user_id", "event_id", "running_value")
        .orderBy("user_id", "event_id")
    },
    // Set operations with SQL DISTINCT semantics: INTERSECT/EXCEPT
    // compile to hash-aggregated semi/anti joins (no full sort) —
    // customers with both open and fulfilled orders but none pending
    "q8_set_ops" -> { (s, d) =>
      val o = Tables.orders(s, d)
      def custs(st: String) =
        o.filter(col("o_orderstatus") === st).select("o_custkey")
      custs("O").intersect(custs("F")).except(custs("P"))
        .orderBy("o_custkey")
    },
    // OLAP grouping sets: ROLLUP subtotals + grand total in ONE shuffle
    // (Spark expands the grouping sets map-side — no per-level rescan),
    // grouping_id disambiguates data NULLs from rolled-up levels. Within
    // a gid the rolled-up columns are uniformly NULL, so the (gid, keys)
    // ORDER BY is total despite Spark/DuckDB null-order defaults
    // differing.
    "q_rollup_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"), // integer-valued doubles
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    },
    // Pivot / crosstab with an EXPLICIT value list: no driver-side
    // distinct pass to discover columns (the scale contract — pivoting on
    // an unbounded value domain is a schema explosion, not a query);
    // count cells that pivot leaves NULL for absent combinations are
    // filled to 0 to match the conditional-aggregation contract.
    "q_pivot_wide" -> { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
        .orderBy("user_id")
    })

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q3_join_agg" ->
      """SELECT n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q4_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderkey % 3 = 0)
        |ORDER BY c_custkey""".stripMargin,
    "q5_semi_join" ->
      """SELECT n_nationkey, n_name FROM nation
        |WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
        |ORDER BY n_nationkey""".stripMargin,
    "q6_window_rank" ->
      """SELECT user_id, event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |FROM events ORDER BY user_id, rn""".stripMargin,
    "q7_running_sum" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(14,2))) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    // INTERSECT binds tighter than EXCEPT in both engines: (O ∩ F) ∖ P
    "q8_set_ops" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,
    "q_rollup_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q_pivot_wide" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS "click",
        |  count(*) FILTER (WHERE event_type = 'error') AS "error",
        |  count(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
        |  count(*) FILTER (WHERE event_type = 'signup') AS "signup",
        |  count(*) FILTER (WHERE event_type = 'view') AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
}
