package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries exercising the adtl operator inventory (SURVEY.md §2) as Spark
  * Column plans over the testdata tables. Each query name carries the §2
  * operator id it demonstrates. The real spec-driven engine lives in
  * `graft.adtl`; these queries pin the per-operator SEMANTICS against a
  * DuckDB oracle on data the oracle can also read.
  *
  * Reference semantics citations are to /root/reference (studied, not copied):
  *  - values-map recode: src/adtl/get_value.py:110-131
  *  - if predicates (cast-then-compare): src/adtl/get_value.py:244-312
  *  - ""→null normalization: src/adtl/get_value.py:194-195
  *  - sensitive hash: src/adtl/get_value.py:45-49
  *  - date reformat: src/adtl/get_value.py:219-234
  *  - unit conversion: src/adtl/get_value.py:200-218
  *  - combinedType firstNonNull/min/max/list/set: src/adtl/get_value.py:315-385
  *  - oneToMany fan-out: src/adtl/parser.py:516-535
  *  - groupBy lastNotNull / combinedType aggregation: src/adtl/parser.py:551-637
  */
object AdtlOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P7: values-map recode; missing key → null, or pass-through under
    // ignoreMissingKey/returnUnmatched (coalesce with the raw value).
    "p7_values_map" -> { (s, d) =>
      val m: Column = col("l_returnflag") match { case c =>
        when(c === "A", "accepted").when(c === "N", "none").when(c === "R", "returned")
      }
      val statusMap = when(col("o_orderstatus") === "O", "open")
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), m.as("flag_mapped"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"),
          coalesce(statusMap, col("o_orderstatus")).as("status_passthrough"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "flag_mapped", "status_passthrough")
        .orderBy("l_orderkey", "l_linenumber")
    },
    // P4/§2.3: if-predicate with cast-then-compare, any/all/not combinators,
    // case-insensitive anchored regex (=~).
    "p4_if_predicate" -> { (s, d) =>
      val pred = (col("value").cast("double") > lit(100.0) &&
        (col("event_type") === "purchase" || col("event_type") === "error")) ||
        (!(col("value").cast("double") >= lit(5.0)) &&
          col("event_type").rlike("(?i)^sign"))
      Tables.events(s, d).filter(coalesce(pred, lit(false)))
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    },
    // P3: can_skip — a column absent from the source compiles to a typed
    // null literal instead of failing resolution.
    "p3_can_skip" -> { (s, d) =>
      val df = Tables.region(s, d)
      val missing = "r_comment" // not present in the testdata region table
      val c = if (df.columns.contains(missing)) col(missing).cast("string")
              else lit(null).cast("string")
      df.select(col("r_regionkey"), col("r_name"), c.as("r_comment_skipped"))
        .orderBy("r_regionkey")
    },
    // P6: "" → null normalization after trim.
    "p6_empty_to_null" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(trim(col("source")) === "", lit(null)).otherwise(trim(col("source")))
            .as("source_norm"))
        .orderBy("doc_id")
    },
    // P10: source_date/date reformat between strftime formats
    // (%Y-%m-%d → %d/%m/%Y), plus round-trip back to ISO.
    "p10_date_reformat" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "dd/MM/yyyy").as("date_dmy"),
          date_format(to_date(date_format(col("o_orderdate"), "dd/MM/yyyy"), "dd/MM/yyyy"),
            "yyyy-MM-dd").as("date_iso"))
        .orderBy("o_orderkey")
    },
    // P11: sensitive → SHA-256 hex of the value.
    "p11_sensitive_hash" -> { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), sha2(col("c_name").cast("string"), 256).as("c_name_hashed"))
        .orderBy("c_custkey")
    },
    // P9: source_unit/unit conversion via a compile-time factor table
    // (lbs→kg etc.), driven by a unit-code column like adtl's coded units.
    "p9_unit_convert" -> { (s, d) =>
      // unit code derived from the row: even custkey = lbs, odd = kg
      val unitCode = when(col("c_custkey") % 2 === 0, "lbs").otherwise("kg")
      val factor = when(unitCode === "lbs", lit(0.45359237)).otherwise(lit(1.0))
      Tables.customer(s, d)
        .select(col("c_custkey"), unitCode.as("source_unit"),
          (col("c_acctbal") * factor).as("acctbal_kg"))
        .orderBy("c_custkey")
    },
    // C2: combinedType firstNonNull == coalesce (skips only nulls).
    // C1: min/max across columns in a row == least/greatest (null-safe).
    "c1_c2_row_combine" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          coalesce(when(col("l_returnflag") =!= "N", col("l_returnflag")),
            col("l_linestatus")).as("first_non_null"),
          least(col("l_quantity"), col("l_discount") * 100).as("row_min"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("row_max"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    // C3: combinedType list/set with excludeWhen filtering, emitted as a
    // deterministic joined string.
    "c3_list_set" -> { (s, d) =>
      val items = array(
        when(col("l_returnflag") =!= "N", col("l_returnflag")),
        when(col("l_linestatus") =!= "F", col("l_linestatus")),
        when(col("l_quantity") > 25, lit("bulk")))
      val kept = filter(items, x => x.isNotNull)
      // empty list → null (matches excludeWhen leaving nothing; also aligns
      // Spark's array_join('')-on-empty with DuckDB's NULL-on-empty)
      def joined(c: Column): Column = when(size(c) > 0, array_join(c, ","))
      // one-row-group input: spread the array-build/join projection
      // (and the orderBy's sampling re-run) across the session's cores
      graft.ops.Pipeline.cpuRebalance(Tables.lineitem(s, d),
          col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"),
          joined(kept).as("list_vals"),
          joined(array_sort(array_distinct(kept))).as("set_vals"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    // R3: oneToMany wide→long fan-out — one struct per match entry, nulled
    // out when its `if` fails, then explode + drop nulls.
    "r3_one_to_many" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val entries = array(
        // entry 1: always emitted (status observation)
        struct(lit("status").as("attribute"), col("o_orderstatus").as("value")),
        // entry 2: default-if — emit only when the mapped source is non-empty
        when(col("o_orderpriority") =!= "",
          struct(lit("priority").as("attribute"), col("o_orderpriority").as("value"))),
        // entry 3: explicit if on a numeric comparison
        when(col("o_totalprice") > 300000.0,
          struct(lit("high_value").as("attribute"), lit("1").as("value"))))
      o.select(col("o_orderkey"), explode(filter(entries, x => x.isNotNull)).as("e"))
        .select(col("o_orderkey"), col("e.attribute").as("attribute"), col("e.value").as("value"))
        .orderBy("o_orderkey", "attribute")
    },
    // A1-A6: groupBy-table aggregation modes. File order is made explicit by
    // event_id (scan-order id at 100TB scale: monotonically_increasing_id).
    "a1_a6_group_modes" -> { (s, d) =>
      val e = Tables.events(s, d)
      val purchaseVal = when(col("event_type") === "purchase", col("value"))
      val purchaseId = when(col("event_type") === "purchase", col("event_id"))
      e.groupBy("user_id").agg(
        max_by(purchaseVal, purchaseId).as("last_purchase_value"), // A1 lastNotNull
        min_by(purchaseVal, purchaseId).as("first_purchase_value"), // A6 firstNonNull
        min(date_format(col("ts"), "yyyy-MM-dd")).as("min_day"), // A2 min (ISO strings)
        max(date_format(col("ts"), "yyyy-MM-dd")).as("max_day"), // A2 max
        array_join(array_sort(collect_set(col("event_type"))), ",").as("type_set"), // A4 set
        count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },
    // A3: any/all over grouped boolean values (bool_or / bool_and semantics
    // restricted to non-null), as max/min over 0/1.
    "a3_any_all" -> { (s, d) =>
      Tables.events(s, d).groupBy("user_id").agg(
        max(when(col("event_type") === "error", 1).otherwise(0)).cast("boolean").as("any_error"),
        min(when(col("value") > 0, 1).otherwise(0)).cast("boolean").as("all_positive"))
        .orderBy("user_id")
    },
    // A4/A5: set vs list with flatten — per-group collect with dedup, joined
    // deterministically; list keeps duplicates in file order.
    "a4_a5_collect" -> { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"))
      e.groupBy("user_id").agg(
        array_join(array_sort(collect_set(col("event_type"))), ",").as("set_types"),
        array_join(sort_array(collect_list(struct(col("event_id"), col("event_type"))))
          .getField("event_type"), ",").as("list_types_in_order"))
        .orderBy("user_id")
    })

  val oracles: Map[String, String] = Map(
    "p7_values_map" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE l_returnflag WHEN 'A' THEN 'accepted' WHEN 'N' THEN 'none' WHEN 'R' THEN 'returned' END AS flag_mapped,
        |  coalesce(CASE o_orderstatus WHEN 'O' THEN 'open' END, o_orderstatus) AS status_passthrough
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p4_if_predicate" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE (value > 100.0 AND event_type IN ('purchase', 'error'))
        |   OR (NOT (value >= 5.0) AND regexp_matches(event_type, '^sign', 'i'))
        |ORDER BY event_id""".stripMargin,
    "p3_can_skip" ->
      """SELECT r_regionkey, r_name, CAST(NULL AS VARCHAR) AS r_comment_skipped
        |FROM region ORDER BY r_regionkey""".stripMargin,
    "p6_empty_to_null" ->
      """SELECT doc_id, CASE WHEN trim(source) = '' THEN NULL ELSE trim(source) END AS source_norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    "p10_date_reformat" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%d/%m/%Y') AS date_dmy,
        |  strftime(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y'), '%Y-%m-%d') AS date_iso
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "p11_sensitive_hash" ->
      """SELECT c_custkey, sha256(c_name) AS c_name_hashed
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "p9_unit_convert" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 2 = 0 THEN 'lbs' ELSE 'kg' END AS source_unit,
        |  c_acctbal * (CASE WHEN c_custkey % 2 = 0 THEN 0.45359237 ELSE 1.0 END) AS acctbal_kg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "c1_c2_row_combine" ->
      """SELECT l_orderkey, l_linenumber,
        |  coalesce(CASE WHEN l_returnflag <> 'N' THEN l_returnflag END, l_linestatus) AS first_non_null,
        |  least(l_quantity, l_discount * 100) AS row_min,
        |  greatest(l_quantity, l_discount * 100) AS row_max
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "c3_list_set" ->
      """WITH items AS (
        |  SELECT l_orderkey, l_linenumber, [
        |    CASE WHEN l_returnflag <> 'N' THEN l_returnflag END,
        |    CASE WHEN l_linestatus <> 'F' THEN l_linestatus END,
        |    CASE WHEN l_quantity > 25 THEN 'bulk' END] AS arr
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  CASE WHEN len(list_filter(arr, x -> x IS NOT NULL)) > 0
        |    THEN array_to_string(list_filter(arr, x -> x IS NOT NULL), ',') END AS list_vals,
        |  CASE WHEN len(list_filter(arr, x -> x IS NOT NULL)) > 0
        |    THEN array_to_string(list_sort(list_distinct(list_filter(arr, x -> x IS NOT NULL))), ',') END AS set_vals
        |FROM items ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "r3_one_to_many" ->
      """SELECT o_orderkey, attribute, value FROM (
        |  SELECT o_orderkey, 'status' AS attribute, o_orderstatus AS value FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'priority', o_orderpriority FROM orders WHERE o_orderpriority <> ''
        |  UNION ALL
        |  SELECT o_orderkey, 'high_value', '1' FROM orders WHERE o_totalprice > 300000.0
        |) ORDER BY o_orderkey, attribute""".stripMargin,
    "a1_a6_group_modes" ->
      """SELECT user_id,
        |  arg_max(value, event_id) FILTER (WHERE event_type = 'purchase') AS last_purchase_value,
        |  arg_min(value, event_id) FILTER (WHERE event_type = 'purchase') AS first_purchase_value,
        |  min(strftime(ts, '%Y-%m-%d')) AS min_day,
        |  max(strftime(ts, '%Y-%m-%d')) AS max_day,
        |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS type_set,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a3_any_all" ->
      """SELECT user_id,
        |  CAST(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BOOLEAN) AS any_error,
        |  CAST(min(CASE WHEN value > 0 THEN 1 ELSE 0 END) AS BOOLEAN) AS all_positive
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a4_a5_collect" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS set_types,
        |  array_to_string(list(event_type ORDER BY event_id), ',') AS list_types_in_order
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
}
