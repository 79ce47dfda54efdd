package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Relational operator inventory over the driver's TPC-H-ish testdata.
  *
  * Covers the classical surface that SURVEY.md §2.6/§2.7 notes "come free in
  * Spark" plus the analytics layer SURVEY §7 schedules on top of the
  * reference's data model (scan, filter+projection pushdown, hash/sort
  * aggregate, broadcast/shuffle joins, semi/anti joins, window functions,
  * rollup/cube, set ops, date bucketing).
  *
  * Numeric-parity rules (see SURVEY §7.5 "oracle expressibility"):
  *   - Sums over money-like doubles go through DECIMAL(18,2) so Spark and the
  *     DuckDB oracle aggregate exactly, then cast the final value to DOUBLE.
  *   - Products that would overflow decimal precision are computed in IEEE
  *     double (same operand order on both sides) and cast to DECIMAL(24,6)
  *     pre-aggregation.
  *   - Ratios are a double division of two exactly-agreed operands.
  */
object RelationalQueries {

  /** Exact decimal sum of a 2-decimal double column, surfaced as double. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full-scan aggregate: TPC-H Q1 pricing summary. Map-side partial
    // aggregation + 2-key hash agg; no shuffle besides the final agg exchange.
    "q01_pricing_summary" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(24,6)")).cast("double").as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))).cast("decimal(24,6)"))
            .cast("double").as("sum_charge"),
          (sum(col("l_discount").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // Selective filter + narrow projection; both should reach the parquet
    // scan (PushedFilters + pruned ReadSchema).
    "q02_filter_project" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01") &&
          col("l_quantity") > 45 && col("l_discount") >= 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag")
    }),

    // 3-way join + agg + deterministic top-N (TPC-H Q3 shape). customer is
    // broadcast (small dim); orders⋈lineitem shuffles on the order key.
    "q03_revenue_topn" -> ((s, d) => {
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = orders(s, d).filter(col("o_orderdate") < lit("1998-07-01"))
      val l = lineitem(s, d).filter(col("l_shipdate") > lit("1998-07-01"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,6)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // Broadcast star-join enrichment: fact ⋈ two tiny dims.
    "q04_region_enrich" -> ((s, d) => {
      customer(s, d)
        .join(broadcast(nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          dsum(col("c_acctbal")).as("sum_acctbal"))
    }),

    // Left-semi join (EXISTS) — TPC-H Q4 shape.
    "q05_priority_semi" -> ((s, d) => {
      val l = lineitem(s, d).filter(col("l_discount") > 0.06)
      orders(s, d)
        .join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // Left-anti join (NOT EXISTS): customers with no big-ticket order.
    "q06_customers_no_orders" -> ((s, d) => {
      val bigOrders = orders(s, d).filter(col("o_totalprice") > 400000)
      customer(s, d)
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // Ranking window: top-3 orders per customer (deterministic tiebreak).
    "q07_top_orders_per_cust" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }),

    // Running aggregate window (explicit ROWS frame on both sides).
    "q08_running_totals" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .withColumn("running_spend",
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double"))
        .select("o_custkey", "o_orderkey", "running_spend")
    }),

    // ROLLUP grouping sets.
    "q09_rollup" -> ((s, d) => {
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
    }),

    // CUBE grouping sets.
    "q10_cube_status_priority" -> ((s, d) => {
      orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"))
    }),

    // Distinct aggregate.
    "q11_distinct_customers" -> ((s, d) => {
      orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
    }),

    // UNION ALL of two heterogeneous scans, normalized to one schema.
    "q12_union_parties" -> ((s, d) => {
      val c = customer(s, d).select(lit("customer").as("kind"),
        col("c_acctbal").as("acctbal"))
      val p = supplier(s, d).select(lit("supplier").as("kind"),
        col("s_acctbal").as("acctbal"))
      c.unionAll(p)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), dsum(col("acctbal")).as("sum_bal"))
    }),

    // Conditional aggregation over a join (TPC-H Q12 shape).
    "q13_priority_case" -> ((s, d) => {
      lineitem(s, d).filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0)
            .otherwise(1)).as("low_line_count"))
    }),

    // Date bucketing (month) — string-formatted for byte-parity.
    "q14_monthly_orders" -> ((s, d) => {
      orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"))
    }),

    // String functions + LIKE / BETWEEN filters.
    "q15_part_strings" -> ((s, d) => {
      part(s, d)
        .filter(col("p_size").between(10, 20) && col("p_name").like("%red%"))
        .select(col("p_partkey"), upper(col("p_brand")).as("brand_u"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 6).as("type_prefix"))
    }),

    // IN-list + numeric range predicate feeding an aggregate.
    "q16_returned_mid_qty" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_quantity").between(10, 20))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
    }),

    // Correlated-aggregate pattern (TPC-H Q17 shape): per-part average as a
    // re-joined subquery; avg computed as exact-decimal-sum / count.
    "q17_below_half_avg" -> ((s, d) => {
      val l = lineitem(s, d)
      val avgQ = l.groupBy(col("l_partkey").as("pk"))
        .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_qty"))
      l.join(avgQ, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(count(lit(1)).as("n_small"),
          dsum(col("l_extendedprice")).as("sum_price"))
    }),

    // Grouped min/max/first-style extremes per group.
    "q18_extremes_per_nation" -> ((s, d) => {
      customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"),
          count(lit(1)).as("n"))
    }),

    // PIVOT: order counts by status per priority.
    "q19_pivot_status" -> ((s, d) => {
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
    }),

    // max_by / min_by argmax aggregates (deterministic: unique ordering key).
    "q20_arg_extremes" -> ((s, d) => {
      orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max_by(col("o_totalprice"), col("o_orderkey")).as("latest_price"),
          min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"),
          count(lit(1)).as("n"))
    }),

    // Ordered distinct string aggregation per group.
    "q21_nations_per_region" -> ((s, d) => {
      nation(s, d)
        .join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(sort_array(collect_set(col("n_name"))), ",")
          .as("nations"))
    }),

    // Interpolated percentiles (linear interpolation on both engines).
    "q22_quantiles" -> ((s, d) => {
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
    }),

    // HAVING: post-aggregation predicate.
    "q24_having_hot_parts" -> ((s, d) => {
      lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .filter(col("sum_qty") > 150.0)
    }),

    // NULL handling: nullif/coalesce round-trips and null-aware counts.
    "q25_null_handling" -> ((s, d) => {
      lineitem(s, d)
        .select(col("l_returnflag"),
          nullif(col("l_discount"), lit(0.0)).as("disc_n"))
        .groupBy(col("l_returnflag"))
        .agg(count(col("disc_n")).as("n_discounted"),
          count(lit(1)).as("n_total"),
          dsum(coalesce(col("disc_n"), lit(-1.0))).as("sum_with_sentinel"))
    }),

    // Regex group extraction.
    "q26_regexp_extract" -> ((s, d) => {
      part(s, d)
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"))
        .groupBy(col("last_word"))
        .agg(count(lit(1)).as("n_parts"))
    }),

    // SQL entry path: temp views + spark.sql CTE (same Catalyst plans as
    // the DataFrame API — this exercises the parser surface).
    "q27_sql_surface" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("orders_v")
      customer(s, d).createOrReplaceTempView("customer_v")
      s.sql(
        """WITH big AS (
             SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
             FROM orders_v GROUP BY o_custkey)
           SELECT c_mktsegment, COUNT(*) AS n_big_spenders
           FROM customer_v JOIN big ON c_custkey = o_custkey
           WHERE spend > 3000000
           GROUP BY c_mktsegment""")
    }),

    // The SQL-FIRST surface end-to-end: graft.Views registers the whole
    // engine as temp views + SQL functions, then the query is pure SQL
    // text over the registered names — the path a DataFrame-free user
    // takes (SqlSurfaceSpec proves per-family parity; this gates it
    // against the DuckDB oracle).
    "q43_sql_views" -> ((s, d) => {
      graft.Views.register(s, d)
      s.sql(
        """SELECT n_name,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
               AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_lines
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           WHERE l_shipdate >= '1997-01-01'
           GROUP BY n_name""")
    }),

    // Value-RANGE window frame (vs q08's ROWS frame): per-customer
    // trailing-90-day spend, frame bounded by the ORDER BY value.
    "q28_range_frame" -> ((s, d) => {
      val o = orders(s, d)
        .withColumn("od", expr("unix_timestamp(o_orderdate) div 86400"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("od"))
        .rangeBetween(-90, 0)
      o.select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("spend_90d"))
    }),

    // posexplode: position-indexed unnest (LATERAL VIEW surface).
    "q29_posexplode" -> ((s, d) => {
      part(s, d)
        .select(col("p_partkey"),
          posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
        .filter(col("pos") < 2)
        .groupBy(col("pos"), col("word"))
        .agg(count(lit(1)).as("n_parts"))
    }),

    // Distribution window functions: quartile bucket, percent_rank,
    // cume_dist per nation. Ordering is fully tie-broken, so rank ==
    // row_number and the ratios are derived from exact integers on both
    // sides — builtin percent_rank/cume_dist drift by a last ULP from
    // DuckDB's at larger partitions, which survives 6-dp rounding on
    // boundary values.
    "q30_distribution_windows" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      val wp = Window.partitionBy(col("c_nationkey"))
      customer(s, d).select(col("c_nationkey"), col("c_custkey"),
        ntile(4).over(w).as("quartile"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(wp).as("n"))
        // no rounding: IEEE division of identical integers is bitwise
        // identical across engines, while rounding half-boundary ratios
        // (41/640 → …625) is not
        .select(col("c_nationkey"), col("c_custkey"), col("quartile"),
          ((col("rn") - 1).cast("double") / (col("n") - 1)).as("pct_rank"),
          (col("rn").cast("double") / col("n")).as("cume"))
    }),

    // TPC-H Q5 shape: local-supplier revenue per nation — the canonical
    // 5-way join (two fact-fact shuffle joins + broadcast dims) with the
    // customer-nation = supplier-nation co-location predicate.
    "q31_local_supplier_volume" -> ((s, d) => {
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(24,6)")
      lineitem(s, d)
        .join(orders(s, d)
          .filter(col("o_orderdate") >= lit("1995-01-01") &&
            col("o_orderdate") < lit("1996-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"))
    }),

    // TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    // quarter (fact joins + broadcast dim + deterministic top-n).
    "q32_returned_item" -> ((s, d) => {
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(24,6)")
      customer(s, d)
        .join(orders(s, d)
          .filter(col("o_orderdate") >= lit("1995-01-01") &&
            col("o_orderdate") < lit("1995-04-01")),
          col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // TPC-H Q12 shape: conditional CASE aggregation over a fact-fact
    // join — high/low order-priority line counts per return flag.
    "q33_priority_lines" -> ((s, d) => {
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(high, 1L).otherwise(0L)).cast("bigint")
            .as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).cast("bigint")
            .as("low_line_count"))
    }),

    // TPC-H Q19 shape: disjunctive multi-range predicates across a
    // lineitem ⋈ part join — the OR-of-ANDs pattern Catalyst must keep
    // partially pushable (brand IN-list reaches the part scan).
    "q34_disjunctive_ranges" -> ((s, d) => {
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(24,6)")
      lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" &&
            col("l_quantity").between(1, 11) &&
            col("p_size").between(1, 5)) ||
          (col("p_brand") === "Brand#13" &&
            col("l_quantity").between(10, 20) &&
            col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#20" &&
            col("l_quantity").between(20, 30) &&
            col("p_size").between(1, 15)))
        .agg(sum(rev).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q16 shape: distinct-supplier counts per part class, with a
    // NOT-LIKE exclusion and an anti-join against a disqualified
    // supplier set (negative balance stands in for the complaints list).
    "q35_supplier_part_counts" -> ((s, d) => {
      val bad = supplier(s, d).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      val li = lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
        .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
      li.join(broadcast(part(s, d)
          .filter(!col("p_type").startsWith("PROMO") &&
            col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).cast("bigint")
          .as("supplier_cnt"))
    }),

    // TPC-H Q22 shape: scalar-subquery threshold (positive-balance
    // average) + anti-join (customers with no orders in the 1995 Q1
    // window — the synthetic data gives every customer SOME order, so
    // the window keeps the anti-join non-trivial), aggregated per
    // nation. The average is computed through DECIMAL so the threshold
    // is bit-identical across engines.
    "q36_wealthy_inactive" -> ((s, d) => {
      val cust = customer(s, d)
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_bal"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(orders(s, d)
          .filter(col("o_orderdate") >= lit("1995-01-01") &&
            col("o_orderdate") < lit("1995-04-01"))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("totacctbal"))
    }),

    // Correlated scalar subquery through the SQL surface — Catalyst's
    // decorrelation rewrites the per-row aggregate into a join; parts
    // priced 5% above their brand's mean (retail prices sit in a tight 900-1000 band). The mean rides a DECIMAL sum
    // so the threshold is bit-identical across engines.
    "q37_correlated_subquery" -> ((s, d) => {
      part(s, d).createOrReplaceTempView("part_v")
      s.sql(
        """SELECT p.p_partkey, p.p_brand, p.p_retailprice
           FROM part_v p
           WHERE p.p_retailprice > (
             SELECT 1.05 * CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(18,2)))
               AS DOUBLE) / COUNT(*)
             FROM part_v p2 WHERE p2.p_brand = p.p_brand)""")
    }),

    // LATERAL correlated subquery join: top-2 orders per customer via a
    // per-row dependent subquery (Catalyst plans a LateralJoin) — the
    // SQL-surface twin of q07's Window top-n.
    "q38_lateral_topn" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("orders_v")
      customer(s, d).createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
           FROM customer_v c,
           LATERAL (SELECT o_orderkey, o_totalprice FROM orders_v o
                    WHERE o.o_custkey = c.c_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC
                    LIMIT 2) o""")
    }),

    // EXCEPT (distinct set difference): customers active in 1995 but
    // not in 1996.
    // TPC-H Q18 shape: large-volume orders — the HAVING aggregate runs
    // FIRST (one shuffle on orderkey, map-side partials), and only the
    // surviving ~10% of orderkeys join back to orders/customer. No
    // broadcast hint: the filtered agg's size is data-dependent, so AQE
    // picks broadcast-vs-shuffle from the runtime size.
    "q39_large_volume_orders" -> ((s, d) => {
      val big = lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("total_qty"))
        .filter(col("total_qty") > 180)
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("total_qty"))
    }),

    // TPC-H Q8 shape: market share — one nation's fraction of a region's
    // import revenue per year. The numerator is a conditional sum inside
    // the SAME aggregate as the denominator (one pass, no self-join);
    // both sums stay exact DECIMAL until the final double division, so
    // the ratio needs no rounding for oracle parity.
    "q40_market_share" -> ((s, d) => {
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(24,6)")
      val custNation = nation(s, d).select(
        col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
      val suppNation = nation(s, d).select(
        col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(custNation), col("c_nationkey") === col("c_nk"))
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("c_rk") === col("r_regionkey"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_2", rev)
            .otherwise(lit(0).cast("decimal(24,6)"))).cast("double") /
          sum(rev).cast("double")).as("mkt_share"))
    }),

    // TPC-H Q7 shape: volume shipping between a nation PAIR, both
    // directions, by year — the disjunctive two-nation filter lands on
    // broadcast dims before the fact-fact join keys are touched.
    "q41_volume_shipping" -> ((s, d) => {
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(24,6)")
      val custNation = nation(s, d).select(
        col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val suppNation = nation(s, d).select(
        col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(custNation), col("c_nationkey") === col("c_nk"))
        .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
        .filter((col("supp_nation") === "NATION_18" &&
            col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" &&
            col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum(rev).cast("double").as("revenue"))
    }),

    // Explicit GROUPING SETS (neither rollup nor cube): the two 1-D
    // marginals without the (a,b) cross or grand total — one pass, the
    // planner expands rows per set (same machinery as q09/q10).
    "q42_grouping_sets" -> ((s, d) => {
      orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"))
    }),

    // TPC-H Q13 shape (customer order-count distribution): LEFT join
    // with a join-side filter (the filter must live IN the join
    // condition — a WHERE would turn the outer join inner and drop
    // zero-order customers), then a double aggregation: per-customer
    // count, then the histogram over counts. Two shuffles; the second
    // is count-domain-sized (tiny).
    "q45_custdist" -> ((s, d) => {
      val c = customer(s, d)
      val o = orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey") &&
          o("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    "q23_churned_1996" -> ((s, d) => {
      val o = orders(s, d)
      val in95 = o.filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01")).select(col("o_custkey"))
      val in96 = o.filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01")).select(col("o_custkey"))
      in95.except(in96)
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    // this schema: a line is "late" when it ships > 60 days after its
    // order date; count each late line whose supplier was the ONLY late
    // supplier on a multi-supplier finalized order. The oracle states it
    // as correlated EXISTS / NOT EXISTS; the Spark plan decorrelates
    // with ONE per-l_orderkey AGGREGATE — the double-exists collapses
    // to per-order MIN/MAX: "another supplier exists" ⟺
    // min(suppkey)≠max(suppkey), "no OTHER late supplier" ⟺ min(late
    // suppkey)=max(late suppkey) (null when the order has no late line,
    // and null === null filters out), and since every qualifying late
    // line then belongs to the ONE late supplier late_min, the per-line
    // count rides the same aggregate as sum(late). vs the r20 WINDOW
    // form: the window forced a full SORT of the joined fact stream
    // after its exchange (Exchange→Sort→Window), while this aggregate
    // partial-combines map-side — the exchange carries ≤ one row per
    // (map partition, orderkey) and nothing sorts. At 100 TB the sort
    // of lineitem⋈orders was the gate's scale-killer. Lineitem is
    // still scanned once; no join-back (the aggregate row itself
    // carries the supplier key and the late-line count).
    "q44_waiting_suppliers" -> ((s, d) => {
      val lateSk = when(col("late"), col("l_suppkey"))
      lineitem(s, d)
        .join(orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > date_add(col("o_orderdate"), 60))
        .groupBy(col("l_orderkey"))
        .agg(min(col("l_suppkey")).as("sk_min"),
          max(col("l_suppkey")).as("sk_max"),
          min(lateSk).as("late_min"),
          max(lateSk).as("late_max"),
          sum(col("late").cast("long")).as("n_late"))
        .filter(col("sk_min") =!= col("sk_max") &&
          col("late_min") === col("late_max"))
        .join(broadcast(supplier(s, d)),
          col("late_min") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("n_late")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(10)
    }),

    // TPC-H Q2 shape (min-cost supplier), adapted: no partsupp table in
    // this schema, so supply cost is the min observed line price per
    // (part, supplier) pair. The oracle states the classic correlated
    // "= (SELECT MIN ...)" form; the Spark plan decorrelates it as a
    // WINDOW minimum over the cost rows (one partkey shuffle, dims
    // broadcast, no per-row re-scan, no aggregate joined back —
    // plan-spec-locked). min() is order-free so DECIMAL(18,2) per-row
    // casts keep both engines bit-identical.
    "q46_min_cost_supplier" -> ((s, d) => {
      val euSupp = supplier(s, d)
        .join(broadcast(nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
      val cost = lineitem(s, d)
        .join(broadcast(euSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"), col("s_suppkey"), col("s_name"),
          col("n_name"))
        .agg(min(col("l_extendedprice").cast("decimal(18,2)"))
          .as("supply_cost"))
      // the per-part minimum rides a WINDOW over the cost rows (the
      // q44 decorrelation pattern): one partkey shuffle instead of a
      // second aggregation joined back — at 100 TB that join's two
      // extra exchanges of the (part, supplier) cost table ARE the
      // dominant stage after the fact scan
      val w = Window.partitionBy(col("l_partkey"))
      cost.withColumn("min_cost", min(col("supply_cost")).over(w))
        .filter(col("supply_cost") === col("min_cost"))
        .join(broadcast(part(s, d).filter(col("p_brand") === "Brand#1")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"),
          col("n_name"), col("supply_cost").cast("double").as("supply_cost"))
    }),

    // TPC-H Q22 shape (global sales opportunity), adapted: the nation
    // name's numeric suffix stands in for the phone country code, and
    // "no orders" means lapsed — none since 2000-06-01 (the synthetic
    // data gives every customer SOME order, as sf-small TPC-H does
    // not). The above-average-balance threshold is stated WITHOUT a
    // division: bal * n_pos > sum_bal in exact DECIMAL arithmetic, so
    // the borderline row can't flip between engines on a last-ULP
    // average. The scalar aggregate is a broadcast single row; the
    // lapsed test is a left-anti join (one shuffle, no correlated
    // re-scan).
    "q47_global_sales_opportunity" -> ((s, d) => {
      val cust = customer(s, d)
        .join(broadcast(nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .filter(substring(col("n_name"), 8, 10)
          .isin("1", "5", "9", "13", "17", "21"))
        .select(col("c_custkey"), col("n_name"),
          col("c_acctbal").cast("decimal(18,2)").as("bal"))
      val stats = cust.filter(col("bal") > 0)
        .agg(sum(col("bal")).as("sum_bal"), count(lit(1)).as("n_pos"))
      cust.crossJoin(broadcast(stats)) // single row by construction
        .filter(col("bal") * col("n_pos") > col("sum_bal"))
        .join(orders(s, d)
            .filter(col("o_orderdate") >= lit("2000-06-01"))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("bal")).cast("double").as("totacctbal"))
    }),

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // per-part AVG decorrelates into one per-part aggregate joined
    // back to the same pre-filtered fact slice. Division-free exact
    // threshold: qty < avg/5  ⇔  5·qty·cnt < sum (all DECIMAL), so row
    // membership can't drift a ULP between engines; the single final
    // division happens once on an exact DECIMAL total in both.
    "q48_small_quantity_revenue" -> ((s, d) => {
      val p = part(s, d)
        .filter(col("p_brand") === "Brand#1" && col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val cand = lineitem(s, d)
        .select(col("l_partkey"),
          col("l_quantity").cast("decimal(18,2)").as("q"),
          col("l_extendedprice"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val perPart = cand.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("q")).as("sumq"), count(lit(1)).as("cnt"))
      cand.join(perPart, col("l_partkey") === col("pk"))
        .filter(col("q") * 5 * col("cnt") < col("sumq"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double") / 7.0).as("avg_yearly"))
    }),

    // TPC-H Q20 shape (concentration screen): suppliers who shipped
    // >10% of some PROMO part's total. Two-level aggregation where the
    // second level REAGGREGATES the first's output — the per-part
    // total is a rollup of the (supp, part) partials, not a second
    // fact scan — then an exact-DECIMAL share threshold (10·sq > tq)
    // and a broadcast name join.
    "q49_excess_share_suppliers" -> ((s, d) => {
      val promo = part(s, d).filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val sp = lineitem(s, d)
        .select(col("l_suppkey"), col("l_partkey"),
          col("l_quantity").cast("decimal(18,2)").as("q"))
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("q")).as("sq"))
      val tot = sp.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("sq")).as("tq"))
      sp.join(tot, col("l_partkey") === col("pk"))
        .filter(col("sq") * 10 > col("tq"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_parts"))
        .join(broadcast(supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("n_parts"))
    }),

    // TPC-H Q9 shape (product-type profit): per-(nation, order-year)
    // profit over the full 6-table star. The schema has no partsupp, so
    // supply cost is the Q9-spirit proxy 80% of p_retailprice — the
    // SHAPE is the point: name-filtered part dim broadcast into
    // lineitem, supplier→nation broadcast chain, the one genuine
    // fact-fact shuffle (lineitem ⋈ orders on orderkey), per-row money
    // math bridged through DECIMAL before the sum.
    "q50_profit_by_nation" -> ((s, d) => {
      val amount = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        - col("p_retailprice") * lit(0.8) * col("l_quantity"))
        .cast("decimal(24,6)")
      lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_name").contains("bolt"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(amount).cast("double").as("profit"))
    }),

    // TPC-H Q14 shape (promo revenue share): one ship-month of
    // lineitem against the broadcast part dim, conditional vs total
    // revenue in ONE aggregate pass — the ratio computed from
    // exact-DECIMAL sums cast to double on both sides (identical IEEE
    // division), never from accumulated float state.
    "q51_promo_revenue" -> ((s, d) => {
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(24,6)")
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-03-01") &&
          col("l_shipdate") < lit("1997-04-01"))
        .join(broadcast(part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(24,6)"))).as("promo"),
          sum(rev).as("total"))
        .select(
          (col("promo").cast("double") / col("total").cast("double")
            * 100.0).as("promo_share"),
          col("promo").cast("double").as("promo_revenue"),
          col("total").cast("double").as("total_revenue"))
    }),

    // TPC-H Q15 shape (top supplier): quarterly per-supplier revenue,
    // the global max as a broadcast single row joined back (ties kept
    // — exact-DECIMAL equality is well-defined where float equality
    // would be a bug), then the broadcast name join. No global-window
    // single-partition shuffle anywhere.
    "q52_top_supplier" -> ((s, d) => {
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(24,6)")
      val byStripe = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(rev).as("total_revenue"))
      val top = byStripe.agg(max(col("total_revenue")).as("max_revenue"))
      byStripe
        .join(broadcast(top),
          col("total_revenue") === col("max_revenue"))
        .join(broadcast(supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_revenue").cast("double").as("total_revenue"))
    }),

    // TPC-H Q6 shape (forecasting revenue change): the pure
    // scan-filter-aggregate — every predicate pushes to the parquet
    // scan (date range, discount band, quantity cap), zero joins, one
    // map-side partial sum; the revenue product bridges through
    // DECIMAL(24,6) so the global sum is order-exact. The simplest
    // classic shape, kept as a gate because it is the purest test of
    // scan-level pushdown doing ALL the work.
    "q53_forecast_revenue" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(24,6)")).as("rev"))
        .select(col("rev").cast("double").as("revenue"))),

    // TPC-H Q11 shape (important stock): per-(nation, part) supplied
    // value, kept only where it exceeds 1.5× the nation's MEAN part
    // value — the group-vs-derived-threshold pattern, self-scaling at
    // any corpus size (a fixed fraction goes empty as parts multiply).
    // ONE pass over the fact: the per-nation total/count re-aggregate
    // the per-(nation, part) aggregate (sum of sums is exact in
    // DECIMAL), so the lineitem scan + its exchange are computed once
    // and the 25-row threshold side broadcasts back. The membership
    // test cross-multiplies (value·np·2 > tv·3) so it stays exact
    // integer/DECIMAL arithmetic — no float ULP call, no
    // engine-specific decimal division. Supplier⋈nation is broadcast.
    "q54_important_parts" -> ((s, d) => {
      val sup = supplier(s, d)
        .join(broadcast(nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val perPart = lineitem(s, d)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name"), col("l_partkey"))
        .agg(sum((col("l_extendedprice") * col("l_quantity"))
          .cast("decimal(24,6)")).as("value"))
      val thresholds = perPart.groupBy(col("n_name"))
        .agg(sum(col("value")).as("tv"), count(lit(1)).as("np"))
      perPart.join(broadcast(thresholds), Seq("n_name"))
        .filter(col("value") * col("np") * 2 > col("tv") * 3)
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_important"),
          sum(col("value")).cast("double").as("important_value"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_quantity > 45 AND l_discount >= 0.05""",
    "q03_revenue_topn" ->
      """SELECT o_orderkey,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-07-01'
           AND l_shipdate > TIMESTAMP '1998-07-01'
         GROUP BY o_orderkey
         ORDER BY revenue DESC, o_orderkey ASC
         LIMIT 10""",
    "q04_region_enrich" ->
      """SELECT r_name, COUNT(*) AS n_customers,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "q05_priority_semi" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_discount > 0.06)
         GROUP BY o_orderpriority""",
    "q06_customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 400000)""",
    "q07_top_orders_per_cust" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) t WHERE rn <= 3""",
    "q08_running_totals" ->
      """SELECT o_custkey, o_orderkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
         FROM orders""",
    "q09_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS n_rows
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q10_cube_status_priority" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q11_distinct_customers" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
         COUNT(*) AS n_orders FROM orders GROUP BY o_orderstatus""",
    "q12_union_parties" ->
      """SELECT kind, COUNT(*) AS n,
         CAST(SUM(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
         FROM (SELECT 'customer' AS kind, c_acctbal AS acctbal FROM customer
               UNION ALL
               SELECT 'supplier' AS kind, s_acctbal AS acctbal FROM supplier) u
         GROUP BY kind""",
    "q13_priority_case" ->
      """SELECT l_returnflag,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY l_returnflag""",
    "q14_monthly_orders" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY 1""",
    "q15_part_strings" ->
      """SELECT p_partkey, UPPER(p_brand) AS brand_u, LENGTH(p_name) AS name_len,
         SUBSTRING(p_type, 1, 6) AS type_prefix
         FROM part WHERE p_size BETWEEN 10 AND 20 AND p_name LIKE '%red%'""",
    "q16_returned_mid_qty" ->
      """SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM lineitem
         WHERE l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 20
         GROUP BY l_returnflag""",
    "q17_below_half_avg" ->
      """SELECT COUNT(*) AS n_small,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM lineitem l JOIN (
           SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
           FROM lineitem GROUP BY l_partkey) a ON l.l_partkey = a.pk
         WHERE l.l_quantity < 0.5 * a.avg_qty""",
    "q18_extremes_per_nation" ->
      """SELECT c_nationkey, MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
         COUNT(*) AS n FROM customer GROUP BY c_nationkey""",
    "q19_pivot_status" ->
      """SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
         CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
         FROM orders GROUP BY o_orderpriority""",
    "q20_arg_extremes" ->
      """SELECT o_custkey,
         max_by(o_totalprice, o_orderkey) AS latest_price,
         min_by(o_totalprice, o_orderkey) AS first_price,
         COUNT(*) AS n
         FROM orders GROUP BY o_custkey""",
    "q21_nations_per_region" ->
      """SELECT r_name,
         string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "q22_quantiles" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
         round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
         FROM lineitem GROUP BY l_returnflag""",
    "q24_having_hot_parts" ->
      """SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS n
         FROM lineitem GROUP BY l_partkey
         HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150.0""",
    "q25_null_handling" ->
      """SELECT l_returnflag,
         COUNT(nullif(l_discount, 0.0)) AS n_discounted,
         COUNT(*) AS n_total,
         CAST(SUM(CAST(coalesce(nullif(l_discount, 0.0), -1.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_with_sentinel
         FROM lineitem GROUP BY l_returnflag""",
    "q26_regexp_extract" ->
      """SELECT regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
         COUNT(*) AS n_parts
         FROM part GROUP BY 1""",
    "q27_sql_surface" ->
      """WITH big AS (
           SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
           FROM orders GROUP BY o_custkey)
         SELECT c_mktsegment, COUNT(*) AS n_big_spenders
         FROM customer JOIN big ON c_custkey = o_custkey
         WHERE spend > 3000000
         GROUP BY c_mktsegment""",
    "q43_sql_views" ->
      """SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE l_shipdate >= '1997-01-01'
         GROUP BY n_name""",
    "q28_range_frame" ->
      """SELECT o_custkey, o_orderkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400
           RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS spend_90d
         FROM orders""",
    "q29_posexplode" ->
      """WITH w AS (
           SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part
         ), x AS (
           SELECT p_partkey, CAST(i - 1 AS INTEGER) AS pos,
             ws[CAST(i AS INTEGER)] AS word
           FROM w, UNNEST(range(1, len(ws) + 1)) AS t(i)
         )
         SELECT pos, word, COUNT(*) AS n_parts
         FROM x WHERE pos < 2 GROUP BY 1, 2""",
    "q30_distribution_windows" ->
      """SELECT c_nationkey, c_custkey,
         CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
         CAST(ROW_NUMBER() OVER w - 1 AS DOUBLE)
           / (COUNT(*) OVER wp - 1) AS pct_rank,
         CAST(ROW_NUMBER() OVER w AS DOUBLE)
           / COUNT(*) OVER wp AS cume
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey
           ORDER BY c_acctbal ASC, c_custkey ASC),
         wp AS (PARTITION BY c_nationkey)""",
    "q31_local_supplier_volume" ->
      """SELECT n_name,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(24,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
           AND o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate < TIMESTAMP '1996-01-01'
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
           AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name""",
    "q32_returned_item" ->
      """SELECT c_custkey, c_name, n_name,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(24,6))) AS DOUBLE) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
           AND o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate < TIMESTAMP '1995-04-01'
         JOIN lineitem ON o_orderkey = l_orderkey AND l_returnflag = 'R'
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",
    "q33_priority_lines" ->
      """SELECT l_returnflag,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY l_returnflag""",
    "q34_disjunctive_ranges" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11
             AND p_size BETWEEN 1 AND 5)
            OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 10 AND 20
             AND p_size BETWEEN 1 AND 10)
            OR (p_brand = 'Brand#20' AND l_quantity BETWEEN 20 AND 30
             AND p_size BETWEEN 1 AND 15)""",
    "q35_supplier_part_counts" ->
      """SELECT p_brand, p_type, p_size,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         WHERE p_type NOT LIKE 'PROMO%'
           AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
           AND l_suppkey NOT IN (
             SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY p_brand, p_type, p_size""",
    "q36_wealthy_inactive" ->
      """WITH ab AS (
           SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_bal
           FROM customer WHERE c_acctbal > 0
         )
         SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
         FROM customer, ab
         WHERE c_acctbal > ab.avg_bal
           AND c_custkey NOT IN (
             SELECT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1995-01-01'
               AND o_orderdate < TIMESTAMP '1995-04-01')
         GROUP BY c_nationkey""",
    "q37_correlated_subquery" ->
      """SELECT p.p_partkey, p.p_brand, p.p_retailprice
         FROM part p
         WHERE p.p_retailprice > (
           SELECT 1.05 * CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(18,2)))
             AS DOUBLE) / COUNT(*)
           FROM part p2 WHERE p2.p_brand = p.p_brand)""",
    "q38_lateral_topn" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
         FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey ASC
                  LIMIT 2) o""",
    "q39_large_volume_orders" ->
      """WITH big AS (
           SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
           FROM lineitem GROUP BY l_orderkey
           HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 180
         )
         SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN big ON o_orderkey = l_orderkey""",
    "q40_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(SUM(CAST(CASE WHEN ns.n_name = 'NATION_2'
             THEN l_extendedprice * (1.0 - l_discount) ELSE 0 END
           AS DECIMAL(24,6))) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(24,6))) AS DOUBLE) AS mkt_share
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation nc ON c_nationkey = nc.n_nationkey
         JOIN region ON nc.n_regionkey = r_regionkey AND r_name = 'ASIA'
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ns ON s_nationkey = ns.n_nationkey
         GROUP BY 1""",
    "q41_volume_shipping" ->
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(24,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation nc ON c_nationkey = nc.n_nationkey
         JOIN nation ns ON s_nationkey = ns.n_nationkey
         WHERE (ns.n_name = 'NATION_18' AND nc.n_name = 'NATION_19')
            OR (ns.n_name = 'NATION_19' AND nc.n_name = 'NATION_18')
         GROUP BY 1, 2, 3""",
    "q42_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""",
    "q23_churned_1996" ->
      """SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
         EXCEPT
         SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'""",
    "q45_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
           SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
           FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
           GROUP BY c.c_custkey) t
         GROUP BY c_count""",
    // stated as the correlated double-EXISTS Q21 form — DuckDB
    // decorrelates it its own way; the Spark gate's aggregation-based
    // decorrelation must agree row-for-row
    "q44_waiting_suppliers" ->
      """SELECT s_name, COUNT(*) AS numwait
         FROM supplier, lineitem l1, orders
         WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
           AND o_orderstatus = 'F'
           AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""",
    // stated as the classic correlated "= (SELECT MIN …)" Q2 form;
    // DuckDB decorrelates it its own way and must agree with the Spark
    // gate's aggregation-based decorrelation row-for-row
    "q46_min_cost_supplier" ->
      """WITH eu AS (
           SELECT s_suppkey, s_name, n_name
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE'
         ), cost AS (
           SELECT l_partkey, s_suppkey, s_name, n_name,
                  MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
           FROM lineitem JOIN eu ON l_suppkey = s_suppkey
           GROUP BY 1, 2, 3, 4
         )
         SELECT p_partkey, p_name, s_name, n_name,
                CAST(supply_cost AS DOUBLE) AS supply_cost
         FROM cost JOIN part ON l_partkey = p_partkey
         WHERE p_brand = 'Brand#1'
           AND supply_cost = (SELECT MIN(c2.supply_cost) FROM cost c2
                              WHERE c2.l_partkey = cost.l_partkey)""",
    "q47_global_sales_opportunity" ->
      """WITH cust AS (
           SELECT c_custkey, n_name,
                  CAST(c_acctbal AS DECIMAL(18,2)) AS bal
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           WHERE substr(n_name, 8) IN ('1', '5', '9', '13', '17', '21')
         ), stats AS (
           SELECT SUM(bal) AS sum_bal, COUNT(*) AS n_pos
           FROM cust WHERE bal > 0
         )
         SELECT n_name, COUNT(*) AS numcust,
                CAST(SUM(bal) AS DOUBLE) AS totacctbal
         FROM cust, stats
         WHERE bal * n_pos > sum_bal
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= '2000-06-01')
         GROUP BY n_name""",
    "q48_small_quantity_revenue" ->
      """WITH cand AS (
           SELECT l_partkey, CAST(l_quantity AS DECIMAL(18,2)) AS q,
                  l_extendedprice
           FROM lineitem JOIN part ON p_partkey = l_partkey
           WHERE p_brand = 'Brand#1' AND p_type = 'ECONOMY'
         ), per_part AS (
           SELECT l_partkey AS pk, SUM(q) AS sumq, COUNT(*) AS cnt
           FROM cand GROUP BY 1
         )
         SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS DOUBLE) / 7.0 AS avg_yearly
         FROM cand JOIN per_part ON l_partkey = pk
         WHERE q * 5 * cnt < sumq""",
    "q49_excess_share_suppliers" ->
      """WITH sp AS (
           SELECT l_suppkey, l_partkey,
                  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
           FROM lineitem JOIN part ON p_partkey = l_partkey
           WHERE p_type = 'PROMO'
           GROUP BY 1, 2
         ), tot AS (
           SELECT l_partkey AS pk, SUM(sq) AS tq FROM sp GROUP BY 1
         )
         SELECT s_name, COUNT(*) AS n_parts
         FROM sp JOIN tot ON l_partkey = pk
         JOIN supplier ON s_suppkey = l_suppkey
         WHERE sq * 10 > tq
         GROUP BY s_name""",
    "q50_profit_by_nation" ->
      """SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           - p_retailprice * 0.8 * l_quantity AS DECIMAL(24,6)))
           AS DOUBLE) AS profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         GROUP BY n_name, o_year""",
    "q51_promo_revenue" ->
      """WITH agg AS (
           SELECT
             SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1.0 - l_discount)
                      AS DECIMAL(24,6))
                 ELSE CAST(0 AS DECIMAL(24,6)) END) AS promo,
             SUM(CAST(l_extendedprice * (1.0 - l_discount)
                 AS DECIMAL(24,6))) AS total
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1997-03-01'
             AND l_shipdate < TIMESTAMP '1997-04-01'
         )
         SELECT CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) * 100.0
                  AS promo_share,
                CAST(promo AS DOUBLE) AS promo_revenue,
                CAST(total AS DOUBLE) AS total_revenue
         FROM agg""",
    "q52_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
                  SUM(CAST(l_extendedprice * (1.0 - l_discount)
                    AS DECIMAL(24,6))) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey
         )
         SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
         FROM rev JOIN supplier ON s_suppkey = l_suppkey
         WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)""",
    "q53_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount
                  AS DECIMAL(24,6))) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24""",
    "q54_important_parts" ->
      """WITH pp AS (
           SELECT n_name, l_partkey,
             SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(24,6)))
               AS value
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           GROUP BY 1, 2
         ), thr AS (
           SELECT n_name, SUM(value) AS tv, COUNT(*) AS np
           FROM pp GROUP BY 1
         )
         SELECT n_name, COUNT(*) AS n_important,
           CAST(SUM(value) AS DOUBLE) AS important_value
         FROM pp JOIN thr USING (n_name)
         WHERE value * np * 2 > tv * 3
         GROUP BY n_name"""
  )
}
