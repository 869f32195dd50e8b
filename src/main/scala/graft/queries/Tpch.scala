package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H-style analytical queries adapted to the driver testdata schema
  * (FIXTURES.md §B — no partsupp/comment/shipmode columns, so some
  * predicates are adapted). This is the "Layer B" query surface the
  * reference exercises through DataFusion (reference:
  * benchmark/src/tpch.rs:67-143, tests/sqllogictests/sql/tpch/) and that
  * Spark answers with built-in operators.
  *
  * Conventions for DuckDB-oracle hash parity:
  *  - every aggregated double is `round(..., n)` identically on both sides
  *    (sums/avgs of doubles differ across engines only in ULPs;
  *    rounding absorbs that);
  *  - every result has a total, deterministic ORDER BY (no nullable keys
  *    unless NULLS FIRST is given explicitly — Spark ASC = nulls first,
  *    DuckDB default = nulls last);
  *  - int aggregates are cast to BIGINT in the oracle (DuckDB SUM(int)
  *    yields HUGEINT);
  *  - top-k cuts order by the *rounded* measure plus a unique key so the
  *    cut is identical on both engines.
  */
object Tpch {
  import Tables.t

  private def rev: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Q20 shape with a parameterized HAVING threshold. The gate uses the
    * canonical `qty > 50`; ScaleBench times `50 × replicas` on its
    * replicated corpus so the semi join stays selective there (at 10×
    * every supplier's replicated sum clears 50, which would make the
    * timed shape semi-vacuous — r10 verdict finding 5).
    */
  def q20Frame(s: SparkSession, dir: String, qtyThreshold: Long): DataFrame = {
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01")
    val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val bigShippers = l.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey").as("bs_key"))
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > qtyThreshold)
    su.join(bigShippers, col("s_suppkey") === col("bs_key"), "left_semi")
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  /** Each entry: (name, DataFrame builder, DuckDB oracle SQL). */
  val defs: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    ("q01_pricing_summary", (s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= "2000-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(rev), 2).as("sum_disc_price"),
          round(sum(rev * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }, """
      SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_base_price,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        round(avg(l_quantity), 4) AS avg_qty,
        round(avg(l_extendedprice), 4) AS avg_price,
        round(avg(l_discount), 4) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """),

    ("q03_shipping_priority", (s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < "1998-01-01")
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > "1998-01-01")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(sum(rev), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }, """
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate  > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10
    """),

    ("q04_order_priority", (s: SparkSession, dir: String) => {
      // (r14 no-win note, interleaved AbBench at 10×: rewriting the
      // EXISTS as inner-join + DISTINCT orderkeys — hoping the ~160k-row
      // filtered-orders projection would broadcast and drop the 6M-row
      // lineitem shuffle — measured SLOWER, min 0.775 → 0.830 s: Spark's
      // string-pessimistic size estimate puts the 3-column projection
      // over the 4 MB threshold, so it pays the same SMJ plus an extra
      // distinct exchange. The pre-aggregate rewrite was re-measured at
      // 100× by Probe100x — see bench/probe_100x.json ab_sec.)
      // IMPLIED l_shipdate BOUND (r16): the semi condition
      // `l_shipdate > o_orderdate + 30d` with `o_orderdate >= 1997-01-01`
      // implies `l_shipdate > 1997-01-31` — a constant bound Catalyst
      // cannot derive across the non-equi join condition, pushed here by
      // hand so it reaches the parquet scan (PushedFilters) and prunes
      // ~79% of lineitem BEFORE the semi join's shuffle (guide §2.3).
      // The bloom route is structurally closed for this shape:
      // InjectRuntimeFilter has canPruneRight(LeftSemi)=false, and the
      // inner rewrite's creation side (orders, filter-blind estimate
      // 274 MB at 100×) busts the honest 64m creation cap. Interleaved
      // AbBench: 100× min 3.26→2.53 s (−22%), 10× min 0.79→0.73 s
      // (−8%). Scale-safe: the bound derives from the query literals,
      // independent of data size. Equivalence: any line with
      // l_shipdate ≤ min(o_orderdate)+30d cannot satisfy the condition
      // (VariantEquivalenceSpec pins the unbounded shape's rows).
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= "1997-01-01" && col("o_orderdate") < "1997-10-01")
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > "1997-01-31")
      o.join(l,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }, """
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1997-10-01'
        AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """),

    ("q05_local_supplier_volume", (s: SparkSession, dir: String) => {
      // DIMENSION-FIRST join order (r16, from the banked q05 stage
      // audit — q05 was the worst 100× shape at 7.17× DuckDB): the
      // literal order joined the UNFILTERED customer table into orders
      // before lineitem, and the ASIA predicate only landed after the
      // fact join, so stage-82 shuffled the full 2640 MB lineitem
      // against a full-orders build side. Restricting customers to ASIA
      // nations FIRST (broadcast nation⋈region) is semantics-preserving
      // — the join requires c_nationkey = s_nationkey, so constraining
      // the customer side constrains the supplier side identically —
      // and cuts the orders join output ~5× before the fact join.
      // n_name rides the customer side (equal keys ⇒ equal names);
      // supplier still joins by (suppkey, nationkey). Interleaved
      // AbBench at 100×: min 4.17→3.96 / 3.66→2.85 / (3rd window in
      // OPTIMIZATION_r16.md) — both clean windows a win, −5..−22%; at
      // 10× one extra stage constant (min 1.15→1.23 s, +7%), the q08
      // adoption trade. The orders-side runtime bloom stays self-
      // disabled either way (creation side over the honest 64m cap).
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val asiaNations = t(s, dir, "nation")
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val c = t(s, dir, "customer")
        .join(asiaNations, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= "1997-01-01" && col("o_orderdate") < "1998-01-01")
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"), col("n_name"))
      t(s, dir, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(rev), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }, """
      SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name
    """),

    ("q06_forecast_revenue", (s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01" &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    }, """
      SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07
        AND l_quantity < 24
    """),

    ("q07_volume_shipping", (s: SparkSession, dir: String) => {
      val su = t(s, dir, "supplier")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1998-01-01")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n1 = t(s, dir, "nation").select(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(
        col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      su.join(l, col("s_suppkey") === col("l_suppkey"))
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("c_custkey") === col("o_custkey"))
        .join(n1, col("s_nationkey") === col("sn_key"))
        .join(n2, col("c_nationkey") === col("cn_key"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(rev), 2).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }, """
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l_shipdate) AS INT) AS l_year,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3
    """),

    ("q08_market_share", (s: SparkSession, dir: String) => {
      // DIMENSION-FIRST join order (r16, r15 verdict task 1 — q08 was
      // the worst 100× shape at 12.61× DuckDB): the AMERICA-filtered
      // customers reduce ORDERS before the lineitem join, so the fact
      // join's build side is ~(2/7 years × 1/5 regions) of orders
      // instead of 100% — Catalyst keeps the written order without CBO
      // stats, and the old literal order (lineitem⋈orders SMJ FIRST,
      // region filter last) shuffled the full fact pair. Interleaved
      // AbBench on the replica corpora: 100× min 5.22→3.77 s (−28%, avg
      // 9.24→4.47 and σ 3.3→0.8 — the fact-first plan was
      // spill-marginal), at the cost of one extra stage constant at 10×
      // (min 1.00→1.33 s). Adopted for the scale this engine targets;
      // the rejected fact-first shape is kept as AbBench's
      // "q08_fact_first" variant with the Probe100x ab_sec evidence.
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      val n1 = t(s, dir, "nation").select(
        col("n_nationkey").as("cn_key"), col("n_regionkey").as("c_region"))
      val r = t(s, dir, "region").filter(col("r_name") === "AMERICA")
      val n2 = t(s, dir, "nation").select(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val amCust = t(s, dir, "customer")
        .join(n1, col("c_nationkey") === col("cn_key"))
        .join(r, col("c_region") === col("r_regionkey"))
        .select(col("c_custkey"))
      val amOrders = t(s, dir, "orders")
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01")
        .join(amCust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"))
      l.join(amOrders, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(n2, col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", rev).otherwise(lit(0.0))) / sum(rev),
          6).as("mkt_share"))
        .orderBy("o_year")
    }, """
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        round(sum(CASE WHEN n2.n_name = 'NATION_3'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
              / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1
      ORDER BY 1
    """),

    ("q09_product_profit", (s: SparkSession, dir: String) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part").filter(col("p_name").contains("red"))
      val su = t(s, dir, "supplier")
      val o = t(s, dir, "orders")
      val n = t(s, dir, "nation")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(round(sum(rev), 2).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }, """
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
      GROUP BY 1, 2
      ORDER BY 1, 2 DESC
    """),

    ("q10_returned_items", (s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= "1997-01-01" && col("o_orderdate") < "1997-07-01")
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = t(s, dir, "nation")
      // aggregate below the customer join: per-custkey revenue from the
      // (orders ⋈ lineitem) fact side first — the grouping key set
      // (c_custkey, c_name, c_acctbal, n_name) is functionally custkey
      // alone, so hauling the wide customer attributes through the fact
      // shuffle AND the aggregation hash table only inflates both; the
      // post-agg join carries |customers| narrow rows
      val perCust = o.join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(round(sum(rev), 2).as("revenue"))
      c.join(perCust, col("c_custkey") === col("o_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }, """
      SELECT c_custkey, c_name, c_acctbal, n_name,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1997-07-01'
        AND l_returnflag = 'R'
      GROUP BY 1, 2, 3, 4
      ORDER BY revenue DESC, c_custkey
      LIMIT 20
    """),

    ("q11_important_parts", (s: SparkSession, dir: String) => {
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation").filter(col("n_name") === "NATION_5")
      val joined = l
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
      val perPart = joined.groupBy("l_partkey")
        .agg(sum(col("l_extendedprice")).as("value_raw"))
      // ONE fact pass (r17): the HAVING threshold derives FROM the
      // per-part aggregate — sum of per-part sums — instead of a second
      // aggregation over the same joined subtree. The two consumers now
      // share the IDENTICAL partkey-exchange subtree, which AQE stage
      // reuse dedupes at runtime (StageAudit at 100×: two fact passes
      // cpu 7.4+11.2 s → one pass 12.1 s + three cheap reads of the
      // reused 82 MB exchange; wall −16%, cpu −23%; interleaved AbBench
      // 100× min 1.371→1.186). 10× pays a ~0.04 s stage constant —
      // the same trade as the q05/q08 adoptions. The threshold's float
      // summation ORDER changes (per-part partials vs one row stream);
      // equivalence is pinned by VariantEquivalenceSpec (q11_twopass)
      // and the oracle hash gates — no part sits within float noise of
      // the 0.1% boundary at any checked SF.
      val total = perPart.agg((sum(col("value_raw")) * lit(0.001)).as("threshold"))
      perPart.crossJoin(total)
        .filter(col("value_raw") > col("threshold"))
        .select(col("l_partkey"), round(col("value_raw"), 2).as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    }, """
      SELECT l_partkey, round(sum(l_extendedprice), 2) AS part_value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_5'
      GROUP BY l_partkey
      HAVING sum(l_extendedprice) > (
        SELECT sum(l_extendedprice) * 0.001
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5')
      ORDER BY part_value DESC, l_partkey
    """),

    ("q12_late_shipping", (s: SparkSession, dir: String) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01")
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    }, """
      SELECT l_linestatus,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      GROUP BY l_linestatus
      ORDER BY l_linestatus
    """),

    ("q13_customer_distribution", (s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") =!= "5-LOW")
      // aggregate BELOW the join (Catalyst doesn't push aggregates
      // through joins itself): per-custkey order counts first — one
      // map-side-combined shuffle of orders collapsing to ≤|customer|
      // rows — then a left join against customer, which AQE can
      // broadcast. The textbook join-then-groupBy shape shuffles the
      // full orders table into the join AND re-shuffles the joined rows
      // for the per-custkey count; the LEFT JOIN count(o_orderkey)
      // semantics (customers with no orders count 0) survive as
      // coalesce(cnt, 0)
      // (r13 A/B note: a join-free rewrite — zero bucket via |customer| −
      // |distinct custkeys in oc| count arithmetic — measured SLOWER,
      // 0.39 → 0.44 s at 10×: the extra tiny count jobs cost more
      // per-stage overhead than the AQE-broadcast customer join saves)
      val oc = o.groupBy(col("o_custkey")).agg(count(lit(1)).as("__oc"))
      c.join(oc, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("__oc"), lit(0L)).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }, """
      SELECT c_count, count(*) AS custdist
      FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC
    """),

    ("q14_promo_effect", (s: SparkSession, dir: String) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1997-06-01" && col("l_shipdate") < "1997-07-01")
      val p = t(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(round(
          lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) / sum(rev),
          6).as("promo_revenue"))
    }, """
      SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                   / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-06-01'
        AND l_shipdate <  TIMESTAMP '1997-07-01'
    """),

    ("q15_top_supplier", (s: SparkSession, dir: String) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1997-04-01")
      val su = t(s, dir, "supplier")
      // (r13 A/B note: cutting top-5 BEFORE the supplier join measured
      // SLOWER, 0.23 → 0.31 s at 10× — the early limit adds a stage,
      // and one extra stage outweighs probing 5 vs 100k broadcast rows)
      l.groupBy("l_suppkey")
        .agg(round(sum(rev), 2).as("total_revenue"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy(col("total_revenue").desc, col("s_suppkey"))
        .limit(5)
    }, """
      SELECT s_suppkey, s_name, total_revenue
      FROM (
        SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
      JOIN supplier ON l_suppkey = s_suppkey
      ORDER BY total_revenue DESC, s_suppkey
      LIMIT 5
    """),

    // Measured-and-REJECTED (r16): distinct (l_partkey, l_suppkey) BELOW
    // the part join (legal — p_brand/p_size are functional in p_partkey,
    // so pair duplicates can't change the count distinct). The map-side
    // partial distinct shrinks the fact exchange ~7× (≈4 suppliers vs
    // ≈30 lines per part), but the runtime bloom has already cut that
    // exchange 1680→164 MB, and the extra 6M-row hash aggregate + extra
    // exchange + AQE stage cost more than the bytes saved: interleaved
    // AbBench 100× min 2.30 vs 2.79 / 2.04 vs 2.49 (two windows), 10×
    // min 0.595 vs 1.024 (−42%, uniform across 7 iters). Kept as
    // AbBench.q16_predistinct; plan in plans/r16/q16_predistinct_rejected.txt.
    // On a network-shuffle cluster the trade could invert — re-measure
    // there before re-adopting.
    ("q16_supplier_part_cnt", (s: SparkSession, dir: String) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part").filter(col("p_size").isin(1, 5, 9, 15, 20))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    }, """
      SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_size IN (1, 5, 9, 15, 20)
      GROUP BY p_brand, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_size
    """),

    ("q17_small_quantity", (s: SparkSession, dir: String) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part").filter(col("p_brand") === "Brand#23")
      val avgQty = t(s, dir, "lineitem").groupBy(col("l_partkey").as("ap_key"))
        .agg((lit(0.5) * avg(col("l_quantity"))).as("half_avg_qty"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(avgQty, col("l_partkey") === col("ap_key"))
        .filter(col("l_quantity") < col("half_avg_qty"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    }, """
      SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN (SELECT l_partkey AS ap_key, 0.5 * avg(l_quantity) AS half_avg_qty
            FROM lineitem GROUP BY l_partkey) a ON l_partkey = ap_key
      WHERE p_brand = 'Brand#23'
        AND l_quantity < half_avg_qty
    """),

    ("q18_large_orders", (s: SparkSession, dir: String) => {
      // PRE-SHUFFLED aggregation (r16, r15 verdict task 1): the 100×
      // StageAudit caught the naive groupBy's PARTIAL phase spilling
      // 7.8 GB at 60M rows — l_orderkey is near-unique per map task
      // (~4 lines per key scattered over 32+ tasks), so the partial
      // hash table held ~1.9M entries/task, fell back to sort, and the
      // shuffle still carried ~one row per input row. Repartitioning
      // the 2-column projection by key FIRST runs both agg phases
      // post-shuffle (EnsureRequirements drops the agg exchange): each
      // partition owns its keys completely, the table is bounded by
      // |keys|/shuffle-partitions, nothing spills. Measured at 100×:
      // min 7.89→5.45 s interleaved, stage spill 7782→0 MB, total CPU
      // 158→84 s; neutral at 10× (0.79 vs 0.83 min). Scale-safe: the
      // expression-only repartition leaves AQE free to size the
      // partition count, and partial agg reduced nothing at ANY scale
      // for this key distribution.
      val l = t(s, dir, "lineitem")
      val bigOrders = l
        .select(col("l_orderkey"), col("l_quantity"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey").as("bo_key"))
        .agg(sum(col("l_quantity")).as("sum_qty_raw"))
        .filter(col("sum_qty_raw") > 180)
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(bigOrders, col("o_orderkey") === col("bo_key"))
        .join(c, col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          round(col("sum_qty_raw"), 2).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }, """
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      FROM orders
      JOIN (SELECT l_orderkey AS bo_key, round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(l_quantity) > 180) b ON o_orderkey = bo_key
      JOIN customer ON c_custkey = o_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 20
    """),

    ("q19_discounted_revenue", (s: SparkSession, dir: String) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(round(sum(rev), 2).as("revenue"))
    }, """
      SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """),

    ("q20_promo_suppliers", (s: SparkSession, dir: String) =>
      q20Frame(s, dir, 50L), """
      SELECT s_suppkey, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 50)
      ORDER BY s_suppkey
    """),

    ("q22_inactive_customers", (s: SparkSession, dir: String) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderdate") >= "2000-01-01")
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))
      // (r14 no-win note, interleaved AbBench at 10×, 9 iterations:
      // computing the scalar subquery eagerly into a literal — pushing
      // the c_acctbal predicate into the customer scan instead of the
      // 1-row broadcast nested loop — measured NEUTRAL, min 0.554 vs
      // 0.559 s, avg 0.651 vs 0.653: the one-row BNLJ is free and
      // c_acctbal carries no file-level clustering for min/max skipping
      // to exploit. Kept the lazy crossJoin form — no eager job at
      // frame-construction time.)
      // (r13 no-win note, measured interleaved-A/B at 10×: anti-joining
      // DISTINCT active custkeys — hoping AQE would see the ≤1 MB key
      // set and convert the SMJ anti to broadcast — was NEUTRAL, min
      // 0.457 vs 0.478 s: the distinct's own final aggregate sits
      // between the shuffle stage and the join, so AQE never sees
      // broadcastable stage stats, and the added distinct pass cancels
      // the smaller sort. The residual vs DuckDB here is per-row
      // scan/shuffle CPU across ~0.66M rows + 7 stage launches, not a
      // plan defect; a forced broadcast hint is rejected — at 100 TB
      // the qualifying-custkey set is unbounded.)
      c.crossJoin(avgBal)
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"), round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy("c_nationkey")
    }, """
      SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
      GROUP BY c_nationkey
      ORDER BY c_nationkey
    """),

    ("q21_waiting_suppliers", (s: SparkSession, dir: String) => {
      // suppliers with a late line on an order where no OTHER supplier
      // was late (q21 shape: join + EXISTS + NOT EXISTS). The NOT
      // EXISTS over the same late-lines derivation is NOT executed as a
      // self-anti-join (that computes the lineitem ⋈ orders late set
      // TWICE and shuffles it twice by orderkey — the r12 verdict's q21
      // audit); "no other late supplier on this order" is equivalently
      // "this order has exactly ONE distinct late supplier", which one
      // (orderkey, suppkey) pre-aggregate plus one orderkey aggregate
      // compute from a SINGLE pass over the late set. numwait = the
      // solo supplier's late-line count on such orders, summed —
      // identical to counting the surviving join rows. The
      // supplier/nation dimension filter commutes past the per-order
      // logic (it references only the supplier key), so it applies as a
      // broadcast join on the tiny aggregated result instead of
      // inflating the fact-side rows.
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation").filter(col("n_name").isin("NATION_1", "NATION_2"))
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val late = t(s, dir, "lineitem").join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey").as("lk"), col("l_suppkey").as("sk"))
      val perOrderSupp = late.groupBy("lk", "sk")
        .agg(count(lit(1)).as("late_lines"))
      val soloLate = perOrderSupp.groupBy("lk")
        .agg(count(lit(1)).as("nsupp"), min(col("sk")).as("solo_sk"),
          sum(col("late_lines")).as("solo_lines"))
        .filter(col("nsupp") === 1) // min(sk)/sum(lines) = THE supplier's
      val numwait = soloLate.groupBy(col("solo_sk"))
        .agg(sum(col("solo_lines")).as("numwait"))
      su.join(n, col("s_nationkey") === col("n_nationkey"))
        .join(numwait, col("s_suppkey") === col("solo_sk"))
        .select(col("s_name"), col("s_suppkey"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(20)
    }, """
      SELECT s_name, s_suppkey, count(*) AS numwait
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN (SELECT l_orderkey AS lk, l_suppkey AS sk
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY) late
        ON s_suppkey = sk
      WHERE n_name IN ('NATION_1', 'NATION_2')
        AND NOT EXISTS (
          SELECT 1
          FROM lineitem l2 JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey
          WHERE l2.l_orderkey = lk AND l2.l_suppkey <> sk
            AND o2.o_orderstatus = 'F'
            AND l2.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY)
      GROUP BY s_name, s_suppkey
      ORDER BY numwait DESC, s_suppkey
      LIMIT 20
    """),

    ("q02_min_cost_supplier", (s: SparkSession, dir: String) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part").filter(col("p_size").isin(3, 7))
      val su = t(s, dir, "supplier")
      val cost = l.join(p, col("l_partkey") === col("p_partkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .groupBy("p_brand", "p_size", "s_suppkey", "s_name")
        .agg(round(sum(col("l_extendedprice")), 2).as("total_cost"))
      val w = Window.partitionBy("p_brand", "p_size")
        .orderBy(col("total_cost").asc, col("s_suppkey").asc)
      cost.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("p_brand", "p_size", "s_suppkey", "s_name", "total_cost")
        .orderBy("p_brand", "p_size")
    }, """
      SELECT p_brand, p_size, s_suppkey, s_name, total_cost
      FROM (
        SELECT p_brand, p_size, s_suppkey, s_name,
          round(sum(l_extendedprice), 2) AS total_cost,
          row_number() OVER (PARTITION BY p_brand, p_size
                             ORDER BY round(sum(l_extendedprice), 2) ASC, s_suppkey ASC) AS rn
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE p_size IN (3, 7)
        GROUP BY p_brand, p_size, s_suppkey, s_name)
      WHERE rn = 1
      ORDER BY p_brand, p_size
    """)
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, f, _) => n -> f }.toMap

  val oracle: Map[String, String] =
    defs.map { case (n, _, o) => n -> o.stripMargin.trim.replaceAll("\\s+", " ") }.toMap
}
