package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational operator surface over the TESTDATA star schema: projections,
  * aggregations, joins (broadcast + shuffle), semi/anti joins, windows,
  * sorts/limits, set ops, histograms.
  *
  * These extend the reference's single-table surface (SURVEY §2.4 notes
  * joins/set-ops are extension, not reference, capabilities) and are designed
  * scale-first:
  *  - Dimension tables (region/nation/supplier/part at TPC-H ratios) are
  *    broadcast explicitly — no shuffle for the big fact side.
  *  - Fact-fact joins (orders⋈lineitem) shuffle on the join key once and let
  *    AQE coalesce/skew-split at runtime.
  *  - Money aggregates go through DECIMAL(18,2) so partial-aggregation order
  *    (which differs run-to-run and engine-to-engine) cannot perturb results:
  *    decimal addition is exact, and the final cast back to double is
  *    deterministic. The raw columns are 2-decimal values stored as double.
  *
  * Every query ends with a deterministic ORDER BY so output is comparable
  * row-for-row against the DuckDB oracle.
  */
object Relational {

  /** Exact money: double → DECIMAL(18,2) (values are 2-decimal by contract). */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact money, fast path: 2-decimal dollars → integer cents. Long sums
    * are exact and order-independent like decimal sums but run as plain
    * 64-bit adds in codegen (no Decimal boxing). round() first — the raw
    * double×100 can sit a hair BELOW the integer (90181.999…) and a bare
    * cast would truncate it wrong.
    */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** TPC-H Q1-shaped pricing summary over lineitem: grouped sums/averages of
    * quantity, base price, discounted price, charge. Group-by is a single
    * hash aggregate with map-side partials; the shuffle carries only
    * |flag×status| rows per partition.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        (sum(cents(col("l_extendedprice"))) / lit(100.0)).as("sum_base_price"),
        // price_cents × (100 - disc_cents) has unit 10⁻⁴ dollars — one long
        // multiply-add per row, summed exactly, scaled once at the end
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          / lit(10000.0)).as("sum_disc_price"),
        (sum(cents(col("l_extendedprice"))) / lit(100.0) / count(lit(1))).as("avg_price"),
        (sum(col("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Top-k orders by total price — Catalyst plans sort+limit as
    * TakeOrderedAndProject (distributed top-k, no global sort).
    */
  def topKOrders(orders: DataFrame, k: Int): DataFrame =
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)

  /** Revenue per nation: fact⋈fact shuffle join (orders⋈lineitem) with
    * broadcast dimensions (customer at sf ratios is small enough locally;
    * nation always is). At 100 TB the fact join shuffles once on orderkey;
    * dims stay broadcast.
    */
  def revenueByNation(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, nation: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))

  /** Customers with at least one order in a status — left SEMI join (EXISTS):
    * no row duplication, the probe side streams, build side is the distinct
    * keys only.
    */
  def customersWithOrders(customer: DataFrame, orders: DataFrame,
                          status: String): DataFrame =
    customer
      .join(orders.filter(col("o_orderstatus") === status), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  /** Customers with NO orders in a status — left ANTI join (NOT EXISTS). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame,
                             status: String): DataFrame =
    customer
      .join(orders.filter(col("o_orderstatus") === status),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Top-n orders per customer by price — ranking window; partition-local
    * sort after one shuffle on the partition key.
    */
  def topOrdersPerCustomer(orders: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** Distinct (brand, type) pairs — hash aggregate, not a global sort. */
  def distinctBrandTypes(part: DataFrame): DataFrame =
    part.select(col("p_brand"), col("p_type")).distinct()
      .orderBy(col("p_brand"), col("p_type"))

  /** Set op: all account-holder keys across customers ∪ suppliers. */
  def unionAccountHolders(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_custkey").as("key"), col("c_acctbal").as("acctbal"))
      .union(supplier.select(col("s_suppkey").cast("bigint").as("key"), col("s_acctbal").as("acctbal")))
      .groupBy(col("key"))
      .agg(sum(dec(col("acctbal"))).cast("double").as("total_bal"),
        count(lit(1)).as("n_accounts"))
      .filter(col("n_accounts") > 1)
      .orderBy(col("key"))

  /** Order-priority cast profile: permissive string→int narrowing (the
    * reference's P6 semantics — dirty values become NULL, counted here).
    */
  def priorityCastProfile(orders: DataFrame): DataFrame =
    orders
      .withColumn("prio_int", substring(col("o_orderpriority"), 1, 1).cast("int"))
      .withColumn("prio_dirty", col("o_orderpriority").cast("int"))
      .groupBy(col("o_orderpriority"), col("prio_int"))
      .agg(count(lit(1)).as("n"),
        count(col("prio_dirty")).as("n_clean_casts"))
      .orderBy(col("o_orderpriority"))

  /** 2-D histogram over lineitem (quantity × price bucket) — the engine-side
    * form of the notebook's driver-side hist2d (SURVEY §2.5 A4).
    */
  def lineitemHistogram2d(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(
        floor(col("l_quantity") / 10).cast("long").as("qty_bin"),
        floor(col("l_extendedprice") / 10000).cast("long").as("price_bin"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("qty_bin"), col("price_bin"))

  /** Filter + projection pushdown showcase: shipped-early high-value lines.
    * Both predicates and the 3-column projection reach the parquet scan
    * (PushedFilters / ReadSchema in explain).
    */
  def highValueEarlyLines(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_extendedprice") > 90000 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Grouped distinct-count + approx distinct side-by-side. */
  def supplierPartStats(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Tumbling 1-hour event aggregation (batch form of the streaming window;
    * date_trunc is the window start).
    */
  def eventsHourly(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** JSON field extraction from the events `props` column (semi-structured
    * surface): parse once per row, group on the extracted value.
    */
  def eventPropsProfile(events: DataFrame): DataFrame =
    events
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("int"))
      // floor, not cast-truncation: DuckDB CAST(double AS INT) rounds while
      // Spark truncates — floor() agrees in both engines
      .groupBy(floor(col("k_val") / 10).cast("int").as("k_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("k_val")).as("k_min"),
        max(col("k_val")).as("k_max"))
      .orderBy(col("k_bucket"))

  /** Calendar decomposition of order dates: year/month/dow grouping. */
  def ordersByCalendar(orders: DataFrame): DataFrame =
    orders
      .groupBy(
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy(col("o_year"), col("o_month"))

  /** ROLLUP aggregation: per (returnflag, linestatus), per returnflag
    * subtotals, and a grand total in one pass (grouping-sets surface).
    */
  def lineitemRollup(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** CUBE: all grouping-set combinations of (returnflag, linestatus). */
  def lineitemCube(lineitem: DataFrame): DataFrame =
    lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Corpus token frequency: explode whitespace tokens, count, top-k with a
    * deterministic tie-break — the word-frequency op of a text pipeline.
    * Scale shape: explode is narrow; the groupBy shuffles (token, partial
    * count) pairs with map-side combine; top-k is TakeOrderedAndProject.
    */
  def tokenFrequency(documents: DataFrame, k: Int): DataFrame =
    documents
      .select(explode(split(trim(col("text")), " +")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Pivot: order counts per (custkey-bucket × orderstatus) — fixed pivot
    * values so the output schema is static and oracle-comparable.
    */
  def ordersStatusPivot(orders: DataFrame): DataFrame =
    orders
      .withColumn("cust_bucket", (col("o_custkey") % 10).cast("int"))
      .groupBy(col("cust_bucket"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("cust_bucket"))

  /** Exact interpolated percentiles of quantity per flag (Spark `percentile`
    * and DuckDB `quantile_cont` share the linear-interpolation definition;
    * exact, not sketch-based, so cross-engine comparable).
    */
  def quantityPercentiles(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        min(col("l_quantity")).as("q_min"),
        max(col("l_quantity")).as("q_max"))
      .orderBy(col("l_returnflag"))

  /** String-function surface: upper/substr/concat/replace/length over part
    * names (SURVEY §2.2 notes the reference has none — extension surface).
    */
  def partNameProfile(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_upper"),
      substring(col("p_type"), 1, 6).as("type_prefix"),
      concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
      regexp_replace(col("p_name"), " ", "_").as("name_snake"),
      length(col("p_name")).as("name_len"))
      .orderBy(col("p_partkey"))

  /** Day-of-week recode pipeline over events — the reference's P3/P4 CASE
    * WHEN surface applied to a derived dow (SURVEY §2.2).
    */
  def eventDowRecode(events: DataFrame): DataFrame = {
    import graft.segmentation.Recode
    events
      .withColumn("dow", (dayofweek(col("ts")) - lit(1)).cast("int"))
      .withColumn("dow_bucket", Recode.dowBucket(col("dow")))
      .withColumn("day_name", Recode.dayName(col("dow")))
      .groupBy(col("dow"), col("dow_bucket"), col("day_name"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("dow"))
  }
}
