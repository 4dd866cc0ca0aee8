package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational/analytic operators over the TPC-H-ish test tables.
  *
  * These fill the aggregation/join/window design space the reference leaves
  * open (SURVEY.md §2.6: the reference's only aggregates are `len(df)`
  * counts — `scripts/etl_pipeline.py:213-217` — and its only join is the
  * tracks⟕audio_features merge at `scripts/transform.py:156`). Each query
  * is declarative DataFrame code so Catalyst applies pushdown, pruning and
  * join selection; small dimension tables are broadcast explicitly so the
  * same plan holds on a 1000-executor cluster (no shuffle of the fact
  * table for dim joins).
  *
  * Every query ends in a total-order `orderBy` so the DuckDB oracle
  * compare is deterministic.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: filter → groupBy → multi-aggregate.
    * Map-side partial aggregation reduces the shuffle to ~|groups| rows per
    * partition; the shipdate filter is pushed to the parquet scan.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(chargeTerm(col("l_extendedprice"), col("l_discount"), col("l_tax")))
          .cast("double").as("sum_charge"),
        moneyAvg(col("l_quantity")).as("avg_qty"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Multi-way star join region→nation→customer→orders→lineitem with
    * revenue per (region, nation). Dimension tables are broadcast (they are
    * KB–MB at any scale factor), so the only shuffle is the final
    * aggregation on (r_name, n_name) — the fact tables join map-side.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables(spark, dir, "region")
    val nation = Tables(spark, dir, "nation")
    val customer = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val lineitem = Tables(spark, dir, "lineitem")

    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy("r_name", "n_name")
  }

  /** Window rank: top-3 orders per customer by totalprice. row_number with
    * an o_orderkey tie-break gives a total order, so results are
    * deterministic. One shuffle on o_custkey; no join needed.
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders
      // cast to long: ROW_NUMBER() is BIGINT in the DuckDB oracle
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  /** ROLLUP over (region, nation): hierarchical subtotals of customer
    * account balance. Spark expands rollup into a single expand+aggregate —
    * one shuffle.
    */
  def rollupAcctbal(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables(spark, dir, "region")
    val nation = Tables(spark, dir, "nation")
    val customer = Tables(spark, dir, "customer")
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "c_acctbal")
      // functions.col, not Dataset.rollup(String*): the latter resolves via
      // the dataset's tagged col() and falsely trips
      // DetectAmbiguousSelfJoin once Expand duplicates the attributes.
      .rollup(col("r_name"), col("n_name"))
      .agg(
        moneySum(col("c_acctbal")).as("sum_acctbal"),
        count(lit(1)).as("n_customers"))
      // Expand duplicates the grouping attributes, so resolve the sort
      // columns against the aggregated dataset explicitly.
      .transform(d => d.orderBy(d("r_name").asc_nulls_first,
        d("n_name").asc_nulls_first))
  }

  /** Graded q74: explicit GROUPING SETS — the general form rollup/cube
    * (q04/q27) are special cases of. The sets here are deliberately
    * NON-HIERARCHICAL (`(flag, status)`, `(status)`, `()` — skipping
    * `(flag)`) so neither rollup nor cube could express them: Catalyst
    * plans one Expand over the scan (rows × |sets|) feeding ONE
    * partial-agg shuffle, the same single-exchange shape as a plain
    * groupBy — multi-granularity reporting without re-scanning per
    * grain, which at 100 TB replaces |sets| separate jobs.
    */
  def groupingSetsLineitem(spark: SparkSession, dir: String): DataFrame = {
    val flag = col("l_returnflag")
    val status = col("l_linestatus")
    Tables(spark, dir, "lineitem")
      .select(flag, status, col("l_quantity"))
      .groupingSets(Seq(Seq(flag, status), Seq(status), Seq()), flag, status)
      .agg(
        count(lit(1)).as("n_rows"),
        moneySum(col("l_quantity")).as("sum_qty"),
        grouping_id().cast("long").as("gid"))
      .transform(d => d.orderBy(d("gid").asc,
        d("l_returnflag").asc_nulls_first, d("l_linestatus").asc_nulls_first))
  }

  /** Graded q77: the correlated-scalar-subquery pattern —
    * `WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer c2 WHERE
    * c2.c_nationkey = c.c_nationkey)` — decorrelated by hand into ONE
    * per-nation aggregate broadcast back onto the customer scan (what
    * Catalyst's RewriteCorrelatedScalarSubquery does mechanically,
    * stated explicitly so the plan is auditable: no per-row subquery, no
    * repeated scan). The average COMPARISON runs as integer
    * cross-multiplication (`cents·n > sum_cents`) instead of dividing —
    * decimal-division scale rules differ across engines, integer
    * products don't (the q60 likelihood-ratio trick).
    */
  def customersAboveNationAvg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        (dec2(col("c_acctbal")) * 100).cast("long").as("cents"))
    val stats = cust.groupBy("c_nationkey")
      .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("n"))
    cust.join(broadcast(stats), "c_nationkey")
      .filter(col("cents") * col("n") > col("sum_cents"))
      .join(broadcast(Tables(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("nation"), col("c_acctbal"))
      .orderBy("c_custkey")
  }

  /** Left-semi join (EXISTS): customers having at least one finished
    * order. Semi joins ship only the join key of the build side — at scale
    * the distinct o_custkey set is tiny vs the orders table.
    */
  def customersWithFinishedOrders(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val finished = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
    customer
      .join(finished, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no urgent-priority
    * orders. (Not "no orders at all" — the generator gives every customer
    * orders, which would make this a vacuous 0-row check.)
    */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val urgent = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    customer
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Global top-k: 10 most expensive orders, deterministic tie-break on
    * orderkey. Spark plans orderBy+limit as TakeOrderedAndProject — each
    * partition keeps only its local top-10, so no full sort/shuffle of the
    * table happens at any scale.
    */
  def topOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
  }

  /** Exact distinct counts per group (partkey/suppkey cardinality per
    * return flag). Spark plans count(distinct x, …) via expand +
    * two-phase aggregation.
    */
  def distinctPartsPerFlag(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** Set operations: (BUILDING-segment ∪ rich) customers minus those with
    * finished orders. UNION/EXCEPT carry distinct semantics in both Spark
    * and ANSI SQL.
    */
  def setOpsCustomers(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val building = customer.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val rich = customer.filter(col("c_acctbal") > 9000).select("c_custkey")
    val finished = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("c_custkey"))
    building.union(rich).except(finished).orderBy("c_custkey")
  }

  /** Window frames: per-customer running spend (unbounded-preceding
    * frame) and 3-order moving average (sliding frame). Frame sums run
    * in exact decimals, so every prefix value is order-independent.
    */
  def customerRunningSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val last3 = w.rowsBetween(-2, Window.currentRow)
    Tables(spark, dir, "orders")
      .withColumn("running_spend",
        sum(dec2(col("o_totalprice"))).over(running).cast("double"))
      .withColumn("avg_last3",
        sum(dec2(col("o_totalprice"))).over(last3).cast("double") /
          count(lit(1)).over(last3))
      .select("o_custkey", "o_orderkey", "o_totalprice", "running_spend",
        "avg_last3")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Exact median order value per priority via two-pass histogram
    * selection (both engines pick the same middle rows deterministically;
    * interpolated quantile functions differ across engines and are
    * avoided).
    *
    * A `Window.partitionBy(o_orderpriority)` rank would funnel the whole
    * orders table through |priorities| = 5 tasks at any scale. Instead:
    * pass 1 builds a per-(priority, price-bucket) histogram — a
    * well-distributed hash aggregation — and locates, per priority, the
    * bucket containing each middle rank via a prefix sum over the TINY
    * histogram (rows ≈ priorities × buckets, independent of data size);
    * pass 2 ranks rows only inside the ≤2 candidate buckets per priority
    * (≈ n/buckets rows each, spread across many tasks by the
    * (priority, bucket) partition key) and picks the located in-bucket
    * ranks. Global order (o_totalprice, o_orderkey) is preserved because
    * buckets partition the price domain.
    */
  def medianOrderValue(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("bucket", floor(col("o_totalprice") / 1000))

    // pass 1: histogram + per-priority totals
    val hist = orders.groupBy("o_orderpriority", "bucket")
      .agg(count(lit(1)).as("cnt"))
    val wb = Window.partitionBy("o_orderpriority").orderBy("bucket")
    val cum = hist.withColumn("cum_before",
      coalesce(sum("cnt").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val totals = orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

    // the two middle ranks per priority (equal when n is odd)
    val targets = totals.select(col("o_orderpriority"), col("n"),
        explode(array(
          struct(lit("lo").as("which"), expr("(n + 1) div 2").as("k")),
          struct(lit("hi").as("which"), expr("n div 2 + 1").as("k")))).as("t"))
      .select(col("o_orderpriority"), col("n"), col("t.which").as("which"),
        col("t.k").as("k"))

    // locate each target rank's bucket and its rank within that bucket
    val located = targets.join(cum, Seq("o_orderpriority"))
      .filter(col("k") > col("cum_before") &&
        col("k") <= col("cum_before") + col("cnt"))
      .select(col("o_orderpriority"), col("which"), col("n"), col("bucket"),
        (col("k") - col("cum_before")).as("in_bucket_rank"))

    // pass 2: rank only inside candidate buckets
    val needed = located.select("o_orderpriority", "bucket").distinct()
    val wib = Window.partitionBy("o_orderpriority", "bucket")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val picked = orders
      .join(broadcast(needed), Seq("o_orderpriority", "bucket"))
      .withColumn("rn", row_number().over(wib).cast("long"))
      .join(broadcast(located),
        Seq("o_orderpriority", "bucket"))
      .filter(col("rn") === col("in_bucket_rank"))

    picked.groupBy("o_orderpriority")
      .agg(
        max(when(col("which") === "lo", col("o_totalprice"))).as("lo"),
        max(when(col("which") === "hi", col("o_totalprice"))).as("hi"),
        max(col("n")).as("n_orders"))
      .select(col("o_orderpriority"),
        ((col("lo") + col("hi")) / 2).as("median_value"),
        col("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Graded q53: exact grouped multi-quantiles (p25/p50/p75/p90/p99 of
    * order value per priority) via the same two-pass histogram selection
    * as [[medianOrderValue]], generalized to a whole quantile VECTOR in
    * the same two passes — the per-group cost is independent of how
    * many quantiles are asked for.
    *
    * Rank rule: the 1-based target rank for percentile `pct` over `n`
    * rows is `ceil(pct·n/100)` computed in INTEGER arithmetic
    * (`(pct*n + 99) div 100`). DuckDB's `quantile_disc` evaluates the
    * same ceil exactly (its `0.25` literal is a decimal, not a binary
    * double), so both engines pick the same physical row — the output
    * is a data value, no interpolation arithmetic to mismatch.
    *
    * Scale shape: `percentile_approx` would be the one-liner but is
    * approximate and engine-specific; an exact global-sort rank funnels
    * each group through one task. Here pass 1 is a hash aggregation to
    * a histogram of ≈ groups × buckets rows (data-size independent),
    * target ranks are located by a prefix sum over that tiny table, and
    * pass 2 ranks only inside the ≤ |quantiles| candidate buckets per
    * group — everything else never leaves the scan.
    */
  def groupedQuantiles(spark: SparkSession, dir: String,
      pcts: Seq[Int] = Seq(25, 50, 75, 90, 99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got $pcts")
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("bucket", floor(col("o_totalprice") / 1000))

    // pass 1: per-(group, bucket) histogram + prefix sum over it
    val hist = orders.groupBy("o_orderpriority", "bucket")
      .agg(count(lit(1)).as("cnt"))
    val wb = Window.partitionBy("o_orderpriority").orderBy("bucket")
    val cum = hist.withColumn("cum_before",
      coalesce(sum("cnt").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val totals = orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

    // one target rank per (group, percentile)
    val targets = totals.select(col("o_orderpriority"), col("n"),
        explode(array(pcts.map(p =>
          struct(lit(p).as("pct"),
            expr(s"($p * n + 99) div 100").as("k"))): _*)).as("t"))
      .select(col("o_orderpriority"), col("n"), col("t.pct").as("pct"),
        col("t.k").as("k"))

    val located = targets.join(cum, Seq("o_orderpriority"))
      .filter(col("k") > col("cum_before") &&
        col("k") <= col("cum_before") + col("cnt"))
      .select(col("o_orderpriority"), col("pct"), col("n"), col("bucket"),
        (col("k") - col("cum_before")).as("in_bucket_rank"))

    // pass 2: rank only inside candidate buckets, pick the located rows
    val needed = located.select("o_orderpriority", "bucket").distinct()
    val wib = Window.partitionBy("o_orderpriority", "bucket")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val picked = orders
      .join(broadcast(needed), Seq("o_orderpriority", "bucket"))
      .withColumn("rn", row_number().over(wib).cast("long"))
      .join(broadcast(located), Seq("o_orderpriority", "bucket"))
      .filter(col("rn") === col("in_bucket_rank"))

    picked.groupBy("o_orderpriority")
      .agg(max(col("n")).as("n_orders"),
        pcts.map(p =>
          max(when(col("pct") === p, col("o_totalprice"))).as(s"p$p")): _*)
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q6-style filtered aggregate: predicate pushdown to the scan,
    * single-row result (the shape `.explain` must show: PushedFilters on
    * l_shipdate, pruned 4-column ReadSchema).
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        dec2(col("l_discount")).between(0.02, 0.06) &&
        col("l_quantity") < 24)
      .agg(
        sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Graded q97: UNPIVOT — the inverse of q36's pivot: lineitem's four
    * measure columns melted to long `(measure, value)` format with
    * `stack`, then aggregated per (flag, measure). The long format is
    * what metric stores and plotting layers consume; the engine question
    * is HOW the melt runs: `stack` plans as ONE generator node over a
    * single scan (4× rows map-side, partial-agg collapsed before the
    * one shuffle) where the naive formulation is four scans unioned.
    * The oracle deliberately IS the naive four-scan UNION ALL —
    * matching proves the generator equivalent. Sums ride the decimal
    * route (`ops.dec2`) like every money aggregate.
    */
  def measureUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), expr(
        """stack(4,
          |  'discount', cast(l_discount as decimal(12,2)),
          |  'extendedprice', cast(l_extendedprice as decimal(12,2)),
          |  'quantity', cast(l_quantity as decimal(12,2)),
          |  'tax', cast(l_tax as decimal(12,2))) AS (measure, value)"""
          .stripMargin))
      .groupBy("l_returnflag", "measure")
      .agg(sum(col("value")).cast("double").as("sum_value"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "measure")
  def rfmSegments(spark: SparkSession, dir: String): DataFrame =
    rfmSegmentsOf(Tables(spark, dir, "orders"))

  /** Per-metric quintile score off a value-domain histogram: one row
    * per DISTINCT metric value with `score = ceil(5·rank/n)` — the
    * closed form of "smallest s whose ceil-rank band covers my rank",
    * evaluated as `(5·cum + n − 1) div n` in pure integers. The
    * cumulative window runs over the histogram (bounded by the value
    * domain, the q53/q128/q145 discipline), never the customer table.
    */
  private def quintileMap(vals: DataFrame, valueCol: String,
      scoreCol: String): DataFrame = {
    // persisted: traversed twice (total + cumulative window) —
    // unpersisted, the value-domain histogram aggregate executed twice
    // per score map (round-18 DupExec sweep, x2 in each of the three
    // q146 maps); bounded by the value domain
    val hist = CachedStages.track(
      vals.groupBy(valueCol).agg(count(lit(1)).as("cnt")).coalesce(1).persist())
    val w = Window.orderBy(col(valueCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("cnt")).as("n"))
    hist.withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(tot))
      .select(col(valueCol), expr("(5 * cum + n - 1) div n").as(scoreCol))
  }

  /** Graded q146: RFM SEGMENTATION (Hughes' recency/frequency/monetary
    * quintile scoring — the classical customer-value grid every CRM and
    * growth stack ships): per ordering customer, days since last order,
    * order count, and lifetime spend, each scored 1..5 by exact
    * quintile over the customer population, rolled up to segment cells
    * with population and spend. R is inverted (5 = most RECENT) so the
    * 5-5-5 cell is the champions corner, the conventional reading.
    *
    * Determinism: spend runs in integer cents through the dec2 cast;
    * recency in whole days off the corpus max order date; quintiles via
    * the integer closed form above — ties share a rank, so equal values
    * can never straddle a cut. No floating point anywhere.
    *
    * Scale shape: ONE orders scan collapses into the persisted
    * per-customer metric table; the three score maps are value-domain
    * histograms (recency ≤ days in the window, frequency ≤ max orders
    * per customer — both tiny, broadcast back; the monetary domain can
    * approach |customers|, so its score map joins WITHOUT a broadcast
    * hint — an equi-join on the cents value that AQE resolves by size,
    * shuffle at 100 TB); the rollup is ≤ 125 cells.
    */
  def rfmSegmentsOf(orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_date"),
        count(lit(1)).as("freq"),
        (sum(dec2(col("o_totalprice"))) * 100).cast("long").as("cents"))
    val maxDate = perCust.agg(max(col("last_date")).as("corpus_max"))
    val met = CachedStages.track(perCust
      .crossJoin(broadcast(maxDate))
      .withColumn("rec_days",
        datediff(col("corpus_max"), col("last_date")).cast("long"))
      .persist())
    val rq = quintileMap(met.select("rec_days"), "rec_days", "r_q")
    val fq = quintileMap(met.select("freq"), "freq", "f_q")
    val mq = quintileMap(met.select("cents"), "cents", "m_q")
    met
      .join(broadcast(rq), Seq("rec_days"))
      .join(broadcast(fq), Seq("freq"))
      .join(mq, Seq("cents"))
      .select(expr("6 - r_q").as("r_score"), col("f_q").as("f_score"),
        col("m_q").as("m_score"), col("cents"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("monetary_cents"))
      .orderBy("r_score", "f_score", "m_score")
  }
  def orderAging(spark: SparkSession, dir: String): DataFrame =
    orderAgingOf(Tables(spark, dir, "orders"))

  /** Graded q157: OPEN-ORDER AGING report — the receivables-style
    * bucket table operations reads weekly: every order still open at
    * the snapshot date (the corpus max order date), bucketed by age
    * and split by priority, with counts, exact cents value, and each
    * cell's share of the open book in ppm. The aging shape (0-30 /
    * 31-90 / 91-365 / 365+) is the standard escalation ladder: the
    * 365+ column is what gets a process audit.
    *
    * Determinism: ages are whole days off the corpus max date; value
    * in integer cents via the dec2 cast; shares one integral division
    * against the broadcast open-book total.
    *
    * Scale shape: one orders scan; the snapshot date and the open
    * totals are 1-row broadcasts; the rollup is ≤ |priorities|·4 rows.
    */
  def orderAgingOf(orders: DataFrame): DataFrame = {
    val open = CachedStages.track(orders
      .filter(col("o_orderstatus") === "O")
      .crossJoin(broadcast(orders.agg(max(col("o_orderdate")).as("snap"))))
      .withColumn("age_days",
        datediff(col("snap"), col("o_orderdate")).cast("long"))
      .withColumn("bucket",
        when(col("age_days") <= 30, "a_0_30")
          .when(col("age_days") <= 90, "b_31_90")
          .when(col("age_days") <= 365, "c_91_365")
          .otherwise("d_365_plus"))
      .persist())
    val tot = open.agg(count(lit(1)).as("n_open"))
    open.groupBy("o_orderpriority", "bucket")
      .agg(count(lit(1)).as("n_orders"),
        (sum(dec2(col("o_totalprice"))) * 100).cast("long")
          .as("value_cents"))
      .crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("n_orders * 1000000 div n_open"))
      .select("o_orderpriority", "bucket", "n_orders", "value_cents",
        "share_ppm")
      .orderBy("o_orderpriority", "bucket")
  }
  def revenueBridge(spark: SparkSession, dir: String, y1: Int = 1999,
      y2: Int = 2000): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val orders = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).as("yr"))
    val parts = Tables(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    revenueBridgeOf(
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey")),
      y1, y2)
  }

  /** The nine Benford first-digit expectations, floor(log₁₀(1+1/d)·10⁶)
    * — public constants of the law itself, shared verbatim with the
    * oracle SQL so both engines test against the same integers.
    */
  private[ops] val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)

  def benfordAudit(spark: SparkSession, dir: String): DataFrame =
    benfordAuditOf(spark, Tables(spark, dir, "orders"))

  /** Graded q171: BENFORD first-digit audit of order totals — the
    * forensic-accounting screen (Benford 1938; Nigrini's fraud
    * practice): organically grown monetary amounts follow
    * P(d) = log₁₀(1+1/d), and a feed whose first-digit histogram
    * deviates hard (fabricated numbers, unit bugs, truncation at
    * system limits) fails the audit before any downstream model
    * consumes it. Per digit: observed count and ppm, expected ppm,
    * absolute deviation, and the χ² contribution
    * (obs−exp)² div exp — all integer.
    *
    * Determinism: the first significant digit of a positive
    * DECIMAL(12,2) is the first character of its cents integer —
    * pure string arithmetic, no log, no float; the expectation table
    * is nine integer constants. Digits absent from the data still
    * report (expected side is the spine).
    *
    * Scale shape: one orders scan collapsing to ≤9 groups with
    * map-side combine; the expectation table and the total are
    * broadcast literals.
    */
  def benfordAuditOf(spark: SparkSession, orders: DataFrame): DataFrame = {
    import spark.implicits._
    // ≤9 rows, but the digit counts feed both the join and the total —
    // persisted so the orders scan runs exactly once
    val counts = CachedStages.track(orders.select(expr(
      """CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(12, 2))
        | * 100 AS BIGINT) AS STRING), 1, 1) AS BIGINT)""".stripMargin)
      .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_orders"))
      .coalesce(1).persist())
    val expected = BenfordPpm
      .map { case (d, p) => (d.toLong, p) }.toDF("digit", "exp_ppm")
    val total = counts.agg(sum(col("n_orders")).as("n_total"))
    broadcast(expected).join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n_orders"))
      .crossJoin(broadcast(total))
      .withColumn("obs_ppm", expr("n_orders * 1000000 div n_total"))
      .withColumn("dev_ppm", expr("abs(obs_ppm - exp_ppm)"))
      .withColumn("chi_ppm", expr(
        "(obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) div exp_ppm"))
      .select("digit", "n_orders", "obs_ppm", "exp_ppm", "dev_ppm",
        "chi_ppm")
      .orderBy("digit")
  }

  def abcClassification(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg((sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
        * 10000).cast("long").as("r4"))
    abcOf(rev)
  }

  /** Graded q174: ABC / PARETO revenue classification of parts — the
    * inventory-management standard (Pareto 1896 via Dixie/GE practice):
    * rank items by revenue descending; the prefix carrying the first
    * 80% of revenue is class A, up to 95% B, the long tail C. An item's
    * class is decided by the revenue ACCUMULATED STRICTLY BEFORE it
    * under (r4 desc, l_partkey asc) order — the item crossing a cut
    * still belongs to the richer class; integer cross-multiplication
    * (`cum_before·5 < total·4`, `·20 < ·19`) decides both cuts with no
    * percentage arithmetic.
    *
    * Scale shape — the q95 two-phase global-rank discipline, pointed at
    * a DESCENDING cumulative: parts collapse to (part, r4) once; a
    * COARSE revenue-bucket histogram (bounded by the value range, not
    * |parts|) carries the only unpartitioned cumulative; the ≤2 buckets
    * containing the 80%/95% cuts are resolved per-part with
    * WITHIN-BUCKET windows; every other bucket classifies wholesale
    * from its bucket-prefix sum. No global sort of |parts| ever runs.
    */
  def abcOf(revIn: DataFrame): DataFrame = {
    // the (part, r4) frame feeds both the histogram and the boundary
    // resolution — persisted so the corpus collapses exactly once
    val rev = CachedStages.track(revIn.persist())
    val hist = CachedStages.track(rev
      .withColumn("hb", expr("r4 div 10000000"))
      .groupBy("hb")
      .agg(count(lit(1)).as("n_in"), sum(col("r4")).as("s_in"))
      .coalesce(1).persist())
    val wb = Window.orderBy(col("hb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist
      .withColumn("cum_before", coalesce(sum(col("s_in")).over(wb), lit(0L)))
    val total = hist.agg(sum(col("s_in")).as("total"),
      sum(col("n_in")).as("n_parts_total"))
    val buckets = CachedStages.track(cum.crossJoin(broadcast(total))
      // a cut at share p/q lies inside the bucket iff the bucket's
      // prefix interval [cum_before, cum_before + s_in) straddles it
      .withColumn("has_cut",
        (expr("cum_before * 5 < total * 4") &&
          expr("(cum_before + s_in) * 5 >= total * 4")) ||
        (expr("cum_before * 20 < total * 19") &&
          expr("(cum_before + s_in) * 20 >= total * 19")))
      .coalesce(1).persist())
    def classExpr(cumBefore: String): org.apache.spark.sql.Column = expr(
      s"""CASE WHEN $cumBefore * 5 < total * 4 THEN 'A'
         |     WHEN $cumBefore * 20 < total * 19 THEN 'B'
         |     ELSE 'C' END""".stripMargin)
    val whole = buckets.filter(!col("has_cut"))
      .select(classExpr("cum_before").as("abc_class"),
        col("n_in").as("n"), col("s_in").as("s"), col("total"),
        col("n_parts_total"))
      .groupBy("abc_class")
      .agg(sum(col("n")).as("n_parts"), sum(col("s")).as("revenue_r4"),
        max(col("total")).as("total"),
        max(col("n_parts_total")).as("n_parts_total"))
    val wIn = Window.partitionBy("hb")
      .orderBy(col("r4").desc, col("l_partkey").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = rev.withColumn("hb", expr("r4 div 10000000"))
      .join(broadcast(buckets.filter(col("has_cut"))
        .select("hb", "cum_before", "total", "n_parts_total")), Seq("hb"))
      .withColumn("part_cum_before",
        col("cum_before") + coalesce(sum(col("r4")).over(wIn), lit(0L)))
      .select(classExpr("part_cum_before").as("abc_class"),
        col("r4"), col("total"), col("n_parts_total"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"), sum(col("r4")).as("revenue_r4"),
        max(col("total")).as("total"),
        max(col("n_parts_total")).as("n_parts_total"))
    whole.unionByName(boundary)
      .groupBy("abc_class")
      .agg(sum(col("n_parts")).as("n_parts"),
        sum(col("revenue_r4")).as("revenue_r4"),
        max(col("total")).as("total"),
        max(col("n_parts_total")).as("n_parts_total"))
      .withColumn("revenue_share_ppm", expr(
        "CAST(CAST(revenue_r4 AS DECIMAL(38, 0)) * 1000000 div total AS BIGINT)"))
      .withColumn("parts_share_ppm",
        expr("n_parts * 1000000 div n_parts_total"))
      .select("abc_class", "n_parts", "revenue_r4", "revenue_share_ppm",
        "parts_share_ppm")
      .orderBy("abc_class")
  }

  def skylineParts(spark: SparkSession, dir: String): DataFrame =
    skylineOf(Tables(spark, dir, "part")
      .select(col("p_partkey"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(12, 2)) * 100 AS BIGINT)")
          .as("price_cents"),
        col("p_size").cast("long").as("size")))

  /** Graded q179: SKYLINE / Pareto frontier (Börzsönyi, Kossmann &
    * Stocker ICDE 2001 — the SKYLINE OF operator): parts no other part
    * dominates under (price MIN, size MAX) — cheaper-and-at-least-as-
    * big or same-price-and-strictly-bigger kills a candidate; parts
    * with IDENTICAL (price, size) do not dominate each other (strict
    * dominance needs one strict edge) and all survive. The
    * multi-criteria "best trade-offs" query a catalog search runs.
    *
    * The 2-D scale shape: naive skyline is the O(n²) NOT-EXISTS
    * self-join (exactly what the DuckDB oracle runs — an INDEPENDENT
    * formulation, so the hash-match proves the reduction); this
    * implementation reduces to the PRICE VALUE DOMAIN — per distinct
    * price the max size, a prefix max over strictly-cheaper prices
    * (histogram-frame window), and one co-partitioned join back:
    * keep iff `size == max_at_price` and `size > prefix_max_before`.
    * O(n) into the histogram, never n².
    */
  def skylineOf(parts: DataFrame): DataFrame = {
    // NOT persisted (round-19): the prefix-max window is this
    // histogram's only traversal — single-reader persist removed
    // (r18 DupExec report).
    val hist = parts.groupBy("price_cents")
      .agg(max(col("size")).as("m"))
    val w = Window.orderBy(col("price_cents").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = hist.withColumn("r", max(col("m")).over(w))
    parts.join(pref, Seq("price_cents"))
      .filter(col("size") === col("m") &&
        (col("r").isNull || col("r") < col("size")))
      .select("p_partkey", "price_cents", "size")
      .orderBy("p_partkey")
  }

  def slaCompliance(spark: SparkSession, dir: String,
      slaDays: Long = 7L): DataFrame =
    slaComplianceOf(Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        Seq("l_orderkey")), slaDays)

  /** Graded q186: order-priority SLA COMPLIANCE — the OTIF (on-time)
    * report operations is judged by: per priority class, line items
    * shipped within the SLA window of their order date (ppm), plus the
    * exact median and p95 order-to-ship days via ceil-rank picks over
    * the day-gap value-domain histogram. Causally-invalid rows (ship
    * before order — q177's screen) are excluded from the latency
    * algebra and surfaced per class as `n_invalid`; a priority whose
    * p95 exceeds the SLA is the escalation signal itself.
    *
    * Scale shape: the order-key equi-join both tables already shuffle
    * on, one collapse into the (priority, gap_days) histogram
    * (bounded by the fulfillment window), bounded cumulative frames,
    * |priorities| output rows.
    */
  def slaComplianceOf(li: DataFrame, slaDays: Long): DataFrame = {
    val gaps = li.select(col("o_orderpriority").as("priority"), expr(
      """unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000
        | - unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"""
        .stripMargin).as("gap_days"))
    val hist = CachedStages.track(gaps
      .filter(col("gap_days") >= 0)
      .groupBy("priority", "gap_days")
      .agg(count(lit(1)).as("cnt"))
      .coalesce(1).persist())
    val invalid = gaps.filter(col("gap_days") < 0)
      .groupBy("priority").agg(count(lit(1)).as("n_invalid"))
    val totals = hist.groupBy("priority")
      .agg(sum(col("cnt")).as("n_lines"),
        sum(when(col("gap_days") <= slaDays, col("cnt")).otherwise(0L))
          .as("n_on_time"))
    val wc = Window.partitionBy("priority").orderBy(col("gap_days").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum", sum(col("cnt")).over(wc))
      .join(broadcast(totals), Seq("priority"))
      .groupBy("priority")
      .agg(max(col("n_lines")).as("n_lines"),
        max(expr("n_on_time * 1000000 div n_lines")).as("on_time_ppm"),
        min(when(expr("cum * 2 >= n_lines"), col("gap_days")))
          .as("median_days"),
        min(when(expr("cum * 20 >= n_lines * 19"), col("gap_days")))
          .as("p95_days"))
      .join(broadcast(invalid), Seq("priority"), "left")
      .na.fill(0L, Seq("n_invalid"))
      .select("priority", "n_lines", "n_invalid", "on_time_ppm",
        "median_days", "p95_days")
      .orderBy("priority")
  }

  def theilDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100 AS BIGINT)"))
        .as("cents"))
    val cust = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("o_custkey"),
        col("c_nationkey").cast("long").as("nation"))
    theilDecompositionOf(spend.join(cust, Seq("o_custkey")))
  }

  /** Graded q264: THEIL-T inequality DECOMPOSITION of customer spend —
    * the property Gini famously lacks (Theil 1967; Shorrocks,
    * Econometrica 1980: the GE family is the ONLY additively
    * decomposable one): total inequality splits exactly into
    * BETWEEN-nation (are some markets richer?) and WITHIN-nation (are
    * whales concentrated inside markets?) — the question q176's
    * per-nation Gini table can't answer because Ginis don't add.
    * Per nation: customer count, spend mass, share_ppm, the nation's
    * own Theil T_g, and its between-term s_g·ln(μ_g/μ); repeated per
    * row: T_total, T_between (Σ of the rounded between terms — exact
    * decimal addition of 6dp values), and T_within (Σ s_g·T_g over
    * the rounded T_g). Zero-spend customers are excluded (0·ln 0 has
    * no mass; standard practice).
    *
    * Oracle parity (the q58 discipline): every ln argument is a
    * correctly-rounded double ratio of EXACTLY-REPRESENTABLE integer
    * products (x·n_g, S_g·n ≪ 2⁵³ at any graded scale), JDK log and
    * DuckDB libm agree bit-for-bit on such inputs (verified
    * empirically by q58 at both scales), per-term products are IEEE
    * doubles, and all sums route through exact DECIMAL(38,18) so
    * engine summation order cannot matter; round 6 at the end.
    *
    * Scale shape: one orders collapse (map-side combinable), one
    * customer-keyed dim join, per-nation moments in ONE shuffle to
    * |nations| rows, global moments broadcast back — no window at
    * all, the cheapest inequality plan in the family.
    */
  def theilDecompositionOf(spend: DataFrame): DataFrame = {
    val pos = CachedStages.track(
      spend.filter(col("cents") > 0).persist())
    val g = CachedStages.track(pos.groupBy("nation")
      .agg(count(lit(1)).as("n_g"), sum(col("cents")).as("s_g"))
      .coalesce(1).persist())
    val tot = broadcast(g.agg(sum(col("n_g")).as("n"),
      sum(col("s_g")).as("s")))
    val dec18 = org.apache.spark.sql.types.DecimalType(38, 18)
    // per-customer terms fold per nation AND globally off one pass
    val terms = pos.join(broadcast(g), Seq("nation")).crossJoin(tot)
      .withColumn("t_g_term",
        (col("cents").cast("double") / col("s_g").cast("double")) *
          log((col("cents") * col("n_g")).cast("double") /
            col("s_g").cast("double")))
      .withColumn("t_term",
        (col("cents").cast("double") / col("s").cast("double")) *
          log((col("cents") * col("n")).cast("double") /
            col("s").cast("double")))
    // ONE traversal of the per-customer `terms` frame: the global
    // t_term sum folds through this rollup as an unrounded DECIMAL
    // per-nation partial (decimal addition is associative — the
    // re-grouped total is bit-identical to the one-pass sum), and the
    // |nations|-row result persists. Before round 18 `terms` was
    // traversed separately for the total (DupExec: 23-node
    // crossJoin subtree x2 — the per-customer join executed twice).
    val perNation = CachedStages.track(terms.groupBy("nation")
      .agg(max(col("n_g")).as("n_cust"), max(col("s_g")).as("spend_cents"),
        round(sum(col("t_g_term").cast(dec18)).cast("double"), 6)
          .as("theil_g"),
        sum(col("t_term").cast(dec18)).as("tt_g"))
      .coalesce(1).persist())
    // persisted: traversed twice (globals rollup + final join) — the
    // residual x2 the round-18 DupExec re-probe caught after the
    // perNation fold landed; |nations| rows
    val withBetween = CachedStages.track(perNation.crossJoin(tot)
      .withColumn("share_ppm", expr("spend_cents * 1000000 div s"))
      .withColumn("between_term", round(
        (col("spend_cents").cast("double") / col("s").cast("double")) *
          log((col("spend_cents") * col("n")).cast("double") /
            (col("s") * col("n_cust")).cast("double")), 6))
      .coalesce(1).persist())
    val globals = broadcast(withBetween
      .withColumn("within_term",
        (col("spend_cents").cast("double") / col("s").cast("double")) *
          col("theil_g"))
      .agg(round(sum(col("between_term").cast(dec18)).cast("double"), 6)
          .as("theil_between"),
        round(sum(col("within_term").cast(dec18)).cast("double"), 6)
          .as("theil_within")))
    val totalRow = broadcast(perNation.agg(
      round(sum(col("tt_g")).cast("double"), 6)
        .as("theil_total")))
    withBetween.crossJoin(globals).crossJoin(totalRow)
      .select("nation", "n_cust", "spend_cents", "share_ppm",
        "theil_g", "between_term", "theil_total", "theil_between",
        "theil_within")
      .orderBy("nation")
  }

  def giniSpend(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100 AS BIGINT)"))
        .as("cents"))
    val cust = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("o_custkey"),
        col("c_nationkey").cast("long").as("nation"))
    giniOf(spend.join(cust, Seq("o_custkey")))
  }

  /** Graded q176: GINI coefficient of customer spend per nation — the
    * inequality measurement (Gini 1912) that complements q162's HHI:
    * HHI asks how concentrated the SELLER side is, Gini how unequal
    * the BUYER side spends (marketing reads it as whale-dependence).
    * Per nation: customers, total spend, and `gini_ppm` from the
    * rank-weighted closed form `G = (2·Σrᵢxᵢ − (n+1)·Σx)/(n·Σx)` with
    * ranks ascending over spend.
    *
    * Exactness + the scale move: spend quantizes to WHOLE DOLLARS
    * (`cents div 100`) so the distribution's value DOMAIN is bounded by
    * the price range — the histogram cumulative then runs over a
    * bounded frame (the q53/q128 discipline) instead of ranking
    * |customers| rows; the rank-weighted sum collapses per bucket as
    * `2·c·v·cum_before + v·c·(c+1)` (the within-bucket arithmetic
    * series, exact), products in DECIMAL(38). G of the quantized
    * distribution is the reported number — the quantization is the
    * documented contract, not an approximation of it. All-equal spends
    * give exactly 0; the ppm division truncates once.
    *
    * Scale shape: one orders collapse to per-customer cents, one
    * broadcast-joined nation tag, one (nation, dollar) histogram with
    * bounded cumulative frames, |nations| output rows.
    */
  def giniOf(spendByNation: DataFrame): DataFrame = {
    // NOT persisted (round-19): the window+rollup below is this
    // histogram's only traversal — the persist paid fill+memory for a
    // single read (r18 DupExec single-reader report).
    val hist = spendByNation
      .withColumn("v", expr("cents div 100"))
      .groupBy("nation", "v")
      .agg(count(lit(1)).as("c"), sum(col("cents")).as("cents_in"))
    val wc = Window.partitionBy("nation").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("cum_before", coalesce(sum(col("c")).over(wc), lit(0L)))
      .groupBy("nation")
      .agg(sum(col("c")).as("n_customers"),
        sum(col("cents_in")).as("total_cents"),
        sum(expr("CAST(v AS DECIMAL(38, 0)) * c")).as("sx"),
        sum(expr(
          """CAST(v AS DECIMAL(38, 0)) * c * 2 * cum_before
            | + CAST(v AS DECIMAL(38, 0)) * c * (c + 1)""".stripMargin))
          .as("two_rank_x"))
      .withColumn("gini_ppm", expr(
        """CAST((two_rank_x - (n_customers + 1) * sx) * 1000000
          | div nullif(CAST(n_customers AS DECIMAL(38, 0)) * sx, 0)
          | AS BIGINT)""".stripMargin))
      .select("nation", "n_customers", "total_cents", "gini_ppm")
      .orderBy("nation")
  }

  def inflightTimeline(spark: SparkSession, dir: String): DataFrame =
    inflightTimelineOf(Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey")))

  /** Graded q177: FULFILLMENT BACKLOG timeline — how many line items
    * are ordered-but-not-yet-shipped on each calendar day. The scale
    * move is the DIFFERENCE-ARRAY reduction every
    * interval-count-at-scale problem uses: each
    * [order_day, ship_day) interval contributes +1 at its start and
    * −1 at its end — two delta rows, never an exploded row-per-day —
    * and the corpus collapses to a calendar-bounded (day, Δ) matrix
    * whose prefix sum IS the timeline. Counting intervals that stab
    * each day via join or explode is O(rows·span); this is O(rows)
    * into O(|days|).
    *
    * Per day (densified over [min, max]): line items entering the
    * backlog, shipping out, and the end-of-day open backlog (a
    * same-day order+ship contributes zero at day end — the stated
    * convention). Rows whose ship day PRECEDES their order day (the
    * synthetic dates are not causally linked — real feeds have clock
    * skew and backfills) are excluded from the interval algebra and
    * surfaced per order-day as `n_invalid`: the data-quality signal
    * rides along, and the backlog stays structurally ≥ 0.
    *
    * Scale shape: one order-key equi-join tags each line item with
    * its order day (the key both tables already shuffle on), then the
    * two-delta projection, one bounded-domain aggregation, and the
    * only unpartitioned window runs over the densified calendar
    * (value-domain bounded).
    */
  def inflightTimelineOf(li: DataFrame): DataFrame = {
    val d = li.select(
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .as("order_day"),
      expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
        .as("ship_day"))
    val valid = d.filter(col("ship_day") >= col("order_day"))
    val deltas = CachedStages.track(valid
      .select(col("order_day").as("day"), lit(1L).as("delta"),
        lit(1L).as("ordered"), lit(0L).as("shipped"), lit(0L).as("invalid"))
      .unionByName(valid.select(col("ship_day").as("day"),
        lit(-1L).as("delta"), lit(0L).as("ordered"),
        lit(1L).as("shipped"), lit(0L).as("invalid")))
      .unionByName(d.filter(col("ship_day") < col("order_day"))
        .select(col("order_day").as("day"), lit(0L).as("delta"),
          lit(0L).as("ordered"), lit(0L).as("shipped"),
          lit(1L).as("invalid")))
      .groupBy("day")
      .agg(sum(col("delta")).as("delta"),
        sum(col("ordered")).as("n_ordered"),
        sum(col("shipped")).as("n_shipped"),
        sum(col("invalid")).as("n_invalid"))
      .coalesce(1).persist())
    val cal = deltas.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(explode(expr("sequence(mn, mx)")).as("day"))
    val w = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(deltas, Seq("day"), "left")
      .na.fill(0L, Seq("delta", "n_ordered", "n_shipped", "n_invalid"))
      .withColumn("open_backlog", sum(col("delta")).over(w))
      .select("day", "n_ordered", "n_shipped", "n_invalid", "open_backlog")
      .orderBy("day")
  }

  def supplierHhi(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_suppkey"),
        revenueTerm(col("l_extendedprice"), col("l_discount")).as("rev"))
    val sup = Tables(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    supplierHhiOf(li.join(broadcast(sup),
      col("l_suppkey") === col("s_suppkey")))
  }

  /** Graded q162: SUPPLIER CONCENTRATION per nation — the Herfindahl–
    * Hirschman index of revenue share across a nation's suppliers,
    * the standard market-concentration statistic (10⁶ ≡ monopoly;
    * 10⁶/n ≡ n equal suppliers): procurement risk reads it to find
    * single-supplier choke points, antitrust reads it the other way.
    * HHI = Σ_i (rev_i / Σrev)² evaluated WITHOUT per-share division:
    * `hhi_ppm = (Σ rev_i²) · 10⁶ div (Σ rev_i)²` by cross-
    * multiplication — revenue in the exact scale-4 integer units,
    * squares and products through DECIMAL(38). The report carries the
    * equivalent-supplier count `10⁶ div hhi_ppm` (the inverse-HHI a
    * buyer actually quotes).
    *
    * Scale shape: one lineitem scan with the supplier dimension
    * broadcast collapses to per-(nation, supplier) revenue; squares
    * re-aggregate that bounded table to |nations| rows.
    */
  def supplierHhiOf(joined: DataFrame): DataFrame =
    joined
      .groupBy(col("s_nationkey").cast("long").as("nation"),
        col("l_suppkey"))
      .agg((sum(col("rev")) * 10000).cast("long").as("r4"))
      .groupBy("nation")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("r4")).as("tot_r4"),
        sum(expr("CAST(r4 AS DECIMAL(38, 0)) * r4")).as("sq_r4"))
      .withColumn("hhi_ppm", expr(
        """CAST(sq_r4 * 1000000
          | div (CAST(tot_r4 AS DECIMAL(38, 0)) * tot_r4) AS BIGINT)"""
          .stripMargin))
      // nullif guard: hhi_ppm floors to 0 once a nation holds >10^6
      // evenly-balanced suppliers (plausible at 100 TB); Spark's div
      // would yield NULL while DuckDB's // raises — nullif makes both
      // engines surface the same NULL sentinel instead of diverging.
      .withColumn("equiv_suppliers_x1000", expr(
        "1000000000 div nullif(hhi_ppm, 0)"))
      .select("nation", "n_suppliers", "tot_r4", "hhi_ppm",
        "equiv_suppliers_x1000")
      .orderBy("nation")

  /** Graded q158: REVENUE BRIDGE — the period-over-period
    * price/volume decomposition every finance review runs: per brand,
    * how much of the revenue change from year 1 to year 2 came from
    * selling MORE (volume effect, at old prices), from charging MORE
    * (price effect, at old volumes), and from the interaction the
    * linear split can't attribute (the mix residual). The three
    * effects sum EXACTLY to the revenue delta — the audit identity
    * that makes the bridge a reconciliation artifact, not an
    * approximation: volume and price are the Laspeyres terms rounded
    * by integral division, and the residual is DEFINED as the exact
    * remainder, so the identity holds to the last unit.
    *
    * Determinism: quantities in centi-units, revenue in the exact
    * scale-4 integer units of the q01 revenue term (both through
    * decimal casts); each Laspeyres term is one integral division
    * with a sign-split CASE so the numerator is never negative (the
    * div-vs-floor engine hazard); products route through DECIMAL(38).
    * A brand absent from a period (new or discontinued) takes its
    * whole delta as volume — the convention that keeps zero
    * denominators out and the identity intact.
    *
    * Scale shape: one lineitem scan filtered to the two years at the
    * source (the year predicate pushes through the order join), brand
    * attached by broadcast; the pivot and effect arithmetic run on
    * the |brands|-row rollup.
    */
  def revenueBridgeOf(joined: DataFrame, y1: Int, y2: Int): DataFrame = {
    val per = joined
      .filter(col("yr") === y1 || col("yr") === y2)
      .groupBy(col("p_brand"), col("yr"))
      .agg((sum(dec2(col("l_quantity"))) * 100).cast("long").as("q_c"),
        (sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
          * 10000).cast("long").as("r4"))
    per.groupBy("p_brand")
      .agg(
        coalesce(sum(when(col("yr") === y1, col("q_c"))), lit(0L)).as("q1"),
        coalesce(sum(when(col("yr") === y1, col("r4"))), lit(0L)).as("r1"),
        coalesce(sum(when(col("yr") === y2, col("q_c"))), lit(0L)).as("q2"),
        coalesce(sum(when(col("yr") === y2, col("r4"))), lit(0L)).as("r2"))
      .withColumn("delta_r4", expr("r2 - r1"))
      .withColumn("volume_eff_r4", expr(
        """CASE WHEN q1 = 0 OR q2 = 0 THEN r2 - r1
          | WHEN q2 >= q1 THEN
          |   CAST(CAST(q2 - q1 AS DECIMAL(38, 0)) * r1 div q1 AS BIGINT)
          | ELSE
          |   -CAST(CAST(q1 - q2 AS DECIMAL(38, 0)) * r1 div q1 AS BIGINT)
          | END""".stripMargin))
      .withColumn("price_eff_r4", expr(
        """CASE WHEN q1 = 0 OR q2 = 0 THEN 0
          | ELSE CAST(CAST(q1 AS DECIMAL(38, 0)) * r2 div q2 AS BIGINT) - r1
          | END""".stripMargin))
      .withColumn("mix_residual_r4",
        expr("delta_r4 - volume_eff_r4 - price_eff_r4"))
      .select("p_brand", "r1", "r2", "delta_r4", "volume_eff_r4",
        "price_eff_r4", "mix_residual_r4")
      .orderBy("p_brand")
  }

  def duplicatePayments(spark: SparkSession, dir: String,
      windowDays: Long = 7L): DataFrame =
    duplicatePaymentsOf(Tables(spark, dir, "orders"), windowDays)

  /** Graded q190: DUPLICATE-PAYMENT fraud screen — the accounts-payable
    * audit classic: orders by the SAME customer within a short window
    * are rapid repeats; those that also land in the same $100 amount
    * band are duplicate-billing SUSPECTS (double submission, double
    * capture). Per day-gap 0..window: rapid-repeat pairs, suspect
    * pairs, distinct customers involved, and the cents at risk (the
    * SMALLER amount of each suspect pair — what a clawback recovers).
    * The gap spine densifies so the ladder is complete even where a
    * gap has no pairs; on this independent synthetic stream the
    * suspect column is honestly ~zero while the volume columns ground
    * the screen — exactly what a clean book should report.
    *
    * Scale shape: the self-join is BLOCKED on the customer key — the
    * only shuffle moves orders keyed by o_custkey and candidates form
    * strictly inside per-customer buckets (bounded by order frequency
    * × the window), never across them; one persisted projection feeds
    * both sides; the 8-row rollup joins the broadcast spine.
    */
  def duplicatePaymentsOf(orders: DataFrame,
      windowDays: Long): DataFrame = {
    val o = CachedStages.track(orders.select(
      col("o_custkey"), col("o_orderkey"),
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .as("day"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100 AS BIGINT)")
        .as("cents")).persist())
    val pairs = o.as("a").join(o.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("a.o_orderkey") < col("b.o_orderkey"))
      .select(col("a.o_custkey").as("cust"),
        expr("abs(b.day - a.day)").as("gap_days"),
        expr("(a.cents div 10000) = (b.cents div 10000)").as("suspect"),
        expr("least(a.cents, b.cents)").as("risk_cents"))
      .filter(col("gap_days") <= windowDays)
    val agg = pairs.groupBy("gap_days")
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("IF(suspect, CAST(1 AS BIGINT), CAST(0 AS BIGINT))"))
          .as("n_suspect"),
        countDistinct(col("cust")).as("n_customers"),
        sum(expr("IF(suspect, risk_cents, CAST(0 AS BIGINT))"))
          .as("cents_at_risk"))
    val spine = orders.sparkSession.range(0L, windowDays + 1L)
      .select(col("id").as("gap_days"))
    spine.join(agg, Seq("gap_days"), "left")
      .na.fill(0L,
        Seq("n_pairs", "n_suspect", "n_customers", "cents_at_risk"))
      .orderBy("gap_days")
  }

  def lorenzDeciles(spark: SparkSession, dir: String): DataFrame =
    lorenzOf(Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100 AS BIGINT)"))
        .as("cents")))

  /** Graded q193: LORENZ CURVE by customer-spend decile — the curve
    * BEHIND q176's Gini number (Lorenz 1905): buyers ranked ascending
    * by spend, split into ten rank deciles, each decile's share of
    * total spend plus the cumulative share — the "bottom 50% hold X%"
    * readout marketing actually quotes. Spend quantizes to WHOLE
    * DOLLARS exactly as q176 (the quantized distribution IS the
    * documented contract), which is what makes a boundary-straddling
    * value group splittable EXACTLY: all members of a group share one
    * spend value, so decile d takes
    * `min(cum+c, dn div 10) − max(cum, (d−1)n div 10)` of its count
    * and that times the value dollars of its spend — no per-row
    * global sort anywhere.
    *
    * Scale shape: one orders scan collapses to per-buyer spend, then
    * to the value-domain histogram (bounded by the price range, the
    * q176/q53 discipline); the ONLY unpartitioned window runs over
    * that bounded histogram and the 10-row decile table; totals ride
    * one broadcast.
    */
  def lorenzOf(spend: DataFrame): DataFrame = {
    val hist = CachedStages.track(spend
      .withColumn("v", expr("cents div 100"))
      .groupBy("v").agg(count(lit(1)).as("c")).coalesce(1).persist())
    val tot = hist.agg(sum(col("c")).as("n"),
      sum(expr("CAST(v AS DECIMAL(38, 0)) * c")).as("total_d"))
    // bounded-by-construction: the frame runs over the value-domain
    // histogram (≤ |price range| rows), never the customer count
    val wc = Window.orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val deciles = hist
      .withColumn("cum", coalesce(sum(col("c")).over(wc), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("v"), col("c"), col("cum"), col("n"), col("total_d"),
        explode(expr("sequence(1, 10)")).as("decile"))
      .withColumn("decile", col("decile").cast("long"))
      .withColumn("dcount", expr(
        """greatest(CAST(0 AS BIGINT),
          |  least(cum + c, (decile * n) div 10)
          |  - greatest(cum, ((decile - 1) * n) div 10))""".stripMargin))
      .filter(col("dcount") > 0)
      .groupBy("decile")
      .agg(sum(col("dcount")).as("n_customers"),
        sum(expr("CAST(dcount AS DECIMAL(38, 0)) * v"))
          .as("spend_dollars"))
    val wd = Window.orderBy(col("decile").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciles
      .withColumn("cum_spend", sum(col("spend_dollars")).over(wd))
      .crossJoin(broadcast(tot.select(col("total_d"))))
      .select(col("decile"), col("n_customers"),
        expr("CAST(spend_dollars AS BIGINT)").as("spend_dollars"),
        expr("CAST(spend_dollars * 1000000 div nullif(total_d, 0) " +
          "AS BIGINT)").as("share_ppm"),
        expr("CAST(cum_spend * 1000000 div nullif(total_d, 0) " +
          "AS BIGINT)").as("cum_share_ppm"))
      .orderBy("decile")
  }

  def supplierReturnScreen(spark: SparkSession, dir: String): DataFrame =
    supplierReturnScreenOf(Tables(spark, dir, "lineitem"))

  /** Graded q195: SUPPLIER RETURN-RATE screen — q194's two-proportion
    * z machinery run as a QUALITY SWEEP: each supplier's returned-line
    * rate (`l_returnflag = 'R'`) against ALL OTHER suppliers pooled,
    * z² vs χ²₀.₉₅(1) from the shared `Chi2Crit95Ppm` table, and
    * `elevated` = significantly ABOVE the rest — the list procurement
    * escalates. One screen per supplier means a multiplicity caveat
    * (≈5% of clean suppliers flag by chance at this alpha); the
    * per-row verdict is the screen's contract, the Bonferroni
    * tightening is the analyst's knob downstream.
    *
    * Same fixed-point discipline as q194 (ppm rates, one-division
    * pooled se² in 10⁻¹⁸ units, bounded intermediates); the pooled
    * rate here is the GLOBAL rate — the null the screen tests.
    *
    * Scale shape: one lineitem scan collapses to per-supplier
    * (lines, returns) with map-side combine; the global row is one
    * broadcast; |suppliers| output rows.
    */
  def supplierReturnScreenOf(li: DataFrame): DataFrame = {
    val per = CachedStages.track(li
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(expr("IF(l_returnflag = 'R', CAST(1 AS BIGINT), " +
          "CAST(0 AS BIGINT))")).as("n_returned"))
      .coalesce(1).persist())
    val glob = per.agg(sum(col("n_lines")).as("nn"),
      sum(col("n_returned")).as("rr"))
    per.crossJoin(broadcast(glob))
      .withColumn("rate_ppm", expr("n_returned * 1000000 div n_lines"))
      .withColumn("rest_ppm", expr(
        "(rr - n_returned) * 1000000 div nullif(nn - n_lines, 0)"))
      .withColumn("diff_ppm", expr("rate_ppm - rest_ppm"))
      .withColumn("pooled_ppm", expr("rr * 1000000 div nn"))
      .withColumn("se2_e18", expr(
        """CAST(pooled_ppm AS DECIMAL(38, 0)) * (1000000 - pooled_ppm)
          | * nn * 1000000
          | div (CAST(n_lines AS DECIMAL(38, 0))
          |      * nullif(nn - n_lines, 0))""".stripMargin))
      .withColumn("z2_micro", expr(
        """CAST(CAST(diff_ppm AS DECIMAL(38, 0)) * diff_ppm
          | * 1000000000000 div nullif(se2_e18, 0) AS BIGINT)"""
          .stripMargin))
      .withColumn("elevated", expr(
        s"""CASE WHEN z2_micro IS NULL THEN CAST(NULL AS BIGINT)
           |     WHEN z2_micro > ${Events.Chi2Crit95Ppm.head}
           |          AND diff_ppm > 0 THEN CAST(1 AS BIGINT)
           |     ELSE CAST(0 AS BIGINT) END""".stripMargin))
      .select("l_suppkey", "n_lines", "n_returned", "rate_ppm",
        "rest_ppm", "diff_ppm", "z2_micro", "elevated")
      .orderBy("l_suppkey")
  }

  /** Upper-tail χ²(1) p ladder: (z²_micro threshold, p_ppm upper
    * bound), descending. The 0.05 rung IS `Events.Chi2Crit95Ppm.head`
    * so the q195 screen and the q235 correction can never disagree at
    * their shared alpha. Quantiles: 10.827566 (0.001), 6.634897
    * (0.01), 5.023886 (0.025), 3.841459 (0.05), 2.705543 (0.1),
    * 1.642374 (0.2), 0.454936 (0.5). */
  private[graft] val PLadderMicro: Seq[(Long, Long)] = Seq(
    (10827566L, 1000L), (6634897L, 10000L), (5023886L, 25000L),
    (Events.Chi2Crit95Ppm.head, 50000L), (2705543L, 100000L),
    (1642374L, 200000L), (454936L, 500000L))

  private[graft] def pLadderCase(z2: String): String =
    PLadderMicro.map { case (t, p) =>
      s"WHEN $z2 >= $t THEN CAST($p AS BIGINT)" }
      .mkString("CASE ", " ", " ELSE CAST(1000000 AS BIGINT) END")

  def supplierFdr(spark: SparkSession, dir: String): DataFrame =
    supplierFdrOf(Tables(spark, dir, "lineitem"))

  /** Graded q235: BENJAMINI–HOCHBERG FDR over the supplier
    * return-rate screen (Benjamini & Hochberg, JRSS-B 1995) — the
    * multiplicity correction q195's scaladoc explicitly left "the
    * analyst's knob downstream": at |suppliers| simultaneous screens,
    * ~5% of CLEAN suppliers flag by chance at per-row alpha, and
    * procurement escalates noise. Each tested supplier's z²_micro
    * maps to a CONSERVATIVE p upper bound through the shared
    * `PLadderMicro` table (quantized p-values keep BH exact-integer:
    * p̂_ppm·m ≤ rank·q_ppm with q = 10%, the step-up evaluated on
    * band cumulative ranks — valid because equal p̂ means one band
    * passes or fails as a unit); Bonferroni (p̂_ppm·m ≤ 50000) ships
    * beside it as the stricter classical contrast. Per-band report:
    * band p, suppliers, cumulative rank, BH pass, plus the global
    * discovery counts repeated per row (q181 discipline). Degenerate
    * (NULL-z²) suppliers are excluded from m — they were never
    * tested.
    *
    * Scale shape: rides the q195 screen unchanged (one lineitem
    * collapse, broadcast global); the correction itself runs on the
    * ≤8-row band table — a LADDER-bounded window, free at any scale.
    */
  def supplierFdrOf(li: DataFrame): DataFrame = {
    // persisted: traversed twice (the per-band rollup AND the m_tested
    // scalar) — unpersisted, the full supplier return screen over
    // lineitem executed twice (round-18 DupExec sweep, 33-node
    // subtree x2); same idiom for `cum` below (totals + final join)
    val tested = CachedStages.track(supplierReturnScreenOf(li)
      .filter(col("z2_micro").isNotNull)
      .withColumn("p_ppm", expr(pLadderCase("z2_micro")))
      .coalesce(1).persist())
    val bands = tested.groupBy("p_ppm")
      .agg(count(lit(1)).as("n_suppliers"))
    val m = tested.agg(count(lit(1)).as("m_tested"))
    val w = Window.orderBy("p_ppm")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = CachedStages.track(bands
      .withColumn("cum_tested", sum(col("n_suppliers")).over(w))
      .crossJoin(broadcast(m))
      .coalesce(1).persist())
      .withColumn("bh_pass", expr(
        """IF(p_ppm * m_tested <= cum_tested * 100000,
          | CAST(1 AS BIGINT), CAST(0 AS BIGINT))""".stripMargin))
      .withColumn("bonf_pass", expr(
        """IF(p_ppm * m_tested <= 50000,
          | CAST(1 AS BIGINT), CAST(0 AS BIGINT))""".stripMargin))
    val totals = cum.agg(
      coalesce(max(when(col("bh_pass") === 1L, col("cum_tested"))),
        lit(0L)).as("n_discoveries"),
      coalesce(max(when(col("bonf_pass") === 1L, col("cum_tested"))),
        lit(0L)).as("n_bonferroni"))
    cum.crossJoin(broadcast(totals))
      .select("p_ppm", "n_suppliers", "cum_tested", "bh_pass",
        "n_discoveries", "n_bonferroni", "m_tested")
      .orderBy("p_ppm")
  }

  def priceAnova(spark: SparkSession, dir: String): DataFrame =
    priceAnovaOf(Tables(spark, dir, "part"),
      Tables(spark, dir, "lineitem"))

  /** Graded q238: ONE-WAY ANOVA variance decomposition of unit price
    * by SUPPLIER within brand (Fisher 1925) — how much of a brand's
    * realized unit-price spread is BETWEEN suppliers (someone charges
    * more for the same catalog) vs within them (ordinary line noise)?
    * η² = SSB/SST is the effect size procurement negotiates on; the
    * engine's q228 regression and q195 screen ask related questions
    * of one covariate — this is the k-group decomposition. Unit price
    * y = extended cents div round(qty), one floor per line (the
    * documented quantization). Floored-mean computational form (the
    * per-group mean floors ONCE to whole cents, sub-cent loss at
    * 10⁵–10⁷-cent prices): B = Σ_g (S_g div n_g)·S_g − (S div n)·S,
    * T = Q − (S div n)·S, η²_ppm = max(0,B)·10⁶ div T — the max(0,·)
    * clamps the small negative a floored B can reach on a
    * zero-effect brand, both engines identically; every product runs
    * in DECIMAL(38) because Spark's integral `div` must land in 64
    * bits (the reason the naive S_g²·10⁶ div n_g form is NOT used).
    * The graded stream draws price independent of supplier, so
    * η² ≈ 0 — the no-hallucinated-structure control again.
    *
    * Scale shape: two nested map-side-combinable collapses — lines →
    * (brand, supplier) moments → brand report — behind one broadcast
    * part join; |brands| rows out. DECIMAL(38) bounds hold to
    * ~10⁹ lines per supplier at cent prices; pre-center beyond.
    */
  def priceAnovaOf(part: DataFrame, li: DataFrame): DataFrame =
    li.select(col("l_partkey"), col("l_suppkey"), expr(
        """CAST(CAST(l_extendedprice AS DECIMAL(12, 2)) * 100 AS BIGINT)
          | div CAST(round(l_quantity) AS BIGINT)""".stripMargin)
        .as("y"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_suppkey"))
      .agg(count(lit(1)).as("n_g"), sum(col("y")).as("s_g"),
        sum(expr("CAST(y AS DECIMAL(38, 0)) * y")).as("q_g"))
      .groupBy("p_brand")
      .agg(sum(col("n_g")).as("n_lines"),
        count(lit(1)).as("n_suppliers"),
        sum(col("s_g")).as("s"), sum(col("q_g")).as("q"),
        sum(expr(
          "CAST(s_g div n_g AS DECIMAL(38, 0)) * s_g")).as("gterms"))
      .withColumn("corr", expr(
        "CAST(s div n_lines AS DECIMAL(38, 0)) * s"))
      .withColumn("ssb", expr("greatest(gterms - corr, 0)"))
      .withColumn("sst", expr("q - corr"))
      // raw SS magnitudes exceed 64 bits at scale — only the bounded
      // ratios and means leave the operator
      .withColumn("eta2_ppm", expr(
        "CAST(ssb * 1000000 div nullif(sst, 0) AS BIGINT)"))
      .withColumn("mean_price_cents", expr("s div n_lines"))
      .select("p_brand", "n_lines", "n_suppliers",
        "mean_price_cents", "eta2_ppm")
      .orderBy("p_brand")

  def mutualInformation(spark: SparkSession, dir: String): DataFrame =
    mutualInformationOf(Tables(spark, dir, "customer")
      .select(expr("CAST(c_nationkey AS BIGINT)").as("x"),
        col("c_mktsegment").as("y")))

  /** Graded q268: MUTUAL INFORMATION of nation × market segment — the
    * information-theoretic companion to q247's Cramér's V²: V² says
    * how far from independence on the χ² scale (bounded, comparable
    * across tables), MI says how many NATS one attribute reveals
    * about the other — the quantity feature selectors rank by
    * (Battiti 1994) and the one that adds up over independent
    * attributes. Per cell: count, expected-independence count
    * (floored), and the signed PMI contribution (c/N)·ln(c·N/(cₓ·cy))
    * in nats; repeated per row: the marginal entropies, joint
    * entropy, MI, and Theil's uncertainty coefficients
    * U(x|y) = MI/H(x), U(y|x) = MI/H(y) (Theil 1970 — how much of
    * each attribute the other explains), both as the deterministic
    * ratio of the two ROUNDED values.
    *
    * Oracle parity: the q58/q264 ln discipline — every ln argument is
    * a correctly-rounded double ratio of exactly-representable
    * integer products (c·N, cₓ·cy ≪ 2⁵³), terms round 6, sums route
    * through exact DECIMAL(38,18). Empty cells contribute nothing
    * (0·ln 0 = 0, and absent cells are absent rows).
    *
    * Scale shape: ONE contingency collapse (map-side combinable) to
    * |x|·|y| cells; marginals re-aggregate the cell table (broadcast
    * back); every ln runs on cell-table rows — the corpus is scanned
    * once and never again.
    */
  def mutualInformationOf(df: DataFrame): DataFrame = {
    val dec18 = org.apache.spark.sql.types.DecimalType(38, 18)
    val cells = CachedStages.track(df.groupBy("x", "y")
      .agg(count(lit(1)).as("c")).coalesce(1).persist())
    // persisted: each marginal feeds the scored join AND its entropy
    // rollup, and the total feeds every branch — unpersisted, the
    // marginal/total aggregates over the cell cache re-ran per
    // consumer (round-18 DupExec sweep)
    val mx = CachedStages.track(
      cells.groupBy("x").agg(sum(col("c")).as("cx")).coalesce(1).persist())
    val my = CachedStages.track(
      cells.groupBy("y").agg(sum(col("c")).as("cy")).coalesce(1).persist())
    val tot = broadcast(CachedStages.track(
      cells.agg(sum(col("c")).as("n")).coalesce(1).persist()))
    def entropy(marg: DataFrame, cnt: String) = broadcast(
      marg.crossJoin(tot)
        .select(round(sum(
          (col(cnt).cast("double") / col("n").cast("double")) *
            log(col("n").cast("double") / col(cnt).cast("double")))
          .cast(dec18).cast("double"), 6).as("h")))
    val scored = CachedStages.track(cells
      .join(broadcast(mx), Seq("x"))
      .join(broadcast(my), Seq("y"))
      .crossJoin(tot)
      .withColumn("expected", expr("cx * cy div n"))
      .withColumn("pmi_term", round(
        (col("c").cast("double") / col("n").cast("double")) *
          log((col("c") * col("n")).cast("double") /
            (col("cx") * col("cy")).cast("double")), 6))
      .coalesce(1).persist())
    val hxy = broadcast(scored.select(round(sum(
      (col("c").cast("double") / col("n").cast("double")) *
        log(col("n").cast("double") / col("c").cast("double")))
      .cast(dec18).cast("double"), 6).as("h_joint")))
    val mi = broadcast(scored.select(round(
      sum(col("pmi_term").cast(dec18)).cast("double"), 6)
      .as("mi_nats")))
    scored
      .crossJoin(entropy(mx, "cx").withColumnRenamed("h", "h_x"))
      .crossJoin(entropy(my, "cy").withColumnRenamed("h", "h_y"))
      .crossJoin(hxy).crossJoin(mi)
      .withColumn("u_x_given_y", expr(
        "IF(h_x = 0.0D, CAST(NULL AS DOUBLE), round(mi_nats / h_x, 6))"))
      .withColumn("u_y_given_x", expr(
        "IF(h_y = 0.0D, CAST(NULL AS DOUBLE), round(mi_nats / h_y, 6))"))
      .select("x", "y", "c", "expected", "pmi_term", "h_x", "h_y",
        "h_joint", "mi_nats", "u_x_given_y", "u_y_given_x")
      .orderBy("x", "y")
  }

  def cramersV(spark: SparkSession, dir: String): DataFrame =
    cramersVOf(Tables(spark, dir, "orders").select(
      col("o_orderpriority").as("priority"),
      col("o_orderstatus").as("status"),
      expr("""CAST((unix_micros(CAST(o_orderdate AS TIMESTAMP))
        | div 86400000000 + 3) % 7 AS STRING)""".stripMargin)
        .as("weekday")),
      Seq("priority", "status", "weekday"))

  /** Graded q247: CRAMÉR's V² dependency matrix between categorical
    * order attributes (Cramér 1946) — the CORRELATED-COLUMNS detector
    * the q153/q160 estimation family presumes away: a cost model that
    * multiplies per-column selectivities is wrong exactly where this
    * matrix lights up, so "which columns move together" is the first
    * question optimizer statistics should answer. Per column pair,
    * the homogeneity χ² via the present-cells identity χ² =
    * n·Σ o²/(r·c) − n (absent cells need no enumeration — their mass
    * is IN the identity), per-cell floors in DECIMAL(38):
    * chi2_micro = Σ floor(o²·n·10⁶/(r·c)) − n·10⁶, then the
    * sqrt-free V² = chi2_micro div (n·min(k_a−1, k_b−1)) in ppm —
    * 0 = independent, 10⁶ = functionally determined. Constant
    * columns (min k−1 = 0) surface NULL via nullif.
    *
    * Scale shape: the base projection persists once; each pair is
    * one map-side-combinable contingency collapse (≤k_a·k_b cells)
    * with margins broadcast back onto the cells; the matrix is
    * |pairs| rows.
    */
  def cramersVOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val base = CachedStages.track(df.persist())
    // persisted: broadcast into EVERY column-pair branch — unpersisted,
    // the count re-scanned the base cache once per pair (round-18
    // DupExec sweep)
    val n = CachedStages.track(
      base.agg(count(lit(1)).as("n")).coalesce(1).persist())
    val parts = cols.combinations(2).map { case Seq(a, b) =>
      val cells = CachedStages.track(base
        .groupBy(col(a).as("va"), col(b).as("vb"))
        .agg(count(lit(1)).as("o"))
        .coalesce(1).persist())
      // persisted: each margin feeds its broadcast join AND its
      // cardinality rollup (ka/kb) — two consumers per margin
      val ra = CachedStages.track(
        cells.groupBy("va").agg(sum(col("o")).as("r")).coalesce(1).persist())
      val rb = CachedStages.track(
        cells.groupBy("vb").agg(sum(col("o")).as("c")).coalesce(1).persist())
      val ka = ra.agg(count(lit(1)).as("k_a"))
      val kb = rb.agg(count(lit(1)).as("k_b"))
      cells.join(broadcast(ra), Seq("va"))
        .join(broadcast(rb), Seq("vb"))
        .crossJoin(broadcast(n))
        .withColumn("term", expr(
          """CAST(o AS DECIMAL(38, 0)) * o * n * 1000000
            | div (CAST(r AS DECIMAL(38, 0)) * c)""".stripMargin))
        .agg(sum(col("term")).as("t"), max(col("n")).as("n"))
        .crossJoin(broadcast(ka)).crossJoin(broadcast(kb))
        .select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
          col("k_a"), col("k_b"),
          expr("CAST(t - CAST(n AS DECIMAL(38, 0)) * 1000000 " +
            "AS BIGINT)").as("chi2_micro"))
    }.toSeq
    parts.reduce(_.unionByName(_))
      .withColumn("v2_ppm", expr(
        """chi2_micro div nullif(n * least(k_a - 1, k_b - 1), 0)"""))
      .select("col_a", "col_b", "n", "k_a", "k_b", "chi2_micro",
        "v2_ppm")
      .orderBy("col_a", "col_b")
  }

  def abcXyzMatrix(spark: SparkSession, dir: String): DataFrame =
    abcXyzOf(Tables(spark, dir, "lineitem"))

  /** Graded q196: ABC-XYZ PLANNING MATRIX — the inventory-policy grid
    * that crosses q174's revenue Pareto with DEMAND VARIABILITY
    * (Errasti/Dickie practice): XYZ classes from the coefficient of
    * variation of a part's YEARLY demand over the global calendar
    * span (X predictable CV ≤ 0.5, Y ≤ 1.0, Z erratic) — AX is
    * "automate the reorder", CZ is "stock nothing, order on demand".
    * The period is YEARS because these are slow movers (~30 lines per
    * part over 7 years: monthly buckets make every part trivially Z —
    * measured, and exactly why practitioners size the XYZ period to
    * the item's movement rate); yearly splits the catalog ~52/48/0.4
    * across X/Y/Z at every scale. Sqrt-free: CV² = (M·Σq²−S²)/S²
    * compares cross-multiplied — X iff 4·(M·Σq²−S²) ≤ S², Y iff
    * (M·Σq²−S²) ≤ S² — in DECIMAL(38)/HUGEINT, quantities in
    * centi-units. Years ABSENT from a part's history are true
    * zero-demand years: the global span M enters the moments directly
    * (zeros add nothing to Σq, Σq²), so no per-part calendar
    * densification is ever needed.
    *
    * Per-part ABC runs the SAME two-phase discipline as q174 (coarse
    * revenue-bucket histogram carries the only unpartitioned window;
    * the ≤2 cut-straddling buckets resolve per-part; every other
    * bucket classifies wholesale) but EMITS the per-part class; the
    * oracle replays the independent global-window formulation — the
    * hash match proves the reduction, the q179 pattern. Matrix cells:
    * part count, revenue share, quantity share (ppm), on the fixed
    * 9-cell spine.
    *
    * Scale shape: one lineitem scan → per-(part, month) collapse →
    * per-part moments (all map-side combinable); the ABC branch reads
    * the same persisted per-part table; cut-bucket windows are
    * bucket-bounded; the rollup is 9 rows.
    */
  def abcXyzOf(li: DataFrame): DataFrame = {
    val monthly = CachedStages.track(li.select(col("l_partkey"),
        expr("year(l_shipdate)").as("m"),
        expr("CAST(CAST(l_quantity AS DECIMAL(12, 2)) * 100 AS BIGINT)")
          .as("qc"),
        revenueTerm(col("l_extendedprice"), col("l_discount")).as("rt"))
      .groupBy("l_partkey", "m")
      .agg(sum(col("qc")).as("qm"), sum(col("rt")).as("rm"))
      .persist())
    val perPart = CachedStages.track(monthly.groupBy("l_partkey")
      .agg(sum(col("qm")).as("sq"),
        sum(expr("CAST(qm AS DECIMAL(38, 0)) * qm")).as("q2"),
        (sum(col("rm")) * 10000).cast("long").as("r4"))
      .persist())
    val span = monthly.agg((max(col("m")) - min(col("m")) + 1).as("mm"))
    val xyzed = perPart.crossJoin(broadcast(span))
      .withColumn("var_num", expr(
        "CAST(mm AS DECIMAL(38, 0)) * q2 - CAST(sq AS DECIMAL(38, 0)) * sq"))
      .withColumn("xyz_class", expr(
        """CASE WHEN var_num * 4 <= CAST(sq AS DECIMAL(38, 0)) * sq
          |       THEN 'X'
          |     WHEN var_num <= CAST(sq AS DECIMAL(38, 0)) * sq THEN 'Y'
          |     ELSE 'Z' END""".stripMargin))
      .select("l_partkey", "xyz_class", "r4", "sq")
    // per-part ABC: q174's two-phase, emitting the class per part
    val hist = CachedStages.track(perPart
      .withColumn("hb", expr("r4 div 10000000"))
      .groupBy("hb")
      .agg(count(lit(1)).as("n_in"), sum(col("r4")).as("s_in"))
      .coalesce(1).persist())
    val wb = Window.orderBy(col("hb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = hist.agg(sum(col("s_in")).as("total"),
      sum(col("n_in")).as("np"))
    val buckets = CachedStages.track(hist
      .withColumn("cum_before", coalesce(sum(col("s_in")).over(wb), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("has_cut",
        (expr("cum_before * 5 < total * 4") &&
          expr("(cum_before + s_in) * 5 >= total * 4")) ||
        (expr("cum_before * 20 < total * 19") &&
          expr("(cum_before + s_in) * 20 >= total * 19")))
      .coalesce(1).persist())
    def classExpr(cumBefore: String) = expr(
      s"""CASE WHEN $cumBefore * 5 < total * 4 THEN 'A'
         |     WHEN $cumBefore * 20 < total * 19 THEN 'B'
         |     ELSE 'C' END""".stripMargin)
    val withHb = perPart.withColumn("hb", expr("r4 div 10000000"))
    val nonCut = withHb.join(broadcast(buckets.filter(!col("has_cut"))
        .select("hb", "cum_before", "total")), Seq("hb"))
      .select(col("l_partkey"), classExpr("cum_before").as("abc_class"))
    val wIn = Window.partitionBy("hb")
      .orderBy(col("r4").desc, col("l_partkey").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cut = withHb.join(broadcast(buckets.filter(col("has_cut"))
        .select("hb", "cum_before", "total")), Seq("hb"))
      .withColumn("pcb",
        col("cum_before") + coalesce(sum(col("r4")).over(wIn), lit(0L)))
      .select(col("l_partkey"), classExpr("pcb").as("abc_class"))
    val abc = nonCut.unionByName(cut)
    val tot2 = perPart.agg(sum(col("r4")).as("tr"), sum(col("sq")).as("tq"))
    val cells = xyzed.join(abc, Seq("l_partkey"))
      .groupBy("abc_class", "xyz_class")
      .agg(count(lit(1)).as("n_parts"), sum(col("r4")).as("cr"),
        sum(col("sq")).as("cq"))
    val spine = li.sparkSession.range(1)
      .select(explode(expr("array('A', 'B', 'C')")).as("abc_class"))
      .select(col("abc_class"),
        explode(expr("array('X', 'Y', 'Z')")).as("xyz_class"))
    spine.join(cells, Seq("abc_class", "xyz_class"), "left")
      .na.fill(0L, Seq("n_parts", "cr", "cq"))
      .crossJoin(broadcast(tot2))
      .select(col("abc_class"), col("xyz_class"), col("n_parts"),
        expr("CAST(CAST(cr AS DECIMAL(38, 0)) * 1000000 div tr AS BIGINT)")
          .as("revenue_share_ppm"),
        expr("CAST(CAST(cq AS DECIMAL(38, 0)) * 1000000 div tq AS BIGINT)")
          .as("qty_share_ppm"))
      .orderBy("abc_class", "xyz_class")
  }

  def priceDispersion(spark: SparkSession, dir: String): DataFrame =
    priceDispersionOf(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "part"))

  /** Graded q197: UNIT-PRICE DISPERSION audit — the pricing-integrity
    * screen: the same part transacting at different effective unit
    * prices (extendedprice/quantity) signals discount leakage, stale
    * price lists, or channel conflict. Per part: min/max unit price in
    * micro-dollars (ext_cents·10⁶ div qty_centi — one floored integral
    * division) and the relative spread (max−min)·10⁶ div min; rolled
    * up per brand into fixed dispersion bands (uniform, ≤1%, ≤5%,
    * ≤20%, >20%) plus the brand's worst spread. On this synthetic
    * stream every part disperses (prices are drawn per line — the
    * loud-failure mode, measured); a disciplined book concentrates in
    * `n_uniform`/`n_le_1pct`.
    *
    * Scale shape: one lineitem scan collapses to per-part min/max on
    * the part key (map-side combinable); ONE part-keyed join carries
    * the brand in (dimension-sized side, AQE broadcasts it); the
    * rollup is |brands| rows.
    */
  def priceDispersionOf(li: DataFrame, part: DataFrame): DataFrame = {
    val per = li.select(col("l_partkey"), expr(
      """CAST(CAST(l_extendedprice AS DECIMAL(12, 2)) * 100 AS BIGINT)
        | * 1000000
        | div CAST(CAST(l_quantity AS DECIMAL(12, 2)) * 100 AS BIGINT)"""
        .stripMargin).as("um"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_lines"), min(col("um")).as("mn"),
        max(col("um")).as("mx"))
      .withColumn("spread_ppm",
        expr("(mx - mn) * 1000000 div nullif(mn, 0)"))
    per.join(part.select(col("p_partkey").as("l_partkey"), col("p_brand")),
        Seq("l_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        sum(expr("IF(spread_ppm = 0, CAST(1 AS BIGINT), " +
          "CAST(0 AS BIGINT))")).as("n_uniform"),
        sum(expr("IF(spread_ppm > 0 AND spread_ppm <= 10000, " +
          "CAST(1 AS BIGINT), CAST(0 AS BIGINT))")).as("n_le_1pct"),
        sum(expr("IF(spread_ppm > 10000 AND spread_ppm <= 50000, " +
          "CAST(1 AS BIGINT), CAST(0 AS BIGINT))")).as("n_le_5pct"),
        sum(expr("IF(spread_ppm > 50000 AND spread_ppm <= 200000, " +
          "CAST(1 AS BIGINT), CAST(0 AS BIGINT))")).as("n_le_20pct"),
        sum(expr("IF(spread_ppm > 200000, CAST(1 AS BIGINT), " +
          "CAST(0 AS BIGINT))")).as("n_gt_20pct"),
        max(col("spread_ppm")).as("max_spread_ppm"))
      .orderBy("p_brand")
  }

  def evergreenBestsellers(spark: SparkSession, dir: String,
      topK: Int = 20): DataFrame =
    evergreenOf(Tables(spark, dir, "lineitem"), topK)

  /** Graded q200: EVERGREEN BESTSELLERS — ranking STABILITY of the
    * weekly revenue top-k: merchandising's "is this a hit or a spike?"
    * question. Per ship-week, parts rank by weekly revenue (row_number
    * over (revenue desc, partkey asc) — fully pinned ties); per part
    * ever appearing in a weekly top-k: weeks in top, total weeks,
    * presence share in ppm, and the best rank reached. A part at
    * presence 10⁶ is assortment-core; a single-week entrant at a good
    * rank is a promotion spike.
    *
    * Scale shape: one lineitem scan collapses to the (week, part)
    * revenue table (map-side combinable — the only corpus-sized
    * shuffle); the rank window partitions BY WEEK over that collapsed
    * table (each partition is at most the catalog, never the line
    * count) and the top-k filter immediately bounds everything
    * downstream to ≤ k·|weeks| rows; the week-count scalar broadcasts.
    */
  def evergreenOf(li: DataFrame, topK: Int): DataFrame = {
    val weekly = li.select(
        expr("""unix_micros(CAST(l_shipdate AS TIMESTAMP))
          | div 86400000000 div 7""".stripMargin).as("week"),
        col("l_partkey"),
        revenueTerm(col("l_extendedprice"), col("l_discount")).as("rt"))
      .groupBy("week", "l_partkey")
      .agg((sum(col("rt")) * 10000).cast("long").as("r4"))
    val wk = Window.partitionBy("week")
      .orderBy(col("r4").desc, col("l_partkey").asc)
    val top = CachedStages.track(weekly
      .withColumn("rnk", row_number().over(wk))
      .filter(col("rnk") <= topK)
      .repartition(1).persist())
    val nWeeks = top.agg(countDistinct(col("week")).as("n_weeks"))
    top.groupBy("l_partkey")
      .agg(count(lit(1)).as("weeks_in_top"),
        min(col("rnk")).cast("long").as("best_rank"))
      .crossJoin(broadcast(nWeeks))
      .withColumn("presence_ppm",
        expr("weeks_in_top * 1000000 div n_weeks"))
      .select("l_partkey", "weeks_in_top", "n_weeks", "presence_ppm",
        "best_rank")
      .orderBy(col("weeks_in_top").desc, col("l_partkey").asc)
  }

  def fkCoverageAudit(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tables(spark, dir, n)
    fkCoverageOf(Seq(
      ("customer.c_nationkey->nation", t("customer"), "c_nationkey",
        t("nation"), "n_nationkey"),
      ("lineitem.l_orderkey->orders", t("lineitem"), "l_orderkey",
        t("orders"), "o_orderkey"),
      ("lineitem.l_partkey->part", t("lineitem"), "l_partkey",
        t("part"), "p_partkey"),
      ("lineitem.l_suppkey->supplier", t("lineitem"), "l_suppkey",
        t("supplier"), "s_suppkey"),
      ("nation.n_regionkey->region", t("nation"), "n_regionkey",
        t("region"), "r_regionkey"),
      ("orders.o_custkey->customer", t("orders"), "o_custkey",
        t("customer"), "c_custkey"),
      ("supplier.s_nationkey->nation", t("supplier"), "s_nationkey",
        t("nation"), "n_nationkey")))
  }

  /** Graded q201: REFERENTIAL-INTEGRITY audit of every foreign-key
    * edge in the schema — the first page of any data-quality report:
    * per edge, child rows, NULL keys, ORPHANS (child keys with no
    * parent — the silent inner-join row-loss q191 met on the
    * order↔line edge), and coverage in ppm. The seven TPC-H-shaped
    * edges are audited in one artifact; a lakehouse runs exactly this
    * before promising join completeness to consumers.
    *
    * Scale shape: per edge, the child collapses to per-key counts
    * (map-side combinable) and LEFT-joins the parent's distinct-key
    * projection on the key both sides already shuffle by — the orphan
    * mass reads off the unmatched side without ever moving child
    * rows twice. Results union to |edges| rows.
    */
  def fkCoverageOf(edges: Seq[(String, DataFrame, String, DataFrame,
      String)]): DataFrame =
    edges.map { case (label, child, fk, parent, pk) =>
      val keys = child.select(col(fk).as("k"))
        .groupBy("k").agg(count(lit(1)).as("cnt"))
      val pkeys = parent.select(col(pk).as("k")).distinct()
        .withColumn("hit", lit(1L))
      keys.join(pkeys, Seq("k"), "left")
        .agg(sum(col("cnt")).as("n_child"),
          sum(when(col("k").isNull, col("cnt")).otherwise(0L))
            .as("n_null_fk"),
          sum(when(col("k").isNotNull && col("hit").isNull, col("cnt"))
            .otherwise(0L)).as("n_orphans"))
        .select(lit(label).as("edge"), col("n_child"),
          coalesce(col("n_null_fk"), lit(0L)).as("n_null_fk"),
          coalesce(col("n_orphans"), lit(0L)).as("n_orphans"),
          expr("""(n_child - coalesce(n_null_fk, 0)
            | - coalesce(n_orphans, 0)) * 1000000
            | div n_child""".stripMargin).as("coverage_ppm"))
    }.reduce(_ unionByName _).orderBy("edge")

  /** The q202 candidate FDs: a deliberate mix of key-implied holds
    * and plausible-but-false dependencies.
    */
  val FdCandidates: Seq[(String, String, String)] = Seq(
    ("customer", "c_custkey", "c_mktsegment"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("nation", "n_name", "n_regionkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("part", "p_brand", "p_type"),
    ("part", "p_name", "p_brand"))

  def fdProfile(spark: SparkSession, dir: String): DataFrame =
    fdProfileOf(FdCandidates.map { case (t, det, dep) =>
      (t, det, dep, Tables(spark, dir, t))
    })

  /** Graded q202: FUNCTIONAL-DEPENDENCY profiling — approximate-FD
    * discovery's verification step (TANE, Huhtala et al. 1999) over
    * candidate `det → dep` rules: per candidate, the g₃ error
    * (Kivinen & Mannila) = the MINIMUM rows to delete for the FD to
    * hold exactly — Σ over det-groups of (group size − plurality dep
    * count) — plus group counts and the verdict. Key-determined
    * candidates must come back g₃ = 0 (the built-in control);
    * plausible-but-false ones (nation → segment) quantify HOW false
    * in ppm, which is what schema inference actually needs.
    *
    * All integer: the plurality count is a max of counts, g₃ a sum of
    * differences — every aggregate map-side combinable; per candidate
    * one (det, dep) collapse then a det collapse, |candidates| output
    * rows.
    */
  def fdProfileOf(cands: Seq[(String, String, String, DataFrame)])
      : DataFrame =
    cands.map { case (table, det, dep, df) =>
      val cnt = df.groupBy(col(det).as("d"), col(dep).as("v"))
        .agg(count(lit(1)).as("c"))
      val per = cnt.groupBy("d")
        .agg(sum(col("c")).as("tot"), max(col("c")).as("mx"),
          count(lit(1)).as("ndep"))
      per.agg(sum(col("tot")).as("n_rows"),
          count(lit(1)).as("n_groups"),
          sum(when(col("ndep") > 1, 1L).otherwise(0L))
            .as("n_violating"),
          sum(expr("tot - mx")).as("g3_rows"))
        .select(lit(table).as("table_name"), lit(det).as("determinant"),
          lit(dep).as("dependent"), col("n_rows"), col("n_groups"),
          col("n_violating"), col("g3_rows"),
          expr("g3_rows * 1000000 div n_rows").as("g3_ppm"),
          expr("IF(g3_rows = 0, CAST(1 AS BIGINT), CAST(0 AS BIGINT))")
            .as("holds"))
    }.reduce(_ unionByName _)
      .orderBy("table_name", "determinant", "dependent")

  def marketShareShift(spark: SparkSession, dir: String): DataFrame =
    marketShareShiftOf(Tables(spark, dir, "orders"),
      Tables(spark, dir, "customer"), Tables(spark, dir, "nation"))

  /** Graded q204: MARKET-SHARE SHIFT — per (nation, order year):
    * revenue cents, share of that year's total in ppm, and the
    * year-over-year share delta (the competitive-dynamics readout:
    * who is taking whose share). Shares are exact integral divisions
    * against broadcast per-year totals; the YoY delta is a lag over
    * each nation's ≤|years|-row series — a bounded window. First
    * years carry a NULL delta honestly (no prior to compare).
    *
    * Scale shape: orders joins customer on the custkey both already
    * shuffle by, the nation dim broadcasts, one collapse to the
    * (nation, year) matrix (≤ 25·|years| rows) — every window and
    * join after the collapse is model-sized.
    */
  def marketShareShiftOf(orders: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame = {
    val ny = CachedStages.track(orders.select(
        col("o_custkey").as("c_custkey"),
        expr("year(CAST(o_orderdate AS TIMESTAMP))").as("yr"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100 AS BIGINT)")
          .as("cents"))
      .join(customer.select("c_custkey", "c_nationkey"), Seq("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("c_nationkey"),
        col("n_name"))), Seq("c_nationkey"))
      .groupBy(col("n_name"), col("yr"))
      .agg(sum(col("cents")).as("revenue_cents"))
      .coalesce(1).persist())
    val yearTot = ny.groupBy("yr").agg(sum(col("revenue_cents")).as("yt"))
    val wn = Window.partitionBy("n_name").orderBy(col("yr").asc)
    ny.join(broadcast(yearTot), Seq("yr"))
      .withColumn("share_ppm", expr(
        "CAST(CAST(revenue_cents AS DECIMAL(38, 0)) * 1000000 div yt " +
          "AS BIGINT)"))
      .withColumn("delta_share_ppm",
        col("share_ppm") - lag(col("share_ppm"), 1).over(wn))
      .select(col("n_name"), expr("CAST(yr AS BIGINT)").as("yr"),
        col("revenue_cents"), col("share_ppm"), col("delta_share_ppm"))
      .orderBy("n_name", "yr")
  }

  def concentrationRatios(spark: SparkSession, dir: String): DataFrame =
    concentrationOf(Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100 AS BIGINT)"))
        .as("cents"))
      .join(Tables(spark, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_nationkey").cast("long").as("nation")),
        Seq("o_custkey")))

  /** Graded q206: CONCENTRATION RATIOS CR1/CR4/CR10 per nation — the
    * industrial-organization standard (Bain's structure metrics; the
    * census bureau publishes exactly these): the revenue share of the
    * top 1 / 4 / 10 buyers. The THIRD lens on buyer concentration
    * beside q162's HHI (whole-distribution sum of squares) and
    * q176/q193's Gini/Lorenz (inequality of everyone): CR-k answers
    * "how exposed are we to losing our k biggest accounts" — the
    * key-account dependence number sales leadership actually tracks.
    *
    * Determinism: per-nation spend ranks by (cents desc, custkey asc)
    * — fully pinned; shares are single integral divisions of exact
    * top-k prefix sums.
    *
    * Scale shape: orders collapse per customer on the custkey the
    * customer join shuffles by anyway; the rank window partitions BY
    * NATION over per-customer rows (bounded by the nation's customer
    * count — the q03 top-N-per-group discipline) and the k ≤ 10
    * prefix immediately bounds the rollup.
    */
  def concentrationOf(spendByNation: DataFrame): DataFrame = {
    val sp = CachedStages.track(spendByNation.persist())
    val tot = sp.groupBy("nation")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("total_cents"))
    val wr = Window.partitionBy("nation")
      .orderBy(col("cents").desc, col("o_custkey").asc)
    val ranked = sp.withColumn("rnk", row_number().over(wr))
      .filter(col("rnk") <= 10)
    ranked.groupBy("nation")
      .agg(sum(when(col("rnk") <= 1, col("cents")).otherwise(0L))
          .as("t1"),
        sum(when(col("rnk") <= 4, col("cents")).otherwise(0L)).as("t4"),
        sum(col("cents")).as("t10"))
      .join(broadcast(tot), Seq("nation"))
      .select(col("nation"), col("n_customers"),
        col("total_cents"),
        expr("""CAST(CAST(t1 AS DECIMAL(38, 0)) * 1000000
          | div total_cents AS BIGINT)""".stripMargin).as("cr1_ppm"),
        expr("""CAST(CAST(t4 AS DECIMAL(38, 0)) * 1000000
          | div total_cents AS BIGINT)""".stripMargin).as("cr4_ppm"),
        expr("""CAST(CAST(t10 AS DECIMAL(38, 0)) * 1000000
          | div total_cents AS BIGINT)""".stripMargin).as("cr10_ppm"))
      .orderBy("nation")
  }

  def promoLift(spark: SparkSession, dir: String): DataFrame =
    promoLiftOf(Tables(spark, dir, "lineitem"))

  /** Graded q207: PROMOTION-LIFT readout — per discount level, does a
    * deeper discount actually move more units? Per discount (in ppm):
    * line count, total and average quantity (centi-units, floored
    * once), and the volume LIFT vs the zero-discount baseline as ONE
    * cross-multiplied integral division — (Σq·n₀)·10⁶ div (n·Σq₀) —
    * which lands at exactly 10⁶ on the baseline row itself (no
    * special case). On this synthetic stream quantity is drawn
    * independently of discount, so every lift reads ≈10⁶: the NULL
    * RESULT a clean A/B of a useless promotion should show — the
    * selection-bias warning (promotions target slow movers in real
    * books) lives in the scaladoc, not the arithmetic.
    *
    * Scale shape: one lineitem scan collapses to ≤|discount levels|
    * rows map-side; the baseline is a 1-row broadcast.
    */
  def promoLiftOf(li: DataFrame): DataFrame = {
    val per = CachedStages.track(li.select(
        expr("CAST(CAST(l_discount AS DECIMAL(8, 6)) * 1000000 " +
          "AS BIGINT)").as("disc_ppm"),
        expr("CAST(CAST(l_quantity AS DECIMAL(12, 2)) * 100 AS BIGINT)")
          .as("qc"))
      .groupBy("disc_ppm")
      .agg(count(lit(1)).as("n_lines"), sum(col("qc")).as("sum_qty_centi"))
      .persist())
    val base = per.filter(col("disc_ppm") === 0L)
      .select(col("n_lines").as("n0"), col("sum_qty_centi").as("q0"))
    per.crossJoin(broadcast(base))
      .withColumn("avg_qty_centi", expr("sum_qty_centi div n_lines"))
      .withColumn("lift_ppm", expr(
        """CAST(CAST(sum_qty_centi AS DECIMAL(38, 0)) * n0 * 1000000
          | div (CAST(n_lines AS DECIMAL(38, 0)) * nullif(q0, 0))
          | AS BIGINT)""".stripMargin))
      .select("disc_ppm", "n_lines", "sum_qty_centi", "avg_qty_centi",
        "lift_ppm")
      .orderBy("disc_ppm")
  }

  def deadStock(spark: SparkSession, dir: String,
      staleDays: Long = 365L): DataFrame =
    deadStockOf(Tables(spark, dir, "part"),
      Tables(spark, dir, "lineitem"), staleDays)

  /** Graded q208: DEAD-STOCK report — the assortment complement to
    * q200's evergreens: per brand, catalog parts with NO sale in the
    * trailing `staleDays` of the calendar (cutoff = max ship day −
    * staleDays; never-sold parts are dead by definition), the dead
    * share in ppm, and the retail value parked in them — the
    * working-capital number a markdown decision starts from.
    *
    * Scale shape: lineitem filters to the trailing window THEN
    * collapses to distinct recently-sold partkeys (the only
    * corpus-sized work, map-side combinable); the catalog LEFT-joins
    * that key set part-keyed; the rollup is |brands| rows. The max
    * ship day is one broadcast scalar.
    */
  def deadStockOf(part: DataFrame, li: DataFrame,
      staleDays: Long): DataFrame = {
    val days = li.select(expr(
      "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
      .as("day"), col("l_partkey"))
    val cutoff = days.agg(max(col("day")).as("mx"))
      .select(expr(s"mx - $staleDays").as("cutoff"))
    val recent = days.crossJoin(broadcast(cutoff))
      .filter(col("day") > col("cutoff"))
      .select(col("l_partkey").as("p_partkey")).distinct()
      .withColumn("alive", lit(1L))
    part.select(col("p_partkey"), col("p_brand"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(12, 2)) * 100 " +
          "AS BIGINT)").as("retail_cents"))
      .join(recent, Seq("p_partkey"), "left")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("alive").isNull, 1L).otherwise(0L)).as("n_dead"),
        sum(when(col("alive").isNull, col("retail_cents")).otherwise(0L))
          .as("dead_value_cents"))
      .withColumn("dead_ppm", expr("n_dead * 1000000 div n_parts"))
      .select("p_brand", "n_parts", "n_dead", "dead_ppm",
        "dead_value_cents")
      .orderBy("p_brand")
  }

  /** The fixed band spine of the q191 reconciliation report. */
  val ReconBands: Seq[String] = Seq("exact",
    "pos_le_1", "pos_le_100", "pos_le_10k", "pos_gt_10k",
    "neg_le_1", "neg_le_100", "neg_le_10k", "neg_gt_10k",
    "no_lines", "orphan_lines")

  def reconciliationAudit(spark: SparkSession, dir: String): DataFrame =
    reconciliationAuditOf(Tables(spark, dir, "orders"),
      Tables(spark, dir, "lineitem"))

  /** Graded q191: ORDER↔LINEITEM RECONCILIATION audit — double-entry
    * bookkeeping for the order pipeline: each order's booked
    * `o_totalprice` against the total RECOMPUTED from its own lines,
    * Σ extendedprice·(1−discount)·(1+tax) (the TPC-H charge formula),
    * plus the two referential-completeness failure modes a FULL OUTER
    * join surfaces: orders with no lines (`no_lines` — booked revenue
    * with nothing behind it) and lines with no order (`orphan_lines`).
    * Per fixed mismatch band (exact, ±≤$1/$100/$10k/>$10k by sign):
    * order count and total absolute delta cents. On this synthetic
    * data the columns are NOT linked, so the distribution spreads
    * across the outer bands — the audit's loud-failure mode, which is
    * what it is for; `exact` going non-trivial is what a real book
    * shows.
    *
    * Determinism: line charge in integer micro-arithmetic —
    * cents × (10⁶−disc_ppm) × (10⁶+tax_ppm) div 10¹² in DECIMAL(38)
    * (≈10¹⁹ intermediate, HUGEINT on the oracle side), floored per
    * line then summed.
    *
    * Scale shape: lineitem collapses per order on the SAME orderkey
    * shuffle the join needs (co-partitioned agg + join); the band
    * rollup is 11 rows against a broadcast spine.
    */
  def reconciliationAuditOf(orders: DataFrame, li: DataFrame): DataFrame = {
    val recomputed = li.select(col("l_orderkey").as("okey"), expr(
      """CAST(CAST(CAST(l_extendedprice AS DECIMAL(12, 2)) * 100
        |  AS BIGINT) AS DECIMAL(38, 0))
        | * (1000000 - CAST(CAST(l_discount AS DECIMAL(8, 6)) * 1000000
        |     AS BIGINT))
        | * (1000000 + CAST(CAST(l_tax AS DECIMAL(8, 6)) * 1000000
        |     AS BIGINT))
        | div 1000000000000""".stripMargin).as("charge_cents"))
      .groupBy("okey").agg(sum(col("charge_cents")).as("recomputed_cents"))
    val booked = orders.select(col("o_orderkey").as("okey"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(12, 2)) * 100 AS BIGINT)")
        .as("booked_cents"))
    val banded = booked.join(recomputed, Seq("okey"), "full_outer")
      .select(expr(
        """CASE WHEN booked_cents IS NULL THEN 'orphan_lines'
          |     WHEN recomputed_cents IS NULL THEN 'no_lines'
          |     WHEN recomputed_cents = booked_cents THEN 'exact'
          |     ELSE concat(
          |       IF(recomputed_cents > booked_cents, 'pos_', 'neg_'),
          |       CASE WHEN abs(recomputed_cents - booked_cents) <= 100
          |              THEN 'le_1'
          |            WHEN abs(recomputed_cents - booked_cents) <= 10000
          |              THEN 'le_100'
          |            WHEN abs(recomputed_cents - booked_cents) <= 1000000
          |              THEN 'le_10k'
          |            ELSE 'gt_10k' END) END""".stripMargin).as("band"),
        expr("""abs(coalesce(recomputed_cents, CAST(0 AS BIGINT))
          | - coalesce(booked_cents, CAST(0 AS BIGINT)))""".stripMargin)
          .as("abs_delta"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("abs_delta")).as("abs_delta_cents"))
    val spine = orders.sparkSession.range(1)
      .select(explode(
        expr(s"array(${ReconBands.map("'" + _ + "'").mkString(",")})"))
        .as("band"))
    spine.join(banded, Seq("band"), "left")
      .na.fill(0L, Seq("n_orders", "abs_delta_cents"))
      .orderBy("band")
  }

  def sourcingRisk(spark: SparkSession, dir: String): DataFrame =
    sourcingRiskOf(Tables(spark, dir, "part"),
      Tables(spark, dir, "lineitem"), Tables(spark, dir, "supplier"))

  /** Graded q226: SUPPLIER SOURCING-RISK report — procurement's
    * Kraljic-style exposure screen over the shipment history: a part
    * whose entire realized volume flows through ONE supplier is a
    * single point of failure, and the revenue parked behind such
    * parts is the number a dual-sourcing program is sized by. Per
    * brand: parts with sales, single-sourced parts and their share,
    * the revenue at risk behind them, the distinct supplier base and
    * its distinct supply NATIONS (geographic concentration — one
    * broadcast supplier-dim join), and the floored mean top-supplier
    * revenue share across the brand's parts (10⁶ ⟺ fully
    * single-sourced; the graded stream's random supplier draws land
    * it near the expected max-share of a uniform multinomial — the
    * control). Never-sold parts are q208's concern, not this one's —
    * the screen covers parts with realized volume.
    *
    * Determinism: per-part top-share = max supplier revenue ·10⁶ div
    * part revenue, ONE floor per part; the brand mean floors the
    * share sum once more; both replayed.
    *
    * Scale shape: lineitem collapses to (part, supplier) revenue —
    * map-side combinable — then to per-part stats co-keyed on the
    * part; the catalog join is part-keyed; supplier nations ride a
    * broadcast dim into a distinct count; the report is |brands|
    * rows.
    */
  def sourcingRiskOf(part: DataFrame, li: DataFrame,
      supplier: DataFrame): DataFrame = {
    val ps = CachedStages.track(li
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(12, 2)) * 100 AS BIGINT)"))
        .as("rev"))
      .persist())
    val perPart = ps.groupBy(col("l_partkey").as("p_partkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        sum(col("rev")).as("part_rev"), max(col("rev")).as("top_rev"))
      .withColumn("top_share_ppm", expr(
        """CAST(CAST(top_rev AS DECIMAL(38, 0)) * 1000000
          | div part_rev AS BIGINT)""".stripMargin))
    val nations = ps.select(col("l_partkey"), col("l_suppkey"))
      .distinct()
      .join(broadcast(supplier.select(col("s_suppkey"),
        col("s_nationkey"))), col("l_suppkey") === col("s_suppkey"))
    val brandParts = part.select(col("p_partkey"), col("p_brand"))
    val brandNations = nations
      .join(broadcast(brandParts),
        col("l_partkey") === brandParts("p_partkey"))
      .groupBy("p_brand")
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("s_nationkey")).as("n_supply_nations"))
    brandParts.join(perPart, Seq("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("n_supp") === 1L, 1L).otherwise(0L))
          .as("n_single"),
        sum(when(col("n_supp") === 1L, col("part_rev")).otherwise(0L))
          .as("risk_cents"),
        sum(col("top_share_ppm")).as("share_sum"))
      .withColumn("single_ppm", expr("n_single * 1000000 div n_parts"))
      .withColumn("mean_top_share_ppm",
        expr("share_sum div n_parts"))
      .join(broadcast(brandNations), Seq("p_brand"))
      .select("p_brand", "n_parts", "n_single", "single_ppm",
        "risk_cents", "n_suppliers", "n_supply_nations",
        "mean_top_share_ppm")
      .orderBy("p_brand")
  }

  def discountResponse(spark: SparkSession, dir: String): DataFrame =
    discountResponseOf(Tables(spark, dir, "part"),
      Tables(spark, dir, "lineitem"))

  /** Graded q228: OLS DISCOUNT→QUANTITY response per brand — the
    * parametric line the engine lacked: q172's Theil–Sen is the
    * robust trend, this is the classical least-squares fit with its
    * R², the price-response ("elasticity"-style) readout a pricing
    * team sizes promotions by. x = discount in integer percent
    * points (round(l_discount·100)), y = round(l_quantity); per
    * brand: slope in ppm (quantity units per discount point),
    * intercept in milli-units, R² in ppm — ALL exact integer
    * rationals of the five power sums (n, Σx, Σy, Σxy, Σx², Σy²)
    * cross-multiplied in DECIMAL(38,0): slope = (nΣxy−ΣxΣy)·10⁶ div
    * (nΣx²−(Σx)²), R² = (nΣxy−ΣxΣy)²·10⁶ div (Sxx·Syy), truncation
    * toward zero (verified Spark div == DuckDB // convention). A
    * zero-variance x (single discount level) NULLs all three via
    * nullif — honestly, not a fake 0. The graded stream draws
    * discount and quantity independently, so R² ≈ 0 is the expected
    * null — the control that the estimator doesn't hallucinate
    * structure.
    *
    * Scale shape: one lineitem scan folds map-side into 5 power sums
    * per brand behind a broadcast part join — the cheapest possible
    * regression at 100 TB (one combinable aggregate, |brands| rows
    * out). Precision bound: the cross products stay exact in 128
    * bits while per-brand n ≤ ~10⁹ at these domains (x ≤ 100,
    * y ≤ 50²); past that, pre-center per brand before the power
    * sums.
    */
  def discountResponseOf(part: DataFrame, li: DataFrame): DataFrame =
    li.select(col("l_partkey"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("x"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("y"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
        sum(expr("y * y")).as("syy"))
      .withColumn("dxx", expr(
        """CAST(n_lines AS DECIMAL(38, 0)) * sxx
          | - CAST(sx AS DECIMAL(38, 0)) * sx""".stripMargin))
      .withColumn("dyy", expr(
        """CAST(n_lines AS DECIMAL(38, 0)) * syy
          | - CAST(sy AS DECIMAL(38, 0)) * sy""".stripMargin))
      .withColumn("dxy", expr(
        """CAST(n_lines AS DECIMAL(38, 0)) * sxy
          | - CAST(sx AS DECIMAL(38, 0)) * sy""".stripMargin))
      .withColumn("slope_ppm", expr(
        "CAST(dxy * 1000000 div nullif(dxx, 0) AS BIGINT)"))
      .withColumn("intercept_milli", expr(
        """CAST((CAST(sy AS DECIMAL(38, 0)) * sxx
          | - CAST(sx AS DECIMAL(38, 0)) * sxy) * 1000
          | div nullif(dxx, 0) AS BIGINT)""".stripMargin))
      .withColumn("r2_ppm", expr(
        "CAST(dxy * dxy * 1000000 div nullif(dxx * dyy, 0) AS BIGINT)"))
      .select("p_brand", "n_lines", "slope_ppm", "intercept_milli",
        "r2_ppm")
      .orderBy("p_brand")
}
