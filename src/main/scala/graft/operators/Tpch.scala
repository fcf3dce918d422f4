package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Portable.{trunc2, trunc4}

/** The remaining classic TPC-H query shapes, adapted to the sandbox
  * star schema (no partsupp / shipmode / commitdate columns — each
  * adaptation keeps the SHAPE that makes the query a benchmark:
  * the join topology, the aggregation pattern, and the subquery
  * decorrelation; see each operator's Scaladoc for what was mapped).
  *
  * Shared discipline with `Analytics` (q_shipping_priority etc.):
  * every money aggregate is an EXACT integer sum — cents and
  * cents×(100−disc%) BIGINTs — so sums, maxima and ratios never
  * depend on float merge order; displayed decimals derive from the
  * scaled integer by truncation (Portable.trunc2/4).
  */
object Tpch {

  /** `cents × (100 − discount%)` BIGINT revenue term (scale 10^4). */
  private def revTerm: Column =
    floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
      (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))

  /** TPC-H Q6-shaped forecast-revenue-change: one scan, three
    * pushed-down predicates, one global sum — the purest pushdown +
    * map-side-combine benchmark. Revenue = Σ price·discount as exact
    * cents×disc% BIGINTs (scale 10^4).
    *
    * Scale: all three predicates (`l_shipdate` year window, discount
    * band, quantity cap) push into the parquet scan as row-group
    * filters; no shuffle at all except the final 1-row partial-agg
    * merge. The discount band compares the ROUNDED percent (the
    * stored double is e.g. 0.0500000001), exactly as the oracle does. */
  def forecastRevenue(li: DataFrame): DataFrame =
    li.filter(expr("l_shipdate >= timestamp'1996-01-01'") &&
        expr("l_shipdate < timestamp'1997-01-01'") &&
        floor(col("l_discount") * 100 + 0.5).between(4, 6) &&
        col("l_quantity") < 24)
      .agg(
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
          floor(col("l_discount") * 100 + 0.5).cast("long")).as("rev_scaled"),
        count(lit(1)).as("n_lines"))
      .select(col("rev_scaled"),
        trunc2(col("rev_scaled") / 10000.0).as("revenue"), col("n_lines"))

  /** TPC-H Q7-shaped volume shipping: revenue flowing between a nation
    * PAIR (supplier nation → customer nation, both directions) per
    * ship-year. The signature shape: two independent nation lookups on
    * the same dim (supplier side and customer side) meeting across the
    * fact⋈fact join.
    *
    * Scale: both nation filters prune via broadcast BEFORE facts are
    * touched (customer keeps ~1/25 of rows, supplier likewise); the
    * one big shuffle is lineitem⋈orders on the order key; the ship
    * year is derived from the pushed-down-filtered lineitem scan. */
  def nationTrade(nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, orders: DataFrame, li: DataFrame,
      nationA: String = "NATION_3", nationB: String = "NATION_7"): DataFrame = {
    val n = nation.filter(col("n_name").isin(nationA, nationB))
      .select(col("n_nationkey"), col("n_name"))
    val c = customer.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val s = supplier.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val o = orders.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    li.filter(expr("l_shipdate >= timestamp'1996-01-01'") &&
        expr("l_shipdate < timestamp'1998-01-01'"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"), revTerm.as("term"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("term")).as("rev_scaled"), count(lit(1)).as("n_lines"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        col("rev_scaled"), trunc2(col("rev_scaled") / 10000.0).as("revenue"),
        col("n_lines"))
  }

  /** TPC-H Q8-shaped market share: the share of one nation's suppliers
    * in a region's revenue for one part type, per order-year — the
    * conditional-sum-over-a-5-way-join shape. Both the numerator and
    * denominator are exact BIGINT sums computed in ONE pass (a CASE
    * term, not a second join); only the final share divides, and both
    * engines divide the same two integers.
    *
    * Scale: region→nation→customer prune by broadcast before facts
    * (the genuinely tiny dims); one lineitem⋈orders shuffle; the
    * supplier-nation lookup feeds the CASE, not a filter — every
    * region-bound line lands in exactly one year group. The
    * type-filtered part (~1/6 of the dim) and the FULL supplier dim
    * carry no broadcast hint: the planner broadcasts them while they
    * fit the threshold and shuffles beyond, where a hint would force
    * driver-side materialization of a wide dim. */
  def marketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, part: DataFrame, orders: DataFrame, li: DataFrame,
      regionName: String = "ASIA", partType: String = "ECONOMY",
      shareNation: String = "NATION_8"): DataFrame = {
    val r = region.filter(col("r_name") === regionName).select(col("r_regionkey"))
    val nIn = nation.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val c = customer.join(broadcast(nIn), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val p = part.filter(col("p_type") === partType).select(col("p_partkey"))
    val sNat = supplier.join(broadcast(
        nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val o = orders
      .filter(expr("o_orderdate >= timestamp'1996-01-01'") &&
        expr("o_orderdate < timestamp'1998-01-01'"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    li.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), revTerm.as("term"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(sNat, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === shareNation, col("term"))
          .otherwise(lit(0L))).as("nation_scaled"),
        sum(col("term")).as("total_scaled"))
      .select(col("o_year"), col("nation_scaled"), col("total_scaled"),
        trunc4(col("nation_scaled").cast("double") / col("total_scaled"))
          .as("mkt_share"))
  }

  /** TPC-H Q13-shaped customer order-count distribution: how many
    * customers placed exactly k (non-excluded) orders, INCLUDING the
    * zero-order customers — the left-outer-join + double-aggregation
    * shape.
    *
    * Scale: orders pre-aggregate per custkey FIRST (one map-side
    * combined shuffle collapses the fact to ≤|customers| rows), then
    * customer left-joins the tiny count table — the fanout join of
    * the textbook plan (customer⟕orders then group) would shuffle
    * every order row with its customer payload instead. The final
    * distribution agg runs on ≤|distinct counts| groups. */
  def orderCountDist(customer: DataFrame, orders: DataFrame,
      excludePriority: String = "4-NOT SPECIFIED"): DataFrame = {
    val perCust = orders.filter(col("o_orderpriority") =!= excludePriority)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    customer.select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q14-shaped promo-revenue share: the percentage of one
    * ship-month's revenue that came from promo parts — conditional
    * numerator and total denominator as exact BIGINT sums in one agg,
    * a single float division at the end (same two integers in both
    * engines ⇒ identical IEEE result).
    *
    * Scale: the one-month filter pushes into the lineitem scan; the
    * part side carries only (partkey, is-promo flag). No broadcast
    * hint — part is the WHOLE dim here (at 100 TB, tens of GB): the
    * planner broadcasts it while it fits the threshold and shuffle-
    * hash-joins beyond, whereas a hint would force the broadcast and
    * OOM at scale. One map-side-combined 1-row agg. */
  def promoRevenue(part: DataFrame, li: DataFrame): DataFrame = {
    val p = part.select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    li.filter(expr("l_shipdate >= timestamp'1996-09-01'") &&
        expr("l_shipdate < timestamp'1996-10-01'"))
      .select(col("l_partkey"), revTerm.as("term"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("is_promo"), col("term")).otherwise(lit(0L))).as("promo_scaled"),
        sum(col("term")).as("total_scaled"))
      .select(col("promo_scaled"), col("total_scaled"),
        trunc4(col("promo_scaled") * 100.0 / col("total_scaled"))
          .as("promo_pct"))
  }

  /** TPC-H Q18-shaped large-volume customers: orders whose total line
    * quantity exceeds a threshold, with customer and order detail —
    * the HAVING-subquery-on-a-fact-aggregate shape. The default
    * threshold selects the rare giants (~0.3% of orders), Q18's
    * intent.
    *
    * Scale: the per-order quantity sum is one map-side-combined
    * shuffle that collapses lineitem to |orders| rows, and HAVING
    * cuts that BEFORE any join. No broadcast hint: the qualifying set
    * is an aggregate whose size Catalyst can't know statically, so
    * AQE converts the join to broadcast at runtime when the set is
    * actually small, and keeps the shuffle join when a loose
    * threshold makes it fact-proportional — a hint would force the
    * broadcast either way. Quantities are integral by data contract
    * (floor() both sides makes that exact). */
  def largeOrders(customer: DataFrame, orders: DataFrame, li: DataFrame,
      minQty: Long = 300L): DataFrame = {
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("sum_qty"))
      .filter(col("sum_qty") >= minQty)
    orders.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("price_cents"),
        col("sum_qty"))
  }

  /** TPC-H Q9-shaped product-type profit: per (supplier nation, order
    * year) profit on parts matching a name token — the widest classic
    * join (fact + 4 dims) with a computed measure. The sandbox schema
    * has no partsupp.ps_supplycost, so cost is quantity ×
    * p_retailprice (same join topology, same measure arithmetic):
    * profit_scaled = Σ [cents·(100−disc%) − qty·retail_cents·100],
    * everything BIGINT at scale 10^4.
    *
    * Scale: the name filter prunes part before the join and nation
    * broadcasts into supplier; the name-filtered part and the FULL
    * supplier dim carry no broadcast hint (wide at 100 TB — the
    * planner broadcasts them only while they fit). Orders carries
    * only (orderkey, year) through the one fact⋈fact shuffle; final
    * agg is |nations|×|years| groups, map-side combined. */
  def productProfit(nation: DataFrame, supplier: DataFrame, part: DataFrame,
      orders: DataFrame, li: DataFrame, nameToken: String = "widget"): DataFrame = {
    val p = part.filter(col("p_name").contains(nameToken))
      .select(col("p_partkey"),
        floor(col("p_retailprice") * 100 + 0.5).cast("long").as("retail_cents"))
    val s = supplier.join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val o = orders.select(col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("o_year"))
    li.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        floor(col("l_quantity")).cast("long").as("qty"), revTerm.as("rev"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("rev") - col("qty") * col("retail_cents") * 100).as("profit_scaled"),
        count(lit(1)).as("n_lines"))
      .select(col("n_name"), col("o_year"), col("profit_scaled"),
        trunc2(col("profit_scaled") / 10000.0).as("profit"), col("n_lines"))
  }

  /** TPC-H Q11-shaped important parts: parts whose shipped value from
    * one nation's suppliers exceeds `mult`× the nation's AVERAGE
    * per-part value — the HAVING-against-a-scalar-subquery shape.
    * Q11's literal threshold is a fraction of the total, which TPC-H
    * itself rescales by SF (a fixed fraction empties as |parts|
    * grows); normalizing by the part count keeps the query meaningful
    * at every scale. The compare is integer
    * (`value·n_parts > mult·total` in cents) — no float threshold tie
    * can split engines.
    *
    * Scale: the nation's suppliers broadcast into the lineitem scan;
    * ONE per-part shuffle produces the value table; the (count, total)
    * re-aggregates that small table (not the fact) and broadcasts
    * back as a 1-row cross join — the fact is scanned once. */
  def importantParts(nation: DataFrame, supplier: DataFrame, li: DataFrame,
      nationName: String = "NATION_4", mult: Int = 3): DataFrame = {
    val s = supplier.join(broadcast(
        nation.filter(col("n_name") === nationName).select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = li
      .select(col("l_partkey"), col("l_suppkey"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey")).agg(sum(col("cents")).as("value_cents"))
    val total = perPart.agg(count(lit(1)).as("n_parts"),
      sum(col("value_cents")).as("total_cents"))
    perPart.crossJoin(broadcast(total))
      // value_cents·n_parts crosses per-part cents × part count
      // (≫ 2^63 at 1e9 parts): both comparison sides exact in
      // DECIMAL(38,0) (round-10 overflow audit)
      .filter(col("value_cents").cast("decimal(38,0)") * col("n_parts") >
        col("total_cents").cast("decimal(38,0)") * mult)
      .select(col("l_partkey"), col("value_cents"),
        trunc2(col("value_cents") / 100.0).as("value"))
  }

  /** TPC-H Q12-shaped shipping-class priority audit: among lines
    * shipped more than `lagDays` after their order date in one year,
    * how many belonged to critical-priority orders vs not, per
    * return-flag class (the schema's stand-in for shipmode) — the
    * join + dual-CASE-count shape.
    *
    * Scale: the ship-year window pushes into the lineitem scan; one
    * lineitem⋈orders shuffle carries only (orderkey, priority); the
    * final agg is 3 groups. The lag predicate rides the join as a
    * residual, exactly like Q4's. */
  def shipClassPriority(orders: DataFrame, li: DataFrame,
      lagDays: Int = 60): DataFrame =
    li.filter(expr("l_shipdate >= timestamp'1996-01-01'") &&
        expr("l_shipdate < timestamp'1997-01-01'"))
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"interval $lagDays days"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_count"))

  /** TPC-H Q16-shaped supplier diversity per part attribute: how many
    * DISTINCT suppliers shipped parts of each (brand, type, size),
    * excluding one brand, promo types, and low-balance suppliers (the
    * schema's stand-in for the complaints NOT IN) — the
    * distinct-pair + count-distinct + anti-join shape.
    *
    * Scale: the (partkey, suppkey) distinct collapses the fact in one
    * map-side-combined shuffle (lineitem has ~7 lines per pair); the
    * count-distinct re-shuffles only the collapsed pair set. The
    * exclusion list and filtered part dim carry NO broadcast hint —
    * both keep most of their dim (≈95% of suppliers, ≈80% of parts),
    * so the planner must stay free to shuffle them at scale; at
    * sandbox scale it broadcasts them on size anyway. */
  def partSupplierCounts(supplier: DataFrame, part: DataFrame,
      li: DataFrame, excludeBrand: String = "Brand#1",
      minBal: Double = 500.0): DataFrame = {
    val excl = supplier.filter(col("s_acctbal") < minBal).select(col("s_suppkey"))
    val p = part.filter(col("p_brand") =!= excludeBrand &&
        col("p_type") =!= "PROMO")
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    li.select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supp_cnt"))
  }

  /** TPC-H Q17-shaped small-quantity revenue: total revenue of lines
    * whose quantity is below 20% of their part's average quantity,
    * for one brand — the correlated-average subquery, decorrelated to
    * one per-part aggregate joined back. The 0.2·avg compare is
    * integer: `5·qty·cnt < Σqty` (quantities are integral by data
    * contract), so no engine disagrees at the threshold.
    *
    * Scale: the brand filter prunes part to ~1/25 before broadcast;
    * the per-part (count, sum) aggregate runs on the pruned join
    * output and broadcasts back — the fact is scanned once and never
    * self-joins at full width. */
  def smallQtyRevenue(part: DataFrame, li: DataFrame,
      brand: String = "Brand#5"): DataFrame = {
    val p = part.filter(col("p_brand") === brand).select(col("p_partkey"))
    val lines = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), floor(col("l_quantity")).cast("long").as("qty"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
    val perPart = lines.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("qty")).as("qty_sum"))
    lines.join(broadcast(perPart.withColumnRenamed("l_partkey", "pk")),
        col("l_partkey") === col("pk"))
      .filter(col("qty") * 5 * col("cnt") < col("qty_sum"))
      .agg(sum(col("cents")).as("total_cents"), count(lit(1)).as("n_lines"))
      .select(col("total_cents"),
        trunc2(col("total_cents") / 700.0).as("avg_yearly"), col("n_lines"))
  }

  /** TPC-H Q19-shaped bracketed revenue: revenue from three
    * (brand, size-range, quantity-range) brackets OR-ed together —
    * the disjunctive-predicate join. The partkey equi-join stays the
    * join condition; the OR-of-ANDs rides as a residual filter, so
    * the plan is one broadcast hash join, not a nested-loop.
    *
    * Scale: part carries only (partkey, brand, size); no broadcast
    * hint — it is the whole dim, so the planner broadcasts below the
    * threshold and shuffles beyond it. The bracket filter cannot push
    * below the join (it spans both sides) but runs codegen'd on the
    * joined stream. */
  def bracketRevenue(part: DataFrame, li: DataFrame): DataFrame = {
    val p = part.select(col("p_partkey"), col("p_brand"), col("p_size"))
    val qty = floor(col("l_quantity")).cast("long")
    li.select(col("l_partkey"), col("l_quantity"), revTerm.as("term"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#5" && col("p_size").between(1, 15) &&
          qty.between(1, 15)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 25) &&
          qty.between(10, 25)) ||
        (col("p_brand") === "Brand#21" && col("p_size").between(1, 35) &&
          qty.between(20, 35)))
      .agg(sum(col("term")).as("rev_scaled"), count(lit(1)).as("n_lines"))
      .select(col("rev_scaled"),
        trunc2(col("rev_scaled") / 10000.0).as("revenue"), col("n_lines"))
  }

  /** TPC-H Q20-shaped promo-part suppliers: suppliers from one nation
    * who shipped more than `minQty` units of promo-type parts in one
    * year — the nested-semi-join chain (part → lineitem aggregate →
    * supplier), with the availqty correlated subquery of the original
    * mapped to a HAVING on shipped quantity (no partsupp table).
    *
    * Scale: the promo partkey set broadcasts into the date-pruned
    * lineitem scan; ONE map-side-combined per-supplier agg collapses
    * the fact; HAVING cuts it to a handful of rows that broadcast
    * into the nation-filtered supplier dim. */
  def promoPartSuppliers(nation: DataFrame, supplier: DataFrame,
      part: DataFrame, li: DataFrame, nationName: String = "NATION_2",
      minQty: Long = 50L): DataFrame = {
    val p = part.filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val shipped = li
      .filter(expr("l_shipdate >= timestamp'1996-01-01'") &&
        expr("l_shipdate < timestamp'1997-01-01'"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("qty_shipped"))
      .filter(col("qty_shipped") > minQty)
    supplier.join(broadcast(
        nation.filter(col("n_name") === nationName).select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(shipped), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("qty_shipped"))
  }

  /** TPC-H Q21-shaped waiting-on-supplier report: suppliers who were
    * the ONLY late shipper on finished multi-supplier orders — the
    * EXISTS + NOT EXISTS double-correlated self-join, decorrelated
    * here to per-order window counts (supplier count and late-supplier
    * count share the per-(order,supplier) aggregate's exchange instead
    * of re-scanning lineitem twice).
    *
    * Scale: one lineitem⋈orders shuffle (status-filtered orders carry
    * only orderkey+date); the per-(order,supplier) collapse is
    * map-side combined; the window runs on the collapsed relation
    * partitioned by the SAME key — no extra exchange; the final
    * per-supplier count is a second small shuffle. Top-k by
    * TakeOrderedAndProject semantics via sort+limit. */
  def waitingSuppliers(supplier: DataFrame, orders: DataFrame, li: DataFrame,
      lagDays: Int = 60, k: Int = 10): DataFrame = {
    val o = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val perOS = li.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr(s"interval $lagDays days"), 1L)
        .otherwise(0L)).as("late"))
    val w = Window.partitionBy(col("l_orderkey"))
    val waiting = perOS
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum(col("late")).over(w))
      .filter(col("late") === 1L && col("n_supp") > 1L && col("n_late") === 1L)
    val counts = waiting.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("l_suppkey")).limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("numwait").desc, col("l_suppkey"))).cast("long"))
    counts.join(supplier.select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"), col("rnk"))
  }

  /** TPC-H Q22-shaped idle-customer report: per nation, the customers
    * with above-average positive balance and no orders since
    * `dormantSince` (this generator's customers ALL order eventually,
    * so Q22's "never ordered" is mapped to dormancy) — the
    * global-scalar-subquery + anti-join shape. The above-average test
    * is integer (`bal·cnt > Σbal` in cents), so the threshold can't
    * split on a float tie; balance totals are exact cent sums.
    *
    * Scale: the (count, sum) of positive balances is a 1-row broadcast
    * back over the customer scan (scanned once — Catalyst reuses the
    * exchange at sandbox scale and re-scans the dim at most once
    * more at 100 TB); the anti join against orders shuffles only
    * custkeys; final agg is |nations| groups. */
  def idleCustomers(nation: DataFrame, customer: DataFrame,
      orders: DataFrame, dormantSince: String = "2000-01-01"): DataFrame = {
    val bal = customer.select(col("c_custkey"), col("c_nationkey"),
      floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal_cents"))
    val stats = bal.filter(col("bal_cents") > 0L)
      .agg(count(lit(1)).as("cnt"), sum(col("bal_cents")).as("cents_sum"))
    bal.crossJoin(broadcast(stats))
      .filter(col("bal_cents") * col("cnt") > col("cents_sum"))
      .join(orders.filter(col("o_orderdate") >= lit(dormantSince).cast("timestamp"))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), sum(col("bal_cents")).as("total_cents"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("numcust"), col("total_cents"),
        trunc2(col("total_cents") / 100.0).as("total_bal"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_promo_part_suppliers" -> ((s, d) => promoPartSuppliers(Tables.nation(s, d),
      Tables.supplier(s, d), Tables.part(s, d), Tables.lineitem(s, d))),
    "q_waiting_suppliers" -> ((s, d) => waitingSuppliers(Tables.supplier(s, d),
      Tables.orders(s, d), Tables.lineitem(s, d))),
    "q_idle_customers" -> ((s, d) => idleCustomers(Tables.nation(s, d),
      Tables.customer(s, d), Tables.orders(s, d))),
    "q_product_profit" -> ((s, d) => productProfit(Tables.nation(s, d),
      Tables.supplier(s, d), Tables.part(s, d), Tables.orders(s, d),
      Tables.lineitem(s, d))),
    "q_important_parts" -> ((s, d) => importantParts(Tables.nation(s, d),
      Tables.supplier(s, d), Tables.lineitem(s, d))),
    "q_ship_class_priority" -> ((s, d) => shipClassPriority(Tables.orders(s, d),
      Tables.lineitem(s, d))),
    "q_part_supplier_counts" -> ((s, d) => partSupplierCounts(Tables.supplier(s, d),
      Tables.part(s, d), Tables.lineitem(s, d))),
    "q_small_qty_revenue" -> ((s, d) => smallQtyRevenue(Tables.part(s, d),
      Tables.lineitem(s, d))),
    "q_bracket_revenue" -> ((s, d) => bracketRevenue(Tables.part(s, d),
      Tables.lineitem(s, d))),
    "q_forecast_revenue" -> ((s, d) => forecastRevenue(Tables.lineitem(s, d))),
    "q_nation_trade" -> ((s, d) => nationTrade(Tables.nation(s, d),
      Tables.customer(s, d), Tables.supplier(s, d), Tables.orders(s, d),
      Tables.lineitem(s, d))),
    "q_market_share" -> ((s, d) => marketShare(Tables.region(s, d),
      Tables.nation(s, d), Tables.customer(s, d), Tables.supplier(s, d),
      Tables.part(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q_order_count_dist" -> ((s, d) => orderCountDist(Tables.customer(s, d),
      Tables.orders(s, d))),
    "q_promo_revenue" -> ((s, d) => promoRevenue(Tables.part(s, d),
      Tables.lineitem(s, d))),
    "q_large_orders" -> ((s, d) => largeOrders(Tables.customer(s, d),
      Tables.orders(s, d), Tables.lineitem(s, d))))

  val oracleSql: Map[String, String] = Map(
    "q_promo_part_suppliers" ->
      ("SELECT s_suppkey, s_name, qty_shipped FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN (SELECT l_suppkey, " +
        "sum(CAST(floor(l_quantity) AS BIGINT))::BIGINT AS qty_shipped " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE p_type = 'PROMO' " +
        "AND l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY 1 HAVING qty_shipped > 50) ON s_suppkey = l_suppkey " +
        "WHERE n_name = 'NATION_2'"),
    "q_waiting_suppliers" ->
      ("WITH pos AS (SELECT l_orderkey, l_suppkey, " +
        "max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY " +
        "THEN 1 ELSE 0 END)::BIGINT AS late " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_orderstatus = 'F' GROUP BY 1, 2), " +
        "win AS (SELECT *, count(*) OVER (PARTITION BY l_orderkey) AS n_supp, " +
        "sum(late) OVER (PARTITION BY l_orderkey) AS n_late FROM pos), " +
        "cnts AS (SELECT l_suppkey, count(*) AS numwait FROM win " +
        "WHERE late = 1 AND n_supp > 1 AND n_late = 1 GROUP BY 1), " +
        "rk AS (SELECT l_suppkey, numwait, row_number() OVER " +
        "(ORDER BY numwait DESC, l_suppkey) AS rnk FROM cnts) " +
        "SELECT s_suppkey, s_name, numwait, rnk FROM rk " +
        "JOIN supplier ON l_suppkey = s_suppkey WHERE rnk <= 10"),
    "q_idle_customers" ->
      ("WITH bal AS (SELECT c_custkey, c_nationkey, " +
        "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents FROM customer), " +
        "st AS (SELECT count(*) AS cnt, sum(bal_cents)::BIGINT AS cents_sum " +
        "FROM bal WHERE bal_cents > 0) " +
        "SELECT n_name, count(*) AS numcust, " +
        "sum(bal_cents)::BIGINT AS total_cents, " +
        "floor(sum(bal_cents) / 100.0::DOUBLE * 100) / 100 AS total_bal " +
        "FROM bal CROSS JOIN st JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE bal_cents * cnt > cents_sum " +
        "AND c_custkey NOT IN (SELECT o_custkey FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '2000-01-01') " +
        "GROUP BY 1"),
    "q_product_profit" ->
      ("SELECT n_name, year(o_orderdate)::BIGINT AS o_year, " +
        "sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) - " +
        "CAST(floor(l_quantity) AS BIGINT) * " +
        "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * 100)::BIGINT " +
        "AS profit_scaled, " +
        "floor(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) - " +
        "CAST(floor(l_quantity) AS BIGINT) * " +
        "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) * 100) / 10000.0::DOUBLE " +
        "* 100) / 100 AS profit, count(*) AS n_lines " +
        "FROM lineitem " +
        "JOIN part ON l_partkey = p_partkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE p_name LIKE '%widget%' GROUP BY 1, 2"),
    "q_important_parts" ->
      ("WITH s AS (SELECT s_suppkey FROM supplier JOIN nation " +
        "ON s_nationkey = n_nationkey WHERE n_name = 'NATION_4'), " +
        "pp AS (SELECT l_partkey, " +
        "sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::BIGINT " +
        "AS value_cents FROM lineitem JOIN s ON l_suppkey = s_suppkey GROUP BY 1) " +
        "SELECT l_partkey, value_cents, " +
        "floor(value_cents / 100.0::DOUBLE * 100) / 100 AS value " +
        "FROM pp WHERE value_cents * (SELECT count(*) FROM pp) > " +
        "(SELECT sum(value_cents) FROM pp) * 3"),
    "q_ship_class_priority" ->
      ("SELECT l_returnflag, " +
        "sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)" +
        "::BIGINT AS high_count, " +
        "sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)" +
        "::BIGINT AS low_count " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND l_shipdate > o_orderdate + INTERVAL 60 DAY " +
        "GROUP BY 1"),
    "q_part_supplier_counts" ->
      ("SELECT p_brand, p_type, p_size, " +
        "count(DISTINCT l_suppkey)::BIGINT AS supp_cnt " +
        "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) " +
        "JOIN part ON l_partkey = p_partkey " +
        "WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' " +
        "AND l_suppkey NOT IN " +
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 500.0) " +
        "GROUP BY 1, 2, 3"),
    "q_small_qty_revenue" ->
      ("WITH lines AS (SELECT l_partkey, " +
        "CAST(floor(l_quantity) AS BIGINT) AS qty, " +
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE p_brand = 'Brand#5'), " +
        "pp AS (SELECT l_partkey AS pk, count(*) AS cnt, sum(qty) AS qty_sum " +
        "FROM lines GROUP BY 1) " +
        "SELECT sum(cents)::BIGINT AS total_cents, " +
        "floor(sum(cents) / 700.0::DOUBLE * 100) / 100 AS avg_yearly, " +
        "count(*) AS n_lines " +
        "FROM lines JOIN pp ON l_partkey = pk WHERE qty * 5 * cnt < qty_sum"),
    "q_bracket_revenue" ->
      ("SELECT sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))::BIGINT AS rev_scaled, " +
        "floor(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) / 10000.0::DOUBLE " +
        "* 100) / 100 AS revenue, count(*) AS n_lines " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15 " +
        "AND CAST(floor(l_quantity) AS BIGINT) BETWEEN 1 AND 15) " +
        "OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 " +
        "AND CAST(floor(l_quantity) AS BIGINT) BETWEEN 10 AND 25) " +
        "OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 35 " +
        "AND CAST(floor(l_quantity) AS BIGINT) BETWEEN 20 AND 35)"),
    "q_forecast_revenue" ->
      ("SELECT sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT))::BIGINT AS rev_scaled, " +
        "floor(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) / 10000.0::DOUBLE * 100) / 100 " +
        "AS revenue, count(*) AS n_lines FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND floor(l_discount * 100 + 0.5) BETWEEN 4 AND 6 " +
        "AND l_quantity < 24"),
    "q_nation_trade" ->
      ("WITH n AS (SELECT n_nationkey, n_name FROM nation " +
        "WHERE n_name IN ('NATION_3', 'NATION_7')) " +
        "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, " +
        "year(l_shipdate)::BIGINT AS l_year, " +
        "sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))::BIGINT AS rev_scaled, " +
        "floor(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) / 10000.0::DOUBLE * 100) / 100 " +
        "AS revenue, count(*) AS n_lines " +
        "FROM lineitem " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN n sn ON s_nationkey = sn.n_nationkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN n cn ON c_nationkey = cn.n_nationkey " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "AND sn.n_name <> cn.n_name " +
        "GROUP BY 1, 2, 3"),
    "q_market_share" ->
      ("SELECT year(o_orderdate)::BIGINT AS o_year, " +
        "sum(CASE WHEN n2.n_name = 'NATION_8' THEN " +
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) ELSE 0 END)::BIGINT " +
        "AS nation_scaled, " +
        "sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))::BIGINT AS total_scaled, " +
        "floor(sum(CASE WHEN n2.n_name = 'NATION_8' THEN " +
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) ELSE 0 END)::DOUBLE / " +
        "sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) * 10000) / 10000 " +
        "AS mkt_share " +
        "FROM lineitem " +
        "JOIN part ON l_partkey = p_partkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
        "JOIN region ON n1.n_regionkey = r_regionkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
        "WHERE r_name = 'ASIA' AND p_type = 'ECONOMY' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY 1"),
    "q_order_count_dist" ->
      ("SELECT c_count, count(*) AS custdist FROM (" +
        "SELECT c_custkey, coalesce(n, 0)::BIGINT AS c_count " +
        "FROM customer LEFT JOIN (" +
        "SELECT o_custkey, count(*) AS n FROM orders " +
        "WHERE o_orderpriority <> '4-NOT SPECIFIED' GROUP BY 1) ON c_custkey = o_custkey" +
        ") GROUP BY 1"),
    "q_promo_revenue" ->
      ("SELECT sum(CASE WHEN p_type = 'PROMO' THEN " +
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) ELSE 0 END)::BIGINT " +
        "AS promo_scaled, " +
        "sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))::BIGINT AS total_scaled, " +
        "floor(sum(CASE WHEN p_type = 'PROMO' THEN " +
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) ELSE 0 END) * 100.0::DOUBLE / " +
        "sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) * 10000) / 10000 " +
        "AS promo_pct " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1996-09-01' " +
        "AND l_shipdate < TIMESTAMP '1996-10-01'"),
    "q_large_orders" ->
      ("SELECT c_custkey, c_name, o_orderkey, o_orderdate, " +
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents, sum_qty " +
        "FROM (SELECT l_orderkey, sum(CAST(floor(l_quantity) AS BIGINT))::BIGINT " +
        "AS sum_qty FROM lineitem GROUP BY 1 HAVING sum_qty >= 300) " +
        "JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN customer ON o_custkey = c_custkey"))
}
