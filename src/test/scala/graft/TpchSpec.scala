package graft

import graft.operators.Tpch
import org.apache.spark.sql.functions._

/** Plan-shape and semantic pins for the classic TPC-H query shapes in
  * [[graft.operators.Tpch]] (correctness is oracle-gated by the driver;
  * these pin the SCALE properties the Scaladocs promise). */
class TpchSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("Q6 shape: all three predicates push into the lineitem scan, no join") {
    val df = Tpch.forecastRevenue(Tables.lineitem(spark, sf))
    val p = plan(df)
    assert(!p.contains("Join"), s"Q6 must not join:\n$p")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("l_shipdate") && pushed.contains("l_quantity"),
      s"date/qty filters not pushed:\n$p")
    assert(df.collect().head.getAs[Long]("n_lines") > 0)
  }

  test("Q13 shape: orders pre-aggregate before the customer join") {
    val df = Tpch.orderCountDist(Tables.customer(spark, sf), Tables.orders(spark, sf))
    // the fanout-then-aggregate plan would put the first HashAggregate
    // ABOVE the join; the collapsed plan aggregates orders below it
    // sparkPlan, not executedPlan: AQE wraps the latter until executed
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty)
    val aggBelowJoin = joins.exists(_.children.exists(c =>
      c.toString.contains("HashAggregate")))
    assert(aggBelowJoin, s"orders must collapse before the join:\n${plan(df)}")
    // zero-order customers are represented
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("custdist")).sum ===
      Tables.customer(spark, sf).count())
  }

  test("Q18 shape: AQE converts the HAVING-aggregate join to broadcast at runtime") {
    val df = Tpch.largeOrders(Tables.customer(spark, sf),
      Tables.orders(spark, sf), Tables.lineitem(spark, sf))
    // no hint in the operator (the qualifying set's size is unknowable
    // statically); the broadcast must come from AQE's runtime stats,
    // so execute first and read the final adaptive plan
    val rows = df.collect()
    rows.foreach(r => assert(r.getAs[Long]("sum_qty") >= 300L))
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"AQE should have converted the tiny qualifying set to broadcast:\n$p")
  }

  test("Q21 shape: window reuses the per-(order,supplier) aggregate's exchange") {
    val df = Tpch.waitingSuppliers(Tables.supplier(spark, sf),
      Tables.orders(spark, sf), Tables.lineitem(spark, sf))
    val p = plan(df)
    // exchanges: lineitem⋈orders shuffle (×2 sides at most), final
    // per-supplier count, top-k single-partition — but NO extra
    // exchange between the groupBy(l_orderkey, l_suppkey) aggregate
    // and the Window partitioned by l_orderkey
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).toList
    assert(exchanges.count(_ => true) <= 3, s"unexpected extra shuffle:\n$p")
    assert(p.contains("Window"), p)
    val rows = df.collect()
    val ranks = rows.map(_.getAs[Long]("rnk")).sorted
    assert(ranks.zip(ranks.tail).forall { case (a, b) => b == a + 1 })
  }

  test("Q22 shape: scalar stats broadcast; threshold is integer-exact") {
    val df = Tpch.idleCustomers(Tables.nation(spark, sf),
      Tables.customer(spark, sf), Tables.orders(spark, sf))
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"1-row stats must broadcast:\n$p")
    // dormant customers really have no post-cutoff orders
    val idle = df.agg(sum(col("numcust"))).collect().head.getLong(0)
    val recent = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct().count()
    val total = Tables.customer(spark, sf).count()
    assert(idle <= total - recent)
  }

  test("Q7/Q8 shape: dims broadcast, exactly one fact-fact shuffle join") {
    for (df <- Seq(
        Tpch.nationTrade(Tables.nation(spark, sf), Tables.customer(spark, sf),
          Tables.supplier(spark, sf), Tables.orders(spark, sf),
          Tables.lineitem(spark, sf)),
        Tpch.marketShare(Tables.region(spark, sf), Tables.nation(spark, sf),
          Tables.customer(spark, sf), Tables.supplier(spark, sf),
          Tables.part(spark, sf), Tables.orders(spark, sf),
          Tables.lineitem(spark, sf)))) {
      val p = df.queryExecution.sparkPlan.toString
      val shuffleJoins = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length
      assert(shuffleJoins <= 1, s"more than one shuffle join:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
      assert(!p.contains("NestedLoop") || p.contains("BroadcastNestedLoop"), p)
    }
  }

  test("Q14/Q8 ratio queries derive the share from the two exact sums") {
    val promo = Tpch.promoRevenue(Tables.part(spark, sf), Tables.lineitem(spark, sf))
      .collect().head
    val share = promo.getAs[Long]("promo_scaled").toDouble * 100.0 /
      promo.getAs[Long]("total_scaled")
    assert(math.abs(promo.getAs[Double]("promo_pct") - share) < 1e-4)
    assert(promo.getAs[Long]("promo_scaled") <= promo.getAs[Long]("total_scaled"))
  }

  test("Q17 threshold compares integers (5·qty·cnt < Σqty), not floats") {
    val r = Tpch.smallQtyRevenue(Tables.part(spark, sf),
      Tables.lineitem(spark, sf)).collect().head
    // n_lines counted must be a subset of the brand's lines
    val brandLines = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") === "Brand#5"),
        col("l_partkey") === col("p_partkey")).count()
    assert(r.getAs[Long]("n_lines") <= brandLines)
  }
}
