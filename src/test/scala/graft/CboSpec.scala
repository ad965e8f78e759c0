package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.engine.TableCatalog

/** Proof that the ANALYZE → catalog-stats → cost-based-optimizer loop
  * actually closes: the SAME query plans a shuffle join before stats
  * exist and a broadcast join after, because column stats let
  * FilterEstimation see that a selective filter shrinks the fact side
  * below the broadcast threshold. Size-only estimation (no stats)
  * carries the child's full file size through the Filter, so the flip
  * is impossible without the ANALYZE — stats nobody consumes would be
  * dead weight; this pins that the planner consumes them.
  */
class CboSpec extends SparkSpec {

  private def withConfs[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // threshold sits between the filtered fact's ESTIMATED size (~6 KB
  // with stats: ~50 of 15000 rows) and both tables' file sizes
  // (customer ~34 KB, orders ~280 KB at sf0.01) — so nothing broadcasts
  // on file size alone and only the stats-fed estimate can flip it
  private val confs = Seq(
    "spark.sql.cbo.enabled" -> "true",
    "spark.sql.adaptive.enabled" -> "false", // pin the STATIC plan choice
    "spark.sql.autoBroadcastJoinThreshold" -> "20480")

  test("ANALYZE column stats flip a filtered join from shuffle to " +
    "broadcast under CBO") {
    val catalog = TableCatalog(spark, tmpDir("graft-cbo"))
    catalog.overwrite("silver.orders_cbo",
      spark.read.parquet("/root/testdata/sf0.01/orders.parquet"))
    catalog.overwrite("silver.customer_cbo",
      spark.read.parquet("/root/testdata/sf0.01/customer.parquet"))

    def filteredOrders = spark
      .table(catalog.metastoreName("silver.orders_cbo"))
      .filter(col("o_orderkey") < 50)
    def joined = filteredOrders.join(
      spark.table(catalog.metastoreName("silver.customer_cbo")),
      col("o_custkey") === col("c_custkey"))
    def plan(): String = withConfs(confs: _*) {
      joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    }

    val before = plan()
    assert(before.contains("SortMergeJoin"),
      s"expected a shuffle join without stats:\n$before")
    assert(!before.contains("BroadcastHashJoin"),
      s"broadcast without stats defeats the test setup:\n$before")
    // and the reason: size-only estimation can't see through the filter
    val estBefore = withConfs(confs: _*) {
      filteredOrders.queryExecution.optimizedPlan.stats.sizeInBytes
    }
    assert(estBefore > BigInt(20480),
      s"filtered estimate already small without stats: $estBefore")

    catalog.analyze("silver.orders_cbo", Seq("o_orderkey"))

    val estAfter = withConfs(confs: _*) {
      filteredOrders.queryExecution.optimizedPlan.stats.sizeInBytes
    }
    assert(estAfter < BigInt(20480),
      s"stats-fed filter estimate still large: $estAfter")
    val after = plan()
    assert(after.contains("BroadcastHashJoin"),
      s"stats did not flip the join to broadcast:\n$after")
    assert(!after.contains("SortMergeJoin"),
      s"shuffle join survived the stats:\n$after")

    // the flip changed the plan, never the answer
    val rows = withConfs(confs: _*) { joined.count() }
    assert(rows == 50, s"filtered join row count: $rows")
  }

  test("stats-fed estimate tracks row count, not file bytes") {
    val catalog = TableCatalog(spark, tmpDir("graft-cbo-rc"))
    catalog.overwrite("silver.nation_cbo",
      spark.read.parquet("/root/testdata/sf0.01/nation.parquet"))
    catalog.analyze("silver.nation_cbo", Seq("n_nationkey"))
    val est = withConfs("spark.sql.cbo.enabled" -> "true") {
      spark.table(catalog.metastoreName("silver.nation_cbo"))
        .filter(col("n_nationkey") < 5)
        .queryExecution.optimizedPlan.stats
    }
    // 5 of 25 nations: the CBO row estimate must reflect the filter
    assert(est.rowCount.exists(rc => rc >= 3 && rc <= 7),
      s"selectivity estimate off: ${est.rowCount}")
  }
}
