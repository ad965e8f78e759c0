package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.engine.TableCatalog

/** Bucketed tables co-locate join keys at write time: a join between
  * two tables bucketed identically on the join key must plan with NO
  * shuffle exchange — the 100 TB answer to repeated large-table joins.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-bucketed join plans with zero exchanges") {
    val catalog = TableCatalog(spark, tmpDir("bucketed"))
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
    catalog.overwriteBucketed("silver.li_b", li, Seq("l_orderkey"), 8)
    catalog.overwriteBucketed("silver.o_b", o, Seq("o_orderkey"), 8)

    val lb = catalog.readBucketed("silver.li_b")
    val ob = catalog.readBucketed("silver.o_b")
    val joined = lb.join(ob, lb("l_orderkey") === ob("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_extendedprice")).as("rev"))

    // force a sort-merge path so bucketing (not broadcast) carries it
    val hinted = lb.hint("merge").join(ob, lb("l_orderkey") === ob("o_orderkey"))
    val p = hinted.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
    assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
    assert(p.contains("SelectedBucketsCount"), s"bucket scan missing:\n$p")

    // and it computes the right thing
    assert(joined.count() > 0)
    assert(hinted.count() == li.count()) // every lineitem has its order
  }

  test("analyze populates catalog stats the CBO can read (row count + " +
    "size; column stats on request)") {
    val catalog = TableCatalog(spark, tmpDir("analyze"))
    val nation = spark.read
      .parquet("/root/testdata/sf0.001/nation.parquet")
    catalog.overwrite("silver.nation_a", nation)
    assert(catalog.tableStats("silver.nation_a").isEmpty
      || catalog.tableStats("silver.nation_a").exists(_._1.isEmpty))
    catalog.analyze("silver.nation_a", Seq("n_nationkey", "n_name"))
    val stats = catalog.tableStats("silver.nation_a")
    assert(stats.isDefined, "no stats after ANALYZE")
    assert(stats.get._1.contains(BigInt(25)), s"row count wrong: $stats")
    assert(stats.get._2 > 0, "size missing")
  }
}
