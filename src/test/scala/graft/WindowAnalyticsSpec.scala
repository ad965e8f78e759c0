package graft

import org.apache.spark.sql.functions._

/** Cross-checks for the window-analytics gate family: each window
  * query must agree with an independent non-window computation of the
  * same fact, and the exact-percentile gate must be tracked by the
  * t-digest approximation that replaces it at unbounded scale.
  */
class WindowAnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_w_running: the last running total per customer equals the " +
    "customer's aggregate spend") {
    val running = SparkEntry.queries("q_w_running")(spark, dir)
    val lastPerCust = running.groupBy(col("o_custkey"))
      .agg(max(col("order_seq")).as("n"),
        max(col("running_cents")).as("final_cents"))
    val agg = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).cast("int").as("n_agg"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
    // cents are positive, so the max running total IS the final one
    val bad = lastPerCust.join(agg, "o_custkey")
      .filter(col("n") =!= col("n_agg") ||
        col("final_cents") =!= col("total_cents"))
    assert(bad.isEmpty, s"window/agg disagreement:\n${bad.head(5).mkString("\n")}")
  }

  test("q_w_lag: deltas telescope — first month's delta is null and the " +
    "sum of deltas equals last minus first month revenue") {
    val m = SparkEntry.queries("q_w_lag")(spark, dir).orderBy(col("month"))
      .collect()
    assert(m.length > 1)
    assert(m.head.isNullAt(3) && m.tail.forall(!_.isNullAt(3)))
    val deltaSum = m.tail.map(_.getLong(3)).sum
    assert(deltaSum == m.last.getLong(2) - m.head.getLong(2))
  }

  test("q_w_rank: ranks start at 1 per nation, never skip (dense), and " +
    "order by spend") {
    val rows = SparkEntry.queries("q_w_rank")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(3), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (nation, rs) =>
      val byRank = rs.sortBy(r => (r._2, -r._3))
      assert(byRank.map(_._2).distinct.min == 1, s"$nation ranks miss 1")
      assert(byRank.map(_._2).distinct.sorted.sliding(2).forall {
        case Array(a, b) => b == a + 1
        case _ => true
      }, s"$nation dense ranks skip")
      // equal spend ⇔ equal rank; higher spend ⇔ lower rank
      byRank.sliding(2).foreach {
        case Array((_, r1, s1), (_, r2, s2)) =>
          if (r1 == r2) assert(s1 == s2)
          else assert(s1 > s2 && r2 == r1 + 1)
        case _ =>
      }
    }
  }

  test("q_a6_quantiles: approx_percentile (the unbounded-scale path) " +
    "tracks the exact gate within 1 quantity unit at high accuracy") {
    val exact = SparkEntry.queries("q_a6_quantiles")(spark, dir)
    val approx = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75, 0.9), 10000)")
        .as("qs"))
    val a = approx.collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    exact.collect().foreach { r =>
      val flag = r.getString(0)
      Seq(1, 2, 3, 4).zipWithIndex.foreach { case (i, j) =>
        assert(math.abs(r.getDouble(i) - a(flag)(j)) <= 1.0,
          s"$flag p$j drifted: exact=${r.getDouble(i)} approx=${a(flag)(j)}")
      }
    }
  }
}
