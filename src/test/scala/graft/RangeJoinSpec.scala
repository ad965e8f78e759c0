package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("pointInInterval equals the brute-force theta join, boundaries inclusive") {
    val rnd = new scala.util.Random(5)
    val points = (1L to 300L).map(i =>
      (i, i % 7, ts(rnd.nextInt(1000000).toLong))).toDF("pid", "k", "ts")
    // intervals longer AND shorter than the bin width (1s here)
    val intervals = (1L to 60L).map { i =>
      val s = rnd.nextInt(900000)
      (i, i % 7, ts(s.toLong), ts(s.toLong + 500 + rnd.nextInt(5000)))
    }.toDF("iid", "k", "wstart", "wend")

    val brute = points.join(intervals, Seq("k"))
      .filter(col("ts") >= col("wstart") && col("ts") <= col("wend"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val binned = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "ts", "wstart", "wend", binWidthMicros = 1000000L)
      .select("pid", "iid").as[(Long, Long)].collect()

    assert(binned.length == binned.toSet.size, "duplicate pairs emitted")
    assert(binned.toSet == brute && brute.nonEmpty)
    // inclusive boundaries: a point exactly on wstart/wend matches
    val edge = RangeJoin.pointInInterval(
      Seq((1L, 0L, ts(1000)), (2L, 0L, ts(2000))).toDF("pid", "k", "ts"),
      Seq((9L, 0L, ts(1000), ts(2000))).toDF("iid", "k", "wstart", "wend"),
      Seq("k"), "ts", "wstart", "wend", binWidthMicros = 250000L)
    assert(edge.count() == 2)
  }

  test("intervalOverlap equals brute force, each pair exactly once") {
    val rnd = new scala.util.Random(11)
    def mk(n: Int, tag: String) = (1L to n.toLong).map { i =>
      val s = rnd.nextInt(500000)
      (i, i % 5, ts(s.toLong), ts(s.toLong + 1000 + rnd.nextInt(300000)))
    }.toDF(s"${tag}id", "k", s"${tag}start", s"${tag}end")
    val a = mk(80, "a")
    val b = mk(80, "b")
    val brute = a.join(b, Seq("k"))
      .filter(col("astart") <= col("bend") && col("bstart") <= col("aend"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    val binned = RangeJoin.intervalOverlap(a, b, Seq("k"),
        ("astart", "bstart"), ("aend", "bend"), binWidthMicros = 100000L)
      .select("aid", "bid").as[(Long, Long)].collect()
    assert(binned.length == binned.toSet.size, "pair emitted in several bins")
    assert(binned.toSet == brute && brute.nonEmpty)
  }

  test("q_ev_range plans an equi-join, not a nested-loop theta join") {
    import org.apache.spark.sql.execution.ExplainMode
    val p = SparkEntry.queries("q_ev_range")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join regressed to theta join:\n$p")
  }
}
