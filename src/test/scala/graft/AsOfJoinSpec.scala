package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("asofJoin: latest prior match, inclusive at equal ts, null before first") {
    val left = Seq(
      (1L, ts(50), 100L),  // before any quote → null
      (1L, ts(100), 101L), // == quote q1 ts → inclusive match q1
      (1L, ts(150), 102L), // between q1 and q2 → q1
      (1L, ts(250), 103L), // after q2 → q2
      (2L, ts(500), 200L)  // other key, own quote
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(100), 9001L, 1.5),
      (1L, ts(200), 9002L, 2.5),
      (2L, ts(400), 9003L, 9.9)
    ).toDF("user_id", "ts", "quote_id", "price")

    val got = AsOfJoin.asofJoin(left, right, "user_id", "ts")
      .select("event_id", "quote_id", "price")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
      .toMap

    assert(got(100L).isEmpty)
    assert(got(101L).contains((9001L, 1.5)))
    assert(got(102L).contains((9001L, 1.5)))
    assert(got(103L).contains((9002L, 2.5)))
    assert(got(200L).contains((9003L, 9.9)))
  }

  test("asofJoin: null fields in the matched right row stay null " +
    "(no backfill from older rows)") {
    val left = Seq((1L, ts(250), 103L)).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(100), Some(9001L), Some(1.5)),
      (1L, ts(200), Some(9002L), Option.empty[Double]) // null price
    ).toDF("user_id", "ts", "quote_id", "price")
    val got = AsOfJoin.asofJoin(left, right, "user_id", "ts")
      .select("event_id", "quote_id", "price").head
    // the matched row is (9002, null) — a per-column carry-forward
    // would stitch 9002 with the OLDER row's 1.5
    assert(got.getLong(1) == 9002L)
    assert(got.isNullAt(2), s"null right field backfilled: $got")
  }

  test("asofJoin: every left row survives exactly once (left-join cardinality)") {
    val left = spark.range(100)
      .select(col("id").as("k"), (col("id") * 10).cast("timestamp").as("ts"),
        col("id").as("ev"))
    val right = spark.range(10)
      .select(col("id").as("k"), (col("id") * 5).cast("timestamp").as("ts"),
        col("id").as("q"))
    val out = AsOfJoin.asofJoin(left, right, "k", "ts")
    assert(out.count() == 100)
    assert(out.select("ev").distinct().count() == 100)
  }

  test("q_ev_asof plans one key shuffle + window — no join explosion") {
    import org.apache.spark.sql.execution.ExplainMode
    val p = SparkEntry.queries("q_ev_asof")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("Window"), s"as-of lost its window plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"as-of regressed to a nested-loop join:\n$p")
    // formatted explain prints each node twice (tree + details): at most
    // one hash exchange — the single key shuffle the semantics require
    assert(p.split("Exchange hashpartitioning").length <= 3,
      s"extra shuffles in as-of plan:\n$p")
  }

  test("asofJoin rejects overlapping payload column names") {
    val l = Seq((1L, ts(1), 1.0)).toDF("k", "ts", "v")
    val r = Seq((1L, ts(1), 2.0)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(l, r, "k", "ts")
    }
  }
}
