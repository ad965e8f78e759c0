package graft

import org.apache.spark.sql.functions._

/** Adaptive Query Execution behaviors the 100 TB plans lean on,
  * demonstrated on real executed plans: runtime skew-join splitting
  * (the complement to the engine's own content-hash salting — AQE
  * handles skew discovered AT RUN TIME, salting handles skew known in
  * advance) and post-shuffle partition coalescing (small-partition
  * explosion control when shuffle.partitions is sized for the big
  * stages).
  */
class AqeSpec extends SparkSpec {

  private def withConfs[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a runtime-skewed join partition (skew=true in the " +
    "final plan)") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink the thresholds so the test corpus's hot key qualifies
      // exactly the way a multi-GB hot partition would in production
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      import spark.implicits._
      // one hot key carrying ~95% of the left side
      val left = spark.range(200000).select(lit(7L).as("k"), col("id").as("v"))
        .union(spark.range(10000)
          .select((col("id") % 100 + 100).as("k"), col("id").as("v")))
      val right = spark.range(300).select(col("id").as("k"), col("id").as("w"))
      // sum(v) keeps the payload column alive through the join: a
      // pruned-to-the-key hot partition would compress under the skew
      // threshold and get coalesced instead of split
      val j = left.join(right, "k")
        .groupBy().agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      // execute THIS dataset's own QueryExecution (a write would plan a
      // fresh one and leave this adaptive plan un-finalized)
      val n = j.collect().head.getLong(0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"plan never finalized:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
      // and the result is exactly the unskewed answer: hot key 7
      // matches one right row; keys 100-199 each match one
      assert(n == 200000L + 10000L, s"wrong join answer: $n")
    }
  }

  test("AQE coalesces an over-partitioned small shuffle") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1MB",
      "spark.sql.shuffle.partitions" -> "64") {
      val tiny = spark.range(1000).groupBy((col("id") % 10).as("g")).count()
      tiny.collect()
      val plan = tiny.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
        s"no runtime coalesce in:\n$plan")
      // 64 configured shuffle partitions collapsed at run time — the
      // knob can be sized for the BIG stages without paying
      // task-per-empty-partition overhead on the small ones
      val parts = tiny.queryExecution.executedPlan.execute().getNumPartitions
      assert(parts < 64, s"still $parts partitions after AQE coalesce")
    }
  }
}
