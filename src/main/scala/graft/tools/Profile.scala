package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (not part of the library surface):
  * times a named subset of SparkEntry.queries, N reps each, so a
  * single operator's constant can be chased without a full Bench run.
  * Usage: sbt "runMain graft.tools.Profile q_d_minhash_lsh q_v_neardup"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("topk-micro")) { topkMicro(); return }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/nation.parquet").count() // warm-up

    val explain = args.headOption.contains("--explain")
    val explainExec = args.headOption.contains("--explain-exec")
    val names0 = if (explain || explainExec) args.tail.toSeq else args.toSeq
    val names = if (names0.nonEmpty) names0 else Seq("q_d_minhash_lsh")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (explainExec) {
        // the plan AFTER AQE replanning (runtime exchange reuse etc.)
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(s"===== $name (executed) =====")
        println(df.queryExecution.executedPlan.toString)
      } else if (explain) {
        println(s"===== $name =====")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      } else {
        val times = (1 to reps).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          // noop sink like Bench: count() lets Catalyst prune the work
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name: ${times.map(t => f"$t%.2f").mkString(" ")} s")
      }
    }
    spark.stop()
  }

  /** Pure-JVM micro-benchmark: heap TopKBuf vs the former sorted-List
    * reduce, 1M rows, k=100 (no Spark).
    */
  private def topkMicro(): Unit = {
    val rnd = new scala.util.Random(3)
    val rows = Array.fill(1000000)((rnd.nextDouble(), rnd.nextLong()))
    val k = 100
    def lt(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    for (_ <- 1 to 3) {
      var t0 = System.nanoTime()
      val buf = graft.operators.TopK.TopKBuf(
        new Array[Double](k), new Array[Long](k), 0)
      rows.foreach { case (s, id) => buf.insert(s, id) }
      val heapS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      var list = List.empty[(Double, Long)]
      rows.foreach { p =>
        if (!(list.length >= k && lt(list.last, p)))
          list = ((p :: list).sortWith(lt)).take(k)
      }
      val listS = (System.nanoTime() - t0) / 1e9
      assert(buf.sortedPairs == list)
      println(f"k=$k 1M rows: heap $heapS%.3f s, sorted-list $listS%.3f s")
    }
  }
}
