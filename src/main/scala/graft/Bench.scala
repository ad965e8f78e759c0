package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: one JSON line with per-query wall seconds over
  * SparkEntry.queries at SPARK_GRAFT_SF_DIR.
  *
  * A warm-up action runs first so the first measured query doesn't
  * absorb JVM/session/codegen startup (~3-4s measured), and queries
  * run in sorted name order for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: a scan + shuffle + broadcast exercise, untimed
    spark.read.parquet(s"$sfDir/nation.parquet")
      .join(spark.read.parquet(s"$sfDir/region.parquet"),
        org.apache.spark.sql.functions.expr("n_regionkey = r_regionkey"))
      .groupBy("r_name").count().count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
