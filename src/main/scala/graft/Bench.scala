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

    // a failing query is recorded in "errors" and contributes NO wall
    // time — a broken query must never quietly look fast
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
        }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val ok = results.filter(_._3.isEmpty)
    val qs = ok.map { case (k, v, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"failed":${results.count(_._3.nonEmpty)},"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.nonEmpty)) sys.exit(1)
  }
}
