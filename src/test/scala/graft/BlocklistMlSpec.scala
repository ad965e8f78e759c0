package graft

import org.apache.spark.sql.functions._
import graft.operators.{AcAutomaton, Blocklist, NaiveBayes}
import graft.functions.TextFunctions

/** Ground truth for the round-11 additions: the Aho–Corasick blocklist
  * matcher (vs a naive all-start-positions scan), the ranking-metric
  * margin contract, and the naive-Bayes classifier (planted separable
  * corpus + partitioning invariance).
  */
class BlocklistMlSpec extends SparkSpec {
  import spark.implicits._

  // ── Aho–Corasick ────────────────────────────────────────────────────

  /** All-start-positions occurrence count — the oracle's semantics. */
  private def naiveCounts(text: String,
                          patterns: Seq[String]): (Long, Long) = {
    val occ = patterns.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }
    (occ.sum, occ.count(_ > 0).toLong)
  }

  test("AC == naive on 400 random texts × random pattern sets " +
    "(overlaps, nesting, absent patterns)") {
    val rnd = new scala.util.Random(7)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(2)).toChar)
      .mkString
    (1 to 20).foreach { _ =>
      val pats = Iterator.continually(randStr(1 + rnd.nextInt(4)))
        .distinct.take(2 + rnd.nextInt(5)).toSeq
      val aut = AcAutomaton(pats)
      (1 to 20).foreach { _ =>
        val t = randStr(rnd.nextInt(40))
        assert(aut.scan(t) == naiveCounts(t, pats),
          s"text='$t' patterns=$pats")
      }
    }
  }

  test("AC nested-pattern output links: 'aaaa' vs [a, aa, aaa]") {
    val aut = AcAutomaton(Seq("a", "aa", "aaa"))
    // 4 + 3 + 2 overlapping occurrences, all three patterns present
    assert(aut.scan("aaaa") == (9L, 3L))
    assert(aut.scan("") == (0L, 0L))
    assert(aut.scan("bbb") == (0L, 0L))
  }

  test("AC construction rejects empty and duplicate patterns") {
    intercept[IllegalArgumentException](AcAutomaton(Seq.empty))
    intercept[IllegalArgumentException](AcAutomaton(Seq("a", "")))
    intercept[IllegalArgumentException](AcAutomaton(Seq("a", "a")))
  }

  test("Blocklist.tag (codegen path) == naive on sf0.001 documents " +
    "with the gate's pattern set; clean() keeps exactly the zero-hit docs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val pats = StretchQueries.blocklistPatterns
    val got = Blocklist.tag(docs, "text", pats)
      .select(col("doc_id"), col("n_hits"), col("n_patterns"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val texts = docs.as[(Long, String)].collect()
    assert(got.size == texts.length)
    texts.foreach { case (id, t) =>
      assert(got(id) == naiveCounts(t, pats), s"doc $id")
    }
    val expectClean = texts.filter { case (_, t) =>
      naiveCounts(t, pats)._1 == 0L }.map(_._1).toSet
    val gotClean = Blocklist.clean(docs, "text", pats)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(gotClean == expectClean)
    // the gate corpus must exercise both sides of the filter
    assert(expectClean.nonEmpty && expectClean.size < texts.length)
  }

  test("pure-SQL surface: graft_blocklist_counts and graft_tokens_cjk " +
    "resolve through the extension and match the Scala forms") {
    val r = spark.sql(
      "SELECT graft_blocklist_counts('fast table table x', " +
        "'fast table', 'table table', 'table') AS c").head.getSeq[Long](0)
    // 'fast table' 1 + 'table table' 1 + 'table' 2 = 4 hits, 3 patterns
    assert(r == Seq(4L, 3L))
    // non-literal pattern → loud failure at plan time, not silence
    intercept[Exception](spark.sql(
      "SELECT graft_blocklist_counts(t, t) FROM VALUES ('x') v(t)")
      .collect())
    val tk = spark.sql("SELECT graft_tokens_cjk('abc中文数 def') AS t")
      .head.getSeq[String](0)
    assert(tk == Seq("abc", "中文", "文数", "def"))
  }

  // ── ranking-metric margin contract ──────────────────────────────────

  test("NDCG term micros never land on a .5 rounding boundary " +
    "(all 40 (rel, rank) combinations)") {
    for (rel <- 0 to 3; rk <- 1 to 10) {
      val x = rel * 1000000.0 / (math.log(rk + 1.0) / math.log(2.0))
      val frac = x - math.floor(x)
      val margin = math.abs(frac - 0.5)
      assert(margin > 1e-3, s"rel=$rel rk=$rk x=$x margin=$margin")
    }
  }

  test("MI / NB log-micros margins on sf0.001: every rounded value is " +
    "far from a .5 boundary (cross-engine 1-ulp log noise can't flip it)") {
    def margins(vals: Seq[Double]): Double =
      vals.map { v =>
        val x = v * 1000000.0
        val frac = x - math.floor(x)
        math.abs(frac - 0.5)
      }.min
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"),
        TextFunctions.tokens(coalesce(col("text"), lit(""))).as("ta"))
    // NB: the raw logs behind every w_micros / w0 / prior
    val tok = docs.select(col("lang"), explode(col("ta")).as("token"))
    val v = tok.select(countDistinct(col("token"))).as[Long].head()
    val cl = tok.groupBy(col("lang")).count().as[(String, Long)]
      .collect().toMap
    val ctl = tok.groupBy(col("lang"), col("token")).count()
      .as[(String, String, Long)].collect()
    val nDocs = docs.count()
    val nl = docs.groupBy(col("lang")).count().as[(String, Long)]
      .collect().toMap
    val nbLogs = ctl.map { case (l, _, c) =>
      math.log((c + 1.0) / (cl(l) + v)) }.toSeq ++
      cl.keys.map(l => math.log(1.0 / (cl(l) + v))) ++
      nl.map { case (l, n) => math.log(n.toDouble / nDocs) }
    val mNb = margins(nbLogs)
    assert(mNb > 1e-4, s"NB min margin $mNb")
    // MI: the four cell logs per token (en vs rest, presence counts)
    val dt = docs.select(col("lang"),
      explode(array_distinct(col("ta"))).as("token"))
    val cells = dt.groupBy(col("token")).agg(
      count(when(col("lang") === "en", 1)).as("n11"),
      count(when(col("lang") =!= "en", 1)).as("n10"))
      .as[(String, Long, Long)].collect()
    val nEn = nl.getOrElse("en", 0L)
    val miLogs = cells.flatMap { case (_, n11, n10) =>
      val n1 = n11 + n10
      Seq((n11, n1 * nEn), (n10, n1 * (nDocs - nEn)),
        (nEn - n11, (nDocs - n1) * nEn),
        (nDocs - nEn - n10, (nDocs - n1) * (nDocs - nEn)))
        .collect { case (c, d) if c > 0 =>
          math.log(c.toDouble * nDocs / d) }
    }.toSeq
    val mMi = margins(miLogs)
    assert(mMi > 1e-4, s"MI min margin $mMi")
  }

  // ── naive Bayes ─────────────────────────────────────────────────────

  test("NB on a separable planted corpus: every doc classified to its " +
    "own label; unseen-token doc goes to the shallower smoothing floor") {
    val docs = Seq(
      (1L, "alpha beta alpha", "A"), (2L, "beta alpha beta", "A"),
      (3L, "alpha alpha", "A"),
      (4L, "gamma delta", "B"), (5L, "delta gamma gamma", "B"))
      .toDF("doc_id", "text", "lab")
      .select(col("doc_id"), col("lab"),
        TextFunctions.tokens(col("text")).as("ta"))
    val (w, ls) = NaiveBayes.train(docs, col("ta"), col("lab"))
    val pred = NaiveBayes.score(docs, "doc_id", col("ta"), w, ls)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(pred == Map(1L -> "A", 2L -> "A", 3L -> "A",
      4L -> "B", 5L -> "B"))
    // unseen tokens only: every label serves its floor
    // w0 = ln(1/(c_l+V)), which is SHALLOWER for the label with fewer
    // training tokens (B: ln(1/9) vs A: ln(1/12)); two floors outweigh
    // A's prior edge → B wins: prior+2·w0 = ln(2/5)−2·ln9 = −5.311 vs
    // ln(3/5)−2·ln12 = −5.481
    val unseen = Seq((9L, "zeta eta")).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ta"))
    val p9 = NaiveBayes.score(unseen, "doc_id", col("ta"), w, ls)
      .as[(Long, String, Long)].collect()
    assert(p9.length == 1 && p9.head._2 == "B")
    // the engine rounds EACH term to micros, then integer-sums
    def mic(x: Double) = BigDecimal(x * 1000000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(p9.head._3 == mic(math.log(2.0 / 5)) + 2 * mic(math.log(1.0 / 9)))
  }

  // ── logistic regression (distributed GD) ────────────────────────────

  /** The gate's featurizer, replayed in plain Scala. */
  private def lrRows(sf: String): Array[(Long, Array[Long])] = {
    val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      .select(col("lang"), coalesce(col("n_chars"), lit(0L)).as("nc"),
        size(graft.functions.TextFunctions.tokens(
          coalesce(col("text"), lit("")))).cast("long").as("nt"))
      .as[(String, Long, Long)].collect()
    docs.map { case (lang, nc, nt) =>
      (if (lang == "en") 1000000L else 0L,
        Array(1000000L, math.min(nc, 500L) * 2000L,
          math.min(nt * 20000L, 1000000L), (nc % 7) * 142857L))
    }
  }

  private def lrFeatDf(sf: String) = {
    val rows = lrRows(sf)
    rows.toSeq.toDF("y", "x")
  }

  /** Pure-Scala replay of LogReg.train (independent implementation). */
  private def lrRef(rows: Array[(Long, Array[Long])], iters: Int,
                    lrPpm: Long): Seq[Array[Long]] = {
    var w = Array.fill(4)(0L)
    (1 to iters).map { _ =>
      val g = Array.fill(4)(0L)
      rows.foreach { case (y, x) =>
        val z = x.zip(w).map { case (a, b) => a * b }.sum
        val p = BigDecimal(1000000.0 / (1.0 + math.exp(-z / 1e12)))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        (0 until 4).foreach(j => g(j) += (p - y) * x(j))
      }
      w = w.indices.map(j =>
        w(j) - (g(j) / rows.length) * 300000L / 1000000000000L).toArray
      w
    }
  }

  test("LogReg.train == independent Scala replay on sf0.001, and is " +
    "partitioning-invariant") {
    val rows = lrRows("sf0.001")
    val expect = lrRef(rows, 3, 300000L)
    val df = lrFeatDf("sf0.001")
    val got = graft.operators.LogReg.train(df.repartition(13),
      col("y"), col("x"), 4, 3, 300000L)
    assert(got.map(_.toSeq) == expect.map(_.toSeq))
    val got1 = graft.operators.LogReg.train(df.repartition(1),
      col("y"), col("x"), 4, 3, 300000L)
    assert(got1.map(_.toSeq) == got.map(_.toSeq))
  }

  test("LR σ micros stay off the .5 boundary along the whole sf0.01 " +
    "training path, and the log-loss decreases every iteration") {
    val rows = lrRows("sf0.01")
    var w = Array.fill(4)(0L)
    var lastLoss = Double.MaxValue
    (1 to 4).foreach { _ =>  // one step past the gate's 3: scoring pass
      var minMargin = Double.MaxValue
      var loss = 0.0
      val g = Array.fill(4)(0L)
      rows.foreach { case (y, x) =>
        val z = x.zip(w).map { case (a, b) => a * b }.sum
        val sig = 1.0 / (1.0 + math.exp(-z / 1e12))
        val xm = sig * 1000000.0
        val frac = xm - math.floor(xm)
        minMargin = math.min(minMargin, math.abs(frac - 0.5))
        val p = BigDecimal(xm)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        (0 until 4).foreach(j => g(j) += (p - y) * x(j))
        val yb = y == 1000000L
        loss -= math.log(math.max(if (yb) sig else 1.0 - sig, 1e-12))
      }
      assert(minMargin > 1e-4, s"σ margin $minMargin too tight")
      assert(loss < lastLoss, s"loss $loss did not improve on $lastLoss")
      lastLoss = loss
      w = w.indices.map(j =>
        w(j) - (g(j) / rows.length) * 300000L / 1000000000000L).toArray
    }
  }

  test("streaming curation scoring ≡ batch: blocklist counts flow " +
    "map-only through a file stream; NB scores per micro-batch via " +
    "foreachBatch with a batch-trained model") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_blml_stream").toString
    val batch = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"),
        coalesce(col("text"), lit("")).as("text"))
    batch.write.parquet(s"$tmp/in")
    val toks = batch.withColumn("ta", TextFunctions.tokens(col("text")))
    val (w, ls) = NaiveBayes.train(toks, col("ta"), col("lang"))
    val expectNb = NaiveBayes.score(toks, "doc_id", col("ta"), w, ls)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val pats = StretchQueries.blocklistPatterns
    val expectBl = Blocklist.tag(batch, "text", pats)
      .select(col("doc_id"), col("n_hits"), col("n_patterns"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    // blocklist: a plain map-only projection — streaming-native
    val qBl = Blocklist.tag(stream, "text", pats)
      .select(col("doc_id"), col("n_hits"), col("n_patterns"))
      .writeStream.format("memory").queryName("bl_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // NB inference needs a per-doc argmax (a window) → the standard
    // composition is foreachBatch: score each micro-batch with the
    // broadcast-trained model and append
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, String, Long)]()
    val qNb = stream
      .withColumn("ta", TextFunctions.tokens(col("text")))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        NaiveBayes.score(b, "doc_id", col("ta"), w, ls)
          .as[(Long, String, Long)](
            org.apache.spark.sql.Encoders.product[(Long, String, Long)])
          .collect().foreach(got.add)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    qBl.awaitTermination(300000); qBl.stop()
    qNb.awaitTermination(300000); qNb.stop()
    val gotBl = spark.table("bl_stream")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(gotBl == expectBl)
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSeq.sortBy(_._1) == expectNb)
  }

  test("NB predictions are partitioning-invariant on sf0.001 documents") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"),
        TextFunctions.tokens(coalesce(col("text"), lit(""))).as("ta"))
    def run(df: org.apache.spark.sql.DataFrame) = {
      val (w, ls) = NaiveBayes.train(df, col("ta"), col("lang"))
      NaiveBayes.score(df, "doc_id", col("ta"), w, ls)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    }
    assert(run(base.repartition(1)) == run(base.repartition(17)))
  }
}
