package graft

import org.apache.spark.sql.functions._

import graft.engine.SkewJoin
import graft.operators.{HeavyHitters, InvertedIndex}

/** Round-5 corpus/scale operators: salted-join edge semantics (the
  * hot-key equivalence lives in ScaleFeaturesSpec), exact heavy
  * hitters (Misra–Gries candidates + recount), positional postings.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── SkewJoin ─────────────────────────────────────────────────────────

  test("saltedJoin handles null keys like the plain join") {
    val big = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"), (None, "d"))
      .toDF("k", "payload")
    val small = Seq((Some(1L), "one"), (None, "null-name"))
      .toDF("k", "name")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt)
        .select("k", "payload", "name")
        .as[(Option[Long], String, Option[String])].collect().sorted
      val salted = SkewJoin.saltedJoin(big, small, Seq("k"), 4, jt)
        .select("k", "payload", "name")
        .as[(Option[Long], String, Option[String])].collect().sorted
      assert(salted.toSeq == plain.toSeq, s"joinType=$jt")
    }
  }

  test("saltedJoin rejects small-side-duplicating join types") {
    val df = Seq((1L, "x")).toDF("k", "v")
    for (jt <- Seq("right", "full", "full_outer", "cross"))
      intercept[IllegalArgumentException] {
        SkewJoin.saltedJoin(df, df, Seq("k"), 4, jt)
      }
  }

  test("saltedJoin saltBuckets=1 degenerates to the plain join") {
    val big = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val small = Seq((1L, "one")).toDF("k", "name")
    val got = SkewJoin.saltedJoin(big, small, Seq("k"), saltBuckets = 1)
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "a", "one")))
  }

  test("saltedJoin left_semi / left_anti partition the big side") {
    val big = (1L to 50L).map(i => (i % 5, i)).toDF("k", "v")
    val small = Seq((0L, "x"), (1L, "y")).toDF("k", "name")
    val semi = SkewJoin.saltedJoin(big, small, Seq("k"), 4, "left_semi")
      .as[(Long, Long)].collect().toSet
    val anti = SkewJoin.saltedJoin(big, small, Seq("k"), 4, "left_anti")
      .as[(Long, Long)].collect().toSet
    val all = big.as[(Long, Long)].collect().toSet
    assert(semi == all.filter(r => r._1 == 0L || r._1 == 1L))
    assert(anti == all -- semi)
  }

  // ── HeavyHitters ─────────────────────────────────────────────────────

  test("misraGries survivors contain every token above n/k (forced overflow)") {
    // 60 distinct fillers + 2 heavies through k=16 counters: far more
    // distinct tokens than counters, so the decrement path runs hot
    val heavy = Seq.fill(300)("alpha") ++ Seq.fill(150)("beta")
    val noise = (1 to 600).map(i => s"tok${i % 60}")
    val stream = new scala.util.Random(7).shuffle(heavy ++ noise)
    val survivors =
      HeavyHitters.misraGries(stream.iterator, k = 16).toSet
    // n = 1050, n/k ≈ 66 — both heavies must survive
    assert(survivors.contains("alpha") && survivors.contains("beta"))
    assert(survivors.size <= 16)
  }

  test("tokenHeavyHitters is exact against a plain group-by (skewed corpus)") {
    val docs = (1 to 400).map { i =>
      val body = if (i % 2 == 0) "the quick fox" else s"rare$i token word"
      (i.toLong, body)
    }.toDF("doc_id", "text")
    val got = HeavyHitters
      .tokenHeavyHitters(docs, "text", minCount = 100L, k = 64)
      .as[(String, Long)].collect().toMap
    val expected = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 100).as[(String, Long)].collect().toMap
    assert(got == expected)
    assert(expected.nonEmpty) // the spec must actually discriminate
  }

  test("tokenHeavyHitters validate=true rejects an undersized k") {
    val docs = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      HeavyHitters.tokenHeavyHitters(docs, "text", minCount = 2L, k = 3,
        validate = true).collect()
    }
  }

  test("tokenHeavyHitters ignores null-text rows") {
    val docs = Seq((1L, Some("a a a")), (2L, None), (3L, Some("a b")))
      .toDF("doc_id", "text")
    val got = HeavyHitters.tokenHeavyHitters(docs, "text", minCount = 2L,
      k = 16).as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 4L))
  }

  // ── InvertedIndex ────────────────────────────────────────────────────

  test("postings positions and counts match per-document truth") {
    val docs = Seq(
      (1L, "to be or not to be"),
      (2L, "be quick"),
      (3L, "")).toDF("doc_id", "text")
    val got = InvertedIndex.postings(docs, "text", "doc_id")
      .as[(String, Long, Long, String)].collect()
      .map { case (t, d, n, p) => ((t, d), (n, p)) }.toMap
    assert(got(("to", 1L)) == ((2L, "1,5")))
    assert(got(("be", 1L)) == ((2L, "2,6")))
    assert(got(("be", 2L)) == ((1L, "1")))
    assert(got(("quick", 2L)) == ((1L, "2")))
    assert(got(("or", 1L)) == ((1L, "3")))
    assert(got(("not", 1L)) == ((1L, "4")))
    // empty doc contributes no postings
    assert(!got.keys.exists(_._2 == 3L))
    assert(got.size == 6)
  }

  test("postings n_occ always equals the position-list length") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = InvertedIndex.postings(docs, "text", "doc_id")
      .filter(size(split(col("positions_csv"), ",")) =!= col("n_occ"))
      .count()
    assert(bad == 0L)
  }

  // ── q_t_pmi / q_ev_winsor gate kernels ───────────────────────────────

  test("PMI: a planted always-adjacent pair ranks above an " +
    "independent pair; counts are exact") {
    // "alpha beta" always adjacent (10×); "gamma"/"delta" co-occur
    // never adjacent-dependent: gamma delta appear adjacent only by
    // chance of construction (here 5× but each also occurs alone 20×)
    val rows = Seq.fill(10)("alpha beta filler") ++
      Seq.fill(5)("gamma delta mid") ++
      Seq.fill(20)("gamma lone") ++ Seq.fill(20)("delta solo")
    val docs = rows.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    val got = StretchQueries.queries("q_t_pmi")(spark, writeDocs(docs))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got(("alpha", "beta"))._1 == 10L)
    assert(got(("gamma", "delta"))._1 == 5L)
    // p(alpha)=p(beta)=10/N while gamma/delta are 25/N each: the
    // dedicated pair's PMI must be strictly higher
    assert(got(("alpha", "beta"))._2 > got(("gamma", "delta"))._2)
  }

  test("winsor: values clamp to the snapped [ceil(p05), floor(p95)] " +
    "band per type; interior values pass through untouched") {
    val ev = ((1 to 99).map(i => (i.toLong, "a", i * 1.0)) :+
      (100L, "a", 10000.0)).toDF("event_id", "event_type", "value")
    val dir = tmpDir("winsor")
    ev.selectExpr("event_id", "timestamp '2024-01-01' AS ts",
        "event_id AS user_id", "event_type", "value", "'' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StretchQueries.queries("q_ev_winsor")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // p05 of (1..99, 10000)·1e6: between 5e6 and 6e6 → low tail clamps
    assert(got(1L) >= 5000000L && got(1L) <= 6000000L)
    assert(got(50L) == 50000000L) // interior untouched
    assert(got(100L) < 10000000000L) // the outlier is capped
    assert(got(100L) == got.values.max)
  }

  private def writeDocs(df: org.apache.spark.sql.DataFrame): String = {
    val dir = tmpDir("pmi-docs")
    df.selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text",
        "'en' AS lang", "'synth' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }
}
