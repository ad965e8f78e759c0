package graft

import org.apache.spark.sql.functions.col
import graft.operators.QualityRules

/** Gopher rule battery: each rule exercised at its boundary on
  * hand-built documents, plus the null-text contract and the
  * filter/report consistency.
  */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private val goodText = {
    // 60 words, mean length in [3,10], stop words present, clean lines
    val sentence = "the committee will be meeting to review all of " +
      "the pending proposals and decide that every item should have " +
      "a fair hearing with careful notes taken"
    sentence + " " + sentence + " and then some closing words here"
  }

  private def report(rows: (Long, String)*) =
    QualityRules.gopherReport(rows.toSeq.toDF("doc_id", "text"),
      "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("a clean document passes every rule") {
    val r = report(1L -> goodText)(1L)
    assert(r.getAs[Boolean]("pass"),
      Seq("r_wordcount", "r_meanlen", "r_symbol", "r_bullet", "r_ellipsis",
        "r_alpha", "r_stop", "r_dupline")
        .map(c => s"$c=${r.getAs[Boolean](c)}").mkString(" "))
  }

  test("word-count bounds: 49 words fail, 50 pass") {
    val base = "the be to of and that have with good words "
    val w49 = (base * 5).trim.split(" ").take(49).mkString(" ")
    val w50 = (base * 5).trim.split(" ").take(50).mkString(" ")
    val m = report(1L -> w49, 2L -> w50)
    assert(!m(1L).getAs[Boolean]("r_wordcount"))
    assert(m(2L).getAs[Boolean]("r_wordcount"))
  }

  test("symbol, bullet, ellipsis, and alpha rules trip on constructed " +
    "violations") {
    val hashy = goodText + " " + ("# " * 10).trim       // >10% hash/words
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    val dots = (1 to 10).map(i => s"line number $i goes on...")
      .mkString("\n") + "\nplain closing line"
    val numeric = goodText + " " + (1 to 60).map(_.toString).mkString(" ")
    val m = report(1L -> hashy, 2L -> bullets, 3L -> dots, 4L -> numeric)
    assert(!m(1L).getAs[Boolean]("r_symbol"))
    assert(!m(2L).getAs[Boolean]("r_bullet"), "100% bulleted lines")
    assert(!m(3L).getAs[Boolean]("r_ellipsis"), "10/11 ellipsis lines")
    assert(!m(4L).getAs[Boolean]("r_alpha"), "half the tokens numeric")
  }

  test("duplicate-line rule: 4 repeats of 8 lines fail, all-distinct pass") {
    val distinct8 = (1 to 8).map(i => s"unique line number $i").mkString("\n")
    val withDups = distinct8 + "\n" + (1 to 4)
      .map(_ => "unique line number 1").mkString("\n")
    val m = report(1L -> distinct8, 2L -> withDups)
    assert(m(1L).getAs[Boolean]("r_dupline"))
    assert(!m(2L).getAs[Boolean]("r_dupline"), "4/12 lines are repeats")
  }

  test("stop-word rule needs two distinct stop words; null text fails " +
    "everything with zero counts") {
    val noStops = (1 to 60).map(i => s"wordy$i").mkString(" ")
    val oneStop = "the " + noStops
    val m = report(1L -> noStops, 2L -> oneStop,
      3L -> null.asInstanceOf[String])
    assert(!m(1L).getAs[Boolean]("r_stop"))
    assert(!m(2L).getAs[Boolean]("r_stop"), "one distinct stop word only")
    assert(!m(3L).getAs[Boolean]("pass"))
    assert(m(3L).getAs[Long]("n_words") == 0L)
  }

  test("gopherFilter keeps exactly the passing documents") {
    val df = Seq(1L -> goodText, 2L -> "too short", 3L -> goodText)
      .toDF("doc_id", "text")
    val kept = QualityRules.gopherFilter(df, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
    assert(QualityRules.gopherFilter(df, "text", "doc_id").columns.toSeq ==
      df.columns.toSeq, "filter preserves the input schema")
  }

  test("fdCheck: true FDs report zero, violations count keys/rows/" +
    "fan-out, a NULL dependent on an otherwise-clean key violates, " +
    "NULL determinants are excluded") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq[(java.lang.Long, String, String)](
      (1L, "a", "x"), (1L, "a", "x"),        // key 1: clean
      (2L, "b", "x"), (2L, "c", "x"),        // key 2: dep1 fans out (2)
      (3L, "d", "x"), (3L, "d", null),       // key 3: NULL dep2 violates
      (4L, "e", "y"),
      (null, "zzz", "zzz"))                  // NULL det: ignored
      .toDF("k", "d1", "d2")
    val got = graft.operators.DataQuality.fdCheck(df,
        Seq(("k", "d1"), ("k", "d2")))
      .as[(String, Long, Long, Long)].collect()
      .map { case (c, a, b, f) => c -> ((a, b, f)) }.toMap
    // claim k->d1: key 2 violates (2 rows, fanout 2)
    assert(got("k->d1") == ((1L, 2L, 2L)), got.toString)
    // claim k->d2: key 3 violates via the NULL dependent (fanout 1+1)
    assert(got("k->d2") == ((1L, 2L, 2L)), got.toString)
    // a fully-true FD reports a zero row, not an empty result
    val clean = graft.operators.DataQuality.fdCheck(df,
        Seq(("d1", "k")))
      .as[(String, Long, Long, Long)].head()
    assert(clean == (("d1->k", 0L, 0L, 0L)))
  }

  test("cohenKappaMicros: textbook value, NULL exclusion, perfect " +
    "agreement = 1e6, vacuous constant agreement = NULL, " +
    "label-independent annotators ≈ 0") {
    import org.apache.spark.sql.functions.col
    import graft.operators.DataQuality
    // classic 2x2: a=(y:25,n:25) b mixing — agree 35 of 50:
    // n1(y)=25,n1(n)=25; n2(y)=30,n2(n)=20 → S=25·30+25·20=1250
    // κ = (35·50−1250)/(2500−1250) = 500/1250 = 0.4 exactly
    val rows =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq((null, "y"), ("y", null)) // un-annotated rows must drop
    val out = DataQuality.cohenKappaMicros(
      rows.toDF("a", "b"), col("a"), col("b")).head()
    assert(out.getLong(0) == 50L && out.getLong(1) == 35L)
    assert(out.getLong(3) == 400000L, s"κ: ${out.getLong(3)}")
    // perfect agreement over ≥2 labels → κ = 1 exactly
    val perfect = DataQuality.cohenKappaMicros(
      Seq(("x", "x"), ("y", "y")).toDF("a", "b"), col("a"), col("b"))
      .head()
    assert(perfect.getLong(3) == 1000000L)
    // both annotators constant and identical → p_e = 1 → NULL
    val vac = DataQuality.cohenKappaMicros(
      Seq(("x", "x"), ("x", "x")).toDF("a", "b"), col("a"), col("b"))
      .head()
    assert(vac.isNullAt(3), "vacuous agreement must be NULL, not 1")
    // independence: b is a constant while a varies → κ = 0 exactly
    // (agree·N = n1(x)·N = S when n2(x) = N)
    val indep = DataQuality.cohenKappaMicros(
      Seq(("x", "x"), ("y", "x"), ("x", "x"), ("z", "x"))
        .toDF("a", "b"), col("a"), col("b")).head()
    assert(indep.getLong(3) == 0L, s"κ: ${indep.getLong(3)}")
  }

  test("fleissKappaMicros: hand-computed varying-raters value, " +
    "single-vote items drop from both sides, unanimity is NULL, " +
    "the assignment envelope raises loudly") {
    import org.apache.spark.sql.functions.col
    import graft.operators.DataQuality
    // item A [x,x]: a=2; item B [x,y]: a=0; item C [y,y,y]: a=6;
    // item D [x] drops. A=8, B=2+2+6=10 → P_o=0.8.
    // L_x=3, L_y=4, D=7, E=25 → P_e=25/49.
    // κ = (8·49−10·25)/(10·(49−25)) = 142/240 = 0.5916667
    val votes = Seq(
      ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "y"),
      ("C", "y"), ("C", "y"), ("C", "y"),
      ("D", "x")).toDF("item", "c")
    val out = DataQuality.fleissKappaMicros(votes, Seq("item"), "c").head()
    assert(out.getLong(0) == 3L, "item D (single vote) must drop")
    assert(out.getLong(1) == 7L, "kept assignments")
    assert(out.getLong(2) == 800000L, s"P_o: ${out.getLong(2)}")
    assert(out.getLong(3) == 510204L, s"P_e: ${out.getLong(3)}")
    assert(out.getLong(4) == 591667L, s"κ: ${out.getLong(4)}")
    // unanimity in ONE category: chance agreement is 1 → κ undefined
    val unan = DataQuality.fleissKappaMicros(
      Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "x"))
        .toDF("item", "c"), Seq("item"), "c").head()
    assert(unan.getLong(2) == 1000000L && unan.isNullAt(4),
      "all-one-category must be NULL, not 1")
    // perfect agreement over ≥2 categories → κ = 1 exactly
    val perfect = DataQuality.fleissKappaMicros(
      Seq(("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"))
        .toDF("item", "c"), Seq("item"), "c").head()
    assert(perfect.getLong(4) == 1000000L)
    // the in-plan envelope: 60k assignments on one item must raise,
    // never wrap
    val big = spark.range(60000L)
      .select(org.apache.spark.sql.functions.lit("A").as("item"),
        (col("id") % 2).cast("string").as("c"))
    val e = intercept[Exception] {
      DataQuality.fleissKappaMicros(big, Seq("item"), "c").head()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("envelope") ||
        Option(e.getCause).exists(_.getMessage.contains("envelope"))),
      s"expected the loud envelope error, got: ${e.getMessage}")
  }

  test("vocabDriftMicros: identical snapshots read exactly 0 per type; " +
    "new-only tokens contribute positive, vanished tokens negative; " +
    "the integer total is the smoothed KL in micros; null/empty texts " +
    "and an empty union vocab are safe") {
    import org.apache.spark.sql.functions.col
    import graft.operators.DataQuality
    val ref = Seq((1L, "alpha beta beta"), (2L, "gamma alpha"))
      .toDF("id", "text")
    // identity: p_cur == p_ref per type → ln 1 = 0 → 0 micros EXACTLY
    val same = DataQuality.vocabDriftMicros(ref, ref, "text")
      .as[(String, Long, Long, Long)].collect()
    assert(same.length == 3 && same.forall(_._4 == 0L),
      s"identity drift must be exactly zero: ${same.toSeq}")
    // shifted mix: 'delta' arrives, 'gamma' vanishes
    val cur = Seq((3L, "alpha beta delta delta"), (4L, null: String))
      .toDF("id", "text")
    val drift = DataQuality.vocabDriftMicros(ref, cur, "text")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(drift.keySet == Set("alpha", "beta", "gamma", "delta"))
    assert(drift("delta")._4 > 0L, "arriving token must read positive")
    assert(drift("gamma")._4 < 0L, "vanished token must read negative")
    // the total is Σ of per-type micros — integer arithmetic, and it
    // equals the double-precision smoothed KL within per-type
    // rounding (4 types → ±2 micros)
    val total = drift.values.map(_._4).sum
    def p(c: Long, n: Long, v: Long): Double =
      (c + 1).toDouble / (n + v).toDouble
    val klDirect = drift.values.map { case (_, cr, cc, _) =>
      p(cc, 4, 4) * math.log(p(cc, 4, 4) / p(cr, 5, 4))
    }.sum * 1e6
    assert(math.abs(total - klDirect) <= 2.0,
      s"total $total vs direct $klDirect")
    // degenerate: both snapshots tokenless → empty result, no division
    val empty = DataQuality.vocabDriftMicros(
      Seq((1L, ""), (2L, null: String)).toDF("id", "text"),
      Seq((3L, "   ")).toDF("id", "text"), "text")
    assert(empty.count() == 0L)
  }
}
