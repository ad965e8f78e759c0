package graft

import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions
import graft.operators.EntityResolution

/** Ground truth for the entity-resolution operator: the Jaro–Winkler
  * kernel point by point (literature values, the exact Winkler-variant
  * edges), blocking recall vs brute force, and multi-pass union
  * semantics. The `q_e_*` gates pin the same kernel against DuckDB's
  * independent implementation in rounded micros at corpus scale.
  */
class EntityResolutionSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    NativeExpressions.jaroWinklerImpl(a, b)

  test("jaro-winkler: literature reference values") {
    // the canonical Winkler test vectors (also DuckDB's outputs —
    // probed while authoring the q_e_jw_match oracle)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
  }

  test("jaro-winkler: variant edges (threshold, prefix cap, empties)") {
    // boost only ABOVE jaro 0.7: this pair has jaro ~0.5417 and a
    // 1-char common prefix — jw must equal jaro exactly
    assert(jw("ab", "axcdefgh") == 0.5416666666666666)
    // prefix capped at 4: jaro 5/6 boosts to exactly 0.9, not beyond
    assert(math.abs(jw("abcdefgh", "abcdefxy") - 0.9) < 1e-15)
    // empties are 0 on either side (DuckDB convention, incl. both)
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("", "a") == 0.0)
    // identity
    assert(jw("same", "same") == 1.0)
    // no shared characters in window
    assert(jw("abc", "xyz") == 0.0)
    // case-sensitive (callers lower() upstream if they want folding)
    assert(jw("ABC", "abc") == 0.0)
    // odd transposition count floors (t = 3 mismatches → 1):
    // jaro(abcdef, bcadef) = (1 + 1 + 5/6)/3 — probed equal in DuckDB
    assert(math.abs(jw("abcdef", "bcadef") -
      ((1.0 + 1.0 + 5.0 / 6.0) / 3.0 + 0.0)) < 1e-15 ||
      // boost applies (jaro > 0.7, zero common prefix → unchanged)
      math.abs(jw("abcdef", "bcadef") - 0.9444444444444445) < 1e-15)
  }

  test("jaro-winkler column form matches the kernel") {
    import spark.implicits._
    val rows = Seq(("martha", "marhta"), ("dwayne", "duane"), ("", "x"))
      .toDF("a", "b")
      .select(NativeExpressions.jaroWinkler(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0))
    assert(rows.toSeq == Seq(jw("martha", "marhta"),
      jw("dwayne", "duane"), 0.0))
  }

  test("blocking: single-pass pairs = exactly the within-block pairs") {
    import spark.implicits._
    val recs = Seq((1L, "anna"), (2L, "annb"), (3L, "bob"), (4L, "boc"),
      (5L, "ann")).toDF("id", "name")
    val got = EntityResolution.candidatePairs(
        recs, "id", Seq("name"), Seq(substring(col("name"), 1, 2)))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // blocks: "an" → {1,2,5}, "bo" → {3,4}
    assert(got == Set((1L, 2L), (1L, 5L), (2L, 5L), (3L, 4L)))
  }

  test("blocking: multi-pass unions and de-duplicates pairs") {
    import spark.implicits._
    // prefix pass pairs (1,2); suffix pass pairs (1,2) again AND (3,4)
    val recs = Seq((1L, "aax"), (2L, "aax"), (3L, "bzz"), (4L, "czz"))
      .toDF("id", "name")
    val got = EntityResolution.candidatePairs(
        recs, "id", Seq("name"),
        Seq(substring(col("name"), 1, 1), substring(col("name"), 2, 2)))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got.toSet == Set((1L, 2L), (3L, 4L)))
    assert(got.size == 2, "pair found by both passes must appear once")
  }

  test("blocking: null block key generates no candidates") {
    import spark.implicits._
    val recs = Seq((1L, "ann"), (2L, "ann"), (3L, null))
      .toDF("id", "name")
    val got = EntityResolution.candidatePairs(
        recs, "id", Seq("name"), Seq(substring(col("name"), 1, 2)))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("scorers: levenshtein threshold and jw micros threshold") {
    import spark.implicits._
    val pairs = Seq((1L, 2L, "martha", "marhta"), (1L, 3L, "martha", "zzz"))
      .toDF("id_a", "id_b", "name_a", "name_b")
    val lev = EntityResolution
      .levenshteinMatches(pairs, "name_a", "name_b", 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lev == Set((1L, 2L)))
    val jwm = EntityResolution
      .jaroWinklerMatches(pairs, "name_a", "name_b", 900000L)
      .select(col("id_b"), col("jw_micros")).as[(Long, Long)]
      .collect().toSet
    assert(jwm == Set((2L, 961111L)))
  }

  test("trigramPairs ≡ naive posting join on random keys (prefix filter " +
    "is exact)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val alpha = "abcdef"
    val recs = (1L to 120L).map { i =>
      val len = 6 + rnd.nextInt(8)
      (i, (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }
    def gramsOf(s: String): Set[String] =
      if (s.length <= 3) Set(s)
      else (0 to s.length - 3).map(i => s.substring(i, i + 3)).toSet
    for ((t, cap) <- Seq((2, Long.MaxValue), (3, 15L))) {
      val df = recs.flatMap { case (_, k) => gramsOf(k) }
        .groupBy(identity).view.mapValues(_.size).toMap
      val kept = recs.map { case (i, k) =>
        i -> gramsOf(k).filter(g => df(g) <= cap)
      }.toMap
      val want = (for {
        (a, ga) <- kept.toSeq; (b, gb) <- kept.toSeq if a < b
        n = ga.intersect(gb).size if n >= t
      } yield (a, b, n.toLong)).toSet
      val got = EntityResolution.trigramPairs(
          recs.toDF("id", "k"), "id", "k", minCommon = t, maxDf = cap)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want, s"t=$t cap=$cap")
      assert(want.nonEmpty, s"degenerate corpus at t=$t cap=$cap")
    }
  }

  test("trigramPairs: short keys fall back to the whole string") {
    import spark.implicits._
    val recs = Seq((1L, "ab"), (2L, "ab"), (3L, "cd")).toDF("id", "k")
    val got = EntityResolution.trigramPairs(recs, "id", "k", 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L)))
  }

  test("end to end: typo-stable blocking reaches full within-entity recall") {
    import spark.implicits._
    // five records of one entity, typos only at positions >= 4 (the
    // messyNames contract), plus an unrelated entity in another block
    val recs = Seq((1L, "cordansson"), (2L, "cordnsson"), (3L, "corxansson"),
      (4L, "cordaansson"), (10L, "belkelson")).toDF("id", "name")
    val pairs = EntityResolution.candidatePairs(
      recs, "id", Seq("name"), Seq(substring(col("name"), 1, 3)))
    // all 6 within-entity pairs present, none with the other block
    val ids = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(ids == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)))
  }

  test("trigramPairsJaccard equals the naive all-pairs Jaccard at " +
    "every threshold — the prefix and length filters are exact") {
    import spark.implicits._
    val names = Seq("jonathansmith", "jonathansmyth", "jonathansmithx",
      "jonathan", "elizabethjones", "elizabethjone", "lizabethjones",
      "bob", "bobb", "completelyother", "zzzz")
    val recs = names.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
    def naive(thetaMicros: Long): Set[(Long, Long, Long)] = {
      def grams(s: String): Set[String] =
        if (s.length <= 3) Set(s.take(3))
        else (1 to s.length - 2).map(i => s.substring(i - 1, i + 2)).toSet
      (for {
        (a, i) <- names.zipWithIndex; (b, j) <- names.zipWithIndex
        if i < j
        n = grams(a).intersect(grams(b)).size.toLong
        u = grams(a).size + grams(b).size - n
        if n * 1000000L >= u * thetaMicros
      } yield (i.toLong, j.toLong, n * 1000000L / u)).toSet
    }
    for (theta <- Seq(500000L, 700000L, 900000L)) {
      val got = EntityResolution
        .trigramPairsJaccard(recs, "id", "name", theta)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == naive(theta), s"theta=$theta: $got vs ${naive(theta)}")
    }
  }

  test("trigramPairsContainment equals naive all-ordered-pairs " +
    "containment at every threshold, and catches the short-inside-" +
    "long pair symmetric Jaccard misses") {
    import spark.implicits._
    val names = Seq("jonathansmith", "jonathan", "jonathansmithjunior",
      "elizabethjones", "liz", "completelyother")
    val recs = names.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
    def grams(s: String): Set[String] =
      if (s.length <= 3) Set(s.take(3))
      else (1 to s.length - 2).map(i => s.substring(i - 1, i + 2)).toSet
    def naive(thetaMicros: Long): Set[(Long, Long, Long)] =
      (for {
        (a, i) <- names.zipWithIndex; (b, j) <- names.zipWithIndex
        if i != j
        n = grams(a).intersect(grams(b)).size.toLong
        sa = grams(a).size.toLong
        if n * 1000000L >= sa * thetaMicros
      } yield (i.toLong, j.toLong, n * 1000000L / sa)).toSet
    for (theta <- Seq(500000L, 800000L, 1000000L)) {
      val got = EntityResolution
        .trigramPairsContainment(recs, "id", "name", theta)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == naive(theta), s"theta=$theta: $got vs ${naive(theta)}")
    }
    // the asymmetry that motivates the operator: 'jonathan' sits
    // fully inside 'jonathansmith' (containment 1.0, directed 1→0)
    // while their Jaccard is 6/11 — invisible at any useful theta
    val at10 = EntityResolution
      .trigramPairsContainment(recs, "id", "name", 1000000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(at10.contains((1L, 0L, 1000000L)) &&
      !at10.contains((0L, 1L, 1000000L)),
      s"directed full containment must appear exactly once: $at10")
    val jac = EntityResolution
      .trigramPairsJaccard(recs, "id", "name", 700000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(!jac.exists(p => Set(p._1, p._2) == Set(0L, 1L)),
      s"symmetric Jaccard at 0.7 must miss the subset pair: $jac")
  }

  test("capped containment (maxDf) is exact over the capped gram " +
    "sets, and on boilerplate-suffix data drops exactly the pairs " +
    "whose every common gram is a stop-gram") {
    import spark.implicits._
    // six records share the boilerplate suffix 'corp' (its grams
    // 'cor'/'orp' — plus the bridging 'aco' — are the stop-grams);
    // record 6 is PURE boilerplate; record 7 genuinely overlaps 0
    // NATO-style stems chosen so non-boilerplate cross-overlap stays
    // far below theta: a denominator-shift drop (capped containment
    // falling below theta while stop-grams were only part of the
    // overlap) would muddy the all-stop-gram pin this test makes
    val names = Seq("alphacorp", "bravocorp", "charliecorp",
      "deltacorp", "echocorp", "foxtrotcorp", "corp", "alphacor")
    val recs = names.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
    def grams(s: String): Set[String] =
      if (s.length <= 3) Set(s.take(3))
      else (1 to s.length - 2).map(i => s.substring(i - 1, i + 2)).toSet
    val df = names.flatMap(n => grams(n)).groupBy(identity)
      .map { case (g, xs) => g -> xs.size.toLong }
    val theta = 800000L
    val cap = 3L
    def naive(capped: Boolean): Set[(Long, Long, Long)] = {
      def gs(s: String): Set[String] =
        if (capped) grams(s).filter(g => df(g) <= cap) else grams(s)
      (for {
        (a, i) <- names.zipWithIndex; (b, j) <- names.zipWithIndex
        if i != j && gs(a).nonEmpty
        n = gs(a).intersect(gs(b)).size.toLong
        sa = gs(a).size.toLong
        if n * 1000000L >= sa * theta
      } yield (i.toLong, j.toLong, n * 1000000L / sa)).toSet
    }
    val gotCapped = EntityResolution
      .trigramPairsContainment(recs, "id", "name", theta, maxDf = cap)
      .as[(Long, Long, Long)].collect().toSet
    // exactness over the capped sets — the relation the oracle gate
    // (q_e_containment_capped) pins at corpus scale against DuckDB
    assert(gotCapped == naive(capped = true),
      s"capped: $gotCapped vs ${naive(capped = true)}")
    // every pair the cap dropped had ONLY stop-grams in common: the
    // boilerplate-eclipsed pairs (pure-'corp' record 6 against each
    // suffixed name) vanish; the genuine pair 7<->0 survives with its
    // containment recomputed over the surviving grams
    val droppedKeys = naive(capped = false).map(p => (p._1, p._2)) --
      gotCapped.map(p => (p._1, p._2))
    assert(droppedKeys.nonEmpty, "the cap must engage on this data")
    droppedKeys.foreach { case (a, b) =>
      val common = grams(names(a.toInt)).intersect(grams(names(b.toInt)))
      assert(common.nonEmpty && common.forall(g => df(g) > cap),
        s"dropped pair ($a,$b) has a surviving common gram: $common")
    }
    assert(gotCapped.exists(p => p._1 == 7L && p._2 == 0L) &&
      gotCapped.exists(p => p._1 == 0L && p._2 == 7L),
      s"genuine overlap must survive the cap: $gotCapped")
    // dropped-gram accounting (the winnowCandidateStats treatment):
    // the stats replay the same census this test computed by hand
    val stats = EntityResolution.trigramDfStats(recs, "id", "name", cap)
    val wantDroppedGrams = df.count(_._2 > cap).toLong
    val wantDroppedPostings = df.collect {
      case (_, d) if d > cap => d
    }.sum
    val wantEmptied = names.count(n => grams(n).forall(g => df(g) > cap))
    assert(stats.grams == df.size.toLong &&
      stats.droppedGrams == wantDroppedGrams &&
      stats.droppedPostings == wantDroppedPostings &&
      stats.emptiedRecords == wantEmptied.toLong,
      s"stats diverged from the hand census: $stats vs " +
        s"(${df.size}, $wantDroppedGrams, $wantDroppedPostings, " +
        s"$wantEmptied)")
  }
}
