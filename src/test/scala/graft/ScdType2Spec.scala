package graft

import org.apache.spark.sql.functions._
import graft.engine.ScdType2

/** SCD Type-2 merge semantics: every branch of the case analysis
  * (carried / closed / opened / new-key), idempotent snapshot
  * re-delivery, the one-open-row-per-key invariant across chained
  * batches, and null-safe attribute comparison.
  */
class ScdType2Spec extends SparkSpec {
  import spark.implicits._

  private def dim0 = ScdType2.initial(
    Seq((1L, "A", 100L), (2L, "B", 200L), (3L, "C", 300L))
      .toDF("k", "seg", "bal"),
    batch = 0L)

  test("merge covers carried, changed, and new-key cases with validity " +
    "stamps") {
    val updates = Seq(
      (1L, "A", 100L),  // unchanged → carried
      (2L, "B2", 200L), // changed → close + open
      (9L, "Z", 900L)   // new key → open
    ).toDF("k", "seg", "bal")
    val out = ScdType2.merge(dim0, updates, Seq("k"), Seq("seg", "bal"),
      batch = 1L)
      .select("k", "seg", "bal", "effective_from", "effective_to",
        "is_current")
      .as[(Long, String, Long, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(out == Set(
      (1L, "A", 100L, 0L, None, true),      // carried untouched
      (2L, "B", 200L, 0L, Some(1L), false), // closed old version
      (2L, "B2", 200L, 1L, None, true),     // opened new version
      (3L, "C", 300L, 0L, None, true),      // absent from snapshot
      (9L, "Z", 900L, 1L, None, true)))     // brand-new key
  }

  test("re-delivering the same snapshot is a no-op, and chained batches " +
    "keep exactly one open row per key") {
    val snap1 = Seq((1L, "A2", 100L), (2L, "B", 200L), (3L, "C", 300L))
      .toDF("k", "seg", "bal")
    val d1 = ScdType2.merge(dim0, snap1, Seq("k"), Seq("seg", "bal"), 1L)
    val d1again = ScdType2.merge(d1, snap1, Seq("k"), Seq("seg", "bal"), 2L)
    assert(d1.orderBy("k", "effective_from").collect().toSeq ==
      d1again.orderBy("k", "effective_from").collect().toSeq,
      "idempotent snapshot re-delivery must not version anything")

    val snap2 = Seq((1L, "A3", 111L)).toDF("k", "seg", "bal")
    val d2 = ScdType2.merge(d1, snap2, Seq("k"), Seq("seg", "bal"), 2L)
    // key 1 now has three versions: A(0..1), A2(1..2), A3(2..)
    val k1 = d2.filter($"k" === 1L)
      .select("seg", "effective_from", "effective_to", "is_current")
      .as[(String, Long, Option[Long], Boolean)].collect().toSet
    assert(k1 == Set(("A", 0L, Some(1L), false), ("A2", 1L, Some(2L), false),
      ("A3", 2L, None, true)))
    val open = d2.filter($"is_current").groupBy($"k").count()
      .filter($"count" =!= 1L).count()
    assert(open == 0L, "exactly one open row per key")
    // closed rows: A(0..1) and A2(1..2), both on key 1
    assert(d2.filter(!$"is_current").count() == 2L)
  }

  test("attribute comparison is null-safe: null→value and value→null " +
    "both version; null→null does not") {
    val d0 = ScdType2.initial(
      Seq((1L, Option.empty[String]), (2L, Option("x")),
        (3L, Option.empty[String])).toDF("k", "seg"), 0L)
    val snap = Seq((1L, Option("now")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("k", "seg")
    val out = ScdType2.merge(d0, snap, Seq("k"), Seq("seg"), 1L)
    assert(out.filter($"k" === 1L && $"is_current").select("seg")
      .as[Option[String]].head() == Some("now"))
    assert(out.filter($"k" === 2L && $"is_current").select("seg")
      .as[Option[String]].head() == None)
    assert(out.filter($"k" === 3L).count() == 1L,
      "null → null is unchanged, no new version")
    assert(out.count() == 5L) // 3 open + 2 closed
  }
}
