package graft

import graft.operators.Intervals

/** Ground truth for the interval-coalescing operator: hand-built span
  * sets covering every merge shape (overlap, touch, containment, gap,
  * ties), the coverage fold, and a brute-force reference over a
  * randomized corpus. The `q_ev_coalesce`/`q_ev_coverage` gates pin the
  * identical windows against DuckDB at corpus scale.
  */
class IntervalsSpec extends SparkSpec {

  private def run(spans: Seq[(Long, Long, Long)]): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Intervals.coalesceSpans(spans.toDF("k", "s", "e"), "k", "s", "e")
      .select("k", "island_start", "island_end", "n_spans")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("merge shapes: overlap, touch, containment, gap") {
    // key 1: [0,10] overlaps [5,20]; [20,30] touches (closed: merges);
    //        [40,50] gapped
    // key 2: [0,100] contains [10,20] and [30,40]
    assert(run(Seq((1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 30L),
      (1L, 40L, 50L), (2L, 0L, 100L), (2L, 10L, 20L), (2L, 30L, 40L))) ==
      Set((1L, 0L, 30L, 3L), (1L, 40L, 50L, 1L), (2L, 0L, 100L, 3L)))
  }

  test("start ties merge regardless of internal order") {
    assert(run(Seq((1L, 0L, 5L), (1L, 0L, 3L), (1L, 0L, 9L))) ==
      Set((1L, 0L, 9L, 3L)))
  }

  test("single span and adjacent-but-gapped-by-one stay separate") {
    assert(run(Seq((1L, 3L, 7L))) == Set((1L, 3L, 7L, 1L)))
    // [0,10] and [11,20]: start 11 > end 10 → strict > opens an island
    assert(run(Seq((1L, 0L, 10L), (1L, 11L, 20L))) ==
      Set((1L, 0L, 10L, 1L), (1L, 11L, 20L, 1L)))
  }

  test("coverage counts overlaps once") {
    import spark.implicits._
    val df = Seq((1L, 0L, 10L), (1L, 5L, 20L), (1L, 40L, 50L))
      .toDF("k", "s", "e")
    val got = Intervals.coverage(df, "k", "s", "e")
      .select("k", "covered", "n_islands", "n_spans")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 30L, 2L, 3L)))
  }

  test("randomized corpus matches a serial sweep reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val spans = (1 to 400).map { _ =>
      val k = rnd.nextInt(5).toLong
      val s = rnd.nextInt(1000).toLong
      (k, s, s + 1 + rnd.nextInt(40))
    }
    // serial reference: per key, sort and sweep
    val want = spans.groupBy(_._1).flatMap { case (k, ss) =>
      val sorted = ss.map(t => (t._2, t._3)).sortBy(identity)
      val islands = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long)]
      for ((s, e) <- sorted) {
        if (islands.nonEmpty && s <= islands.last._2) {
          val (a, b, n) = islands.last
          islands(islands.size - 1) = (a, math.max(b, e), n + 1)
        } else islands += ((s, e, 1L))
      }
      islands.map { case (a, b, n) => (k, a, b, n) }
    }.toSet
    assert(run(spans) == want)
  }
}
