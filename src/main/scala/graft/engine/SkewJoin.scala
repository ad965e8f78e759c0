package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * A shuffle join on a key where a handful of values carry a large
  * fraction of the rows puts those values' entire volume on single
  * tasks. AQE's skew-join splitting handles many cases at runtime;
  * salting is the explicit, planner-independent fix for the worst
  * ones (and the only fix when the skew is invisible to shuffle
  * statistics — a key whose heat only materializes after a filter —
  * or when the skewed side feeds an aggregation AQE cannot split).
  *
  * Shape: the big (skewed) side gets a deterministic salt in
  * [0, saltBuckets); the small side is exploded ×saltBuckets with
  * every salt value; the join key becomes (key, salt). Row
  * multiplication is confined to the small side — the big side is
  * never duplicated — and each formerly-hot key now spreads over
  * saltBuckets tasks. Cost model, stated plainly: the small side
  * shuffles saltBuckets× its size; worth it exactly when the hot
  * key's row count divided by saltBuckets still exceeds the average
  * reducer load — at 100 TB a single-key reducer is the difference
  * between a straggler pinning the stage for hours and an even finish.
  *
  * The default salt is `xxhash64(all big-side columns) mod
  * saltBuckets` — a pure function of the row, so identical logical
  * rows land in identical buckets under any partitioning, replay, or
  * speculative re-execution. (A `rand()`-based salt is only safe
  * while the upstream partitioning never changes: AQE coalescing or a
  * lost-map replay re-draws different salts mid-query — the classic
  * rand-salt bug.) The flip side of determinism: byte-IDENTICAL rows
  * share a bucket, so a big side that is mostly exact duplicates of
  * the hot key (a pre-dedup scrape, or a projection down to the key
  * columns alone) gets no spread from the default — pass `saltOn`
  * with a unique row id (or any high-cardinality column) to restore
  * it. When every row is distinct — the common case — the default
  * spreads a hot key evenly.
  *
  * Semantics: identical to the unsalted join (salt columns are
  * dropped). Only left-preserving join types are accepted — the
  * exploded small side would emit unmatched small rows once PER SALT
  * under right/full outer semantics. CorpusOpsSpec/ScaleFeaturesSpec
  * assert row-level equality against the plain join, including under
  * 90% hot-key skew and null keys.
  */
object SkewJoin {

  private val allowed =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  /** @param saltOn optional expression whose hash spreads the big
    *        side over buckets; pass a unique row id when the big side
    *        carries many byte-identical rows (see object doc). Default:
    *        hash of all big-side columns.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int = 8,
                 joinType: String = "inner",
                 saltOn: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "saltedJoin needs at least one join key")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports left-preserving join types only, got $joinType")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name")
    val saltSrc = saltOn.getOrElse(xxhash64(big.columns.map(col).toSeq: _*))
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(saltSrc), lit(saltBuckets.toLong)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    val cond: Column = (keys.map(k => bigS(k) === smallS(k)) :+
      (bigS("__salt") === smallS("__salt"))).reduce(_ && _)
    val joined = bigS.join(smallS, cond, joinType)
    // drop the salt and the small side's duplicate key columns
    val dropped = keys.foldLeft(joined)((d, k) => d.drop(smallS(k)))
    dropped.drop(bigS("__salt")).drop(smallS("__salt"))
  }

  /** Differential salting: detect the hot keys FIRST, then salt only
    * them — the production refinement of [[saltedJoin]]. Blanket
    * salting multiplies the ENTIRE small side by `saltBuckets`; here
    * only the hot keys' small-side rows explode, and the cold
    * majority takes the plain hash join untouched.
    *
    *   1. one aggregation counts big-side keys (exact here; at corpus
    *      scale pass `sampleFraction` and the threshold scales with
    *      it — heat detection needs magnitudes, not exact counts);
    *   2. keys above `hotThreshold` collect to the driver (bounded:
    *      `maxHotKeys` guards against a threshold that matches half
    *      the key space — that situation wants repartitioning, not
    *      salting);
    *   3. the big side splits on the broadcast hot-key set; hot rows
    *      take the salted join, cold rows the plain join; results
    *      union.
    *
    * Single-key only (the splitting filter is an isin on one column).
    * Semantics ≡ the plain join for the accepted join types —
    * ScaleFeaturesSpec asserts row equality under 90% hot-key skew,
    * no-hot-keys, and all-hot-keys corpora.
    */
  def adaptiveSaltedJoin(big: DataFrame, small: DataFrame, key: String,
                         hotThreshold: Long,
                         saltBuckets: Int = 8,
                         joinType: String = "inner",
                         sampleFraction: Double = 1.0,
                         maxHotKeys: Int = 10000): DataFrame = {
    require(hotThreshold >= 1, "hotThreshold must be positive")
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction in (0, 1], got $sampleFraction")
    // validate BEFORE hot-key detection: the no-hot-keys early return
    // would otherwise run right/full outer through the plain join while
    // the same call throws once the data grows hot keys — whether an
    // unsupported type errors must not depend on the data (and the
    // hot/cold decomposition joins cold rows against the FULL small
    // table, which would duplicate unmatched small rows under
    // right/full semantics)
    require(allowed.contains(joinType.toLowerCase.replace("_", "")),
      s"adaptiveSaltedJoin supports left-preserving join types only, " +
        s"got $joinType")
    val counted =
      (if (sampleFraction < 1.0) big.sample(sampleFraction) else big)
        .groupBy(col(key)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") >=
          math.max(1L, (hotThreshold * sampleFraction).toLong))
        .filter(col(key).isNotNull)
        .select(col(key))
    val hot = counted.limit(maxHotKeys + 1).collect().map(_.get(0))
    require(hot.length <= maxHotKeys,
      s"more than $maxHotKeys hot keys — repartition, don't salt")
    if (hot.isEmpty) return big.join(small, Seq(key), joinType)
    val hotSet = hot.toSeq
    val bigHot = big.filter(col(key).isInCollection(hotSet))
    val bigCold = big.filter(!col(key).isInCollection(hotSet) ||
      col(key).isNull)
    val smallHot = small.filter(col(key).isInCollection(hotSet))
    saltedJoin(bigHot, smallHot, Seq(key), saltBuckets, joinType)
      .unionByName(bigCold.join(small, Seq(key), joinType))
  }
}
