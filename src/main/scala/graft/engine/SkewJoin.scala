package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * A shuffle join on a key where a handful of values carry a large
  * fraction of the rows puts those values' entire volume on single
  * tasks. AQE's skew-join splitting handles many cases at runtime;
  * salting is the explicit, planner-independent fix for the worst
  * ones (and the only fix when the skewed side feeds an aggregation
  * that AQE cannot split).
  *
  * Shape: the big (skewed) side gets a random salt in [0, n); the
  * small side is exploded ×n with every salt value; the join key
  * becomes (key, salt). Row multiplication is confined to the small
  * side — the big side is never duplicated — and each formerly-hot
  * key now spreads over n tasks.
  *
  * Semantics: identical to the unsalted inner/left join (salt columns
  * are dropped); SkewJoinSpec asserts row-level equality against the
  * plain join.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    // right/full outer would emit unmatched small-side rows once PER
    // SALT (the small side is exploded ×saltBuckets) — refuse them
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val bigS = big.withColumn("__salt",
      (rand(42L) * saltBuckets).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    val cond: Column = (keys.map(k => bigS(k) === smallS(k)) :+
      (bigS("__salt") === smallS("__salt"))).reduce(_ && _)
    val joined = bigS.join(smallS, cond, joinType)
    // drop the salt and the small side's duplicate key columns
    val dropped = keys.foldLeft(joined)((d, k) => d.drop(smallS(k)))
    dropped.drop(bigS("__salt")).drop(smallS("__salt"))
  }
}
