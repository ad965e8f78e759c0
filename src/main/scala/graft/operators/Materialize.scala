package graft.operators

import org.apache.spark.sql.DataFrame

/** Pin a result that is small relative to its inputs (a near-dup pair
  * list, a candidate id table) through a scratch parquet directory: one
  * write action now, then a plain scan. The returned frame holds no
  * reference to the producing plan, so an enclosing persist bracket can
  * unpersist its intermediates before returning — the operator leaves
  * ZERO residue in the session's cache manager (CacheHygieneSpec pins
  * `getPersistentRDDs.isEmpty` after every driver query).
  *
  * This is also what a production pipeline does at 100 TB: the pair
  * list of a dedup pass is persisted as a table for the downstream
  * delete/keep join, never recomputed from the corpus.
  */
private[graft] object Materialize {

  def viaScratch(df: DataFrame, prefix: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    dir.toFile.deleteOnExit()
    val path = dir.resolve("out").toString
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
