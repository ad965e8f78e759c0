package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Session-scratch artifacts derived from a source path, built once
  * and reused until the SOURCE changes — the shape every
  * build-once-measure-many gate needs (bucketed layouts, sorted
  * layouts, staged stream inputs, on-disk indexes).
  *
  * Two prior ad-hoc versions of this had real hazards (round-5
  * ADVICE): keying by `dir.hashCode` (32-bit — a cross-dir collision
  * silently reads the wrong artifact) and guarding by bare `_SUCCESS`
  * (a regenerated source at the same path reuses the stale artifact
  * forever). Here the key embeds the sanitized FULL path (collisions
  * impossible by construction) and freshness compares the artifact
  * marker's mtime against the newest source file, like
  * [[graft.operators.Ivf.ensureIndex]].
  */
object Scratch {

  /** (newest mtime, direct-child count, total bytes) of a file or
    * directory — driver-side FS metadata, one listing.
    */
  private def stat(spark: SparkSession, p: String): (Long, Long, Long) = {
    val path = new Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(path)
    if (st.isDirectory) {
      val children = fs.listStatus(path)
      (children.map(_.getModificationTime)
        .foldLeft(st.getModificationTime)(math.max),
        children.length.toLong, children.map(_.getLen).sum)
    } else (st.getModificationTime, 1L, st.getLen)
  }

  /** Human-readable content key for `sourcePath`: the sanitized full
    * path plus file count, total bytes, and newest mtime. Distinct
    * paths can never share a key, and regenerating the source changes
    * it — safe to embed in metastore table names that must track their
    * input (a stale-named table is simply never read again).
    */
  def contentKey(spark: SparkSession, sourcePath: String): String = {
    val (m, n, b) = stat(spark, sourcePath)
    sourcePath.replaceAll("[^A-Za-z0-9]", "_") + s"_${n}_${b}_$m"
  }

  /** Return a scratch directory for (`tag`, `sourcePath`), running
    * `build` first iff the artifact is missing, half-built (no marker:
    * a crash mid-build rebuilds), or older than the newest source
    * file. `build` writes into the directory it is handed; the
    * `_GRAFT_READY` marker lands after it returns.
    */
  def ensure(spark: SparkSession, tag: String, sourcePath: String)
            (build: String => Unit): String = {
    val root = spark.conf.get("graft.scratch.dir",
      System.getProperty("java.io.tmpdir"))
    val dir = s"$root/graft-scratch/${tag}_" +
      sourcePath.replaceAll("[^A-Za-z0-9.]", "_")
    val (srcModified, _, _) = stat(spark, sourcePath)
    val marker = new Path(s"$dir/_GRAFT_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = fs.exists(marker) &&
      fs.getFileStatus(marker).getModificationTime >= srcModified
    if (!fresh) {
      fs.delete(new Path(dir), true)
      build(dir)
      fs.create(marker, true).close()
    }
    dir
  }
}
