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

  /** Injective identifier-safe encoding of a path: alphanumerics pass
    * through, every other character becomes `_xx` (hex). Distinct
    * paths can NEVER encode to the same key — a lossy `[^A-Za-z0-9]→_`
    * sanitize would let `/data/b-c` and `/data/b_c` collide and serve
    * each other's artifacts.
    */
  private def encode(path: String): String =
    path.flatMap {
      case c if c.isLetterOrDigit && c < 128 => c.toString
      case c if c < 256 => f"_${c.toInt}%02x"
      case c => f"_u${c.toInt}%04x" // 'u' is not a hex digit → unambiguous
    }

  /** Human-readable content key for `sourcePath`: the injectively
    * encoded full path plus file count, total bytes, and newest mtime.
    * Distinct paths can never share a key, and regenerating the source
    * changes it — safe to embed in metastore table names that must
    * track their input (a stale-named table is simply never read
    * again).
    */
  def contentKey(spark: SparkSession, sourcePath: String): String = {
    val (m, n, b) = stat(spark, sourcePath)
    encode(sourcePath) + s"_${n}_${b}_$m"
  }

  /** Read a whole small marker file, looping to EOF (a single read may
    * legally return short).
    */
  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
                         p: Path): Option[String] = {
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      Some(out.toString("UTF-8"))
    } finally in.close()
  }

  /** The build-once protocol at an EXPLICIT artifact directory
    * (shared core of [[ensure]] and
    * [[graft.operators.Ivf.ensureIndex]]): rebuild iff the marker is
    * missing (crash mid-build), older than the newest source file
    * (regenerated source), or carrying a different `fingerprint`
    * (changed build parameters — an index built with other settings at
    * the same path must never be served). The artifact dir is deleted
    * before rebuild; the marker (content = fingerprint) lands only
    * after `build` returns.
    */
  def ensureAt(spark: SparkSession, artifactDir: String, sourcePath: String,
               fingerprint: String = "",
               markerName: String = "_GRAFT_READY")
              (build: String => Unit): Unit = {
    val (srcModified, _, _) = stat(spark, sourcePath)
    val marker = new Path(s"$artifactDir/$markerName")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = fs.exists(marker) &&
      fs.getFileStatus(marker).getModificationTime >= srcModified &&
      readMarker(fs, marker).contains(fingerprint)
    if (!fresh) {
      fs.delete(new Path(artifactDir), true)
      build(artifactDir)
      val o = fs.create(marker, true)
      o.write(fingerprint.getBytes("UTF-8")); o.close()
    }
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
    val dir = s"$root/graft-scratch/${tag}_" + encode(sourcePath)
    ensureAt(spark, dir, sourcePath)(build)
    dir
  }
}
