package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Build-once, content-addressed cache for persisted index artifacts (the
  * q143 saved-IVF pattern, shared by every saved-index query): the cache
  * key is an md5 fingerprint of the SOURCE parquet's file listing
  * (name + length + mtime), not just the path — regenerated data at the
  * same scale dir gets a fresh index instead of a silently stale one, and
  * stale fingerprints of the same source are garbage-collected.
  *
  * Builds are crash-safe: the index is built under a unique temp dir and
  * published by ONE atomic rename; completeness is gated on `successRel`
  * (a writer _SUCCESS marker) existing inside the published dir, so a
  * half-written index (crashed build) rebuilds rather than serving partial
  * data. Two concurrent first runs each build their own temp dir and the
  * rename loser just discards — no torn shared dir.
  */
object IndexCache {

  /** Returns the ready-to-read index dir, building it first if the cached
    * copy is absent or incomplete. `build` receives the TEMP dir to write
    * into; the publish rename is handled here. */
  def cachedDir(s: SparkSession, srcPath: String, tag: String,
      successRel: String)(build: String => Unit): String = {
    val hconf = s.sparkContext.hadoopConfiguration
    val src = new Path(srcPath)
    val srcFs = src.getFileSystem(hconf)
    val fp = {
      val parts = srcFs.listStatus(src).filter(_.isFile)
        .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .sorted.mkString("|")
      java.security.MessageDigest.getInstance("MD5")
        .digest(parts.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
    }
    val idxBase = sys.props("java.io.tmpdir") + "/" + tag
    val idxDir = s"${idxBase}_$fp"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(idxDir), hconf)
    if (!fs.exists(new Path(s"$idxDir/$successRel"))) {
      val tmpDir =
        s"${idxDir}__build_${java.util.UUID.randomUUID().toString.take(8)}"
      // a failed build must not leave its temp dir behind: the stale-index
      // GC below deliberately skips __build_ names (a CONCURRENT build's
      // live temp dir must survive), so orphans would otherwise accumulate
      try build(tmpDir)
      catch { case t: Throwable =>
        fs.delete(new Path(tmpDir), true); throw t
      }
      if (!fs.rename(new Path(tmpDir), new Path(idxDir)))
        fs.delete(new Path(tmpDir), true) // lost the race: winner's index is complete
      // drop stale indexes of the same source (older fingerprints)
      val parent = new Path(idxDir).getParent
      val base = new Path(idxBase).getName
      fs.globStatus(new Path(parent, base + "_*"))
        .filter(st => st.getPath.getName != s"${base}_$fp" &&
          !st.getPath.getName.contains("__build_"))
        .foreach(st => fs.delete(st.getPath, true))
    }
    idxDir
  }

  /** A scale-dir-derived cache tag: `prefix` + the dir path sanitized to
    * `[A-Za-z0-9_]` so different scale dirs never share a cache entry —
    * plus an md5 of the BUILD CONTRACT. The content fingerprint in
    * [[cachedDir]] only watches the SOURCE data; every parameter that
    * changes the ARTIFACT's content given the same source (a k-formula, a
    * merge count, a vocab size, a train-side filter) must ride in
    * `contract`, or a changed build recipe silently serves the stale
    * artifact. Queries sharing one artifact on purpose (q288/q296's gram
    * index) share one contract constant so the coupling is visible. */
  def tagFor(prefix: String, sfDir: String, contract: String*): String = {
    val base = prefix + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    if (contract.isEmpty) base
    else {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(contract.mkString("|").getBytes("UTF-8"))
        .take(6).map(b => f"$b%02x").mkString
      s"${base}_c$h"
    }
  }
}
