package graft.analytics

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Once-per-application staged state under the JVM tmpdir — the
  * storedDedupEdges discipline, in ONE place: a pipeline derives a
  * serving-state table once per run and every consumer reads the store,
  * so benches measure the steady-state body, not re-staging.
  *
  * Completion is a `_graft_done` marker written AFTER `build` returns:
  * a crashed build (which can leave partial child dirs — e.g. the first
  * of two parquet writes finished) is detected on next use, its debris
  * deleted, and the build re-run — the marker-decoupled `fs.exists(dir)`
  * checks this replaces could wedge an app on half-built state forever.
  * One JVM-wide lock serializes builds so parallel suites sharing a
  * session cannot race a half-visible store.
  */
object AppState {

  private val lock = new Object

  def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9.]", "_")

  /** Returns the state dir after ensuring `build(dir)` completed exactly
    * once in this application (keyed by `name` + applicationId).
    */
  def ensure(s: SparkSession, name: String)(build: String => Unit)
      : String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/${name}_" +
      s.sparkContext.applicationId
    val p = new Path(dir)
    val marker = new Path(p, "_graft_done")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    lock.synchronized {
      if (!fs.exists(marker)) {
        // no marker + existing dir = a crashed build's partial debris
        if (fs.exists(p)) fs.delete(p, true)
        build(dir)
        fs.create(marker, false).close()
      }
    }
    dir
  }
}
