package graft.entry

import org.apache.spark.sql.SparkSession

/** Session-scoped stream-stage registry for the streaming twins.
  *
  * Every file-source streaming gate stages a deterministic slice of the
  * test tables under /tmp before starting its query — and re-staged it on
  * EVERY run: twice per gate when the bench retries, once more for each
  * verify pass in the same JVM. The staged bytes are a pure function of
  * (scale factor, fixture name), so the writes after the first are pure
  * waste — measured as roughly half a second per streaming gate at sf0.1.
  * This registry builds each fixture AT MOST ONCE per Spark application
  * and hands back the path on every later call.
  *
  * Path layout (same contract the q_hll_stream_twin staging established):
  * `/tmp/graft_stream_stage/<sfTag>_<applicationId>/<name>` — the
  * applicationId keeps two CONCURRENT runs at the same scale factor from
  * racing on a shared directory, and an age-gated sweep (>1 h untouched)
  * clears finished runs' leftovers without touching a live concurrent
  * run's stage.
  *
  * A cache hit REVALIDATES: another session's sweep (or an OS tmp cleaner)
  * can delete a long-lived session's fixture out from under the memoized
  * path, so `dir` checks the directory still exists before handing it
  * back and rebuilds if not; each reuse also touches the run directory's
  * mtime so a concurrent sweep's age gate keeps seeing this run as live.
  */
object StageOnce {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def runDir(s: SparkSession, dataDir: String): String =
    s"/tmp/graft_stream_stage/${Sql.sfTag(dataDir)}_" +
      s.sparkContext.applicationId

  /** Per-run SCRATCH path under this application's swept stage directory —
    * NOT memoized and NOT built here: for gate-owned mutable state (e.g.
    * the CDC fold's ping-pong parquet state) that must be rebuilt fresh on
    * every run but should still live at an appId-keyed, sweep-covered
    * location instead of a shared path two concurrent runs would race on.
    * The caller owns deletion/creation. */
  def scratch(s: SparkSession, dataDir: String, name: String): String =
    s"${runDir(s, dataDir)}/$name"

  /** The staged directory for (`dataDir`'s sf tag, `name`), building it
    * with `build(path)` only on the first call in this application. The
    * path passed to `build` is freshly deleted (a previous application
    * with the same id is impossible, but a crashed build's partial output
    * is not). */
  def dir(s: SparkSession, dataDir: String, name: String)
      (build: String => Unit): String = {
    val tag = Sql.sfTag(dataDir)
    val path = s"${runDir(s, dataDir)}/$name"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sessionState.newHadoopConf())
    val cached = built.get(path)
    if (cached != null) {
      val hp = new org.apache.hadoop.fs.Path(cached)
      if (fs.exists(hp)) {
        // keep the sweep's age gate seeing this run as live, and self-heal
        // if an external cleaner deleted the fixture since we built it
        try fs.setTimes(hp.getParent, System.currentTimeMillis(), -1)
        catch { case _: java.io.IOException => () }
        return cached
      }
      built.remove(path, cached)
    }
    built.computeIfAbsent(path, _ => {
      val hp = new org.apache.hadoop.fs.Path(path)
      if (fs.exists(hp)) fs.delete(hp, true)
      // sweep stale same-sf siblings from FINISHED runs (each run only
      // ever deletes its own tag otherwise, so /tmp would accumulate one
      // dir per historical run). Age-gated so a genuinely concurrent
      // same-sf run — the race the run tag exists to prevent — keeps its
      // live stage. The bare `<tag>` name covers the pre-StageOnce legacy
      // layout (untagged shared dirs), orphaned since the r11 migration.
      val parent = hp.getParent.getParent
      if (fs.exists(parent)) {
        val cutoff = System.currentTimeMillis() - 3600L * 1000
        fs.listStatus(parent).foreach { st =>
          val n = st.getPath.getName
          if ((n == tag || n.startsWith(s"${tag}_")) &&
              n != hp.getParent.getName &&
              st.getModificationTime < cutoff)
            fs.delete(st.getPath, true)
        }
      }
      build(path)
      path
    })
  }
}
