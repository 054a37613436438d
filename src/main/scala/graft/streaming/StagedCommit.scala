package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The staged, batch-stamped, marker-committed publish protocol shared
  * by the streaming ingest transactions ([[DocStream]] documents,
  * [[VecStream]] vectors). Each micro-batch appends to TWO tables (a
  * payload table + a digest index); exactly-once across both comes
  * from:
  *
  *  1. replay guard — if this batchId's commit marker exists, the
  *     batch fully committed and the replay is a no-op;
  *  2. undo — delete any live files stamped with this batchId (a
  *     crashed attempt's partial publish) before reading the index;
  *  3. stage — write outputs under dot-prefixed staging dirs, hidden
  *     from Spark's file index so readers never see in-flight data;
  *  4. publish — rename staged files into the live dirs under
  *     batch-stamped names (per-file renames are atomic; whole-publish
  *     atomicity is the marker's job);
  *  5. commit — create the marker LAST.
  *
  * A crash anywhere before step 5 leaves the marker absent, so the
  * checkpointed replay wipes the stamped files and re-runs — the
  * tables converge to exactly the clean-run state, never a half batch.
  */
private[streaming] object StagedCommit {

  def commitMarker(indexDir: String, batchId: Long): Path =
    new Path(s"$indexDir/_commits/$batchId")

  /** Crash-drill seam: invoked at the entry of every publish and
    * commit step with the step's target dir. Identity (no-op) in
    * production; the crash-drill specs install a throwing hook to
    * simulate a JVM death at an EXACT point inside the two-table
    * transaction — between table A's and table B's publish, or after
    * both publishes but before the marker — and then prove the
    * checkpointed replay converges to the clean-run state. A function
    * field rather than a config flag so the drill composes with any
    * stream and any step without production branching.
    */
  @volatile private[streaming] var failpoint: (String, Long) => Unit = (_, _) => ()

  /** Live data files carry their batchId as a name prefix so a replay
    * can identify (and remove) exactly its own partial publish.
    */
  def deleteStamped(fs: FileSystem, dir: String, batchId: Long): Unit = {
    val d = new Path(dir)
    if (fs.exists(d))
      fs.listStatus(d)
        .filter(_.getPath.getName.startsWith(s"batch-$batchId-"))
        .foreach(st => fs.delete(st.getPath, false))
  }

  /** Move staged part files into the live dir under batch-stamped
    * names, then drop the staging dir.
    */
  def publishStaged(
      fs: FileSystem, stageDir: String, liveDir: String, batchId: Long): Unit = {
    failpoint(s"publish:$liveDir", batchId)
    val stage = new Path(stageDir)
    fs.listStatus(stage)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      .foreach { st =>
        val dst = new Path(liveDir, s"batch-$batchId-${st.getPath.getName}")
        if (!fs.rename(st.getPath, dst))
          throw new java.io.IOException(s"publish rename failed: ${st.getPath} -> $dst")
      }
    fs.delete(stage, true)
  }

  /** Step 5 — create the commit marker LAST (marker present ⇔ both
    * tables hold the batch). Routed through here so the crash drill
    * can kill the transaction after both publishes but before the
    * commit point.
    */
  def commit(fs: FileSystem, indexDir: String, batchId: Long): Unit = {
    failpoint(s"commit:$indexDir", batchId)
    fs.mkdirs(commitMarker(indexDir, batchId))
    ()
  }

  /** The digest index, or an empty frame before the first batch lands.
    * Digests are distinct-ed on read: a replayed/torn append may hold
    * duplicates, which must not multiply anti-join probes downstream.
    * Only visible (non-hidden) files count — `_commits` markers and
    * `.staging-*` dirs are bookkeeping, not data.
    */
  def readDigestIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    if (hasData)
      spark.read.parquet(indexDir).select("h").distinct()
    else {
      import spark.implicits._
      Seq.empty[String].toDF("h")
    }
  }
}
