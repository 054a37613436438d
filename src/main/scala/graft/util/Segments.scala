package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Segment-append maintenance for the engine-owned at-rest fact
  * layouts (the sorted logs and the bucketed co-location tables) —
  * the lifecycle primitive that makes a corpus append O(batch)
  * instead of a 100 TB layout rewrite.
  *
  * The one-shot builders (`Relational.lineitemSdLog`,
  * `Relational.ordersByYear`, `Events.eventsUsLog`, the
  * `Snapshots.bucketedTable` pairs) produce a layout whose value is
  * GEOMETRY: tight disjoint min/max per file (row-group pruning), a
  * partition directory per year (directory pruning), or a pinned
  * hash-bucket assignment (co-located joins). None of that geometry is
  * global-order-dependent, which is exactly why appends can be
  * segments:
  *
  *  - '''Sorted logs''' (ship-date/ts/orders-date clustering): parquet
  *    row-group statistics are per file. A batch clustered by the SAME
  *    recipe and appended as new files gives every new file its own
  *    tight disjoint range over the batch's span; a boundary scan then
  *    prunes old segments by their stats and new segments by theirs.
  *    What is lost vs a full rewrite is only inter-segment disjointness
  *    (two segments may overlap a date range), which widens the scan by
  *    at most the overlapping segments' selected groups — never a
  *    rescan of history. SegmentAppendSpec measures this: the boundary
  *    scan over a 2-segment log emits batch-sized row counts.
  *
  *  - '''Bucketed tables''': the bucket function (Murmur3 hash mod N,
  *    both pinned constants of the layout family) assigns every future
  *    row to the same bucket id forever, so a batch written as new
  *    bucket FILES extends each bucket without touching its history.
  *    Spark groups all files of a bucket into one scan partition, so
  *    co-located joins/aggregations still plan with NO hash exchange.
  *    The one property multi-file buckets give up is the scan's
  *    REPORTED sort order (per-file sortBy survives, the concatenation
  *    is not globally sorted), so a co-located sort-merge join pays a
  *    local per-partition sort — bounded by the bucket's rows, no wire
  *    cost. SegmentAppendSpec pins both: zero `Exchange
  *    hashpartitioning` with broadcasts disabled, and row fidelity.
  *
  * '''Compaction policy''' (the file-count bound): every append adds
  * ≤ N files (N = the layout's pinned partition/bucket count), so K
  * appends put K files in a bucket / K·N in the log, and scan task
  * setup plus footer reads grow with file count even when pruning is
  * perfect. The policy is the standard LSM bound applied at the layout
  * grain: when a bucket (or a sorted log's date range / a year
  * partition) accumulates more than `CompactAfterSegments` segment
  * files, rewrite THAT grain — one bucket, one partition directory —
  * by reading its files and writing one replacement segment with the
  * same recipe; never the whole table. Rewriting a grain is the same
  * code as building it (the recipe functions are shared), so
  * compaction needs no third write path. The sandbox corpus never
  * reaches the bound; the constant documents the production trigger.
  */
object Segments {

  /** Segment files per grain (bucket / partition / log range) above
    * which that grain should be compacted by a single-grain rewrite.
    * 16 bounds footer+task overhead at ~16× the ideal file count —
    * small enough that scan setup stays O(ideal), large enough that
    * compaction amortizes over many appends (each compaction halves
    * write amplification vs compacting every tick).
    */
  val CompactAfterSegments = 16

  /** Append one clustered segment to a sorted-log layout root (creates
    * the root on first call — the one-shot build IS the first
    * segment). `segment` must already carry the layout's clustering
    * (the caller applies its recipe function: range-partitioned and
    * sorted within partitions on the boundary column), so every file
    * this writes has tight disjoint min/max stats over the batch's
    * span. `partitionDirs` adds directory-level partitioning (the
    * orders-by-year layout) — partition directories are SHARED between
    * segments: a batch's rows land as new files inside the existing
    * year directories, so directory pruning sees one tree.
    */
  def appendSorted(segment: DataFrame, root: String,
      partitionDirs: Seq[String] = Nil): Unit = {
    val w = segment.write.mode("append")
    (if (partitionDirs.nonEmpty) w.partitionBy(partitionDirs: _*) else w)
      .parquet(root)
  }

  /** Append one segment of new bucket files to a bucketed catalog
    * table (creates the table on first call). The pre-write
    * repartition on the bucket key uses the SAME hash Spark's bucketBy
    * applies, so each task holds exactly one bucket's rows and the
    * segment adds ONE file per non-empty bucket. Append mode validates
    * the bucket spec against the existing table — a mismatched count
    * or key fails loudly instead of silently breaking co-location.
    */
  def appendBucketed(segment: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    segment.repartition(buckets, col(key))
      .write.mode("append")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Compact ONE date-range grain of a segment-appended sorted log:
    * select the data files whose footer min/max statistics for
    * `boundCol` lie FULLY inside [loIncl, hiExcl) — K appends leave up
    * to K files per range — globally sort their rows on the boundary
    * column, and replace them with a single file whose stats span the
    * grain tightly. Straddling files (range crossing a grain edge) and
    * files holding NULL boundary values are left alone: compacting
    * them would widen some grain's stats, and the null rows live in
    * the log's leading files by the recipe's nulls-first sort. Like
    * [[compactBucket]], a single-writer ingest-side operation.
    */
  def compactSortedRange(spark: org.apache.spark.sql.SparkSession, root: String,
      boundCol: String, loIncl: Long, hiExcl: Long): Unit = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val conf = spark.sessionState.newHadoopConf()
    val fs = rootPath.getFileSystem(conf)
    val selected = fs.listStatus(rootPath).filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".") &&
        fileRange(st.getPath, boundCol, conf).exists { case (mn, mx) =>
          mn >= loIncl && mx < hiExcl
        }
    }
    if (selected.length <= 1) return // grain already compact
    val merged = spark.read
      .parquet(selected.map(_.getPath.toString).toSeq: _*)
      .repartitionByRange(1, col(boundCol))
      .sortWithinPartitions(boundCol)
    val tmp = new org.apache.hadoop.fs.Path(rootPath, s".compact-$loIncl")
    merged.write.mode("overwrite").parquet(tmp.toString)
    val parts = fs.listStatus(tmp).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
    selected.foreach(st => fs.delete(st.getPath, false))
    parts.foreach { p =>
      val dst = new org.apache.hadoop.fs.Path(rootPath, s"compact-$loIncl-${p.getName}")
      if (!fs.rename(p, dst))
        throw new java.io.IOException(s"compaction rename failed: $p -> $dst")
    }
    fs.delete(tmp, true)
  }

  /** Footer min/max of a BIGINT column in one parquet file — None when
    * any row group lacks usable stats or holds nulls (the conservative
    * answer: such a file is never selected for compaction). One footer
    * read, no data pages.
    */
  private def fileRange(file: org.apache.hadoop.fs.Path, column: String,
      conf: org.apache.hadoop.conf.Configuration): Option[(Long, Long)] = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      import scala.jdk.CollectionConverters._
      val perBlock = reader.getFooter.getBlocks.asScala.map { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == column)
          .flatMap(c => Option(c.getStatistics))
          .filter(s => !s.isEmpty && s.hasNonNullValue && s.getNumNulls == 0)
          .flatMap(s => (s.genericGetMin, s.genericGetMax) match {
            case (mn: java.lang.Long, mx: java.lang.Long) => Some((mn.toLong, mx.toLong))
            case _ => None
          })
      }
      if (perBlock.isEmpty || perBlock.exists(_.isEmpty)) None
      else Some((perBlock.flatten.map(_._1).min, perBlock.flatten.map(_._2).max))
    } finally reader.close()
  }

  /** Spark maps a data file to its bucket by NAME (the trailing
    * `_NNNNN` id before the extensions) — the contract both the append
    * path (bucketBy names its files) and [[compactBucket]]'s
    * replacement file rely on.
    */
  private val BucketFileName = """.*_(\d+)(?:\..*)?$""".r
  private def bucketIdOf(name: String): Option[Int] = name match {
    case BucketFileName(id) => Some(id.toInt)
    case _ => None
  }

  /** Compact ONE bucket of a segment-appended bucketed table back to a
    * single file — the per-grain rewrite the
    * [[CompactAfterSegments]] policy prescribes: read exactly that
    * bucket's segment files, sort by the bucket key (restoring the
    * per-file sort the layout advertises), write one replacement file
    * carrying the bucket's id suffix, and swap. Touches nothing
    * outside the grain: other buckets' files are never read, never
    * listed into the rewrite, never invalidated. Like the append path
    * itself, compaction is an ingest-pipeline operation — bare parquet
    * dirs have no snapshot isolation, so it must not run concurrently
    * with readers of the same layout instance (the Snapshots
    * fingerprint keying re-keys a mutated layout for new sessions).
    */
  def compactBucket(spark: org.apache.spark.sql.SparkSession, table: String,
      key: String, bucketId: Int): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val olds = fs.listStatus(loc).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".") &&
        bucketIdOf(n).contains(bucketId)
    }
    if (olds.length <= 1) return // grain already compact
    val merged = spark.read.parquet(olds.map(_.getPath.toString).toSeq: _*).sort(key)
    val tmp = new org.apache.hadoop.fs.Path(loc, s".compact-$bucketId")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(p => p.getName.startsWith("part-"))
      .getOrElse(throw new java.io.IOException(s"compaction wrote no part file under $tmp"))
    // The replacement keeps a name whose trailing _NNNNN parses to this
    // bucket (prefixing an old file's name preserves the suffix parse).
    val dst = new org.apache.hadoop.fs.Path(loc, s"compact-${olds.head.getPath.getName}")
    olds.foreach(st => fs.delete(st.getPath, false))
    if (!fs.rename(part, dst))
      throw new java.io.IOException(s"compaction rename failed: $part -> $dst")
    fs.delete(tmp, true)
    // New files on disk → stale cached file listing otherwise.
    spark.catalog.refreshTable(table)
  }
}
