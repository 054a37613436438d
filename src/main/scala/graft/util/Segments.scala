package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit, when}

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
      partitionDirs: Seq[String] = Nil,
      boundCol: Option[String] = None): Unit = {
    // An adopted root upgrades transparently: same recipe, same files,
    // but visibility moves to the manifest's atomic commit (with the
    // new files' boundary stats recorded when the recipe names one).
    if (ManifestLog.isManifested(segment.sparkSession, root)) {
      ManifestLog.appendSorted(segment, root, partitionDirs, boundCol); return
    }
    // Same parent guard as the range ops: a bare append into a
    // partition directory OF a manifested log would write files no
    // manifest generation lists — invisible to every reader and
    // deleted as orphans by the next vacuum. Loud, not lost.
    val parent = new org.apache.hadoop.fs.Path(root).getParent
    if (parent != null &&
        ManifestLog.isManifested(segment.sparkSession, parent.toString))
      throw new IllegalStateException(
        s"$root is a partition directory of the manifested log $parent — " +
          "a bare append here is invisible to the manifest and vacuumed " +
          "as orphans; append at the log root with partitionDirs instead")
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
      buckets: Int): Unit = {
    // Heal any torn compaction swap BEFORE adding files: a file
    // appended into a crashed bucket's recovery window would be
    // superseded when that bucket's staged content is finally
    // installed (see [[swapStaged]]'s single-writer contract).
    val spark = segment.sparkSession
    if (spark.catalog.tableExists(table)) {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      val loc = new org.apache.hadoop.fs.Path(meta.location)
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (recoverPendingBuckets(fs, loc)) spark.catalog.refreshTable(table)
    }
    segment.repartition(buckets, col(key))
      .write.mode("append")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

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
    if (ManifestLog.isManifested(spark, root)) {
      ManifestLog.compactRange(spark, root, "", boundCol, loIncl, hiExcl); return
    }
    guardNotInsideManifestedLog(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val conf = spark.sessionState.newHadoopConf()
    val fs = rootPath.getFileSystem(conf)
    def grain(): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(rootPath).toSeq.filter { st =>
        val n = st.getPath.getName
        st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".") &&
          fileRange(st.getPath, boundCol, conf).exists { case (mn, mx) =>
            mn >= loIncl && mx < hiExcl
          }
      }.map(_.getPath)
    // The staged name carries the FULL range: a crashed transaction is
    // only ever replayed against its own grain — a later call for a
    // different range that happens to share loIncl must not install
    // this range's staged content over its wider/narrower file set.
    val tmp = new org.apache.hadoop.fs.Path(rootPath, s".compact-$loIncl-$hiExcl")
    def dst(partName: String) =
      new org.apache.hadoop.fs.Path(rootPath, s"compact-$loIncl-$hiExcl-$partName")
    recoverPendingRanges(fs, rootPath, boundCol, conf)
    val selected = grain()
    if (selected.length <= 1) return // grain already compact
    spark.read
      .parquet(selected.map(_.toString): _*)
      .repartitionByRange(1, col(boundCol))
      .sortWithinPartitions(boundCol)
      .write.mode("overwrite").parquet(tmp.toString)
    swapStaged(fs, tmp, () => selected, dst)
  }

  /** The self-driving end of the [[CompactAfterSegments]] policy: ONE
    * maintenance-tick call that finds every over-fragmented grain and
    * compacts it, instead of leaving grain selection to the operator.
    * Grains are DERIVED from the live files' footer ranges: files
    * whose [min,max] intervals overlap form a connected component
    * (appends over the same span always land in one component), and a
    * component holding more than `maxFiles` files is compacted over
    * its exact span. Components of ≤ maxFiles files — including every
    * already-compacted history grain — are untouched, so a tick over a
    * year of history costs footer reads plus only the fragmented
    * grains' rewrites. Files without trustworthy stats (or with null
    * boundary values) belong to no component and are never touched.
    *
    * Manifest-aware: on an adopted root the tick reads the CURRENT
    * manifest (per partition directory) and commits through
    * [[ManifestLog.compactRange]]; on a bare root it lists the
    * directory and swaps through the staged protocol. Returns the
    * compacted grains as (relDir, lo, hiExcl) for the caller's ledger.
    */
  def maintainSorted(spark: org.apache.spark.sql.SparkSession, root: String,
      boundCol: String,
      maxFiles: Int = CompactAfterSegments): Seq[(String, Long, Long)] = {
    require(maxFiles >= 1, "maxFiles must admit at least one file per grain")
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    val manifested = ManifestLog.isManifested(spark, root)
    // (relDir, recorded-or-footer range). Manifest entries carrying
    // stats for the bound column classify WITHOUT a footer read — at
    // 100k files the tick's discovery pass is then a manifest parse.
    val byDir: Map[String, Seq[Option[(Long, Long)]]] =
      if (manifested)
        ManifestLog.currentEntries(spark, root)
          .map { e =>
            val relDir = e.path.lastIndexOf('/') match {
              case -1 => ""
              case i => e.path.take(i)
            }
            val range = e.statFor(boundCol).orElse(fileRange(
              new org.apache.hadoop.fs.Path(rootPath, e.path), boundCol, conf))
            (relDir, range)
          }
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      else
        Map("" -> fs.listStatus(rootPath).toSeq.filter { st =>
          val n = st.getPath.getName
          st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
        }.map(st => fileRange(st.getPath, boundCol, conf)))
    val done = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    byDir.toSeq.sortBy(_._1).foreach { case (relDir, fileRanges) =>
      // Interval components over the files with usable stats.
      val ranged = fileRanges.flatten.sortBy(_._1)
      var i = 0
      while (i < ranged.length) {
        var (lo, hi) = ranged(i)
        var count = 1
        var j = i + 1
        while (j < ranged.length && ranged(j)._1 <= hi) {
          hi = math.max(hi, ranged(j)._2)
          count += 1
          j += 1
        }
        // hi == Long.MaxValue cannot be expressed as an exclusive
        // bound; such a grain (a sentinel timestamp) stays fragmented
        // rather than silently widening into a neighbor.
        if (count > maxFiles && hi < Long.MaxValue) {
          if (manifested)
            ManifestLog.compactRange(spark, root, relDir, boundCol, lo, hi + 1)
          else
            compactSortedRange(spark, root, boundCol, lo, hi + 1)
          done += ((relDir, lo, hi + 1))
        }
        i = j
      }
    }
    done.toSeq
  }

  /** [[maintainSorted]] for the bucketed co-location tables: compact
    * every bucket whose live file count exceeds `maxFiles` (K appends
    * leave K files per bucket). Returns the compacted bucket ids.
    */
  def maintainBucketed(spark: org.apache.spark.sql.SparkSession, table: String,
      key: String, maxFiles: Int = CompactAfterSegments): Seq[Int] = {
    require(maxFiles >= 1, "maxFiles must admit at least one file per bucket")
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val counts = fs.listStatus(loc).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isFile && !n.startsWith("_") && !n.startsWith(".")) bucketIdOf(n) else None
    }.groupBy(identity).view.mapValues(_.size)
    val targets = counts.filter(_._2 > maxFiles).keys.toSeq.sorted
    targets.foreach(compactBucket(spark, table, key, _))
    targets
  }

  /** A staged-swap range op on a partition SUBDIR of a manifested
    * layout (the per-year compaction call shape) would delete/rename
    * files the manifest still lists — readers of every generation
    * would break. Throw toward the manifest-native per-partition API
    * instead. One parent level is the layout family's actual nesting
    * depth (root/year=YYYY).
    */
  private def guardNotInsideManifestedLog(
      spark: org.apache.spark.sql.SparkSession, root: String): Unit = {
    val parent = new org.apache.hadoop.fs.Path(root).getParent
    if (parent != null && ManifestLog.isManifested(spark, parent.toString))
      throw new IllegalStateException(
        s"$root is a partition directory of the manifested log $parent — " +
          "staged-swap maintenance here would strand the manifest; use " +
          "ManifestLog.compactRange/restateRange(root, relDir, ...) instead")
  }

  /** Staged range-transaction dirs: `.compact-<lo>-<hi>` /
    * `.restate-<lo>-<hi>`. */
  private val StagedRangeDir = """^\.(compact|restate)-(-?\d+)-(-?\d+)$""".r

  /** Recover EVERY pending staged range transaction under `root` —
    * called at the entry of both range ops, so a crash in one grain is
    * healed by the next call on ANY grain, not only a retry of the
    * same range (a torn grain would otherwise stay torn until someone
    * happened to re-run that exact range). Each staged dir's name
    * carries its own grain, so replay re-derives that grain's
    * contained files and converges; files the footer classifier cannot
    * decide are SKIPPED here (recovery must converge, not judge — the
    * ops' own grain listings stay strict about them).
    */
  private def recoverPendingRanges(fs: org.apache.hadoop.fs.FileSystem,
      rootPath: org.apache.hadoop.fs.Path, boundCol: String,
      conf: org.apache.hadoop.conf.Configuration): Unit =
    fs.listStatus(rootPath).toSeq
      .filter(_.isDirectory)
      .foreach { st =>
        st.getPath.getName match {
          case StagedRangeDir(kind, loS, hiS) =>
            val (lo, hi) = (loS.toLong, hiS.toLong)
            def grain(): Seq[org.apache.hadoop.fs.Path] =
              fs.listStatus(rootPath).toSeq.filter { f =>
                val n = f.getPath.getName
                f.isFile && n.endsWith(".parquet") &&
                  !n.startsWith("_") && !n.startsWith(".") &&
                  containment(f.getPath, boundCol, lo, hi, conf) == Containment.Contained
              }.map(_.getPath)
            def dst(partName: String) =
              new org.apache.hadoop.fs.Path(rootPath, s"$kind-$lo-$hi-$partName")
            recoverStaged(fs, st.getPath, grain, dst)
          case _ => ()
        }
      }

  /** Restate ONE date-range grain of a sorted log — the CORRECTION
    * primitive (upstream restated history: late fixes, recomputed
    * amounts, takedown edits): replace the grain's files with a
    * corrected batch, never rewriting the rest of the log. The
    * replacement is re-clustered here (range-partitioned to ONE file,
    * sorted on the boundary column) so the grain keeps tight stats AND
    * the swap has the same single-rename crash geometry as compaction
    * — every crash window re-converges via the shared staged protocol
    * ([[swapStaged]]; SegmentRestatementSpec drills each window).
    *
    * Alignment contract: files fully inside [loIncl, hiExcl) are
    * superseded; files fully outside (and all-null leading files —
    * null boundaries live outside every value range) are untouched;
    * anything else — a straddling file, a null-bearing in-range file,
    * or a file without trustworthy stats — throws: restating over it
    * would leave stale rows alive next to their corrections, the one
    * silent-corruption mode a restatement must not have. Compact the
    * grain (or restate at a wider, segment-aligned range) first. The
    * corrected batch must be non-empty and lie entirely inside the
    * grain — both checked loudly. For the year-partitioned layout,
    * restate within the year directory (pass it as `root`).
    * Single-writer, like append and compaction.
    */
  def restateSortedRange(spark: org.apache.spark.sql.SparkSession, root: String,
      boundCol: String, loIncl: Long, hiExcl: Long,
      replacement: DataFrame): Unit = {
    if (ManifestLog.isManifested(spark, root)) {
      ManifestLog.restateRange(spark, root, "", boundCol, loIncl, hiExcl, replacement)
      return
    }
    guardNotInsideManifestedLog(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val conf = spark.sessionState.newHadoopConf()
    val fs = rootPath.getFileSystem(conf)
    def grain(): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(rootPath).toSeq.filter { st =>
        val n = st.getPath.getName
        st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".") && {
          containment(st.getPath, boundCol, loIncl, hiExcl, conf) match {
            case Containment.Contained => true
            case Containment.Disjoint => false
            case Containment.Unknown => throw new IllegalStateException(
              s"restatement grain [$loIncl, $hiExcl) is not segment-aligned at " +
                s"'$n' (straddling range, in-range nulls, or unusable stats) — " +
                "compact the grain or restate a segment-aligned range")
          }
        }
      }.map(_.getPath)
    val tmp = new org.apache.hadoop.fs.Path(rootPath, s".restate-$loIncl-$hiExcl")
    def dst(partName: String) =
      new org.apache.hadoop.fs.Path(rootPath, s"restate-$loIncl-$hiExcl-$partName")
    // Crashed prior transactions (this grain's or any other's) finish
    // first; the current call then supersedes their outcome like any
    // other grain content.
    recoverPendingRanges(fs, rootPath, boundCol, conf)
    // EVERY validation runs before anything is staged: a staged dir is
    // a live recovery source the moment its _SUCCESS lands, so writing
    // it first and then rejecting the call would leave a
    // fully-committed transaction a later call silently installs.
    val selected = grain() // throws on a non-aligned grain
    // One evaluation of the (possibly expensive) upstream plan; the
    // validation aggregate and the staged write both read the
    // checkpointed blocks.
    val batch = validatedRestateBatch(replacement, boundCol, loIncl, hiExcl)
    batch
      .repartitionByRange(1, col(boundCol))
      .sortWithinPartitions(boundCol)
      .write.mode("overwrite").parquet(tmp.toString)
    swapStaged(fs, tmp, () => selected, dst)
  }

  /** The restatement batch contract, shared by the staged-swap path
    * and the manifest path ([[ManifestLog.restateRange]]): non-empty
    * (a whole-grain delete is not a restatement) and entirely inside
    * the grain — both checked loudly BEFORE anything is written.
    * Returns the batch locally checkpointed so the (possibly
    * expensive) upstream plan evaluates once for both the validation
    * aggregate and the write.
    */
  private[util] def validatedRestateBatch(replacement: DataFrame,
      boundCol: String, loIncl: Long, hiExcl: Long): DataFrame = {
    val batch = replacement.localCheckpoint()
    val checks = batch.agg(
      count(lit(1)).as("total"),
      count(when(
        col(boundCol).isNull || col(boundCol) < loIncl || col(boundCol) >= hiExcl,
        lit(1))).as("strays")).head()
    require(checks.getLong(0) > 0,
      "restatement batch is empty — a whole-grain delete is not expressible " +
        "as a restatement (the staged recovery could not tell it from a torn swap)")
    require(checks.getLong(1) == 0,
      s"${checks.getLong(1)} replacement row(s) fall outside the grain " +
        s"[$loIncl, $hiExcl) — a restatement replaces exactly its own grain")
    batch
  }

  private[util] sealed trait Containment
  private[util] object Containment {
    case object Contained extends Containment
    case object Disjoint extends Containment
    case object Unknown extends Containment
  }

  /** Footer classification of one file against a value grain: fully
    * inside, fully outside (all-null files count as outside — null
    * boundaries sort into the log's leading files and belong to no
    * value range), or not decidable from trustworthy stats. One footer
    * read, no data pages.
    */
  private[util] def containment(file: org.apache.hadoop.fs.Path, column: String,
      lo: Long, hi: Long,
      conf: org.apache.hadoop.conf.Configuration): Containment = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      import scala.jdk.CollectionConverters._
      var nulls = 0L
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var anyValue = false
      var unusable = false
      reader.getFooter.getBlocks.asScala.foreach { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == column)
          .flatMap(c => Option(c.getStatistics)) match {
          case Some(s) if s.getNumNulls >= 0 =>
            nulls += s.getNumNulls
            if (s.hasNonNullValue) (s.genericGetMin, s.genericGetMax) match {
              case (a: java.lang.Long, z: java.lang.Long) =>
                anyValue = true
                mn = math.min(mn, a.toLong)
                mx = math.max(mx, z.toLong)
              case _ => unusable = true
            }
          case _ => unusable = true
        }
      }
      if (unusable) Containment.Unknown
      else if (!anyValue) Containment.Disjoint
      else if (mx < lo || mn >= hi) Containment.Disjoint
      else if (mn >= lo && mx < hi && nulls == 0) Containment.Contained
      else Containment.Unknown
    } finally reader.close()
  }

  /** Footer min/max of a BIGINT column in one parquet file — None when
    * any row group lacks usable stats or holds nulls (the conservative
    * answer: such a file is never selected for compaction). One footer
    * read, no data pages.
    */
  private[util] def fileRange(file: org.apache.hadoop.fs.Path, column: String,
      conf: org.apache.hadoop.conf.Configuration): Option[(Long, Long)] =
    fileRanges(file, Seq(column), conf).get(column)

  /** Trustworthy footer [min, max] per requested column, from ONE
    * footer read — the multi-stat manifest recording path would
    * otherwise open the same footer once per cluster column. A column
    * is present in the result only when EVERY row group carries
    * null-free, long-decodable statistics for it (the single-column
    * contract, unchanged).
    */
  private[util] def fileRanges(file: org.apache.hadoop.fs.Path,
      columns: Seq[String],
      conf: org.apache.hadoop.conf.Configuration): Map[String, (Long, Long)] = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      import scala.jdk.CollectionConverters._
      val blocks = reader.getFooter.getBlocks.asScala
      columns.flatMap { column =>
        val perBlock = blocks.map { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == column)
            .flatMap(c => Option(c.getStatistics))
            .filter(s => !s.isEmpty && s.hasNonNullValue && s.getNumNulls == 0)
            .flatMap(s => (s.genericGetMin, s.genericGetMax) match {
              case (mn: java.lang.Long, mx: java.lang.Long) => Some((mn.toLong, mx.toLong))
              case _ => None
            })
        }
        if (perBlock.isEmpty || perBlock.exists(_.isEmpty)) None
        else Some(column ->
          (perBlock.flatten.map(_._1).min, perBlock.flatten.map(_._2).max))
      }.toMap
    } finally reader.close()
  }

  /** Footer row count of one parquet file — one footer read, no data
    * pages. The delete paths use it to drop schema-only empty parts a
    * fully-tombstoned grain's write may leave behind.
    */
  private[util] def fileRowCount(file: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): Long = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try reader.getRecordCount finally reader.close()
  }

  /** Spark maps a data file to its bucket by NAME (the trailing
    * `_NNNNN` id before the extensions) — the contract both the append
    * path (bucketBy names its files) and [[compactBucket]]'s
    * replacement file rely on.
    */
  private def bucketIdOf(name: String): Option[Int] =
    BucketNames.bucketIdOf(name)

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
    def grain(): Seq[org.apache.hadoop.fs.Path] = bucketGrain(fs, loc, bucketId)
    val tmp = new org.apache.hadoop.fs.Path(loc, s".compact-$bucketId")
    def dst(partName: String) = bucketDst(loc, bucketId, partName)
    def done(): Unit = spark.catalog.refreshTable(table)
    // Sweep EVERY pending bucket transaction, not only this bucket's —
    // a crash in bucket N's delete window must not leave N's rows
    // missing until someone happens to retry compactBucket(N).
    if (recoverPendingBuckets(fs, loc)) done()
    val olds = grain()
    if (olds.length <= 1) return // grain already compact
    spark.read.parquet(olds.map(_.toString): _*).sort(key)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    swapStaged(fs, tmp, () => olds, dst)
    done()
  }

  /** One bucket's live data files: everything whose trailing `_NNNNN`
    * id parses to `bucketId` (K appends leave up to K such files). */
  private def bucketGrain(fs: org.apache.hadoop.fs.FileSystem,
      loc: org.apache.hadoop.fs.Path, bucketId: Int): Seq[org.apache.hadoop.fs.Path] =
    fs.listStatus(loc).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".") &&
        bucketIdOf(n).contains(bucketId)
    }.map(_.getPath)

  /** The replacement must keep a trailing _NNNNN that parses to its
    * bucket: splice the id between the staged part's stem and its
    * extensions ("part-...-c000" + "_00007" + ".snappy.parquet").
    */
  private def bucketDst(loc: org.apache.hadoop.fs.Path, bucketId: Int,
      partName: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(loc, BucketNames.bucketNamed(partName, bucketId))

  /** Staged bucket-transaction dirs: `.compact-<bucketId>` — one
    * integer; the range transactions' names ([[StagedRangeDir]]) carry
    * two, so the patterns are disjoint. */
  private val StagedBucketDir = """^\.compact-(\d+)$""".r

  /** Recover EVERY pending staged bucket transaction under `loc` — the
    * bucket-table mirror of [[recoverPendingRanges]]: a crash in
    * bucket N's swap is healed by the next maintenance call on ANY
    * bucket (or the next append), not only a retry of the same id.
    * Returns true when any transaction was installed or cleaned up
    * (the caller refreshes the catalog's file listing).
    */
  private def recoverPendingBuckets(fs: org.apache.hadoop.fs.FileSystem,
      loc: org.apache.hadoop.fs.Path): Boolean = {
    var recovered = false
    fs.listStatus(loc).toSeq.filter(_.isDirectory).foreach { st =>
      st.getPath.getName match {
        case StagedBucketDir(idS) =>
          val id = idS.toInt
          if (recoverStaged(fs, st.getPath,
              () => bucketGrain(fs, loc, id), bucketDst(loc, id, _)))
            recovered = true
        case _ => ()
      }
    }
    recovered
  }

  /** Crash-drill seam (the StagedCommit.failpoint pattern): invoked
    * between the swap's steps with a step tag; identity in
    * production. The recovery drill installs a throwing hook to kill
    * the swap at an exact point, then proves a re-run converges.
    */
  @volatile private[util] var failpoint: String => Unit = _ => ()

  /** The crash-safe grain swap shared by both compaction paths. The
    * staged output under `tmp` is the recovery source: it is written
    * COMPLETELY (committer `_SUCCESS` marker) before the first live
    * file is touched, so every crash window re-converges on the next
    * compaction call via [[recoverStaged]] — delete-then-rename alone
    * would lose the grain to a crash between the two steps (the
    * StagedCommit lesson applied at the layout grain). Single-writer
    * contract, one notch stronger than append's: after a compaction
    * crash, re-run compaction (or any call that triggers recovery)
    * BEFORE appending to the same grain — recovery supersedes every
    * live grain file with the staged content, and a file appended
    * into the crash window would be superseded too.
    */
  private def swapStaged(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path,
      grain: () => Seq[org.apache.hadoop.fs.Path],
      dst: String => org.apache.hadoop.fs.Path): Unit = {
    failpoint(s"staged:$tmp")
    grain().foreach(p => fs.delete(p, false))
    failpoint(s"deleted:$tmp")
    fs.listStatus(tmp).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .foreach { p =>
        if (!fs.rename(p, dst(p.getName)))
          throw new java.io.IOException(s"compaction rename failed: $p -> ${dst(p.getName)}")
      }
    failpoint(s"renamed:$tmp")
    fs.delete(tmp, true)
  }

  /** Entry-point recovery for a crashed swap. Returns true when the
    * grain is already compacted (a completed staged attempt was
    * finished or had only its cleanup pending); false when there is
    * nothing to recover (no staged attempt, or an INCOMPLETE staged
    * write — no `_SUCCESS` — which is discarded: the live grain was
    * never touched before staging completed).
    */
  private def recoverStaged(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path,
      grain: () => Seq[org.apache.hadoop.fs.Path],
      dst: String => org.apache.hadoop.fs.Path): Boolean = {
    if (!fs.exists(tmp)) return false
    val complete = fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))
    if (!complete) { fs.delete(tmp, true); return false }
    val parts = fs.listStatus(tmp).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
    if (parts.isEmpty) { fs.delete(tmp, true); true } // crash after rename: cleanup only
    else { swapStaged(fs, tmp, grain, dst); true } // crash before/mid swap: finish it
  }
}

/** Spark maps a data file to its bucket by NAME — the trailing
  * `_NNNNN` id before the extensions (BucketingUtils' contract, which
  * bucketBy's writer follows when naming files). ONE copy of the
  * parse + splice logic: [[Segments]]' catalog path and
  * [[BucketedManifest]]'s manifested path must stay byte-identical
  * here, or a drifted copy silently mis-assigns files to buckets in
  * whichever path kept the stale rule.
  */
private[util] object BucketNames {
  private val BucketFileName = """.*_(\d+)(?:\..*)?$""".r

  /** The bucket id a data file's name parses to, if any. */
  def bucketIdOf(name: String): Option[Int] = name match {
    case BucketFileName(id) => Some(id.toInt)
    case _ => None
  }

  /** Splice a bucket id between a plain part name's stem and its
    * extensions ("part-...-c000" + "_00007" + ".snappy.parquet"), so
    * a replacement file parses to its grain's bucket.
    */
  def bucketNamed(partName: String, bucketId: Int): String = {
    val dot = partName.indexOf('.')
    val (stem, ext) = partName.splitAt(if (dot < 0) partName.length else dot)
    f"$stem%s_$bucketId%05d$ext%s"
  }
}
