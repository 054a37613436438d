package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table access for the driver-generated test corpus (TESTDATA.md).
  *
  * All declared queries receive a scale-factor directory and read the
  * parquet tables lazily — Catalyst prunes columns and pushes filters
  * into the scan, so a query that touches 2 of lineitem's 11 columns
  * only decodes 2 column chunks. At cluster scale the same code reads
  * a partitioned table root instead of a single file; nothing here
  * assumes single-file layout.
  */
object Tables {
  def tbl(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cachedParquet(spark, s"$sfDir/$name.parquet")

  // ------------------------------------------------------------------
  // Resolved-relation cache (r21; guide §1 / §7.3 driver-side cost).
  // `spark.read.parquet` re-resolves its relation on EVERY call — path
  // listing, footer schema inference (often as a one-task Spark job),
  // options validation — measured 80-130 ms per call on the bench box,
  // and RuleExecutor attributes 370-490 ms of the multi-join queries'
  // per-build planning time to ResolveDataSource alone. Spark already
  // memoizes resolved relations for CATALOG tables (spark.table's
  // relation cache); bare-path reads lack that seam, so this provides
  // it: METADATA-only caching of the analyzed read DataFrame, scoped
  // per SparkSession (WeakHashMap — entries die with the session),
  // validated by a top-level file signature (name:length:mtime of the
  // path's direct entries) so an in-place corpus rewrite invalidates
  // and re-resolves. Manifest-generation reads key on root+version (or
  // the exact file list) — generations are immutable commits; vacuum
  // only deletes files no kept manifest references. No row data is
  // ever cached: every execution still scans parquet from disk; only
  // the re-resolution of an UNCHANGED relation is skipped — the same
  // service a catalog gives a long-lived production session.

  private val relCaches =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, (String, DataFrame)]]()

  private def relCacheOf(spark: SparkSession) = relCaches.synchronized {
    relCaches.computeIfAbsent(
      spark,
      _ => new java.util.concurrent.ConcurrentHashMap[String, (String, DataFrame)]())
  }

  /** Top-level content signature of `path`: the direct children's
    * (name, length, mtime) — catches in-place rewrites (parquet writers
    * emit fresh part-file names and mtimes) at ~0.1 ms instead of the
    * full re-resolution. Deeper mutation of an already-written
    * partition subdir does not occur in this codebase: snapshot and
    * layout paths are write-once per key (rebuilds use new generation
    * suffixes), and the raw corpus tables are single files.
    */
  private def pathSig(path: String): String = {
    val f = new java.io.File(path)
    if (f.isFile) s"f:${f.length}:${f.lastModified}"
    else {
      val kids = f.listFiles()
      if (kids == null) "absent"
      else
        kids.sortBy(_.getName)
          .map(k => s"${k.getName}:${k.length}:${k.lastModified}")
          .mkString("d:", ",", "")
    }
  }

  /** Cached, signature-validated `spark.read.parquet(path)`. */
  private[graft] def cachedParquet(spark: SparkSession, path: String): DataFrame =
    relationCached(spark, s"p:$path", pathSig(path))(spark.read.parquet(path))

  /** Generic relation memo: `key` identifies the relation, `sig` its
    * expected content signature ("" = the key itself pins immutable
    * content, e.g. a manifest generation's exact file list). A lost
    * race re-resolves on both threads and keeps the last — idempotent,
    * metadata-only.
    */
  private[graft] def relationCached(spark: SparkSession, key: String,
      sig: String = "")(mk: => DataFrame): DataFrame = {
    val cache = relCacheOf(spark)
    val hit = cache.get(key)
    if (hit != null && hit._1 == sig) hit._2
    else { val df = mk; cache.put(key, (sig, df)); df }
  }

  /** Session config every graft entry point needs:
    * `nanosAsLong` so a TIMESTAMP(NANOS) events file — one historical
    * encoding of the corpus — reads as long instead of failing outright
    * ([PARQUET_TYPE_ILLEGAL] in Spark 4); [[events]] then adapts to
    * whatever type actually came off disk, so the flag is harmless for
    * µs-encoded files and load-bearing only if a producer writes nanos.
    * Applied once at session build (Verify/Bench/RunPipeline/tests) —
    * NOT inside query functions, so no hidden global side effects.
    */
  val sessionConf: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // Engine extensions: registers native expressions (graft_dot_f)
    // with the SQL function registry via SparkSessionExtensions.
    "spark.sql.extensions" -> "graft.plans.GraftSparkExtensions",
    // Whole-stage-codegen class cache (STATIC conf — must be set at
    // session build). The default is 100 entries, sized for a handful
    // of hot queries; a session running this library's 144-query
    // surface holds far more distinct codegen stages, so at 100 the
    // cache THRASHES and every query re-compiles (Janino) every stage
    // on every execution. Measured r18 on the full roster at sf0.1:
    // per-query min-of-3 sum 97.8 s → 58.1 s with the cache at 10k;
    // q49_bucketed_agg alone 0.94 s → 0.45 s — the "persistent
    // elevation" two rounds of quiet-box bisection chased was exactly
    // this recompilation, which is why it showed on every box and grew
    // with the roster. A long-lived analytics session (the 100 TB
    // deployment shape: one driver serving many repeated query shapes)
    // wants the same headroom; ~10k compiled stages is tens of MB of
    // class metadata — negligible against an 8 GiB driver.
    "spark.sql.codegen.cache.maxEntries" -> "10000",
    // Scan-split open-cost charge (default 4 MB). The default floors
    // maxSplitBytes at 4 MB, so a 10 MB fact file scans as 3 tasks no
    // matter how many cores are idle — measured r21: q20's whole
    // runtime was one 3-task scan+join+agg stage (721 task-ms, 240 ms
    // wall each) on a 32-core box. 256 KB keeps the many-small-files
    // task-explosion guard (a split still absorbs ≤ maxPartitionBytes/
    // 256 KB files) while letting bytesPerCore set the split size, so
    // scan parallelism derives from input mass / available cores — the
    // scale-adaptive rule. At cluster scale splits are
    // maxPartitionBytes-bound (128 MB files ≫ open cost) and this knob
    // is inert; it only governs small-input parallelism, where decode
    // cost dominates file-open cost by orders of magnitude.
    "spark.sql.files.openCostInBytes" -> (256 * 1024).toString,
    // AQE post-shuffle coalescing floor (default 1 MB). Coalescing is
    // BYTE-targeted, but the shuffles feeding this library's heavy
    // operators carry compact keys/digests with high per-row CPU
    // downstream (explode+pair-generation, array_intersect
    // verification, regex): at 1 MB the whole reduce side of q74
    // coalesces to ONE task (879 ms measured, single-threaded) while
    // 31 cores idle. 128 KB keeps the parallelism-first contract
    // meaningful at small shuffle mass: target size stays
    // max(total/parallelism, 128 KB), so a genuinely tiny shuffle
    // still collapses to one or two tasks, a CPU-heavy medium one fans
    // out toward the core count, and at cluster scale (multi-GB
    // shuffles) the advisory 64 MB target governs exactly as before —
    // the floor is inert there. 128 KB and not less: an r21 sweep
    // (16/64/128/256 KB over the eight heaviest shuffle consumers)
    // showed ~100 ms of fixed per-task cost in these stage shapes, so
    // fanning a sub-128 KB-per-task shuffle wider pays more overhead
    // than the row work it spreads (q113 0.93 s at 16 KB vs 0.53 s at
    // 128 KB), while 256 KB re-serializes the pair-explosion stages
    // (q67 1.19 → 1.77 s).
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "131072",
    // Shuffle writer selection (core conf — context-creation time).
    // SQL shuffles carry no RDD-level map-side combine, so with reduce
    // partitions ≤ the default threshold (200) every map task takes
    // the BYPASS writer: one spill file + 32 KB buffer PER REDUCE
    // PARTITION per map task. At shuffle.partitions = cores = 32 that
    // is 32 file create/write/close/merge cycles per map task —
    // measured r21 (MicroProbe shapes, 100 k rows): the map stage of a
    // plain hash aggregate spent 4.1 s of task time at threshold 200
    // vs 1.5 s with the serialized (Unsafe) writer, and a window
    // query's map stage 5.2 s → 0.4 s; identical results. 8 keeps the
    // bypass path for genuinely tiny fan-outs (where its simplicity
    // wins) and routes everything else to the single-file serialized
    // sorter — which is already the only writer used at cluster scale
    // (partitions ≫ 200), so production behavior is unchanged.
    "spark.shuffle.sort.bypassMergeThreshold" -> "8",
  )

  /** Fold [[sessionConf]] into a session builder. */
  def withSessionConf(b: SparkSession.Builder): SparkSession.Builder =
    sessionConf.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Canonical events frame: `ts` as a microsecond TimestampType column
    * regardless of the file's physical encoding. Producers upgrade
    * timestamp encodings across writer versions (the corpus itself moved
    * ns→µs between rounds), so the loader branches on the OBSERVED
    * type instead of hard-coding one historical layout — exactly the
    * schema-at-read adaptivity a 100 TB table with years of writer
    * drift requires:
    *  - nanos-as-long (TIMESTAMP(NANOS) under [[sessionConf]]'s
    *    `nanosAsLong`): integer `div 1000` truncates exactly like
    *    DuckDB's ns→µs read, so both engines see identical instants;
    *  - TIMESTAMP_MICROS `isAdjustedToUTC=false` (reads as
    *    TimestampNTZ): cast to TimestampType — the session is pinned
    *    UTC, so the cast is micros-identity;
    *  - TIMESTAMP_MICROS UTC-adjusted (reads as TimestampType): as-is.
    * Anything else fails loudly — silently misreading time data is the
    * one non-option.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = tbl(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // A LongType ts is not ALWAYS nanos: a producer writing plain
        // BIGINT micros reads as the same Spark type, and `div 1000`
        // would silently shift every instant ×1000 — violating the
        // fails-loudly contract below. Verify against the parquet
        // footer (logical-type annotation, else column stats range)
        // before trusting the nanos interpretation.
        requireNanosTs(spark, sfDir)
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet encoding $other " +
          "(expected nanos-as-long, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }

  /** Footer-level plausibility check that a LongType `ts` really holds
    * epoch NANOS, without scanning any data: one parquet footer read of
    * the first data file. Two accepted proofs, in order:
    *   1. the column's logical-type annotation is TIMESTAMP(NANOS) —
    *      the one encoding `nanosAsLong` exists for; definitive;
    *   2. no usable annotation (a plain INT64 column): the footer's
    *      row-group statistics must land in a sane epoch-nanos range
    *      (~1973..2140). Micros/millis/seconds land 3/6/9 orders of
    *      magnitude below the floor, so a mis-unit producer fails here
    *      by construction rather than shifting every instant ×1000.
    * Anything else (missing stats, out-of-range values) throws — the
    * physical schema alone cannot distinguish the units, and guessing
    * time units is the one non-option.
    */
  private def requireNanosTs(spark: SparkSession, sfDir: String): Unit = {
    val nanosFloor = 100000000000000000L // ~1973-03 in ns; µs values are 1000× below
    val nanosCeil = 5400000000000000000L // ~2141-02 in ns
    val root = new org.apache.hadoop.fs.Path(s"$sfDir/events.parquet")
    val conf = spark.sessionState.newHadoopConf()
    val fs = root.getFileSystem(conf)
    // Recursive listing (the Snapshots.fingerprint pattern): a
    // partitioned table root keeps its data files under partition
    // subdirectories — a top-level-only listing would reject a layout
    // the loader otherwise reads fine.
    val dataFile =
      if (fs.getFileStatus(root).isFile) root
      else {
        val it = fs.listFiles(root, true)
        var best: Option[org.apache.hadoop.fs.Path] = None
        while (it.hasNext) {
          val p = it.next().getPath
          if (p.getName.endsWith(".parquet") && !p.getName.startsWith("_")
            && best.forall(_.toString > p.toString)) best = Some(p)
        }
        best.getOrElse(
          throw new IllegalStateException(s"events.ts: no data files under $root"))
      }
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(dataFile, conf))
    try {
      val md = reader.getFooter
      val schema = md.getFileMetaData.getSchema
      val prim = schema.getType(schema.getFieldIndex("ts")).asPrimitiveType()
      val isNanosAnnotated = prim.getLogicalTypeAnnotation match {
        case t: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit == org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.NANOS
        case _ => false
      }
      if (!isNanosAnnotated) {
        import scala.jdk.CollectionConverters._
        val stats = md.getBlocks.asScala
          .flatMap(_.getColumns.asScala.find(_.getPath.toDotString == "ts"))
          .flatMap(c => Option(c.getStatistics))
          .filter(s => !s.isEmpty && s.hasNonNullValue)
        val inRange = stats.nonEmpty && stats.forall { s =>
          (s.genericGetMin, s.genericGetMax) match {
            case (mn: java.lang.Long, mx: java.lang.Long) =>
              mn >= nanosFloor && mx <= nanosCeil
            case _ => false
          }
        }
        if (!inRange) throw new IllegalStateException(
          s"events.ts: BIGINT column in $dataFile is not plausibly epoch NANOS " +
            "(no TIMESTAMP(NANOS) annotation and footer stats outside the " +
            "~1973..2140 nanos range) — refusing to guess the time unit")
      }
    } finally reader.close()
  }

  /** Exact-micros NTZ literal for comparisons against a raw
    * TIMESTAMP_NTZ column. The bare-column-vs-literal form is the only
    * one the parquet source even ACCEPTS as a pushed filter (wrapping
    * the column in unix_micros/cast blocks pushdown outright); in UTC
    * the two forms select identical rows. Measured honesty (r9):
    * accepted ≠ pruned — this Spark's ParquetFilters converts only
    * UTC-adjusted timestamp annotations to row-group predicates, so on
    * raw NTZ data the accepted filter evaluates post-decode. Keep the
    * literal form anyway: it prunes the day upstream learns NTZ, and
    * already prunes on UTC-adjusted files; where the engine owns the
    * layout, sorted BIGINT-micros at-rest tables close the hole for
    * good (the events-us-log pattern, metrics-proven).
    */
  def ntzUs(us: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)

}

/** Derived-artifact materialization: build once per (corpus, name),
  * write to a parquet snapshot, read it back for every subsequent use
  * in the session. This replaces `.cache()` for artifacts referenced
  * from multiple plan branches or queries (Catalyst does not share
  * subplans between self-join branches, and caches squat on executor
  * storage for the session's lifetime): no storage residency, columnar
  * scans thereafter — exactly what a cluster pipeline does with
  * shingle/signature/cluster tables, persisted once per corpus
  * snapshot.
  *
  * Keyed by (corpus dir, artifact name, corpus CONTENT fingerprint):
  * if the corpus parquet at a path is rewritten mid-session, the
  * fingerprint (sorted recursive file listing: path + length + mtime)
  * changes and the artifact rebuilds instead of silently serving the
  * stale snapshot. The mtime listing is the filesystem-generic stand-in
  * for what a table format gives as a snapshot id; its granularity is
  * the filesystem's mtime resolution.
  */
object Snapshots {
  // Concurrency: prepareIndexes builds independent artifact chains on
  // parallel threads, and artifacts NEST (pq-codes builds pq-codebooks;
  // the half-index assignment builds its centroids). TrieMap
  // .getOrElseUpdate may evaluate a racing key's builder twice — two
  // overwrite-writes to the SAME parquet path — and running the builder
  // INSIDE ConcurrentHashMap.computeIfAbsent throws IllegalStateException
  // ("Recursive update") when a nested build touches the map mid-resize.
  // So computeIfAbsent only allocates a cheap memo cell, and the build
  // runs in the cell's lazy val: exactly-once per key, same-key callers
  // block on the cell's monitor, nested different-key builds never
  // mutate the map while a mapping function is on the stack. The
  // dependency graph is a DAG, so cell-monitor deadlock cannot occur.
  private final class Cell(build: () => String) {
    @volatile private var done = false
    lazy val value: String = { val v = build(); done = true; v }
    /** The path if the build already ran — NEVER forces it (gc walks
      * the memo; forcing a lazy cell there would build artifacts as a
      * side effect of garbage collection). */
    def valueIfBuilt: Option[String] = if (done) Some(value) else None
  }
  private val paths =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), Cell]

  def apply(spark: SparkSession, dir: String, name: String,
      partitionBy: Seq[String] = Nil,
      adoptBound: Option[String] = None)(
      build: => DataFrame): DataFrame = {
    val fp = fingerprint(spark, dir)
    val cell = paths.computeIfAbsent(
      (dir, name, fp),
      _ => writeCell(spark, dir, name, fp, partitionBy, () => build, adoptBound = adoptBound))
    readArtifact(spark, cell.value)
  }

  /** Every parquet-artifact read funnels here: a manifested root
    * ([[ManifestLog]] — an [[install]]ed, maintenance-owned layout)
    * resolves its CURRENT manifest's exact file set, so queries built
    * mid-maintenance see one committed generation, never a directory
    * listing's torn in-between. Plain snapshot paths read as before.
    */
  private def readArtifact(spark: SparkSession, path: String): DataFrame =
    if (ManifestLog.isManifested(spark, path)) {
      // FLAT manifested roots read through the stats-aware FileIndex
      // ([[BucketedManifest.readIndexed]]): a consumer's ordinary
      // pushed integral-literal filters then skip whole files at PLAN
      // time from the manifest-recorded per-file ranges — the default
      // path the benched TPC-H date family rides once the one-shot
      // build self-adopts. Partition-dir layouts keep the basePath
      // read (their dir-encoded columns live in path names the flat
      // relation cannot reconstruct); directory pruning and the
      // readSlice hints cover them.
      val flat = scala.util.Try(
        ManifestLog.currentEntries(spark, path).forall(!_.path.contains("/")))
        .getOrElse(false)
      if (flat) BucketedManifest.readIndexed(spark, path)
      else ManifestLog.read(spark, path)
    } else cachedParquet(spark, path)

  /** [[apply]] with a boundary hint: the incremental query paths (the
    * since/slice boundary reads) declare the [loIncl, hiExcl) window
    * they will filter to, and a MANIFESTED artifact then plans only
    * the files whose manifest-recorded stats may overlap it
    * ([[ManifestLog.readSlice]] — stats-less files always included, so
    * selection is a row superset and the caller's filter stays
    * load-bearing). On a plain snapshot path the hint is free: the
    * read is identical to [[apply]] and row-group pruning does the
    * skipping. This is how a manifested 100 TB deployment keeps a
    * day's boundary read from planning a listing of years of history.
    */
  def slice(spark: SparkSession, dir: String, name: String,
      boundCol: String, loIncl: Long, hiExcl: Long,
      partitionBy: Seq[String] = Nil)(
      build: => DataFrame): DataFrame = {
    val fp = fingerprint(spark, dir)
    val cell = paths.computeIfAbsent(
      (dir, name, fp),
      _ => writeCell(spark, dir, name, fp, partitionBy, () => build,
        adoptBound = Some(boundCol)))
    if (ManifestLog.isManifested(spark, cell.value))
      ManifestLog.readSlice(spark, cell.value, boundCol, loIncl, hiExcl)
    else cachedParquet(spark, cell.value)
  }

  /** Unconditional REBUILD of an artifact, replacing whatever the memo
    * holds for (dir, name) — the refresh half of the maintenance
    * lifecycle ([[install]] is the append half): when an incremental
    * regime's validity condition breaks (the IVF quantizer-drift
    * canary is the canonical case), the owning module re-derives the
    * artifact from the current corpus and every later consumer reads
    * the refreshed state. Same path scheme and write discipline as the
    * memoized build.
    */
  private[graft] def rebuild(spark: SparkSession, dir: String, name: String,
      partitionBy: Seq[String] = Nil)(
      build: => DataFrame): DataFrame = {
    val fp = fingerprint(spark, dir)
    // A rebuild writes a NEW generation dir instead of overwriting the
    // memoized path in place: an overwrite DELETES the files first, so
    // any reader holding a plan over the old artifact (a query built
    // before the quantizer-drift canary tripped) would lose its scan
    // mid-flight. The old generation stays on disk for pinned readers;
    // [[gc]] collects whatever the memo no longer points to.
    val cell = writeCell(spark, dir, name, fp, partitionBy, () => build,
      suffix = s"-gen${java.util.UUID.randomUUID.toString.take(8)}")
    cell.value // force the write before replacing the memo
    paths.put((dir, name, fp), cell)
    readArtifact(spark, cell.value)
  }

  private def writeCell(spark: SparkSession, dir: String, name: String,
      fp: String, partitionBy: Seq[String], build: () => DataFrame,
      suffix: String = "", adoptBound: Option[String] = None): Cell =
    new Cell(() => {
      // md5 of the corpus dir, not hashCode: hashCode collisions
      // between two corpus dirs would silently serve wrong-corpus
      // artifacts (and abs(Int.MinValue) is negative).
      val dirKey = md5Hex(dir).take(12)
      val out =
        s"${System.getProperty("java.io.tmpdir")}/graft-snap-$dirKey-$fp-$name$suffix"
      val w = build().write.mode("overwrite")
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(out)
      // Self-adopt: the one-shot build IS the manifested layout's
      // first generation ([[ManifestLog.adopt]] — one footer pass
      // records per-file boundCol ranges). Readers then plan from the
      // manifest (file skipping); the Segments maintenance path sees
      // a manifested root and appends through manifest commits.
      adoptBound.foreach(b => ManifestLog.adopt(spark, out, Some(b)))
      out
    })

  /** Bucketed-table variant: materialize the artifact as a catalog
    * table bucketed (and sorted) by `key`, data at an external tmpdir
    * path. Joins and aggregations keyed on the bucket column then plan
    * with NO hash-partitioning Exchange — the shuffle is paid once at
    * write time, the at-rest layout a 100 TB fact table repeatedly
    * joined/aggregated on one key wants. Same (dir, name, content
    * fingerprint) keying as parquet snapshots.
    */
  def bucketedTable(spark: SparkSession, dir: String, name: String,
      key: String, buckets: Int)(build: => DataFrame): DataFrame = {
    val fp = fingerprint(spark, dir)
    val cell = paths.computeIfAbsent(
      (dir, s"bkt-$name", fp),
      _ => new Cell(() => {
        val dirKey = md5Hex(dir).take(12)
        val t = s"graft_snap_${dirKey}_${fp}_${name.replaceAll("[^A-Za-z0-9]", "_")}"
        val out =
          s"${System.getProperty("java.io.tmpdir")}/graft-snap-$dirKey-$fp-bkt-$name"
        build.write.mode("overwrite")
          .option("path", out)
          .bucketBy(buckets, key).sortBy(key)
          .saveAsTable(t)
        t
      }),
    )
    spark.table(cell.value)
  }

  /** Manifested-log artifact: build once per (corpus, name) as a
    * [[ManifestLog]] root — created empty, the lookup-key bloom
    * columns declared FIRST ([[ParquetBlooms.declare]]), then the
    * build frame appended as one sorted segment, so every data file
    * carries boundary stats in the manifest AND a key bloom filter in
    * its footer from birth. Returns the ROOT (the keyed entry points
    * — [[ManifestLog.readKeyed]], [[ManifestLog.deleteKeys]] — take a
    * root, not a frame). This is the at-rest shape of "fetch/forget by
    * id on a log sorted by something else": range stats answer the
    * boundary reads, blooms answer the keyed ones, one layout pays for
    * both.
    *
    * Idempotent across JVMs: a root already manifested with live files
    * under the same (corpus-fingerprint) path is reused as-is; a torn
    * previous attempt (create committed, append never landed) is
    * discarded and rebuilt.
    */
  def manifestedLog(spark: SparkSession, dir: String, name: String,
      boundCol: String, bloomCols: Seq[String])(build: => DataFrame): String = {
    val fp = fingerprint(spark, dir)
    val cell = paths.computeIfAbsent(
      (dir, s"mlog-$name", fp),
      _ => new Cell(() => {
        val dirKey = md5Hex(dir).take(12)
        val out =
          s"${System.getProperty("java.io.tmpdir")}/graft-snap-$dirKey-$fp-mlog-$name"
        val (p, fs) = ManifestLog.hadoop(spark, out)
        val complete = ManifestLog.isManifested(spark, out) &&
          scala.util.Try(ManifestLog.liveFileCount(spark, out) > 0).getOrElse(false)
        if (!complete) {
          fs.delete(p, true)
          ManifestLog.create(spark, out)
          if (bloomCols.nonEmpty) ParquetBlooms.declare(spark, out, bloomCols)
          ManifestLog.appendSorted(build, out, Nil, Some(boundCol))
        }
        out
      }),
    )
    cell.value
  }

  /** Z-clustered manifested-log artifact: [[manifestedLog]] plus one
    * [[ManifestLog.cluster]] pass, so the at-rest layout answers
    * conjunctive boundary slices over EVERY cluster column from a
    * manifest parse ([[ManifestLog.readSliceN]]) — the multi-tenant /
    * multi-dimension read pattern a time-only sort cannot prune.
    * Same idempotence contract: a complete root is reused as-is; a
    * torn attempt (created or appended but never clustered — the last
    * committed op tells) is discarded and rebuilt.
    */
  def clusteredLog(spark: SparkSession, dir: String, name: String,
      cols: Seq[String], targetFileRows: Long,
      bloomCols: Seq[String] = Nil)(build: => DataFrame): String = {
    val fp = fingerprint(spark, dir)
    val cell = paths.computeIfAbsent(
      (dir, s"zlog-$name", fp),
      _ => new Cell(() => {
        val dirKey = md5Hex(dir).take(12)
        val out =
          s"${System.getProperty("java.io.tmpdir")}/graft-snap-$dirKey-$fp-zlog-$name"
        val (p, fs) = ManifestLog.hadoop(spark, out)
        val complete = ManifestLog.isManifested(spark, out) &&
          scala.util.Try(ManifestLog.describe(spark, out).last._2 == "cluster")
            .getOrElse(false)
        if (!complete) {
          fs.delete(p, true)
          ManifestLog.create(spark, out)
          if (bloomCols.nonEmpty) ParquetBlooms.declare(spark, out, bloomCols)
          ManifestLog.appendSorted(build, out, Nil, Some(cols.head))
          ManifestLog.cluster(spark, out, cols, targetFileRows)
        }
        out
      }),
    )
    cell.value
  }

  /** Generic memoized layout root — the [[manifestedLog]] machinery
    * for builders that own their whole write protocol (e.g. a
    * manifested BUCKETED layout, whose bootstrap goes through a staged
    * catalog table): `build(path)` runs once per (corpus, name,
    * fingerprint); a root failing `complete` (a torn previous attempt)
    * is deleted and rebuilt.
    */
  private[graft] def layoutRoot(spark: SparkSession, dir: String, name: String)(
      complete: String => Boolean)(build: String => Unit): String = {
    val fp = fingerprint(spark, dir)
    val cell = paths.computeIfAbsent(
      (dir, s"root-$name", fp),
      _ => new Cell(() => {
        val dirKey = md5Hex(dir).take(12)
        val out =
          s"${System.getProperty("java.io.tmpdir")}/graft-snap-$dirKey-$fp-root-$name"
        if (!complete(out)) {
          val (p, fs) = ManifestLog.hadoop(spark, out)
          fs.delete(p, true)
          build(out)
        }
        out
      }),
    )
    cell.value
  }

  /** Ingest-pipeline seam: register an externally maintained at-rest
    * layout (e.g. a SEGMENT-APPENDED parquet root — [[Segments]]) as
    * the artifact for (dir, name), replacing any memoized build. This
    * is how the maintenance path and the query path compose: queries
    * consume whatever is at rest under the artifact's key, so an
    * ingest pipeline that appends segments installs the layout root
    * once and no query ever triggers a rebuild. SegmentAppendSpec
    * drives the round-trip: one-shot build and segmented layout answer
    * the TPC-H family hash-identically.
    */
  private[graft] def install(spark: SparkSession, dir: String, name: String,
      path: String): Unit =
    paths.put((dir, name, fingerprint(spark, dir)), new Cell(() => path))

  /** [[install]] for bucketed catalog-table artifacts: `table` is the
    * catalog name of an externally maintained bucketed table (same
    * bucket key/count as the one-shot build — append-mode bucketBy
    * validates this at every segment write).
    */
  private[graft] def installTable(spark: SparkSession, dir: String, name: String,
      table: String): Unit =
    paths.put((dir, s"bkt-$name", fingerprint(spark, dir)), new Cell(() => table))

  /** Garbage-collect superseded artifact generations for a corpus dir
    * — the disposal end of the lifecycle (build → [[install]] append →
    * [[rebuild]] refresh → gc): when the corpus at `dir` is rewritten,
    * its content fingerprint changes, every artifact rebuilds under
    * the new fingerprint, and the previous generation's parquet
    * snapshots and bucketed tables become unreachable (the memo keys
    * on the current fingerprint) yet occupy disk forever. gc removes
    * exactly the stale generations of THIS corpus dir: tmpdir
    * snapshot dirs and catalog tables whose key carries this dir's
    * hash but a different fingerprint, plus their memo entries. Other
    * corpus dirs' artifacts are untouched by construction (the dir
    * hash prefixes every key). Like compaction, gc is an
    * ingest-pipeline operation: it must not run concurrently with a
    * session still reading the old generation. Returns what it
    * removed, for the caller's ledger.
    */
  private[graft] def gc(spark: SparkSession, dir: String): Seq[String] = {
    val fp = fingerprint(spark, dir)
    val dirKey = md5Hex(dir).take(12)
    val removed = scala.collection.mutable.ArrayBuffer.empty[String]
    // Stale bucketed tables first (their external data dirs fall in
    // the path sweep below): graft_snap_<dirKey>_<fp>_<name>.
    val tPrefix = s"graft_snap_${dirKey}_"
    val tKeep = s"$tPrefix${fp}_"
    spark.catalog.listTables().collect()
      .map(_.name)
      .filter(n => n.startsWith(tPrefix) && !n.startsWith(tKeep))
      .foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS `$t`")
        removed += s"table:$t"
      }
    // Stale parquet snapshot dirs: graft-snap-<dirKey>-<fp>-<name>.
    val tmp = new org.apache.hadoop.fs.Path(System.getProperty("java.io.tmpdir"))
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pPrefix = s"graft-snap-$dirKey-"
    val pKeep = s"$pPrefix$fp-"
    if (fs.exists(tmp))
      fs.listStatus(tmp)
        .map(_.getPath)
        .filter(p => p.getName.startsWith(pPrefix) && !p.getName.startsWith(pKeep))
        .foreach { p =>
          fs.delete(p, true)
          removed += s"path:$p"
        }
    // Superseded REBUILD generations within the current fingerprint:
    // each [[rebuild]] writes a fresh `-gen<id>` dir so pinned readers
    // keep their files; once no memo cell points at a generation (or
    // at the base dir a generation superseded), it is stale. Only
    // EVALUATED cells count — forcing a lazy cell here would build
    // artifacts as a side effect of gc.
    locally {
      import scala.jdk.CollectionConverters._
      val live = paths.entrySet().asScala
        .filter(e => e.getKey._1 == dir && e.getKey._3 == fp)
        .flatMap(_.getValue.valueIfBuilt)
        .map(p => new org.apache.hadoop.fs.Path(p).getName)
        .toSet
      val GenDir = """^(.*)-gen[0-9a-f]{8}$""".r
      val supersededBases = live.collect { case GenDir(base) => base }
      if (fs.exists(tmp))
        fs.listStatus(tmp)
          .map(_.getPath)
          .filter(_.getName.startsWith(pKeep))
          .filter { p =>
            p.getName match {
              case GenDir(_) => !live.contains(p.getName)
              case n => supersededBases.contains(n)
            }
          }
          .foreach { p =>
            fs.delete(p, true)
            removed += s"path:$p"
          }
    }
    // Stale memo cells (same dir, superseded fingerprint) — without
    // this, a session that GCs and then touches an old-generation key
    // would read a deleted path instead of rebuilding.
    paths.keySet().removeIf { case (d, _, f) => d == dir && f != fp }
    removed.toSeq
  }

  /** Content fingerprint of the corpus dir: md5 over the sorted
    * recursive (path, length, mtime) listing. Cheap relative to any
    * build (one namenode/dirent sweep, no data read).
    */
  private def fingerprint(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    if (fs.exists(p)) {
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val st = it.next()
        entries += s"${st.getPath}:${st.getLen}:${st.getModificationTime}"
      }
    }
    md5Hex(entries.sorted.mkString("\n")).take(12)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}

/** One declared query: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle query over the
  * same tables. Queries with `oracle = None` get a weaker rows-only
  * check from the driver (SURVEY.md §5).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
)(val run: (SparkSession, String) => DataFrame)

object QueryDef {
  /** Merge query modules into the SparkEntry contract maps. */
  def toMaps(
      defs: Seq[QueryDef]
  ): (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) = {
    val qs = defs.map(d => d.name -> d.run).toMap
    require(qs.size == defs.size, "duplicate query names")
    val os = defs.collect { case QueryDef(n, Some(sql)) => n -> sql }.toMap
    (qs, os)
  }
}
