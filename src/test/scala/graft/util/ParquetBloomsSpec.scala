package graft.util

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The keyed point-operation surface over manifested layouts:
  * [[ParquetBlooms]] footer probes, [[ManifestLog.readKeyed]], and
  * their composition with [[ManifestLog.deleteKeys]]. The layout under
  * test is the shape that motivates the feature — a log sorted (and
  * stats-recorded) by TIME, keyed by a uid column the sort scatters…
  * except here each append localizes uids per file, so the spec can
  * prove the bloom probe admits a strict subset while remaining a
  * SUPERSET of the files that truly hold the keys (conservative,
  * never wrong).
  */
class ParquetBloomsSpec extends SparkTestBase with graft.TempCorpusDirs {
  import sqlImplicits._

  /** 4-file manifested log: file i covers ts [i*500, i*500+500) with
    * recorded stats, and uids [i*100, i*100+100) (5 rows per uid) with
    * a DECLARED bloom filter written into every file's footer (declare
    * precedes the first append, so staging attaches the writer
    * options). tag is globally unique per row — the string-key probe.
    */
  private def freshBloomLog(): (String, Seq[(Long, Long, String)]) = {
    val root = s"${tempCorpusDir("graft_pbloom")}/log"
    ManifestLog.create(spark, root)
    ParquetBlooms.declare(spark, root, Seq("uid", "tag"), expectedNdv = 1000L)
    val all = (0 until 4).flatMap { i =>
      (0 until 500).map { j =>
        (i * 500L + j, i * 100L + j % 100, s"e-$i-$j")
      }
    }
    (0 until 4).foreach { i =>
      ManifestLog.appendSorted(
        all.filter(r => r._1 >= i * 500 && r._1 < (i + 1) * 500)
          .toDF("ts", "uid", "tag").coalesce(1).sortWithinPartitions("ts"),
        root, Nil, Some("ts"))
    }
    (root, all)
  }

  private def absFiles(root: String): Seq[String] = {
    val (p, fs) = ManifestLog.hadoop(spark, root)
    ManifestLog.currentEntries(spark, root)
      .map(e => new org.apache.hadoop.fs.Path(p, e.path).toString)
  }

  test("footer probes prune files that cannot hold a key and keep every file that does") {
    val (root, _) = freshBloomLog()
    val files = absFiles(root)
    assert(files.length == 4)
    // uid 5 lives only in file 0's range; uid 105 only in file 1's.
    val admitted = ParquetBlooms.mayContainAny(spark, files, "uid", Seq(5L, 105L))
    val truth = spark.read.parquet(files: _*)
      .where(col("uid").isin(5L, 105L))
      .select(input_file_name()).distinct().collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).toUri.getPath).toSet
    assert(truth.size == 2)
    val admittedNorm =
      admitted.map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet
    assert(truth.subsetOf(admittedNorm),
      "bloom pruning dropped a file that holds a probed key — NEVER acceptable")
    assert(admittedNorm.size < files.length,
      "bloom probe admitted every file — no pruning happened at all")
    // String keys hash as BINARY — the tag filter localizes to file 2.
    val byTag = ParquetBlooms.mayContainAny(spark, files, "tag", Seq("e-2-10"))
    assert(byTag.nonEmpty && byTag.length < files.length)
  }

  test("missing filters, missing columns, and broken files all stay candidates") {
    val (root, _) = freshBloomLog()
    // A layout adopted from pre-declaration parquet has no filters:
    // every file is a permanent candidate.
    val plainRoot = s"${tempCorpusDir("graft_pbloom_plain")}/log"
    Seq((1L, 10L)).toDF("ts", "uid").write.parquet(plainRoot)
    ManifestLog.adopt(spark, plainRoot, Some("ts"))
    val plainFiles = absFiles(plainRoot)
    assert(ParquetBlooms.mayContainAny(spark, plainFiles, "uid",
      Seq(999999L)).toSet == plainFiles.toSet,
      "a filterless file must remain a candidate (conservative)")
    // A column the files don't have: kept.
    val files = absFiles(root)
    assert(ParquetBlooms.mayContainAny(spark, files, "no_such_col",
      Seq(1L)).toSet == files.toSet)
    // A key/physical-type pairing the prober refuses to guess: kept.
    assert(ParquetBlooms.mayContainAny(spark, files, "uid",
      Seq(java.math.BigDecimal.ONE)).toSet == files.toSet)
    // A file that is not parquet at all: kept, not failed — the probe
    // is an optimization and must never turn IO damage into a skipped
    // file or a dead job; the real scan reports the damage.
    val junk = s"${tempCorpusDir("graft_pbloom_junk")}/junk.parquet"
    java.nio.file.Files.write(java.nio.file.Paths.get(junk),
      "not a parquet file".getBytes("UTF-8"))
    assert(ParquetBlooms.mayContainAny(spark, files :+ junk, "uid",
      Seq(5L)).contains(junk))
  }

  test("readKeyed equals the unpruned filter and plans fewer files") {
    val (root, all) = freshBloomLog()
    val keys = Seq(5L, 105L)
    val got = ManifestLog.readKeyed(spark, root, "uid", keys)
    assert(got.inputFiles.length < 4,
      "readKeyed planned every file of a bloom-declared layout")
    val expected = all.filter(r => keys.contains(r._2)).sorted
    assert(got.select("ts", "uid", "tag").as[(Long, Long, String)]
      .collect().toSeq.sorted == expected)
    // The key set missing entirely: zero rows, schema intact.
    val none = ManifestLog.readKeyed(spark, root, "uid", Seq(999999L))
    assert(none.columns.toSeq == Seq("ts", "uid", "tag") && none.count() == 0L)
  }

  test("readKeyed stats-prunes when the key IS the boundary column — no blooms needed") {
    val root = s"${tempCorpusDir("graft_pbloom_stats")}/log"
    val rows = (0 until 2000).map(i => (i.toLong, s"doc-$i"))
    Seq(0, 500, 1000, 1500).foreach { lo =>
      rows.toDF("k", "body").filter(col("k") >= lo && col("k") < lo + 500)
        .coalesce(1).sortWithinPartitions("k")
        .write.mode("append").parquet(root)
    }
    ManifestLog.adopt(spark, root, Some("k"))
    val got = ManifestLog.readKeyed(spark, root, "k", Seq(42L, 1700L))
    assert(got.inputFiles.length == 2,
      s"range stats should admit exactly 2 of 4 files, planned ${got.inputFiles.length}")
    assert(got.select("k", "body").as[(Long, String)].collect().toSeq.sorted ==
      Seq((42L, "doc-42"), (1700L, "doc-1700")))
  }

  test("the MaxProbeKeys contract: point paths refuse bulk keys; the bulk path is a semi-join") {
    val (root, all) = freshBloomLog()
    val bulk = (0L until (ParquetBlooms.MaxProbeKeys + 1L)).toSeq
    val e = intercept[IllegalArgumentException] {
      ManifestLog.readKeyed(spark, root, "uid", bulk)
    }
    assert(e.getMessage.contains("semi-join"),
      "the refusal must tell the user the executable bulk alternative")
    // The executable guidance itself: semi-join against read().
    val keyFrame = spark.range(90L, 210L).select(col("id").as("uid"))
    val viaSemi = ManifestLog.read(spark, root)
      .join(keyFrame, Seq("uid"), "left_semi")
      .select("ts", "uid", "tag").as[(Long, Long, String)].collect().toSeq.sorted
    assert(viaSemi == all.filter(r => r._2 >= 90L && r._2 < 210L).sorted)
  }

  test("deleteKeys on a bloom-declared layout rewrites only files holding keys; others pass by reference") {
    val (root, all) = freshBloomLog()
    val before = ManifestLog.currentEntries(spark, root).sortBy(_.stats.head._2)
    // uids 100..104 live only in file 1; ts stats prune NOTHING for a
    // uid delete (the key is not the boundary column), so without the
    // bloom probe all four files would be scan candidates. The probe
    // reads four footers (KBs), admits file 1, and the find scan +
    // rewrite touch only it: the other three entries survive in the
    // manifest LINE-identical (path AND stats — pass-by-reference,
    // not rewrite).
    val res = ManifestLog.deleteKeys(spark, root, "uid",
      (100L to 104L).toDF("uid"))
    assert(res.rowsDeleted == 25L, s"got $res") // 5 uids × 5 rows
    assert(res.filesRewritten + res.filesRetired == 1,
      s"bloom pruning should confine the rewrite to ONE file, got $res")
    val after = ManifestLog.currentEntries(spark, root).map(_.line)
    Seq(before(0), before(2), before(3)).foreach { e =>
      assert(after.contains(e.line), "an unprobed file did not pass through by reference")
    }
    assert(ManifestLog.read(spark, root).select("ts", "uid", "tag")
      .as[(Long, Long, String)].collect().toSeq.sorted ==
      all.filterNot(r => r._2 >= 100L && r._2 <= 104L).sorted)
  }

  test("deleteKeys above the probe cap falls back to the scan path and stays exact") {
    val (root, all) = freshBloomLog()
    // 100_001 tombstone keys (over MaxProbeKeys): present uids 100..399
    // plus a vast absent tail. The bloom shortcut must step aside and
    // the find scan must still decide per file exactly.
    val tomb = spark.range(100L, ParquetBlooms.MaxProbeKeys + 101L)
      .select(col("id").as("uid"))
    val res = ManifestLog.deleteKeys(spark, root, "uid", tomb)
    assert(res.rowsDeleted == 1500L, s"got $res") // files 1,2,3 fully tombstoned
    assert(ManifestLog.read(spark, root).select("ts", "uid", "tag")
      .as[(Long, Long, String)].collect().toSeq.sorted ==
      all.filter(_._2 < 100L).sorted)
  }

  test("readForKeys: dynamic pruning from a key frame — empty, point, and bulk regimes") {
    val (root, all) = freshBloomLog()
    // Empty key frame (a dim filter that matched nothing): zero rows,
    // schema intact, nothing scanned.
    val none = ManifestLog.readForKeys(spark, root, "uid",
      Seq.empty[Long].toDF("uid"))
    assert(none.count() == 0L && none.columns.contains("tag"))
    // Null keys are not identities: a frame of nulls matches nothing.
    val nulls = ManifestLog.readForKeys(spark, root, "uid",
      Seq[Option[Long]](None, None).toDF("uid"))
    assert(nulls.count() == 0L)
    // Point regime: equals the plain filter, plans a file subset —
    // this is the join-shaped entry (keys from a filtered dim frame).
    val got = ManifestLog.readForKeys(spark, root, "uid",
      Seq(5L, 105L, 5L).toDF("uid"))
    assert(got.inputFiles.length < 4,
      "readForKeys planned every file for a 2-key frame")
    assert(got.select("ts", "uid", "tag").as[(Long, Long, String)]
      .collect().toSeq.sorted ==
      all.filter(r => r._2 == 5L || r._2 == 105L).sorted)
    // Bulk regime (> MaxProbeKeys distinct keys): falls back to the
    // full generation — the caller's join filters, nothing lost.
    val bulk = ManifestLog.readForKeys(spark, root, "uid",
      spark.range(0L, ParquetBlooms.MaxProbeKeys + 2L).select(col("id").as("uid")))
    assert(bulk.count() == all.length.toLong,
      "the bulk fallback must return the whole generation")
  }

  test("both probe regimes prune: written blooms at high NDV, exact dictionaries at low") {
    // parquet-mr deliberately writes NO bloom filter for a chunk whose
    // every data page is dictionary-encoded — the dictionary already
    // answers membership exactly. A probe that only consulted blooms
    // would silently stop pruning on low-NDV chunks (measured: that
    // was r14's failure), so the probe must handle both regimes. Two
    // files: one whose uid column overflows the 1MB dictionary page
    // (≈200k distinct longs → plain encoding → bloom written), one
    // small (dictionary-encoded → no bloom, dictionary probe).
    val root = s"${tempCorpusDir("graft_pbloom_regimes")}/log"
    ManifestLog.create(spark, root)
    ParquetBlooms.declare(spark, root, Seq("uid"), expectedNdv = 300000L)
    ManifestLog.appendSorted(
      spark.range(0L, 200000L)
        .select(col("id").as("ts"), (col("id") * 7919L).as("uid"))
        .coalesce(1).sortWithinPartitions("ts"),
      root, Nil, Some("ts"))
    ManifestLog.appendSorted(
      (0 until 500).map(i => (200000L + i, 9000L + i % 100))
        .toDF("ts", "uid")
        .coalesce(1).sortWithinPartitions("ts"),
      root, Nil, Some("ts"))
    val files = absFiles(root)
    assert(files.length == 2)
    // Prove the layout is in the mixed regime the test claims: the
    // big file carries a bloom for uid, the small one does not.
    def hasBloom(f: String): Boolean = {
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f),
          spark.sessionState.newHadoopConf()))
      try {
        import scala.jdk.CollectionConverters._
        reader.getFooter.getBlocks.asScala.exists(
          _.getColumns.asScala.exists(c =>
            c.getPath.toDotString == "uid" && c.getBloomFilterOffset >= 0))
      } finally reader.close()
    }
    val (withBloom, noBloom) = files.partition(hasBloom)
    assert(withBloom.length == 1 && noBloom.length == 1,
      s"expected one bloom-bearing and one dictionary-only file, " +
        s"got bloom=${withBloom.length}")
    // A key only the BIG file holds: bloom admits it, the small
    // file's dictionary rejects it.
    assert(ParquetBlooms.mayContainAny(spark, files, "uid",
      Seq(7919L)).toSet == Set(withBloom.head))
    // A key only the SMALL file holds: its dictionary admits it; the
    // big file's bloom rejects it.
    assert(ParquetBlooms.mayContainAny(spark, files, "uid",
      Seq(9001L)).toSet == Set(noBloom.head))
    // A key neither holds: everything pruned (modulo bloom false
    // positives on one fixed key — accept either ∅ or {bloom file}).
    val ghost = ParquetBlooms.mayContainAny(spark, files, "uid", Seq(1L))
    assert(!ghost.contains(noBloom.head),
      "an exact dictionary probe cannot have false positives")
  }

  test("duplicate and Int/Long-alias keys do not disable the exact dictionary probe") {
    // The r16 ADVICE defect: the probe's un-coercible-key guard
    // compared a SET's size to the input length, so duplicate keys
    // (or the same value arriving as both Int and Long) tripped it
    // and silently kept every dictionary-only file — conservative,
    // never wrong, but defeating the probe exactly where it should
    // help. Coercion failures are now counted explicitly.
    val root = s"${tempCorpusDir("graft_pbloom_dups")}/log"
    ManifestLog.create(spark, root)
    ParquetBlooms.declare(spark, root, Seq("uid"), expectedNdv = 300000L)
    ManifestLog.appendSorted(
      (0 until 500).map(i => (i.toLong, 9000L + i % 100))
        .toDF("ts", "uid")
        .coalesce(1).sortWithinPartitions("ts"),
      root, Nil, Some("ts"))
    val files = absFiles(root)
    assert(files.length == 1)
    // Ghost keys with a duplicate and an Int alias of a Long: the
    // dictionary holds none of them, so the file must be PRUNED.
    assert(ParquetBlooms.mayContainAny(spark, files, "uid",
      Seq(5L, 105L, 5L)).isEmpty,
      "duplicate keys disabled the dictionary probe")
    assert(ParquetBlooms.mayContainAny(spark, files, "uid",
      Seq(5, 5L)).isEmpty,
      "Int/Long aliases of one value disabled the dictionary probe")
    // A genuinely held key among duplicates still admits the file.
    assert(ParquetBlooms.mayContainAny(spark, files, "uid",
      Seq(9001L, 9001L, 1L)).toSet == files.toSet)
  }

  test("a cluster() rewrite keeps the declared filters: the z-layout stays probe-prunable") {
    val (root, all) = freshBloomLog()
    ManifestLog.cluster(spark, root, Seq("ts", "uid"), targetFileRows = 500L)
    val files = absFiles(root)
    assert(files.length == 4)
    // uid 5's rows concentrate in few z-files; the probe must admit a
    // strict subset and the keyed read must answer exactly.
    val admitted = ParquetBlooms.mayContainAny(spark, files, "uid", Seq(5L))
    assert(admitted.nonEmpty && admitted.length < files.length,
      "the clustered replacement lost its declared filters")
    assert(ManifestLog.readKeyed(spark, root, "uid", Seq(5L))
      .select("ts", "uid", "tag").as[(Long, Long, String)]
      .collect().toSeq.sorted == all.filter(_._2 == 5L).sorted)
  }

  test("maintenance rewrites keep the declared filters: compaction output stays probe-prunable") {
    val (root, _) = freshBloomLog()
    // Append a second segment into file 0's ts range, then compact the
    // range grain: the replacement file is a NEW file written by the
    // maintenance path — it must carry the declared blooms too.
    ManifestLog.appendSorted(
      Seq((10L, 9990L, "x-1"), (20L, 9991L, "x-2")).toDF("ts", "uid", "tag")
        .coalesce(1).sortWithinPartitions("ts"),
      root, Nil, Some("ts"))
    ManifestLog.compactRange(spark, root, "", "ts", 0L, 500L)
    val files = absFiles(root)
    assert(files.length == 4, s"compaction should leave 4 live files, got ${files.length}")
    val admitted = ParquetBlooms.mayContainAny(spark, files, "uid", Seq(9990L))
    assert(admitted.length < files.length,
      "the compacted replacement lost its bloom filter — probes stopped pruning")
    assert(ManifestLog.readKeyed(spark, root, "uid", Seq(9990L)).count() == 1L)
  }
}
