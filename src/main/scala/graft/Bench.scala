package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {

  /** One bench execution's outcome: the prepare-phase report, the
    * per-query min-of-2 timings, and the two JSON lines main prints.
    * Exposed (private[graft]) so the chaos spec can run the REAL bench
    * pipeline — prepare → timed loop → JSON assembly — against a
    * poisoned module and assert on the machine-readable degradation
    * signature instead of trusting unit-level isolation alone.
    */
  private[graft] final case class Result(
      indexSec: Double, indexFailed: Seq[String], errors: Seq[String],
      results: Seq[(String, Double)], json: String, tail: String)

  /** The bench core: prepare indexes (fault-isolated, NonFatal-only),
    * two timed passes over `queries`, min-of-2 merge, JSON assembly.
    * Everything main adds is session construction, warmup, and output.
    */
  private[graft] def run(
      spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame] = SparkEntry.queries,
  ): Result = {
    // At-rest index artifacts (shingle/signature/IVF/bucketed layouts)
    // are ingest-time work paid once per corpus — build them before the
    // timed loop and report the cost as its own metric, so per-query
    // numbers measure query evaluation, not which query sorted first.
    val idxT0 = System.nanoTime()
    // Degraded prebuilds must be machine-readable, not stderr-only: a
    // failed module's artifacts lazily rebuild inside run 1 and
    // min-of-2 hides the cost, so a small index_build_sec with a
    // non-empty failed list is the honest signature (r8's was silent).
    // NonFatal ONLY: prepareIndexes already rethrows fatal throwables
    // (OOM-class) on purpose — catching those here would run the full
    // timed loop on a possibly-corrupted JVM and commit plausible-
    // looking numbers with nothing but a crash marker as the hint.
    // Letting the fatal abort the bench (no JSON at all) is the honest
    // outcome.
    val indexFailed =
      try SparkEntry.prepareIndexes(spark, sfDir)
      catch { case scala.util.control.NonFatal(_) => Seq("prepare-indexes-crashed") }
    val indexSec = (System.nanoTime() - idxT0) / 1e9
    val indexFailedJson = indexFailed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Deterministic name order so per-query numbers compare across rounds.
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    // Driver-JVM GC time, for stall forensics: if a query's wall time
    // spikes while its GC delta stays flat, the stall was outside the
    // JVM (box contention / page cache); if GC tracks it, it's heap.
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime.max(0L)).sum
    }
    def timeAll(run: Int): Seq[(String, Double, Double)] =
      queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val g0 = gcMillis
        // noop-format write forces FULL evaluation of every column —
        // a bare count() would let Catalyst prune projection-only work
        // and under-measure map-shaped queries (VERDICT r1 caveat).
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            // A broken query must not read as a speedup: record it.
            if (!errors.contains(name)) errors += name
            System.err.println(s"[bench] $name FAILED (run $run): ${e.getMessage}")
        }
        (name, (System.nanoTime() - t0) / 1e9, (gcMillis - g0) / 1e3)
      }
    // Two timed passes, report the per-query MIN. Rationale: the
    // driver's shared box shows one-off multi-second stalls that land
    // on whichever query is executing at a fixed wall-clock offset
    // into the run (q54 absorbed 16.5 s in r3 and 27.4 s in r4 on a
    // 2.1 MB input; the identical binary measures it at ~0.6 s on an
    // idle box, and a plan read shows a single scan+agg). A stall that
    // is a property of the box, not the plan, cannot hit the same
    // query in both passes, so min-of-2 measures steady-state query
    // evaluation — which is what per-round comparisons need. Both raw
    // passes are reported for transparency.
    val run1 = timeAll(1)
    val run2 = timeAll(2)
    // Errored queries are EXCLUDED from the merged min-of-2 map (and
    // from total/median/n_queries): an analysis fast-fail's ~0.05 s is
    // not a measurement, and recording it would read as a spurious
    // speedup this round and a large regression the round it's fixed —
    // the errors array alone carries failures. The raw run1/run2 maps
    // keep every attempt for forensics.
    val results = run1.zip(run2).collect {
      case ((name, a, _), (_, b, _)) if !errors.contains(name) =>
        name -> math.min(a, b)
    }
    def qjson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // The driver archives a 2000-char TAIL of stdout, so a capture can
    // start anywhere inside this (long) line. Two consequences: every
    // gc-map entry carries its own ".gc_delta_sec" suffix (a bare
    // fragment of ~0.0 values otherwise reads as per-query seconds —
    // the r7 cross-round diff trap), and the per-query MIN map — the
    // one number cross-round comparisons need — is placed LAST so the
    // tail window lands on real seconds, not forensics.
    val gc1 = qjson(run1.map(r => (r._1 + ".gc_delta_sec") -> r._3))
    val gc2 = qjson(run2.map(r => (r._1 + ".gc_delta_sec") -> r._3))
    // q35b/q38b's timed rows include the exact twin the hash gate
    // compares against (r7 reformulation) — they no longer measure the
    // sketch path alone and are not comparable with rounds 1-6.
    val gateOnly = """["q35b_approx_distinct","q38b_approx_percentiles"]"""
    // n_queries/n_errors ride the long (persisted) line too, not just
    // the compact tail: the file artifact's headline `value` sums only
    // non-errored queries, so a cross-round diff of `value` alone would
    // silently compare different query sets without them.
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","measure":"min_of_2","n_queries":${results.size},"n_errors":${errors.size},"index_build_sec":$indexSec,"index_build_failed":$indexFailedJson,"gate_only_queries":$gateOnly,"gc_delta_sec_run1":$gc1,"gc_delta_sec_run2":$gc2,"queries_run1":${qjson(run1.map(r => r._1 -> r._2))},"queries_run2":${qjson(run2.map(r => r._1 -> r._2))},"sf":"$sfDir","errors":$errJson,"queries":${qjson(results)}}"""
    // The driver archives a 2000-char TAIL of stdout, which loses the
    // FRONT of the long line above (the r5 artifact ended inside the GC
    // map and the headline total survived only in the file). So main's
    // very last line is this compact summary — short enough to always
    // fit a tail capture whole — carrying the headline metrics.
    val sorted = results.map(_._2).sorted
    val median =
      if (sorted.isEmpty) 0.0
      else (sorted((sorted.size - 1) / 2) + sorted(sorted.size / 2)) / 2
    val maxQ = if (results.isEmpty) "null" else {
      val (n, v) = results.maxBy(_._2); s"""{"name":"$n","sec":$v}"""
    }
    val tail =
      s"""{"metric":"total","value":$total,"unit":"sec","measure":"min_of_2","n_queries":${results.size},"median_sec":$median,"max_query":$maxQ,"index_build_sec":$indexSec,"index_build_failed":$indexFailedJson,"gate_only_queries":$gateOnly,"sf":"$sfDir","errors":$errJson}"""
    Result(indexSec, indexFailed, errors.toSeq, results, json, tail)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.util.Tables.withSessionConf(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed session warmup: JVM classloading, the codegen compiler,
    // and parquet reader init otherwise land on whichever query runs
    // first (~4-5s measured at sf0.1 misattributed to one query).
    // Covers the scan/agg/shuffle path and the text path (split/
    // explode/md5) that the dedup queries JIT on first use.
    // Warmup must never kill the bench — a missing table just means
    // that path stays cold and its first query absorbs the JIT.
    def warm(f: => Unit): Unit = try f catch { case _: Throwable => () }
    warm(spark.read.parquet(s"$sfDir/nation.parquet").count())
    // Touch EVERY column of EVERY table once (full decode via a noop
    // write, not count() which prunes): first-touch page decompress +
    // per-type decoder JIT otherwise lands on whichever timed query
    // first reads a column family — the r3/r4 driver benches charged
    // the events.props first decode to q54.
    warm {
      val fs = new org.apache.hadoop.fs.Path(sfDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(sfDir))
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
        .foreach { p =>
          try spark.read.parquet(p.toString)
            .write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
        }
    }
    warm(spark.range(1000000).selectExpr("sum(id * 2)").collect())
    warm(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        .selectExpr("md5(text) AS m", "explode(split(text, ' ')) AS t")
        .groupBy("t").agg(org.apache.spark.sql.functions.count("m"))
        .count())
    // Shingle/HOF + parquet-write warmup: the higher-order shingle
    // chain (transform/sequence/element_at), conv(), and the parquet
    // write committer each pay a first-use planning/JIT tax that
    // measured 5-10 s on a cold JVM (box-dependent) — without this it
    // all lands on whichever shingle query sorts first (q64), making
    // per-query numbers incomparable across rounds/boxes.
    warm {
      import org.apache.spark.sql.functions._
      val f = graft.functions.TextFunctions
      spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          explode(array_distinct(f.shingles(f.tokens(col("text")), 3))).as("sh"))
        .select(col("doc_id"), md5(col("sh")).as("m"))
        .withColumn("h", conv(substring(col("m"), 1, 15), 16, 10).try_cast("bigint"))
        .write.mode("overwrite")
        .parquet(s"${System.getProperty("java.io.tmpdir")}/graft-bench-warm")
    }
    // First-use warmup for the remaining JIT-heavy paths the queries
    // share: the JSON parser (Jackson init + codegen, q54/q58), the
    // session-window planner (q52/q53), and the noop sink's committer.
    warm {
      import org.apache.spark.sql.functions._
      graft.util.Tables.events(spark, sfDir).limit(256)
        .select(col("user_id"), col("ts"),
          get_json_object(col("props"), "$.k").as("jk"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(
              "k", org.apache.spark.sql.types.StringType)))).as("js"))
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(col("jk")), min(col("js.k")))
        .write.format("noop").mode("overwrite").save()
    }
    val r = run(spark, sfDir)
    // Also persist to a file: a tail-capture of stdout can truncate the
    // (long) summary line mid-JSON (BENCH_r02 "parsed": null); the file
    // is immune to log interleaving and capture windows.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_SUMMARY.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(out),
      (r.json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () } // file is best-effort; stdout is the contract
    println(r.json)
    println(r.tail)
    spark.stop()
  }
}
