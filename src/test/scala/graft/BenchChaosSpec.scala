package graft

/** End-to-end degradation drill for the bench harness — the r8 failure
  * signature (a module's broken prebuild masquerading as a fast bench)
  * exercised through the REAL pipeline, not just unit isolation:
  * poison ONE module's prebuild (the chaos hook in
  * SparkEntry.prepareIndexes), run Bench's actual core (prepare →
  * two timed passes → JSON assembly) on a cross-module query sample,
  * and assert the machine-readable signature comes out right:
  * `index_build_failed:["events"]` in the JSON line, every other
  * module's queries timed clean, AND the poisoned family still
  * answers (its artifacts lazily rebuild — degraded means slower
  * run 1, never wrong or absent).
  */
class BenchChaosSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  // One query per module family, plus one events query whose artifact
  // chain the poisoned prebuild would have built: small enough for a
  // unit test, wide enough that "the other modules bench clean" means
  // something.
  private val sample = Seq(
    "q20_join_broadcast", // relational
    "q60_exact_dedup", // textops
    "q68_knn_bruteforce", // similarity
    "q145_scd2_merge", // events — reads the sorted log + SCD2 base
  )

  override def afterAll(): Unit = {
    sys.props -= "graft.test.poison-module"
    super.afterAll()
  }

  test("a poisoned events prebuild degrades visibly and nothing else breaks") {
    sys.props("graft.test.poison-module") = "events"
    try {
      val r = Bench.run(spark, sf,
        SparkEntry.queries.view.filterKeys(sample.contains).toMap)
      // The honest signature: the failure is IN the artifact...
      assert(r.indexFailed == Seq("events"),
        s"poisoned module must be reported, alone: ${r.indexFailed}")
      assert(r.json.contains("\"index_build_failed\":[\"events\"]"),
        s"bench JSON must carry the degradation marker: ${r.json.take(300)}")
      assert(r.tail.contains("\"index_build_failed\":[\"events\"]"),
        "the tail-capture summary must carry the marker too")
      // ...and it is a DEGRADATION, not an outage: every sampled query
      // (the events one included — its artifacts lazily rebuilt) timed
      // without error.
      assert(r.errors.isEmpty, s"no query may error: ${r.errors}")
      assert(r.results.map(_._1).sorted == sample.sorted,
        s"all sampled queries must report timings: ${r.results.map(_._1)}")
    } finally sys.props -= "graft.test.poison-module"
  }

  test("with the poison lifted the same pipeline reports a healthy build") {
    val r = Bench.run(spark, sf,
      SparkEntry.queries.view.filterKeys(Set("q20_join_broadcast")).toMap)
    assert(r.indexFailed.isEmpty, s"healthy prebuild must report no failures: ${r.indexFailed}")
    assert(r.json.contains("\"index_build_failed\":[]"), r.json.take(300))
    assert(r.errors.isEmpty && r.results.nonEmpty)
  }

  test("the frozen baseline roster names only declared queries, all 43 of them") {
    // A rename in SparkEntry would silently shrink baseline43_n and
    // the gate subtotal with it — the dangling-allowance failure mode
    // (PlanAuditSpec) applied to the bench roster.
    assert(Bench.Baseline43.size == 43)
    assert(Bench.Baseline43.distinct.size == 43, "roster must not repeat names")
    val undeclared = Bench.Baseline43.filterNot(SparkEntry.queries.keySet)
    assert(undeclared.isEmpty,
      s"baseline roster names undeclared queries (renamed? removed?): $undeclared")
  }

  test("both JSON lines carry the like-for-like gate fields (r10 verdict item 1)") {
    val sample = Set("q20_join_broadcast", "q145_scd2_merge")
    val r = Bench.run(spark, sf,
      SparkEntry.queries.view.filterKeys(sample.contains).toMap)
    // The 2× gate reads baseline43_sec, never `value`; measure names
    // the three-pass merge so a cross-round diff knows what it compares.
    Seq(r.json, r.tail).foreach { line =>
      assert(line.contains("\"measure\":\"min_of_3_interleaved\""), line.take(300))
      assert(line.contains("\"baseline43_sec\":"), line.take(300))
      assert(line.contains("\"baseline43_n\":"), line.take(300))
    }
    // On this sample only q20 is in the frozen roster: the subtotal
    // counts it alone — partial runs must SAY they are partial.
    assert(r.json.contains("\"baseline43_n\":1"), r.json.take(400))
    val b43 = r.json.split("\"baseline43_sec\":")(1).split(",")(0).toDouble
    val q20 = r.results.toMap.apply("q20_join_broadcast")
    assert(math.abs(b43 - q20) < 1e-9,
      s"subset subtotal must equal the roster queries' min sum: $b43 vs $q20")
  }

  test("the per-query regression gate trips on ratio AND slack off the committed ref") {
    // loadRef parses the committed BENCH_REF.json (name→seconds under
    // "ref"; the _comment string can't match the number-valued regex).
    val ref = Bench.loadRef("BENCH_REF.json")
    assert(ref.size >= 100, s"committed reference unexpectedly small: ${ref.size}")
    assert(!ref.contains("_comment"), "string fields must not parse as entries")
    // Threshold semantics — BOTH conditions must trip (the manual
    // 1.4×-and-0.25 s review rule, now machine-applied):
    def trips(sec: Double, r: Double) =
      sec > r * Bench.RegressionRatio && sec - r > Bench.RegressionSlackSec
    assert(trips(1.0, 0.5), "2.0x and +0.5 s is a regression")
    assert(!trips(0.30, 0.10), "3x on a tiny query is box noise, not a regression")
    assert(!trips(10.3, 10.0), "+0.3 s at 1.03x is drift, not a regression")
    // Missing file → empty map → the gate reports nothing, never throws.
    assert(Bench.loadRef("/nonexistent/ref.json").isEmpty)
    // Both JSON lines carry the gate fields so the driver tail capture
    // and the file artifact each stand alone.
    val sample = Set("q20_join_broadcast")
    val r = Bench.run(spark, sf,
      SparkEntry.queries.view.filterKeys(sample.contains).toMap)
    Seq(r.json, r.tail).foreach { line =>
      assert(line.contains("\"n_regressions\":"), line.take(300))
    }
    // The long line carries the FULL map; the tail only the worst-8
    // (a noisy box can flag dozens and the tail must fit the driver's
    // 2000-char capture window whole).
    assert(r.json.contains("\"regressions\":"), r.json.take(300))
    assert(r.tail.contains("\"regressions_worst\":"), r.tail.take(300))
  }

  test("the x10 heavy-slice section rides both lines when a scale dir is set") {
    // The corpus doubles as its own "x10" dir here: the section's
    // contract is structural (prepare the roster's modules there, time
    // the roster's intersection with the query map min-of-2, compare
    // against BENCH_REF's x10_ref object), not about actual scale.
    val sample = Set("q154_dfp_join", "q20_join_broadcast")
    val r = Bench.run(spark, sf,
      SparkEntry.queries.view.filterKeys(sample.contains).toMap,
      x10Dir = Some(sf))
    val xIdx = r.json.indexOf("\"x10\":{")
    assert(xIdx >= 0, s"long line must carry the x10 object: ${r.json.take(300)}")
    val xObj = r.json.substring(xIdx, r.json.indexOf("}}", xIdx) + 2)
    // Only the roster ∩ query-map runs at x10: q154 yes, q20 no.
    assert(xObj.contains("\"n_queries\":1"), xObj)
    assert(xObj.contains("\"q154_dfp_join\":"), xObj)
    assert(!xObj.contains("\"q20_join_broadcast\""), xObj)
    assert(xObj.contains("\"measure\":\"min_of_2\""), xObj)
    assert(xObj.contains("\"n_regressions\":"), xObj)
    assert(r.tail.contains("\"x10\":{"), r.tail.take(400))
    // Unset env/param → no section at all (the driver's lean bench).
    val r2 = Bench.run(spark, sf,
      SparkEntry.queries.view.filterKeys(Set("q20_join_broadcast")).toMap,
      x10Dir = None)
    assert(!r2.json.contains("\"x10\""), r2.json.take(300))
    assert(!r2.tail.contains("\"x10\""), r2.tail.take(300))
  }

  test("loadRef scopes to the named object and rejects non-query keys") {
    // r17 advice: a top-level numeric field or a "name":number pair in
    // the _comment prose must not become a reference time; the x10_ref
    // object must load independently of ref.
    val f = java.nio.file.Files.createTempFile("benchref", ".json")
    java.nio.file.Files.writeString(f,
      """{"_comment":"q99_fake:1.5 and \"q98_fake\":2.5 in prose",
        |"total_sec":12.5,
        |"ref":{"q01_a":0.5,"q02_b":1.25,"not_a_query":3.0},
        |"x10_ref":{"q67_ngram_jaccard":4.5}}""".stripMargin)
    val ref = Bench.loadRef(f.toString)
    assert(ref == Map("q01_a" -> 0.5, "q02_b" -> 1.25), ref)
    val x = Bench.loadRef(f.toString, "x10_ref")
    assert(x == Map("q67_ngram_jaccard" -> 4.5), x)
    assert(Bench.loadRef(f.toString, "absent_key").isEmpty)
    java.nio.file.Files.delete(f)
  }
}
