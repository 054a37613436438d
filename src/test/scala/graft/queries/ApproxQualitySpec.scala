package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Error-bound gates for the sketch queries. Since round 7 the bound
  * itself is part of each query's DECLARED output (a within-bound
  * boolean the DuckDB oracle asserts TRUE — see the q35b/q38b
  * QueryDefs), so sketch drift fails the driver's hash gate. This spec
  * keeps the bound red-green locally and pins the boolean columns'
  * semantics: every *_in_bound must hold on the test corpus, and the
  * exact columns must agree with the exact twins (q35/q38) — i.e. the
  * reformulation didn't change what "exact" means.
  */
class ApproxQualitySpec extends SparkTestBase {

  // sf0.01: large enough that the sketches do real estimation
  // (lineitem ~60k rows, orders ~15k), small enough for unit tests.
  private val sf = "/root/testdata/sf0.01"

  test("q35b: sketch within the 5·rsd bound and exact columns match q35") {
    // approx_count_distinct(col, 0.02) is HyperLogLog++ with a target
    // relative standard deviation of 2%. The estimate is unbiased with
    // sd ≈ rsd, so |approx/exact - 1| ≤ 5·rsd = 10% is a >5σ bound —
    // far outside anything but a genuinely broken sketch, while tight
    // enough to catch an accidental rsd loosening (0.02 → 0.2 would
    // miss at ~1σ odds per group across six groups... i.e. loudly).
    val rows = SparkEntry.queries("q35b_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getBoolean(r.fieldIndex("supp_in_bound")),
        s"group ${r.getString(0)}: suppkey sketch outside 5·rsd bound")
      assert(r.getBoolean(r.fieldIndex("part_in_bound")),
        s"group ${r.getString(0)}: partkey sketch outside 5·rsd bound")
    }
    val exact = SparkEntry.queries("q35_distinct_agg")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val declared = rows.map(r => r.getString(0) ->
      (r.getLong(r.fieldIndex("n_supp")), r.getLong(r.fieldIndex("n_part")))).toMap
    assert(declared == exact,
      s"q35b's exact columns diverge from q35: $declared vs $exact")
  }

  test("q38b: sketch within the rank-error envelope and exact columns match q38") {
    // percentile_approx(col, q, 1000) guarantees rank error ≤
    // 1/accuracy = 0.001·N (Greenwald-Khanna style bound). The declared
    // booleans pin each approx pXX between the EXACT quantiles at
    // q ± 5/accuracy (5× the guaranteed rank slack — generous for
    // box-independence, still a 1%-of-rank window that a broken or
    // re-parameterized sketch cannot satisfy across all groups).
    val rows = SparkEntry.queries("q38b_approx_percentiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows; p <- Seq(25, 50, 75))
      assert(r.getBoolean(r.fieldIndex(s"p${p}_in_bound")),
        s"group ${r.getString(0)}: approx p$p outside the exact envelope")
    val exact = SparkEntry.queries("q38_percentiles")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val declared = rows.map(r => r.getString(0) -> (
      r.getDouble(r.fieldIndex("p25")), r.getDouble(r.fieldIndex("p50")),
      r.getDouble(r.fieldIndex("p75")))).toMap
    assert(declared == exact,
      s"q38b's exact columns diverge from q38: $declared vs $exact")
  }
}
