package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Error-bound gates for the sketch queries that have no DuckDB oracle
  * (approx values are engine-specific, so the driver records a
  * rows-only check): pin each sketch to its DOCUMENTED error bound
  * against the exact twin on the same corpus, so a sketch that drifts
  * (a parameter change, a Spark upgrade altering defaults) goes red
  * here instead of silently degrading under the weaker rows-only gate.
  */
class ApproxQualitySpec extends SparkTestBase {

  // sf0.01: large enough that the sketches do real estimation
  // (lineitem ~60k rows, orders ~15k), small enough for unit tests.
  private val sf = "/root/testdata/sf0.01"

  test("q35b approx-distinct lands within the HLL++ error bound of exact q35") {
    // approx_count_distinct(col, 0.02) is HyperLogLog++ with a target
    // relative standard deviation of 2%. The estimate is unbiased with
    // sd ≈ rsd, so |approx/exact - 1| ≤ 5·rsd = 10% is a >5σ bound —
    // far outside anything but a genuinely broken sketch, while tight
    // enough to catch an accidental rsd loosening (0.02 → 0.2 would
    // miss at ~1σ odds per group across six groups... i.e. loudly).
    val exact = SparkEntry.queries("q35_distinct_agg")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = SparkEntry.queries("q35b_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet, s"group sets differ: $approx vs $exact")
    val bound = 5 * 0.02
    for ((g, (aSupp, aPart)) <- approx) {
      val (eSupp, ePart) = exact(g)
      val errSupp = math.abs(aSupp.toDouble / eSupp - 1)
      val errPart = math.abs(aPart.toDouble / ePart - 1)
      assert(errSupp <= bound, s"group $g suppkey: approx $aSupp vs exact $eSupp (err $errSupp)")
      assert(errPart <= bound, s"group $g partkey: approx $aPart vs exact $ePart (err $errPart)")
    }
  }

  test("q38b approx-percentiles land within the sketch's rank-error bound of exact q38") {
    // percentile_approx(col, q, 1000) guarantees rank error ≤
    // 1/accuracy = 0.001·N (Greenwald-Khanna style bound). A value
    // assertion needs the bound translated through the distribution:
    // the approx pXX must lie between the EXACT quantiles at
    // q ± 5/accuracy (5× the guaranteed rank slack — generous for
    // box-independence, still a 1%-of-rank window that a broken or
    // re-parameterized sketch cannot satisfy across all groups).
    import org.apache.spark.sql.functions._
    val slack = 5.0 / 1000
    val qs = Seq(0.25, 0.50, 0.75)
    val lowCols = qs.zipWithIndex.map { case (q, i) =>
      percentile(col("o_totalprice"), lit(math.max(0.0, q - slack))).as(s"lo$i") }
    val hiCols = qs.zipWithIndex.map { case (q, i) =>
      percentile(col("o_totalprice"), lit(math.min(1.0, q + slack))).as(s"hi$i") }
    val envelope = graft.util.Tables.tbl(spark, sf, "orders")
      .groupBy("o_orderstatus")
      .agg(lowCols.head, (lowCols.tail ++ hiCols): _*)
      .collect()
      .map(r => r.getString(0) -> (0 until 3).map(i =>
        (r.getDouble(1 + i), r.getDouble(4 + i))))
      .toMap
    val approx = SparkEntry.queries("q38b_approx_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> Seq(
        r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == envelope.keySet)
    for ((g, vals) <- approx; (v, i) <- vals.zipWithIndex) {
      val (lo, hi) = envelope(g)(i)
      assert(v >= lo && v <= hi,
        s"group $g p${qs(i)}: approx $v outside exact envelope [$lo, $hi]")
    }
  }
}
