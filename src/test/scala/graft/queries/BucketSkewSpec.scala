package graft.queries

import graft.{SparkTestBase, TempCorpusDirs}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew drill for the co-location pairs (VERDICT r10 item 5): bucketed
  * co-located joins bypass AQE's runtime skew splitting BY CONSTRUCTION
  * (no exchange at query time → nothing for AQE to re-plan), so the
  * skew story must hold at the LAYOUT level. This spec builds a
  * deliberately skewed synthetic corpus — one orderkey owning ~83% of
  * all lineitem rows — and pins the three facts that make the pair
  * safe to ship:
  *
  *  1. CORRECTNESS is skew-blind: the co-located join/aggregate over
  *     the bucketed pair equals the plain shuffle-join answer row for
  *     row, and still plans with zero orderkey exchanges.
  *  2. The GEOMETRY is what the scaladoc claims: a hot key hashes to
  *     exactly ONE bucket (bucketing cannot split a key — that is the
  *     co-location contract), while the uniform remainder of the corpus
  *     stays balanced across buckets; i.e. skew concentrates, it does
  *     not contaminate.
  *  3. The ESCAPE HATCH is semantics-preserving: when a key's grain
  *     outgrows one task, the two-phase salted aggregate over the SAME
  *     bucketed scan (partials on (key, salt), merge on key) returns
  *     bit-identical results — so de-hot-spotting a query is a local
  *     rewrite, never a re-layout. (TPC-H's own grain is bounded — ≤7
  *     lineitems per order — so the hatch exists for corpora whose key
  *     grain is NOT schema-bounded, e.g. events-per-entity feeds.)
  */
class BucketSkewSpec extends SparkTestBase with TempCorpusDirs {

  private val HotKey = 7777L
  private val HotRows = 20000L
  private val UniformKeys = 500L
  private val RowsPerKey = 8L

  /** Synthetic corpus: lineitem with one pathologically hot orderkey,
    * orders uniform. Written through the same parquet layout `tbl`
    * reads, so the REAL layout builders run unmodified against it.
    */
  private lazy val skewDir: String = {
    val dir = tempCorpusDir("graft-skew-corpus")
    val uniform = spark.range(UniformKeys * RowsPerKey).select(
      (col("id") % UniformKeys + 1).as("l_orderkey"),
      (col("id") % 200).as("l_partkey"),
      (col("id") % 10).as("l_suppkey"),
      (col("id") % 50 + 1).cast("double").as("l_quantity"),
      ((col("id") % 1000) * lit(1.5) + 1.0).as("l_extendedprice"),
    )
    val hot = spark.range(HotRows).select(
      lit(HotKey).as("l_orderkey"),
      (col("id") % 200).as("l_partkey"),
      (col("id") % 10).as("l_suppkey"),
      (col("id") % 50 + 1).cast("double").as("l_quantity"),
      ((col("id") % 1000) * lit(1.5) + 1.0).as("l_extendedprice"),
    )
    uniform.unionAll(hot).write.parquet(s"$dir/lineitem.parquet")
    spark.range(UniformKeys + 1).select(
      when(col("id") === UniformKeys, HotKey).otherwise(col("id") + 1).as("o_orderkey"),
      (col("id") % 97).as("o_custkey"),
      lit("O").as("o_orderstatus"),
      to_date(lit("1995-06-15")).as("o_orderdate"),
      (col("id") * lit(10.0) + 5.0).as("o_totalprice"),
    ).write.parquet(s"$dir/orders.parquet")
    dir
  }

  private def coLocatedAgg(li: DataFrame, o: DataFrame): DataFrame =
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))

  test("skewed corpus: co-located join answers match the shuffle join, zero orderkey exchanges") {
    // Broadcasts OFF: at this SF the planner would broadcast the tiny
    // synthetic orders side, which hides the exchange the test exists
    // to pin — at 100 TB nothing fact-scaled broadcasts, so the
    // at-scale geometry is sort-merge over the co-bucketed scans
    // (the LineitemLayoutSpec/PlanSpec broadcasts-off convention).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val liB = Relational.lineitemBucketed(spark, skewDir)
      val oB = Relational.ordersBucketed(spark, skewDir)
      val got = coLocatedAgg(liB, oB)

      // Plan: both sides consume the at-rest bucket distribution — the
      // join and the per-order aggregate add NO orderkey exchange, hot
      // key or not (that is precisely why AQE skew splitting never sees
      // this plan). Count via the Arguments line: formatted mode prints
      // the Exchange header and its hashpartitioning args on SEPARATE
      // lines (PlanSpec.keyExchanges documents the r11 review find).
      val p = got.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("Bucketed: true"), s"bucketed layout not in play:\n$p")
      val keyEx = p.linesIterator.count(l =>
        l.contains("Arguments: hashpartitioning(") && l.contains("orderkey"))
      assert(keyEx == 0, s"co-located join must not re-shuffle on orderkey:\n$p")

      // Answers: row-identical to the plain shuffle join over the raw
      // parquet (doubles sum in a different partition order here, so
      // compare at a rounding the grain supports).
      val raw = coLocatedAgg(
        spark.read.parquet(s"$skewDir/lineitem.parquet"),
        spark.read.parquet(s"$skewDir/orders.parquet"))
      def canon(df: DataFrame) = df
        .select(col("o_orderkey"), round(col("qty"), 6).as("qty"), col("n"))
        .orderBy("o_orderkey").collect().toSeq
      assert(canon(got) == canon(raw))
      // And the hot key really is pathological in this corpus.
      val hotN = raw.filter(col("o_orderkey") === HotKey).collect()(0).getAs[Long]("n")
      assert(hotN == HotRows)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("skew concentrates in one bucket and does not contaminate the rest") {
    val liB = Relational.lineitemBucketed(spark, skewDir)
    val perFile = liB
      .groupBy(input_file_name().as("f"))
      .agg(
        sum(when(col("l_orderkey") === HotKey, 1L).otherwise(0L)).as("hot"),
        sum(when(col("l_orderkey") === HotKey, 0L).otherwise(1L)).as("cold"),
      )
      .collect()
    // One file per bucket (the pre-write repartition pins this; the
    // sorted-scan claim in the layout scaladoc depends on it).
    assert(perFile.length == 32, s"expected 32 bucket files, got ${perFile.length}")
    // The hot key lives in exactly one bucket — bucketing never splits
    // a key. That file is the documented hot spot...
    val hotFiles = perFile.filter(_.getAs[Long]("hot") > 0)
    assert(hotFiles.length == 1, s"hot key must hash to one bucket, got ${hotFiles.length}")
    assert(hotFiles(0).getAs[Long]("hot") == HotRows)
    // ...and the uniform remainder stays balanced: no bucket holds more
    // than 3× the mean of the non-hot rows (murmur distribution over
    // 500 keys), so the damage is bounded to the hot bucket alone.
    val cold = perFile.map(_.getAs[Long]("cold"))
    val mean = cold.sum.toDouble / cold.length
    assert(cold.max <= 3 * mean,
      s"non-hot rows must stay balanced: max=${cold.max}, mean=$mean")
    assert(cold.min > 0, "every bucket should carry uniform-key rows")
  }

  test("the salted two-phase aggregate over the bucketed scan is bit-identical") {
    val liB = Relational.lineitemBucketed(spark, skewDir)
    val direct = liB.groupBy("l_orderkey")
      .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))
    // The escape hatch: partials on (key, salt) — 8 tasks share the hot
    // key's grain — then an 8-rows-per-key merge. Deterministic salt so
    // the test (and a production replay) is reproducible.
    val salted = liB
      .withColumn("__salt", pmod(hash(col("l_partkey"), col("l_suppkey")), lit(8)))
      .groupBy("l_orderkey", "__salt")
      .agg(sum("l_quantity").as("pq"), count(lit(1)).as("pn"))
      .groupBy("l_orderkey")
      .agg(sum("pq").as("qty"), sum("pn").as("n"))
    def canon(df: DataFrame) = df
      .select(col("l_orderkey"), round(col("qty"), 6).as("qty"), col("n"))
      .orderBy("l_orderkey").collect().toSeq
    assert(canon(salted) == canon(direct))
  }
}
