package graft.util

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Property-style fuzz for the two-phase window decompositions: on
  * random frames — skewed low-card keys, heavy ties, single-row
  * groups — each helper must equal the single-window builtin it
  * replaces, row for row. The oracle gate already proves the three
  * rewired queries on one corpus; this pins the HELPER's algebra
  * (slice co-location of ties, offset merge, mid-arithmetic) against
  * the exact engine semantics on inputs chosen to break it.
  */
class TwoPhaseRankPropertySpec extends SparkTestBase {
  import sqlImplicits._

  private val rng = new Random(210)

  /** (key, v1, v2): key skewed over ≤3 values; v1 from a tiny domain so
    * tie groups are large and straddle range-partition boundaries; v2 a
    * unique id for total-order variants.
    */
  private def frame(round: Int) = {
    val n = 50 + rng.nextInt(400)
    val keys = 1 + rng.nextInt(3)
    // Skew: key 0 takes ~half the rows — the straggler shape the
    // helpers exist to balance.
    (0 until n).map { i =>
      val k = if (rng.nextInt(2) == 0) 0 else rng.nextInt(keys)
      (s"k$k", rng.nextInt(if (round % 2 == 0) 5 else 40).toDouble, i.toLong)
    }.toDF("key", "v1", "v2")
  }

  test("rankAndTotal equals rank() + count() over the builtin window, ties included") {
    (1 to 5).foreach { round =>
      val df = frame(round)
      val w = Window.partitionBy("key").orderBy(asc("v1"))
      val expected = df
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("n_g", count(lit(1)).over(Window.partitionBy("key")))
        .select("key", "v1", "v2", "rnk", "n_g")
        .as[(String, Double, Long, Long, Long)].collect().toSeq.sorted
      val got = TwoPhaseRank.rankAndTotal(spark, df, Seq("key"), Seq(asc("v1")))
        .select("key", "v1", "v2", "rnk", "n_g")
        .as[(String, Double, Long, Long, Long)].collect().toSeq.sorted
      assert(got == expected, s"round $round: rankAndTotal diverged from the builtin")
    }
  }

  test("rowNumberAndTotal equals row_number() under a total ordering") {
    (1 to 5).foreach { round =>
      val df = frame(round)
      // v2 unique → (v1 desc, v2) is total, the variant's contract.
      val w = Window.partitionBy("key").orderBy(desc("v1"), asc("v2"))
      val expected = df
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("n_g", count(lit(1)).over(Window.partitionBy("key")))
        .select("key", "v1", "v2", "rnk", "n_g")
        .as[(String, Double, Long, Long, Long)].collect().toSeq.sorted
      val got = TwoPhaseRank
        .rowNumberAndTotal(spark, df, Seq("key"), Seq(desc("v1"), asc("v2")))
        .select("key", "v1", "v2", "rnk", "n_g")
        .as[(String, Double, Long, Long, Long)].collect().toSeq.sorted
      assert(got == expected, s"round $round: rowNumberAndTotal diverged from the builtin")
    }
  }

  test("prefixSum equals the default-frame running sum, peer groups included") {
    (1 to 5).foreach { round =>
      val df = frame(round)
      // Default frame with ORDER BY = RANGE UNBOUNDED PRECEDING..CURRENT
      // ROW: a row's sum includes ALL its ordering peers — the subtle
      // semantics the decomposition must preserve through co-location.
      val w = Window.partitionBy("key").orderBy(asc("v1"))
      val expected = df
        .withColumn("psum", sum("v2").over(w))
        .select("key", "v1", "v2", "psum")
        .as[(String, Double, Long, Long)].collect().toSeq.sorted
      val got = TwoPhaseRank.prefixSum(spark, df, Seq("key"), Seq(asc("v1")), col("v2"))
        .select("key", "v1", "v2", "psum")
        .as[(String, Double, Long, Long)].collect().toSeq.sorted
      assert(got == expected, s"round $round: prefixSum diverged from the builtin")
    }
  }

  test("prefixSum matches the builtin on NULL values, all-NULL prefixes included") {
    // The builtin running sum is NULL exactly while zero non-null
    // values have been seen, then ignores later NULLs. Random NULLs
    // land on slice heads often enough to exercise the cross-slice
    // merge; key "z" pins the all-NULL-prefix case deterministically.
    (1 to 4).foreach { round =>
      val n = 100 + rng.nextInt(300)
      val df = ((0 until n).map { i =>
        val k = s"k${rng.nextInt(2)}"
        (k, rng.nextInt(6).toDouble, i.toLong,
          if (rng.nextInt(4) == 0) None else Some(rng.nextInt(100).toLong))
      } ++ Seq(
        ("z", 1.0, 100000L, None), ("z", 2.0, 100001L, None),
        ("z", 3.0, 100002L, Some(5L)), ("z", 4.0, 100003L, None),
      )).toDF("key", "v1", "v2", "v3")
      val w = Window.partitionBy("key").orderBy(asc("v1"), asc("v2"))
      val expected = df
        .withColumn("psum", sum("v3").over(w))
        .select("key", "v2", "psum")
        .as[(String, Long, Option[Long])].collect().toSeq.sorted
      val got = TwoPhaseRank
        .prefixSum(spark, df, Seq("key"), Seq(asc("v1"), asc("v2")), col("v3"))
        .select("key", "v2", "psum")
        .as[(String, Long, Option[Long])].collect().toSeq.sorted
      assert(got == expected, s"round $round: prefixSum diverged on NULL values")
    }
  }

  test("a single-row group and an empty frame stay exact") {
    val one = Seq(("a", 1.0, 1L)).toDF("key", "v1", "v2")
    val r = TwoPhaseRank.rankAndTotal(spark, one, Seq("key"), Seq(asc("v1")))
      .select("rnk", "n_g").as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L)))
    val empty = Seq.empty[(String, Double, Long)].toDF("key", "v1", "v2")
    assert(TwoPhaseRank.rankAndTotal(spark, empty, Seq("key"), Seq(asc("v1"))).count() == 0)
    assert(TwoPhaseRank.prefixSum(
      spark, empty, Seq("key"), Seq(asc("v1")), col("v2")).count() == 0)
  }
}
