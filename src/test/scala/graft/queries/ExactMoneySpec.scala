package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the cross-engine money-arithmetic convention on PLANTED
  * rounding boundaries, so a convention regression fails
  * deterministically instead of by data luck.
  *
  * The convention (the "q154 convention", now repo-wide for every
  * TPC-H-shape money aggregate): cast each true-2-dp FACTOR to
  * DECIMAL(18,2) BEFORE multiplying, sum the exact decimal products,
  * round(…, 2) in the decimal domain, cast to double last. Both the
  * Spark plan and the DuckDB oracle then compute the identical exact
  * rational — no engine-specific double→decimal cast path can move a
  * penny. The retired convention — multiply in double, cast the
  * PRODUCT to DECIMAL(38,15) — depended on Spark's
  * shortest-representation rendering and DuckDB's float-scaling cast
  * agreeing, which they do not (~1e-11 relative), so group totals
  * landing on a .xx5 penny boundary flipped between engines.
  *
  * For the two queries whose cost factor is NOT a 2-dp value
  * (q139/q140's ps_supplycost, a full-precision min(price/qty)
  * quotient), the convention is integer-cent quantization via
  * round(double) at scale 0 — engine-identical for |v| < 2^52 because
  * every x.5 tie is exactly representable in binary, so no rounding
  * boundary can sit strictly between a double and its shortest decimal
  * representation. This spec pins the Spark half of those semantics;
  * the DuckDB half is exercised by the driver's correctness gate on
  * every round.
  */
class ExactMoneySpec extends SparkTestBase {
  import sqlImplicits._

  /** Planted boundary: 10.01 at 50% off (exact revenue 5.005) plus
    * 10.00 at no discount — the group's exact revenue sum is 15.005,
    * a .xx5 penny tie that HALF_UP must take to 15.01. The binary
    * product 10.01 × 0.5 is 5.004999999999999893… — below the tie —
    * which is exactly the regime where DuckDB's float-scaling
    * double→decimal cast rounds a penny down; the factor-cast
    * convention never consults that binary value. */
  private lazy val boundary = Seq(
    ("g", 10.01, 0.50),
    ("g", 10.00, 0.00),
  ).toDF("grp", "l_extendedprice", "l_discount")

  private val factorCastRevenue =
    round(sum(col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount")).cast("decimal(18,2)")), 2)
      .cast("double").as("revenue")

  test("factor-cast convention rounds a planted .xx5 group total half-up") {
    val got = boundary.groupBy("grp").agg(factorCastRevenue)
      .select("revenue").as[Double].head()
    assert(got == 15.01, s"exact 15.005 must round HALF_UP to 15.01, got $got")
  }

  test("retired product-cast convention lands below the planted boundary") {
    // The pre-r17 form: double product, ONE cast to DECIMAL(38,15).
    // 4.10 at 15% off is exactly 3.485, but the IEEE product
    // 4.1 × 0.85 = 3.484999999999999…, whose shortest representation
    // ("3.484999999999999") casts to 3.484999999999999 at scale 15 →
    // rounds to 3.48: a penny off the true 3.485 HALF_UP (which the
    // factor-cast convention gets right, asserted alongside). This is
    // the deterministic witness for why the migration exists; if this
    // assert ever fails, the engine's double→decimal cast semantics
    // changed and every oracle in the family needs re-auditing.
    val row = Seq(("g", 4.10, 0.15)).toDF("grp", "l_extendedprice", "l_discount")
    val (oldConv, newConv) = row.groupBy("grp")
      .agg(
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(38,15)")).cast("double"), 2).as("old"),
        factorCastRevenue,
      )
      .select(col("old"), col("revenue")).as[(Double, Double)].head()
    assert(newConv == 3.49, s"factor-cast must round exact 3.485 up, got $newConv")
    assert(oldConv == 3.48, s"retired convention expected 3.48, got $oldConv")
  }

  test("three-factor charge stays exact inside the 38-digit cap") {
    // q120's sum_charge: price × (1-disc) × (1+tax) with DECIMAL(12,2)
    // factors — exact scale-6 product, planted so the scale-6 value
    // ends in …5 at the cent: 10.01 × 0.50 × 1.10 = 5.5055 → 5.51.
    val df = Seq((10.01, 0.50, 0.10)).toDF("p", "d", "t")
    val got = df.agg(
      round(sum(col("p").cast("decimal(12,2)") *
        (lit(1) - col("d")).cast("decimal(12,2)") *
        (lit(1) + col("t")).cast("decimal(12,2)")), 2)
        .cast("double").as("charge"))
      .select("charge").as[Double].head()
    assert(got == 5.51, s"exact 5.5055 must round to 5.51, got $got")
  }

  test("scale-0 double round is half-away-from-zero on representable ties") {
    // The q139/q140 integer-cent quantization leans on round(double)
    // at scale 0 being engine-identical: x.5 is exactly representable
    // (|x| < 2^52), and Spark's HALF_UP == DuckDB's half-away there.
    val df = Seq((2.5, -2.5, 3.5)).toDF("a", "b", "c")
    val r = df.select(
      round(col("a")).cast("bigint"),
      round(col("b")).cast("bigint"),
      round(col("c")).cast("bigint")).as[(Long, Long, Long)].head()
    assert(r == ((3L, -3L, 4L)), s"half-away-from-zero expected, got $r")
  }

  test("cent quantization of a quotient-derived product is stable") {
    // ps_supplycost-shaped value: 10.01/2 = 5.004999999999999893… sits
    // below the 5.005 tie, but ×100 rounds UP to exactly 500.5 — an
    // exactly-representable tie — which quantizes half-away to 501 in
    // BOTH engines (the double is the same object end to end; no
    // decimal cast exists to disagree). Pin the Spark half; the DuckDB
    // half rides the driver gate through q139/q140.
    val df = Seq((10.01, 2L)).toDF("price", "qty")
    val cents = df.select(
      round(col("price") / col("qty") * lit(100.0)).cast("bigint"))
      .as[Long].head()
    assert(cents == 501L, s"quantized cents expected 501, got $cents")
  }

  test("decimicents→cents rounding stays exact past the 2^52 double cliff") {
    // q140's group rounding (r17 advice closed): the retired shape
    // round(CAST(sum_dm AS DOUBLE)/100)/100 was exact only while the
    // group's decimicent sum stayed below ~2^52. Planted witness:
    // dm = 72057594037928042 (> 2^56, double spacing 16) is NOT
    // representable — the decimal→double cast lands on …048, and the
    // /100 division then re-rounds …280.48 UP to the representable
    // …280.5 (double ulp at 7.2e14 is 0.125), so the double path
    // rounds to 720575940379281 cents — one cent above the true
    // …280.42 → 720575940379280. The new shape adds the sign-matched
    // half-unit and integer-divides in the exact decimal domain, so
    // the division only ever sees the true sum; both engines then cast
    // the identical integer cents to double (deterministic IEEE
    // nearest — no engine freedom left at any group magnitude).
    val df = Seq(72057594037928000L, 42L).toDF("v")
      .select(col("v").cast("decimal(38,0)").as("v"))
    val (cents, oldCents) = df.agg(sum(col("v")).as("dm"))
      .select(
        when(col("dm") >= 0, expr("(dm + 50) div 100"))
          .otherwise(-expr("(50 - dm) div 100")).as("cents"),
        round(col("dm").cast("double") / lit(100)).cast("bigint").as("old_cents"))
      .as[(Long, Long)].head()
    assert(cents == 720575940379280L,
      s"exact-domain rounding must follow the true sum, got $cents")
    assert(oldCents == 720575940379281L,
      s"retired double-path witness expected …281 (one-cent drift), got $oldCents")
    // Negative mirror: half-away-from-zero via the sign-split arm.
    val neg = Seq(-72057594037928000L, -42L).toDF("v")
      .select(col("v").cast("decimal(38,0)").as("v"))
      .agg(sum(col("v")).as("dm"))
      .select(when(col("dm") >= 0, expr("(dm + 50) div 100"))
        .otherwise(-expr("(50 - dm) div 100")).as("cents"))
      .as[Long].head()
    assert(neg == -720575940379280L, s"negative mirror must match, got $neg")
    // Small half-ties: the sign-split integer form rounds half AWAY
    // FROM ZERO on both signs (matching round(double)'s convention on
    // the magnitudes where the old path was exact).
    val ties = spark.range(1).select(
      expr("(CAST(150 AS DECIMAL(38,0)) + 50) div 100"),
      expr("-((50 - CAST(-150 AS DECIMAL(38,0))) div 100)"),
      expr("(CAST(149 AS DECIMAL(38,0)) + 50) div 100"))
      .as[(Long, Long, Long)].head()
    assert(ties == ((2L, -2L, 1L)), s"integer half-away ties expected, got $ties")
  }

  test("no oracle multiplies inside a DECIMAL(38,15) cast (family guard)") {
    // The regression this round fixed: a product cast to DECIMAL(38,15)
    // in an oracle re-introduces the engine-divergent double→decimal
    // path. Single-column (38,15) casts remain legitimate for
    // float-embedding means (Similarity), so the guard targets a
    // spaced binary `*` (the repo's multiplication style — `count(*)`
    // has no spaces) within reach of an AS DECIMAL(38,15); a bare
    // character-class regex cannot cross the nested parens of
    // `price * (1 - discount)`, which is exactly the form to catch.
    val productCast =
      """[\w)]\s\*\s[\w(][^;]{0,160}?AS\s+DECIMAL\(38,\s*15\)""".r
    val offenders = graft.SparkEntry.oracleSql.collect {
      case (name, sql) if productCast.findFirstIn(sql).isDefined => name
    }
    assert(offenders.isEmpty,
      s"product-form DECIMAL(38,15) casts found in oracles: ${offenders.mkString(", ")}")
    // Self-test: the guard must catch both retired shapes.
    assert(productCast.findFirstIn(
      "sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,15)))").isDefined)
    assert(productCast.findFirstIn(
      "sum(CAST(ps_supplycost * ps_availqty AS DECIMAL(38,15)))").isDefined)
    // …and ignore count(*) near a legitimate single-column cast.
    assert(productCast.findFirstIn(
      "count(*), sum(CAST(val AS DECIMAL(38,15)))").isEmpty)
  }
}
