package graft.util

import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Early-warning canary for corpus drift. The driver regenerates the
  * test corpus between rounds and has ALREADY changed a column's
  * physical type once (events.ts ns→µs before round 9) — that drift
  * surfaced as 20 erroring queries and 12 red tests sharing one
  * cryptic analysis error. This suite pins, per table, the
  * load-bearing columns and the TYPE FAMILY the engine can absorb, so
  * the next regeneration fails here first, as one test naming the
  * exact table.column and observed type.
  *
  * Families are deliberately loose where the code is genuinely
  * adaptive (events.ts may be long-nanos, NTZ, or UTC timestamp — the
  * loader branches) and deliberately strict where silent coercion
  * would be WRONG rather than broken: a date column arriving as plain
  * long must fail review, because ANSI `cast(long as timestamp)`
  * reads SECONDS and would shift every instant by 10^6 without a
  * single error. Fractional columns arriving as DECIMAL also fail:
  * aggregate result types change (the driver hash-compares serialized
  * types), and the double-domain exactness arguments (integral-double
  * sums, bit-deterministic division) need re-review in decimal.
  */
class CorpusDriftCanarySpec extends SparkTestBase {

  // Same env var the entry points read (Verify/Bench), so the canary
  // follows a relocated corpus instead of pinning a machine-specific
  // path; the default matches the smoke-tier fixture.
  private val sf =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  private def integral(dt: DataType) = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def frac(dt: DataType) = dt match {
    case FloatType | DoubleType => true
    case _ => false
  }
  private def str(dt: DataType) = dt == StringType
  // events.ts: every branch Tables.events adapts to.
  private def tsAdaptive(dt: DataType) = dt match {
    case LongType | TimestampNTZType | TimestampType => true
    case _ => false
  }
  // Date-like columns the queries compare against bare-column literals
  // (the pushdown form): only the timestamp types the code actually
  // handles pass. A plain integer would coerce to WRONG instants, and
  // DATE — though semantically coercible — would wrap every boundary
  // compare in an implicit cast that kills the pushed filter and the
  // plan pins; neither is an adaptive seam today, so both must fail
  // here for review rather than downstream.
  private def tsStrict(dt: DataType) = dt match {
    case TimestampNTZType | TimestampType => true
    case _ => false
  }
  private def floatVec(dt: DataType) = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  private val expected: Seq[(String, Seq[(String, String, DataType => Boolean)])] = Seq(
    "region" -> Seq(("r_regionkey", "integral", integral), ("r_name", "string", str)),
    "nation" -> Seq(("n_nationkey", "integral", integral), ("n_name", "string", str),
      ("n_regionkey", "integral", integral)),
    "customer" -> Seq(("c_custkey", "integral", integral), ("c_name", "string", str),
      ("c_nationkey", "integral", integral), ("c_acctbal", "float", frac),
      ("c_mktsegment", "string", str)),
    "supplier" -> Seq(("s_suppkey", "integral", integral), ("s_name", "string", str),
      ("s_nationkey", "integral", integral), ("s_acctbal", "float", frac)),
    "part" -> Seq(("p_partkey", "integral", integral), ("p_name", "string", str),
      ("p_brand", "string", str), ("p_type", "string", str),
      ("p_size", "integral", integral), ("p_retailprice", "float", frac)),
    "orders" -> Seq(("o_orderkey", "integral", integral), ("o_custkey", "integral", integral),
      ("o_orderstatus", "string", str), ("o_totalprice", "float", frac),
      ("o_orderdate", "timestamp", tsStrict), ("o_orderpriority", "string", str)),
    "lineitem" -> Seq(("l_orderkey", "integral", integral), ("l_partkey", "integral", integral),
      ("l_suppkey", "integral", integral), ("l_linenumber", "integral", integral),
      ("l_quantity", "float", frac), ("l_extendedprice", "float", frac),
      ("l_discount", "float", frac), ("l_tax", "float", frac),
      ("l_returnflag", "string", str), ("l_linestatus", "string", str),
      ("l_shipdate", "timestamp", tsStrict)),
    "events" -> Seq(("event_id", "integral", integral),
      ("ts", "long-nanos|ntz|timestamp", tsAdaptive),
      ("user_id", "integral", integral), ("event_type", "string", str),
      ("value", "float", frac), ("props", "string", str)),
    "documents" -> Seq(("doc_id", "integral", integral), ("text", "string", str),
      ("lang", "string", str), ("source", "string", str),
      ("n_chars", "integral", integral)),
    "embeddings" -> Seq(("vec_id", "integral", integral),
      ("embedding", "array<float>", floatVec), ("label", "integral", integral)),
  )

  test("every load-bearing corpus column exists in a type family the engine absorbs") {
    val drift = expected.flatMap { case (table, cols) =>
      val schema = Tables.tbl(spark, sf, table).schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      cols.flatMap { case (col, family, ok) =>
        byName.get(col) match {
          case None => Some(s"$table.$col MISSING (expected $family); table now: ${schema.simpleString}")
          case Some(dt) if !ok(dt) =>
            Some(s"$table.$col drifted to ${dt.simpleString} (supported family: $family)")
          case _ => None
        }
      }
    }
    assert(drift.isEmpty,
      "corpus drift detected — extend the adaptive seam (Tables.events pattern) or " +
        "re-review the affected domain BEFORE trusting downstream failures:\n  " +
        drift.mkString("\n  "))
  }
}
