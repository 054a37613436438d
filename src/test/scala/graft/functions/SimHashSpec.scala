package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The native one-pass SimHash must be bit-identical to the
  * declarative explode + bit-balance + reassembly construction it
  * replaces — that equivalence is what keeps the q66/q80 oracles (which
  * still compute the declarative form in DuckDB) honest.
  */
class SimHashSpec extends SparkTestBase {
  import sqlImplicits._
  import TextFunctions._

  /** The declarative construction, as a DataFrame over one column. */
  private def declarative(texts: Seq[String], bits: Int): Seq[Long] = {
    val tok = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), explode(tokens(col("t"))).as("tok"))
      .withColumn("h", stringHash60(col("tok")))
    val balanceAggs = (0 until bits).map(j => sum(simhashBitTerm(col("h"), j)).as(s"b$j"))
    tok.groupBy("id")
      .agg(balanceAggs.head, balanceAggs.tail: _*)
      .select(col("id"), simhashFromBalances((0 until bits).map(j => col(s"b$j"))).as("sig"))
      .orderBy("id")
      .collect().map(_.getLong(1)).toSeq
  }

  private def native(texts: Seq[String], bits: Int): Seq[Long] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), simhashNative(col("t"), bits).as("sig"))
      .orderBy("id")
      .collect().map(_.getLong(1)).toSeq

  test("matches the declarative construction on fuzzed strings (32 and 60 bits)") {
    val rng = new Random(17)
    val vocab = Array("alpha", "bravo", "a", "", "日本語", "x-y", "tok42")
    val texts = (1 to 40).map { _ =>
      Seq.fill(rng.nextInt(25))(vocab(rng.nextInt(vocab.length))).mkString(" ")
    } ++ Seq("", "a", " ", "  ", "a  b", " leading", "trailing ")
    Seq(32, 60).foreach { bits =>
      assert(native(texts, bits) == declarative(texts, bits), s"bits=$bits")
    }
  }

  test("interpreted eval agrees with codegen") {
    val texts = Seq("alpha bravo alpha", "", " ", "a  b c")
    // Interpreted path: call compute() directly (what nullSafeEval does).
    val interpreted = texts.map(t =>
      SimHash.compute(org.apache.spark.unsafe.types.UTF8String.fromString(t), 60))
    assert(native(texts, 60) == interpreted)
  }

  test("registered in SQL as graft_simhash") {
    val viaSql = spark.sql("SELECT graft_simhash('alpha bravo alpha', 60) AS sig")
      .collect()(0).getLong(0)
    assert(viaSql == SimHash.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("alpha bravo alpha"), 60))
    // Non-constant / wrong-arity bits argument is rejected at plan time.
    intercept[Exception] {
      spark.sql("SELECT graft_simhash('a', cast(rand() * 10 AS INT)) AS sig").collect()
    }
  }

  test("null propagates") {
    val out = Seq(Some("a b"), None).toDF("t")
      .select(simhashNative($"t", 60).as("sig")).collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
  }
}
