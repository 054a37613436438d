package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The native one-pass gram-statistics expression must agree with two
  * independent oracles on fuzzed documents: a plain-Scala count (the
  * readable spec of "top multiplicity") and the declarative
  * explode → group construction it replaced in q81 (which is still
  * what the DuckDB oracle computes). Both, because the declarative
  * twin carries the shingles(t, 2) edge semantics (short docs get one
  * whole-text shingle) that the plain count must also reproduce.
  */
class GramStatsSpec extends SparkTestBase {
  import sqlImplicits._
  import TextFunctions._

  private case class Stats(nTokens: Long, topUni: Long, nBigrams: Long, topBi: Long)

  /** Plain-Scala oracle with the exact split/shingle semantics. */
  private def scalaOracle(text: String): Stats = {
    val toks = text.split(" ", -1).toSeq
    val topUni = toks.groupBy(identity).values.map(_.size).max.toLong
    val bigrams =
      if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
      else Seq(toks.mkString(" "))
    val topBi = bigrams.groupBy(identity).values.map(_.size).max.toLong
    Stats(toks.length.toLong, topUni, bigrams.length.toLong, topBi)
  }

  /** The declarative explode construction (the pre-native q81 shape). */
  private def declarative(texts: Seq[String]): Seq[Stats] = {
    val t = tokens(col("text"))
    def tag(k: Int, grams: org.apache.spark.sql.Column) =
      transform(grams, g => struct(lit(k).as("kind"), g.as("g")))
    texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
      .select(col("id"), explode(concat(tag(0, t), tag(1, shingles(t, 2)))).as("kg"))
      .groupBy(col("id"), col("kg.kind").as("kind"), col("kg.g").as("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(
        sum(when(col("kind") === 0, col("c"))).as("n_tokens"),
        max(when(col("kind") === 0, col("c"))).as("top_uni"),
        sum(when(col("kind") === 1, col("c"))).as("n_bigrams"),
        max(when(col("kind") === 1, col("c"))).as("top_bi"),
      )
      .orderBy("id")
      .collect()
      .map(r => Stats(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
  }

  private def native(texts: Seq[String]): Seq[Stats] =
    texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
      .select(col("id"), GramStats.gramStats(col("text")).as("st"))
      .orderBy("id")
      .select("id", "st.n_tokens", "st.top_uni", "st.n_bigrams", "st.top_bi")
      .collect()
      .map(r => Stats(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  test("matches the plain-Scala and declarative oracles on fuzzed documents") {
    val rng = new Random(29)
    val vocab = Array("alpha", "bravo", "a", "", "日本語", "x-y", "loop", "loop")
    val texts = (1 to 60).map { _ =>
      Seq.fill(1 + rng.nextInt(30))(vocab(rng.nextInt(vocab.length))).mkString(" ")
    } ++ Seq(
      "", "a", " ", "  ", "a  b", " leading", "trailing ",
      "x x x x x", "a b a b a b", "one two three",
    )
    val n = native(texts)
    assert(n == texts.map(scalaOracle), "native != plain-Scala oracle")
    assert(n == declarative(texts), "native != declarative explode construction")
  }

  test("interpreted eval agrees with the dataframe (codegen) path") {
    val texts = Seq("alpha bravo alpha", "", " ", "a  b c", "x x x")
    val interpreted = texts.map { t =>
      val r = GramStats.compute(org.apache.spark.unsafe.types.UTF8String.fromString(t))
      Stats(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    assert(native(texts) == interpreted)
  }

  test("registered in SQL as graft_gram_stats; null propagates") {
    val viaSql = spark.sql(
      "SELECT graft_gram_stats('a b a').top_uni AS t").collect()(0).getLong(0)
    assert(viaSql == 2L)
    val out = Seq(Some("a b"), None).toDF("t")
      .select(GramStats.gramStats($"t").as("st")).collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
  }
}
