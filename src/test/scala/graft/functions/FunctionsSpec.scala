package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class FunctionsSpec extends SparkTestBase {
  import sqlImplicits._

  test("shingles: k-token windows, short docs fall back to whole text") {
    val df = Seq("a b c d", "a b", "solo").toDF("text")
    val got = df.select(TextFunctions.shingles(TextFunctions.tokens($"text"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b"))   // < k tokens → single whole-text shingle
    assert(got(2) == Seq("solo"))
  }

  test("stringHash60: deterministic, 60-bit range, distinct on distinct input") {
    val df = Seq("hello", "hello", "world").toDF("s")
    val got = df.select(TextFunctions.stringHash60($"s").as("h")).collect().map(_.getLong(0))
    assert(got(0) == got(1))
    assert(got(0) != got(2))
    assert(got.forall(h => h >= 0 && h < (1L << 60)))
  }

  test("minhash family is reproducible and order-independent") {
    val a = Seq((1L, "x y z w q")).toDF("doc_id", "text")
    def sig(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", explode(TextFunctions.shingles(TextFunctions.tokens($"text"), 3)).as("sh"))
      .select($"doc_id", TextFunctions.stringHash60($"sh").as("h"))
      .groupBy("doc_id")
      .agg(min(TextFunctions.minhashExpr($"h", 0)).as("m0"), min(TextFunctions.minhashExpr($"h", 1)).as("m1"))
      .collect().head
    val s1 = sig(a)
    val s2 = sig(a)
    assert(s1.getLong(1) == s2.getLong(1) && s1.getLong(2) == s2.getLong(2))
  }

  test("vector dot / norm / cosine on known values") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
    ).toDF("a", "b")
    val got = df.select(
      VectorFunctions.dot($"a", $"b").as("d"),
      VectorFunctions.l2Norm($"a").as("na"),
      VectorFunctions.cosine($"a", $"b", VectorFunctions.l2Norm($"a"), VectorFunctions.l2Norm($"b")).as("c"),
    ).collect().head
    assert(math.abs(got.getDouble(0) - 11.0) < 1e-12)
    assert(math.abs(got.getDouble(1) - math.sqrt(5)) < 1e-12)
    assert(math.abs(got.getDouble(2) - 11.0 / (math.sqrt(5) * 5.0)) < 1e-12)
  }

  test("cosine of zero vector is null, not NaN (H1 invariant)") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val got = df.select(
      VectorFunctions.cosine($"a", $"b", VectorFunctions.l2Norm($"a"), VectorFunctions.l2Norm($"b")).as("c")
    ).collect().head
    assert(got.isNullAt(0))
  }
}
