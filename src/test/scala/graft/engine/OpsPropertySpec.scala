package graft.engine

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Property-style tests (SURVEY.md §5.3) with seeded generation
  * (scalatestplus bridge isn't in the offline cache, so plain seeded
  * loops stand in for ScalaCheck's driver): parse/serialize round-trip
  * on comma-free tokens; explode row-count invariant.
  */
class OpsPropertySpec extends SparkTestBase {
  import sqlImplicits._

  private val rng = new Random(42)
  private def token: String =
    (1 + rng.nextInt(8)).toString.flatMap(_ => rng.alphanumeric.take(1 + rng.nextInt(6))).mkString

  test("parseNameList matches the per-token reference semantics on fuzzed input") {
    // Reference X1: literal split, trim each token (spaces only, like
    // Spark/DuckDB trim), drop empties — the formulation the codegen-
    // friendly regex rewrite must reproduce exactly.
    def reference(s: String, sep: String): Seq[String] =
      Option(s).getOrElse("")
        .split(java.util.regex.Pattern.quote(sep), -1)
        .map(_.replaceAll("^ +| +$", ""))
        .filter(_.nonEmpty).toSeq
    val pieces = Seq("a", "bb", " ", "", "x y", "\tz", "q ", " w", "-")
    (1 to 60).foreach { _ =>
      val sep = if (rng.nextBoolean()) "," else ";"
      val s = if (rng.nextInt(10) == 0) null
      else Seq.fill(rng.nextInt(6))(pieces(rng.nextInt(pieces.length))).mkString(sep)
      val got = Seq(Tuple1(s)).toDF("s")
        .select(Ops.parseNameList($"s", sep).as("g"))
        .collect().head.getSeq[String](0)
      assert(got == reference(s, sep), s"input: ${Option(s).map("'" + _ + "'")} sep='$sep'")
    }
  }

  test("X1 ∘ X6 round-trip: parse(padded CSV of tokens) rebuilds the tokens") {
    (1 to 20).foreach { _ =>
      val toks = Seq.fill(rng.nextInt(6))(token)
      val csv = toks.mkString(" , ")
      val df = Seq(csv).toDF("s")
      val got = df.select(Ops.parseNameList($"s").as("g"))
        .collect().head.getSeq[String](0)
      assert(got == toks.filter(_.nonEmpty), s"input: '$csv'")
    }
  }

  test("serialize ∘ parse is idempotent through a second parse cycle") {
    (1 to 10).foreach { _ =>
      val toks = Seq.fill(1 + rng.nextInt(5))(token)
      val df = Seq(toks.mkString(",")).toDF("s")
      val once = Ops.serializeList(Ops.parseNameList($"s"))
      // strip brackets, re-parse, re-serialize → fixpoint
      val twice = Ops.serializeList(Ops.parseNameList(regexp_replace(once, "[\\[\\]]", "")))
      val r = df.select(once.as("a"), twice.as("b")).collect().head
      assert(r.getString(0) == r.getString(1))
    }
  }

  test("explode row-count invariant: |explode(df)| == Σ array sizes") {
    (1 to 10).foreach { _ =>
      val arrays = Seq.fill(8)(Seq.fill(rng.nextInt(5))(token))
      val df = arrays.zipWithIndex.map { case (a, i) => (i, a) }.toDF("id", "arr")
      val exploded = df.select($"id", explode($"arr").as("v")).count()
      assert(exploded == arrays.map(_.size).sum)
    }
  }
}
