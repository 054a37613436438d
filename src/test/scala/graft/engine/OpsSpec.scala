package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Unit tests for the reference operator semantics (SURVEY.md §5.2):
  * the X1 null/blank/padded-token cases, X6 serialization, lenient
  * casts, NaN-vs-null (H1), explode-of-empty (H3), non-null counts (H5).
  */
class OpsSpec extends SparkTestBase {
  import sqlImplicits._

  test("X1 parseNameList: split, trim, drop empties, null → []") {
    val df = Seq(
      ("Action, Adventure ,Sci-Fi"), // padded tokens
      (" , ,Drama"),                 // leading empties
      (""),                          // blank
      (null: String),                // null
      ("Solo"),
    ).toDF("genres")
    val got = df.select(Ops.parseNameList($"genres").as("g")).collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("Action", "Adventure", "Sci-Fi"))
    assert(got(1) == Seq("Drama"))
    assert(got(2) == Seq.empty)
    assert(got(3) == Seq.empty) // clean semantics: null → [], not ['None'] (H2)
    assert(got(4) == Seq("Solo"))
  }

  test("X1 treats separator literally, not as regex") {
    val df = Seq("a.b|c").toDF("s")
    val got = df.select(Ops.parseNameList($"s", "|").as("g"))
      .collect().head.getSeq[String](0)
    assert(got == Seq("a.b", "c"))
  }

  test("X2 parseNameListParity reproduces the astype(str) quirk on demand") {
    val df = Seq(
      (null: String),       // pandas astype(str): NaN → literal 'nan' token
      ("Action, Drama"),
      (""),
    ).toDF("genres")
    val nan = df.select(Ops.parseNameListParity($"genres").as("g"))
      .collect().map(_.getSeq[String](0))
    assert(nan(0) == Seq("nan")) // the quirk: a bogus one-token list
    assert(nan(1) == Seq("Action", "Drama")) // non-null path = clean X1
    assert(nan(2) == Seq.empty) // blank (a real string) still parses to []

    // Object-None flavor ('None'), selectable per the reference's dtype.
    val none = df.select(Ops.parseNameListParity($"genres", ",", "None").as("g"))
      .collect().map(_.getSeq[String](0))
    assert(none(0) == Seq("None"))

    // The quirk token survives the reference's own F2 filter (!= ''),
    // which is exactly how it polluted movie_genre_fact.
    assert(Seq("nan").filter(_ != "").nonEmpty)
  }

  test("X6 serializeList: bracketed, no spaces, [] for empty/null") {
    val df = Seq(
      (Seq("a", "b", "c")),
      (Seq.empty[String]),
      (null: Seq[String]),
    ).toDF("l")
    val got = df.select(Ops.serializeList($"l").as("s")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("[a,b,c]", "[]", "[]"))
  }

  test("X1 ∘ X6 round-trip on the reference fixture row") {
    // FIXTURES.md example: 'Action, Adventure ,Sci-Fi' → '[Action,Adventure,Sci-Fi]'
    val df = Seq("Action, Adventure ,Sci-Fi").toDF("genres")
    val got = df.select(Ops.serializeList(Ops.parseNameList($"genres")).as("s"))
      .collect().head.getString(0)
    assert(got == "[Action,Adventure,Sci-Fi]")
  }

  test("X3/X5 lenient casts: unparseable → null (ANSI-safe)") {
    val df = Seq("2787965087", "not-a-num", "", "3.5").toDF("v")
    val doubles = df.select(Ops.lenientDouble($"v").as("d")).collect().map(r => Option(r.get(0)))
    assert(doubles.toSeq == Seq(Some(2787965087.0), None, None, Some(3.5)))
    val longs = df.select(Ops.lenientLong($"v").as("l")).collect().map(r => Option(r.get(0)))
    assert(longs(0).contains(2787965087L) && longs(1).isEmpty)
  }

  test("X4 deriveYear: lenient date parse, bad → null") {
    val df = Seq("2009-12-15", "garbage", null).toDF("d")
    val got = df.select(Ops.deriveYear($"d").as("y")).collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(Some(2009), None, None))
  }

  test("X7/X8 normalizeFloat: NaN and ±Inf → null, values pass") {
    val df = Seq(1.5, Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .toDF("x")
    val got = df.select(Ops.normalizeFloat($"x").as("n")).collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(Some(1.5), None, None, None))
  }

  test("F1/H1 notNaFilter drops both null and NaN for doubles") {
    val df = Seq(Some(7.9), None, Some(Double.NaN), Some(6.1))
      .toDF("imdb_rating")
    assert(Ops.notNaFilter(df, "imdb_rating").count() == 2)
  }

  test("G1/H3 explodePandas: empty array keeps one null row like pandas") {
    val df = Seq(
      (1, Seq("a", "b")),
      (2, Seq.empty[String]),
    ).toDF("id", "arr")
    val got = df.select($"id", Ops.explodePandas($"arr").as("v"))
      .orderBy("id", "v").collect()
    assert(got.length == 3)
    assert(got.count(_.isNullAt(1)) == 1) // the empty-array row survives as null
  }

  test("A3 nonNullCounts: one row, non-null count per column") {
    val df = Seq((Some(1), "x"), (None, "y"), (Some(3), null))
      .toDF("a", "b")
    val got = Ops.nonNullCounts(df).collect().head
    assert(got.getLong(0) == 2 && got.getLong(1) == 2)
  }
}
