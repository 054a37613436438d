package graft.functions

import scala.util.Random

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Property-style invariants (seeded loops — the scalatestplus bridge
  * isn't in the offline cache) for the text/vector primitives the dedup
  * and similarity pipelines build on: the properties that, if silently
  * broken, corrupt candidate generation rather than crash.
  */
class TextFunctionsPropertySpec extends SparkTestBase {
  import sqlImplicits._

  private val rng = new Random(7)
  private def token: String = rng.alphanumeric.take(1 + rng.nextInt(8)).mkString

  test("shingle count is max(1, n-k+1); shingles are consecutive k-windows") {
    (1 to 25).foreach { _ =>
      val toks = Seq.fill(rng.nextInt(12))(token)
      val k = 2 + rng.nextInt(4)
      val sh = Seq(Tuple1(toks)).toDF("toks")
        .select(TextFunctions.shingles($"toks", k).as("sh"))
        .head().getSeq[String](0)
      assert(sh.length == math.max(1, toks.length - k + 1), s"toks=$toks k=$k")
      if (toks.length >= k)
        sh.zipWithIndex.foreach { case (s, i) =>
          assert(s == toks.slice(i, i + k).mkString(" "), s"i=$i toks=$toks k=$k")
        }
      else assert(sh == Seq(toks.mkString(" ")))
    }
  }

  test("orderedPairs yields exactly the i<j position pairs, duplicates preserved") {
    // The bounded-set pair primitive behind q67/q74: every unordered
    // pair once (by position, so equal VALUES still pair — candidate
    // generation must not silently dedup a doc list), no self-pairs,
    // empty and singleton arrays yield no pairs.
    (1 to 25).foreach { _ =>
      val xs = Seq.fill(rng.nextInt(8))(token)
      val got = Seq(Tuple1(xs)).toDF("xs")
        .select(TextFunctions.orderedPairs($"xs").as("p"))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getString(1)))
      val want = for {
        i <- xs.indices; j <- (i + 1) until xs.length
      } yield (xs(i), xs(j))
      assert(got == want, s"xs=$xs")
    }
  }

  test("stringHash60 stays in [0, 2^60) and is deterministic") {
    val toks = Seq.fill(50)(token)
    val hash = (ts: Seq[String]) =>
      ts.toDF("t").select(TextFunctions.stringHash60($"t").as("h"))
        .collect().map(_.getLong(0)).toSeq
    val out = hash(toks)
    assert(out.forall(h => h >= 0L && h < (1L << 60)))
    assert(out == hash(toks))
  }

  test("minhash values stay in [0, P) across the full hash family") {
    val hashes = Seq(0L, 1L, 12345L, (1L << 60) - 1, 987654321987L) ++
      Seq.fill(20)(math.abs(rng.nextLong()) % (1L << 60))
    val df = hashes.toDF("h")
    (0 until 16).foreach { i =>
      val vals = df.select(TextFunctions.minhashExpr($"h", i).as("m"))
        .collect().map(_.getLong(0))
      assert(vals.forall(m => m >= 0 && m < TextFunctions.MinhashP), s"i=$i")
    }
  }

  test("native dot: symmetric bit-for-bit, ~linear under scalar doubling") {
    (1 to 15).foreach { _ =>
      val a = Seq.fill(16)(rng.nextFloat() * 20f - 10f)
      val b = Seq.fill(16)(rng.nextFloat() * 20f - 10f)
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        VectorFunctions.dot($"a", $"b"),
        VectorFunctions.dot($"b", $"a"),
        VectorFunctions.dot(transform($"a", x => (x * 2f).cast("float")), $"b"),
      ).head()
      val (ab, ba, doubled) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(ab == ba) // same accumulation order ⇒ bit-equal symmetry
      assert(math.abs(doubled - 2.0 * ab) <= 1e-4,
        s"doubling not ~linear: $doubled vs ${2.0 * ab}")
    }
  }
}
