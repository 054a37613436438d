package graft.functions

import scala.util.Random

import graft.SparkTestBase

/** The native rolling fingerprint must equal a brute-force reference
  * (re-hash every window from scratch) on arbitrary byte content —
  * that equivalence is what the O(1) rolling update has to preserve.
  */
class RollingMinHashSpec extends SparkTestBase {
  import sqlImplicits._

  private val M = RollingMinHash.M
  private val B = RollingMinHash.B

  /** Brute-force reference: hash each k-byte window independently. */
  private def reference(s: String, k: Int): Long = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.isEmpty) return 0L
    val w = math.min(k, bytes.length)
    (0 to bytes.length - w).map { i =>
      bytes.slice(i, i + w).foldLeft(0L)((h, b) => (h * B + (b & 0xff)) % M)
    }.min
  }

  test("matches the brute-force reference on fuzzed strings (incl. multi-byte)") {
    val rng = new Random(11)
    val alphabets = Seq("abc", "abcdefgh XYZ,.-", "äöü€日本語a b")
    (1 to 80).foreach { _ =>
      val alpha = alphabets(rng.nextInt(alphabets.length))
      val s = Seq.fill(rng.nextInt(60))(alpha(rng.nextInt(alpha.length))).mkString
      val k = 1 + rng.nextInt(20)
      val got = Seq(s).toDF("t")
        .select(VectorFunctions.rollingMinHash($"t", k).as("h"))
        .head().getLong(0)
      assert(got == reference(s, k), s"s='$s' k=$k")
    }
  }

  test("empty string hashes to 0; null propagates; short text hashes whole content") {
    val df = Seq(Some(""), None, Some("ab")).toDF("t")
    val out = df.select(VectorFunctions.rollingMinHash($"t", 16).as("h")).collect()
    assert(out(0).getLong(0) == 0L)
    assert(out(1).isNullAt(0))
    assert(out(2).getLong(0) == reference("ab", 16))
  }

  test("appending content never raises the fingerprint (window-superset property)") {
    val rng = new Random(12)
    (1 to 20).foreach { _ =>
      val s = Seq.fill(30 + rng.nextInt(30))(('a' + rng.nextInt(26)).toChar).mkString
      val t = Seq.fill(rng.nextInt(20))(('a' + rng.nextInt(26)).toChar).mkString
      val Array(f1, f2) = Seq((s, s + t)).toDF("a", "b")
        .select(
          VectorFunctions.rollingMinHash($"a", 8),
          VectorFunctions.rollingMinHash($"b", 8),
        ).head() match { case r => Array(r.getLong(0), r.getLong(1)) }
      assert(f2 <= f1, s"appending raised the fingerprint: $f1 -> $f2")
    }
  }

  test("registered in SQL as graft_rolling_min_hash") {
    val viaSql = spark.sql("SELECT graft_rolling_min_hash('hello world rolling', 8) AS h")
      .head().getLong(0)
    assert(viaSql == reference("hello world rolling", 8))
  }
}
