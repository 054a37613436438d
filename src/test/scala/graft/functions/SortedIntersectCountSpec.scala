package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The native merge-walk intersection count must equal the built-in
  * `size(array_intersect(a, b))` on its contract inputs — asc-sorted,
  * distinct, null-free bigint arrays (what `sort_array(collect_set(h))`
  * produces) — since that built-in composition is what the DuckDB
  * oracle CTEs of the near-dup family were validated against before
  * the r21 hot-path swap in `jaccardOfCandidates`.
  */
class SortedIntersectCountSpec extends SparkTestBase {
  import sqlImplicits._

  private def sortedSet(rnd: scala.util.Random, n: Int, range: Long): Seq[Long] =
    Seq.fill(n)(rnd.nextLong() % range).distinct.sorted

  test("fuzz: native count equals size(array_intersect) on sorted distinct arrays") {
    val rnd = new scala.util.Random(421)
    val rows = Seq.fill(300) {
      // Overlapping ranges so intersections are non-trivial; sizes
      // span empty to a few thousand (the doc-shingle-set scale).
      val n1 = rnd.nextInt(60)
      val n2 = rnd.nextInt(60)
      (sortedSet(rnd, n1, 40), sortedSet(rnd, n2, 40))
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(-5L, 0L, 7L), Seq(-5L, 7L)))
    val df = rows.toDF("a", "b").select(
      TextFunctions.sortedIntersectCount($"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).cast("long").as("builtin"),
    )
    assert(df.filter($"native" =!= $"builtin").count() == 0)
    // Sanity: the fuzz actually produced non-zero intersections.
    assert(df.filter($"native" > 0).count() > 50)
  }

  test("null array propagates to null") {
    val df = Seq(
      (Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (None: Option[Seq[Long]], Some(Seq(1L))),
      (Some(Seq(1L, 2L)), Some(Seq(2L, 3L))),
    ).toDF("a", "b")
    val out = df.select(
      TextFunctions.sortedIntersectCount($"a", $"b").as("c")).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0))
    assert(out(2).getLong(0) == 1L)
  }

  test("interpreted eval (literal fold) matches codegen (column path)") {
    val viaSql = spark.sql(
      """SELECT graft_sorted_intersect_count(
        |  array(1L, 3L, 5L, 9L), array(3L, 4L, 9L, 11L)) AS c""".stripMargin)
      .head().getLong(0)
    val viaCol = Seq((Seq(1L, 3L, 5L, 9L), Seq(3L, 4L, 9L, 11L))).toDF("a", "b")
      .select(TextFunctions.sortedIntersectCount($"a", $"b").as("c"))
      .head().getLong(0)
    assert(viaSql == 2L && viaCol == 2L)
  }
}
