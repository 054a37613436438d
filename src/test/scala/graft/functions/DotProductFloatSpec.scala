package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The native fused dot product must be value-identical to the built-in
  * zip_with/aggregate composition (same promotion, same accumulation
  * order) — that equivalence is what keeps the DuckDB oracle matches
  * valid after swapping the hot path to the custom expression.
  */
class DotProductFloatSpec extends SparkTestBase {
  import sqlImplicits._

  private def vecs(n: Int, dim: Int, seed: Int): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  test("native dot equals the built-in composition bit-for-bit") {
    val rows = vecs(200, 64, 1).zip(vecs(200, 64, 2)).map { case (a, b) => (a.toSeq, b.toSeq) }
    val df = rows.toDF("a", "b")
      .select(
        VectorFunctions.dot($"a", $"b").as("native"),
        VectorFunctions.dotBuiltin($"a", $"b").as("builtin"),
      )
    // Bit-for-bit: same double accumulation in the same order.
    assert(df.filter($"native" =!= $"builtin" ||
      ($"native".isNull =!= $"builtin".isNull)).count() == 0)
    assert(df.filter($"native".isNull).count() == 0)
  }

  test("null array propagates to null; mismatched lengths use common prefix") {
    val df = Seq(
      (Some(Seq(1f, 2f, 3f)), Some(Seq(4f, 5f, 6f))),
      (None: Option[Seq[Float]], Some(Seq(1f, 2f))),
      (Some(Seq(1f, 2f, 3f)), Some(Seq(2f))),
    ).toDF("a", "b")
    val out = df.select(VectorFunctions.dot($"a", $"b").as("d")).collect()
    assert(out(0).getDouble(0) == (4.0 + 10.0 + 18.0))
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 2.0)
  }

  test("graft_dot_f is registered in SQL via SparkSessionExtensions") {
    val r = spark.sql(
      """SELECT graft_dot_f(
        |  array(cast(1.0 as float), cast(2.0 as float)),
        |  array(cast(3.0 as float), cast(4.0 as float))) AS d""".stripMargin)
    assert(r.head().getDouble(0) == 11.0)
  }

  test("interpreted eval matches codegen (literal fold path)") {
    // Literal inputs go through the interpreted eval (ConstantFolding);
    // column inputs go through doGenCode — both must agree.
    val lit2 = spark.sql(
      """SELECT graft_dot_f(
        |  array(cast(0.5 as float), cast(-1.5 as float), cast(2.25 as float)),
        |  array(cast(4.0 as float), cast(2.0 as float), cast(-2.0 as float))) AS d""".stripMargin)
      .head().getDouble(0)
    import sqlImplicits._
    val viaCol = Seq((Seq(0.5f, -1.5f, 2.25f), Seq(4.0f, 2.0f, -2.0f))).toDF("a", "b")
      .select(VectorFunctions.dot($"a", $"b")).head().getDouble(0)
    assert(lit2 == viaCol)
  }
}
