package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing-style document fingerprint —
  * the MINIMUM Karp-Rabin rolling hash over all `k`-byte windows of
  * the UTF-8 text, in one pass with O(1) per-byte updates
  * (h' = (h − oldByte·B^(k−1))·B + newByte mod M).
  *
  * This is the "rolling hash" fingerprint proper: near-identical
  * documents share their minimizing window, so equal fingerprints are
  * strong near-dup candidates, and the pass is O(bytes) regardless of
  * k — unlike the shingle-table construction (q64), which materializes
  * one row per window. No built-in composition can express the O(1)
  * rolling update (aggregate() would re-hash each window from
  * scratch, O(bytes·k)); that is exactly the "custom Expression" tier
  * of the extension ladder.
  *
  * Texts shorter than k bytes hash their whole content; empty/null
  * behave as null-propagating (standard UnaryExpression) with empty →
  * 0. Constants: B = 131, M = 1e9+7 — all intermediates fit in a long
  * (255·M and M·B are both < 2^63).
  */
case class RollingMinHash(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "window size k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_rolling_min_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    if (n == 0) return 0L
    val M = RollingMinHash.M
    val B = RollingMinHash.B
    val w = math.min(k, n)
    var bk = 1L
    var j = 1
    while (j < w) { bk = bk * B % M; j += 1 }
    var h = 0L
    j = 0
    while (j < w) { h = (h * B + (s.getByte(j) & 0xff)) % M; j += 1 }
    var min = h
    var i = w
    while (i < n) {
      h = (h - (s.getByte(i - w) & 0xff) * bk % M + M) % M
      h = (h * B + (s.getByte(i) & 0xff)) % M
      if (h < min) min = h
      i += 1
    }
    min
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx, ev,
      s => {
        val n = ctx.freshName("n")
        val w = ctx.freshName("w")
        val bk = ctx.freshName("bk")
        val h = ctx.freshName("h")
        val min = ctx.freshName("min")
        val i = ctx.freshName("i")
        s"""
          |int $n = $s.numBytes();
          |if ($n == 0) { ${ev.value} = 0L; } else {
          |  int $w = java.lang.Math.min($k, $n);
          |  long $bk = 1L;
          |  for (int $i = 1; $i < $w; $i++) $bk = $bk * ${RollingMinHash.B}L % ${RollingMinHash.M}L;
          |  long $h = 0L;
          |  for (int $i = 0; $i < $w; $i++)
          |    $h = ($h * ${RollingMinHash.B}L + ($s.getByte($i) & 0xff)) % ${RollingMinHash.M}L;
          |  long $min = $h;
          |  for (int $i = $w; $i < $n; $i++) {
          |    $h = ($h - ($s.getByte($i - $w) & 0xff) * $bk % ${RollingMinHash.M}L + ${RollingMinHash.M}L) % ${RollingMinHash.M}L;
          |    $h = ($h * ${RollingMinHash.B}L + ($s.getByte($i) & 0xff)) % ${RollingMinHash.M}L;
          |    if ($h < $min) $min = $h;
          |  }
          |  ${ev.value} = $min;
          |}
        """.stripMargin
      },
    )

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  val M: Long = 1000000007L
  val B: Long = 131L
}
