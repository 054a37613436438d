package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `bits`-wide SimHash of a document in one
  * O(tokens) map-side pass.
  *
  * Bit-for-bit equivalent to the declarative construction in
  * [[TextFunctions]] (split on single space keeping empties, md5-based
  * 60-bit token hash = first 15 hex chars as a long, +1/−1 balance per
  * token OCCURRENCE for each bit, signature bit set iff balance > 0) —
  * SimHashSpec fuzz-asserts the equivalence. The declarative form
  * explodes every token occurrence and shuffles 60 partial sums per
  * document through a groupBy; this expression computes the signature
  * WHERE THE ROW IS, so signature generation over 100 TB is
  * embarrassingly parallel with zero exchange — the same justification
  * tier as [[RollingMinHash]] (the per-token digest loop has no
  * built-in composition that avoids the explode).
  *
  * Codegen emits a call to the static [[SimHash.compute]] rather than
  * inlining the MD5 loop — the call stays inside whole-stage codegen
  * (one virtual-free static invoke per row, same shape as Spark's own
  * digest expressions which call into commons-codec).
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  require(bits > 0 && bits <= 60, "bits must be in 1..60 (the token hash is 60 bits)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx, ev,
      s => s"${ev.value} = graft.functions.SimHash.compute($s, $bits);",
    )

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5-based token hash — the byte-level twin of
    * [[TextFunctions.stringHash60]]: first 15 hex chars of the digest
    * = the top 7.5 bytes, big-endian.
    */
  private def hash60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    // 15 hex chars = bytes 0..6 in full plus the high nibble of byte 7.
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** One-pass SimHash over space-separated tokens (empties kept, like
    * split(text, ' ') with limit −1). Public: called from generated
    * code.
    */
  def compute(text: UTF8String, bits: Int): Long = {
    val bal = new Array[Int](bits)
    val b = text.getBytes
    var start = 0
    var i = 0
    val n = b.length
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        val h = hash60(java.util.Arrays.copyOfRange(b, start, i))
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) bal(j) += 1 else bal(j) -= 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (bal(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }
}
