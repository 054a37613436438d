package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over ArrayType(FloatType) columns — no
  * UDFs, so similarity search stays inside whole-stage codegen and
  * scales as a map-side scan.
  *
  * Floats are promoted to double BEFORE multiplication and accumulated
  * left-to-right — the same order DuckDB's list_dot_product uses on a
  * double list, which keeps results bit-comparable with the oracle.
  * The hot-path dot product is the native [[DotProductFloat]]
  * expression (one fused codegen loop, no per-row intermediate array);
  * [[dotBuiltin]] is the equivalent built-in composition, kept for
  * generic numeric arrays and as the semantics cross-check in tests.
  */
object VectorFunctions {

  import org.apache.spark.sql.graft.ColumnBridge

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two float arrays — native fused expression. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductFloat(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Winnowing-style rolling-hash fingerprint over a text column. */
  def rollingMinHash(text: Column, k: Int): Column =
    ColumnBridge.column(RollingMinHash(ColumnBridge.expression(text), k))

  /** Built-in composition with identical semantics (any numeric array). */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x,
    )

  /** L2 norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; null when either norm is zero. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    when(normA === 0 || normB === 0, lit(null))
      .otherwise(dot(a, b) / (normA * normB))
}
