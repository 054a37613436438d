package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductFloat, RollingMinHash}

/** Session-extension entry point (SparkSessionExtensions): registers
  * the engine's native expressions with the SQL function registry, so
  * `spark.sql("... graft_dot_f(a, b) ...")` works alongside the
  * DataFrame API. Installed via config —
  * `spark.sql.extensions=graft.plans.GraftSparkExtensions`
  * (part of `graft.util.Tables.sessionConf`) — the standard mechanism
  * for shipping engine extensions without forking the session builder.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot_f"),
        new ExpressionInfo(
          classOf[DotProductFloat].getCanonicalName,
          null,
          "graft_dot_f",
          "graft_dot_f(a, b) - dot product of two float arrays, double accumulation",
          "",
        ),
        (children: Seq[Expression]) => DotProductFloat(children.head, children(1)),
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_rolling_min_hash"),
        new ExpressionInfo(
          classOf[RollingMinHash].getCanonicalName,
          null,
          "graft_rolling_min_hash",
          "graft_rolling_min_hash(text, k) - min Karp-Rabin hash over k-byte windows",
          "",
        ),
        (children: Seq[Expression]) =>
          RollingMinHash(
            children.head,
            children(1).eval().asInstanceOf[Number].intValue()),
      )
    )
  }
}
