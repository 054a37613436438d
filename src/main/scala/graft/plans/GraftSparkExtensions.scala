package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductFloat, GramStats, RollingMinHash, SimHash, SortedIntersectCount}

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
    // Whole-operator extension: the as-of join's planner strategy
    // (AsOfJoin logical node → AsOfJoinExec). Strategies injected here
    // run before Spark's built-ins but match only the custom node.
    ext.injectPlannerStrategy(_ => new AsOfJoinStrategy)
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot_f"),
        new ExpressionInfo(
          classOf[DotProductFloat].getCanonicalName,
          null,
          "graft_dot_f",
          "graft_dot_f(a, b) - dot product of two float/double arrays, double accumulation",
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
        (children: Seq[Expression]) => {
          // Guarded: an unguarded eval() on a non-foldable/NULL/non-
          // numeric second argument surfaces raw internal exceptions
          // to SQL users at plan time.
          if (children.length != 2)
            throw new IllegalArgumentException(
              "graft_rolling_min_hash(text, k) takes exactly 2 arguments")
          if (!children(1).foldable)
            throw new IllegalArgumentException(
              "graft_rolling_min_hash: k must be a constant")
          children(1).eval() match {
            case n: Number => RollingMinHash(children.head, n.intValue())
            case other => throw new IllegalArgumentException(
              s"graft_rolling_min_hash: k must be a non-null integer, got $other")
          }
        },
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_simhash"),
        new ExpressionInfo(
          classOf[SimHash].getCanonicalName,
          null,
          "graft_simhash",
          "graft_simhash(text, bits) - one-pass token-level SimHash signature, bits in 1..60",
          "",
        ),
        (children: Seq[Expression]) => {
          if (children.length != 2)
            throw new IllegalArgumentException(
              "graft_simhash(text, bits) takes exactly 2 arguments")
          if (!children(1).foldable)
            throw new IllegalArgumentException(
              "graft_simhash: bits must be a constant")
          children(1).eval() match {
            case n: Number => SimHash(children.head, n.intValue())
            case other => throw new IllegalArgumentException(
              s"graft_simhash: bits must be a non-null integer, got $other")
          }
        },
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_gram_stats"),
        new ExpressionInfo(
          classOf[GramStats].getCanonicalName,
          null,
          "graft_gram_stats",
          "graft_gram_stats(text) - struct(n_tokens, top_uni, n_bigrams, top_bi): " +
            "one-pass per-document n-gram repetition statistics",
          "",
        ),
        (children: Seq[Expression]) => {
          if (children.length != 1)
            throw new IllegalArgumentException(
              "graft_gram_stats(text) takes exactly 1 argument")
          GramStats(children.head)
        },
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_sorted_intersect_count"),
        new ExpressionInfo(
          classOf[SortedIntersectCount].getCanonicalName,
          null,
          "graft_sorted_intersect_count",
          "graft_sorted_intersect_count(a, b) - |A ∩ B| of two asc-sorted " +
            "distinct bigint arrays (primitive merge walk)",
          "",
        ),
        (children: Seq[Expression]) => {
          if (children.length != 2)
            throw new IllegalArgumentException(
              "graft_sorted_intersect_count(a, b) takes exactly 2 arguments")
          SortedIntersectCount(children.head, children(1))
        },
      )
    )
  }
}
