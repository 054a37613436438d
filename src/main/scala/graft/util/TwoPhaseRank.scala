package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe windowed ranking over LOW-CARDINALITY partition keys.
  *
  * `rank() OVER (PARTITION BY k ORDER BY o)` with a ≤handful-of-values
  * `k` funnels whole-table-scale partitions through single WindowExec
  * tasks — a straggler by construction at 100×. This is the standard
  * two-phase decomposition: range-repartition the input on the FULL
  * window ordering (N balanced partitions whose key ranges never
  * interleave), rank locally inside each (k, slice) — a window keyed on
  * N×|k| values, every bucket bounded by the range-partition size —
  * then merge with broadcast per-slice offsets and group totals (a
  * ≤N×|k|-row aggregate).
  *
  * Correctness of `global rank = slice offset + local rank` rests on
  * two properties of Spark's range partitioner:
  *   - slices never interleave: within a partition key, a later slice
  *     holds only strictly-later ordering values, so the offset (count
  *     of rows in earlier slices) counts exactly the rows ranked before
  *     the local slice;
  *   - ties are CO-LOCATED: rows with equal (partition, ordering)
  *     tuples map to one slice (the partitioner is a function of the
  *     key), so a local `rank()` sees every member of a tie group and
  *     SQL rank semantics (ties share the rank of their first row)
  *     survive the merge untouched.
  * dense_rank does NOT decompose this way (it needs the count of
  * DISTINCT earlier values); derive it only when the ordering is total
  * (then rank == dense_rank == row_number).
  *
  * The fixed N pins the slice layout (AQE must not coalesce the range
  * exchange — the slice id is load-bearing) and `spark_partition_id()`
  * is evaluated in the stage right after that exchange (nondeterministic
  * expressions never migrate across exchanges). Both derived branches
  * (local ranks, slice counts) consume the same exchange, which AQE
  * reuses as one shuffle stage.
  */
object TwoPhaseRank {

  /** Append `rnk` (BIGINT: rank over PARTITION BY partCols ORDER BY
    * orderCols) and `n_g` (BIGINT: the partition's total row count —
    * the other ingredient percent_rank / cume_dist / ntile closed
    * forms need) to `df`. Internal columns are dropped.
    */
  def rankAndTotal(
      s: SparkSession, df: DataFrame,
      partCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    val part = partCols.map(col)
    val sliced = df
      .repartitionByRange(n, part ++ orderCols: _*)
      .withColumn("_tpr_pid", spark_partition_id())
    val wLocal = Window
      .partitionBy(part :+ col("_tpr_pid"): _*)
      .orderBy(orderCols: _*)
    val local = sliced.withColumn("_tpr_lrk", rank().over(wLocal))
    val wOff = Window.partitionBy(part: _*).orderBy("_tpr_pid")
    val offs = sliced
      .groupBy(part :+ col("_tpr_pid"): _*)
      .agg(count(lit(1)).as("_tpr_cnt"))
      .withColumn("_tpr_off", coalesce(
        sum("_tpr_cnt").over(wOff.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n_g", sum("_tpr_cnt").over(Window.partitionBy(part: _*)))
      .drop("_tpr_cnt")
    local
      .join(broadcast(offs), partCols :+ "_tpr_pid")
      .withColumn("rnk", (col("_tpr_off") + col("_tpr_lrk")).cast("long"))
      .drop("_tpr_pid", "_tpr_lrk", "_tpr_off")
  }

  /** [[rankAndTotal]] for TOTAL orderings (every row has a distinct
    * (partCols, orderCols) tuple — e.g. a unique key as the last sort
    * term), where rank == row_number and the local phase needs no
    * window AT ALL: after the range shuffle each partition is sorted
    * once, `monotonically_increasing_id()` is then consecutive within
    * it, so the in-slice position is `mid − min(mid of slice)` — plain
    * arithmetic against a broadcast per-slice (min, offset, total)
    * aggregate. The fact flows through ONE exchange total, vs the
    * window form's two (range + hash): at 100 TB that halves the
    * job's network cost. Both derived branches re-sort the reused
    * shuffle output deterministically (the ordering is total), so the
    * mid values agree between them. NOT valid with ties — a tie group
    * would get distinct row numbers where SQL rank shares one; use
    * [[rankAndTotal]] there.
    */
  def rowNumberAndTotal(
      s: SparkSession, df: DataFrame,
      partCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    val part = partCols.map(col)
    val sliced = df
      .repartitionByRange(n, part ++ orderCols: _*)
      .sortWithinPartitions(part ++ orderCols: _*)
      .withColumn("_tpr_pid", spark_partition_id())
      .withColumn("_tpr_mid", monotonically_increasing_id())
    val wOff = Window.partitionBy(part: _*).orderBy("_tpr_pid")
    val stats = sliced
      .groupBy(part :+ col("_tpr_pid"): _*)
      .agg(count(lit(1)).as("_tpr_cnt"), min("_tpr_mid").as("_tpr_min"))
      .withColumn("_tpr_off", coalesce(
        sum("_tpr_cnt").over(wOff.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n_g", sum("_tpr_cnt").over(Window.partitionBy(part: _*)))
      .drop("_tpr_cnt")
    sliced
      .join(broadcast(stats), partCols :+ "_tpr_pid")
      .withColumn("rnk",
        (col("_tpr_off") + (col("_tpr_mid") - col("_tpr_min")) + 1).cast("long"))
      .drop("_tpr_pid", "_tpr_mid", "_tpr_min", "_tpr_off")
  }

  /** Append `psum` (the running `sum(valueCol) OVER (PARTITION BY
    * partCols ORDER BY orderCols)` in its default RANGE-to-current-row
    * frame) to `df`, decomposed the same two-phase way: local running
    * sums inside balanced range slices + broadcast per-slice value
    * totals as offsets. Exact for the default frame too: ordering peers
    * are co-located by the range partitioner, so the local window sees
    * every peer of a row, and earlier slices contribute whole —
    * strictly-earlier — ranges.
    */
  def prefixSum(
      s: SparkSession, df: DataFrame,
      partCols: Seq[String], orderCols: Seq[Column],
      valueCol: Column): DataFrame = {
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    val part = partCols.map(col)
    val sliced = df
      .repartitionByRange(n, part ++ orderCols: _*)
      .withColumn("_tpr_pid", spark_partition_id())
      .withColumn("_tpr_v", valueCol)
    val wLocal = Window
      .partitionBy(part :+ col("_tpr_pid"): _*)
      .orderBy(orderCols: _*)
    val local = sliced.withColumn("_tpr_lsum", sum("_tpr_v").over(wLocal))
    val wOff = Window.partitionBy(part: _*).orderBy("_tpr_pid")
    val offs = sliced
      .groupBy(part :+ col("_tpr_pid"): _*)
      // Per-slice value total AND non-null count: the builtin running
      // sum is NULL exactly while ZERO non-null values have been seen,
      // then ignores later NULLs — so the merge below needs to know
      // whether any earlier slice contributed a value, not just the
      // (null-skipping) sum of slice totals.
      .agg(sum("_tpr_v").as("_tpr_cnt"), count("_tpr_v").as("_tpr_nn"))
      .withColumn("_tpr_off", coalesce(
        sum("_tpr_cnt").over(wOff.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("_tpr_nnb", coalesce(
        sum("_tpr_nn").over(wOff.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("_tpr_cnt", "_tpr_nn")
    local
      .join(broadcast(offs), partCols :+ "_tpr_pid")
      // A row whose slice-local running sum is still NULL (only NULLs
      // so far in-slice) must inherit the prior slices' sum — or stay
      // NULL when no prior slice held a value, exactly the builtin's
      // all-NULL-prefix behavior.
      .withColumn("psum",
        when(col("_tpr_lsum").isNotNull, col("_tpr_off") + col("_tpr_lsum"))
          .otherwise(when(col("_tpr_nnb") > 0, col("_tpr_off"))))
      .drop("_tpr_pid", "_tpr_v", "_tpr_lsum", "_tpr_off", "_tpr_nnb")
  }
}
