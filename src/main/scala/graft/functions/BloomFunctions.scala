package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's own Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime bloom-filter join pruning, not exposed in
  * `sql.functions`). The engine uses them for the compact-index probe
  * pattern: serialize the at-rest digest set into a few MB of bloom
  * bits, ship that ONE value to every executor, and drop
  * definitely-new rows map-side so the exact verification join only
  * shuffles candidate rows. A Bloom filter has no false negatives, so
  * the pruning never changes query results — only the join input size.
  */
object BloomFunctions {

  /** Aggregate `c` (must be LongType, e.g. `xxhash64(...)`) into a
    * serialized Bloom filter (binary). `numBits` is the scale knob —
    * the same trade Spark's runtime-filter conf
    * (`spark.sql.optimizer.runtime.bloomFilter.*`) exposes: bits ≈
    * items × 7.3 gives ~3% false positives, i.e. ~3% of truly-new rows
    * redundantly entering the verification join.
    */
  def bloomAgg(c: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(c),
        Literal(estimatedItems),
        Literal(numBits),
      ).toAggregateExpression())

  /** True when `c` (LongType) may be in the serialized filter; false
    * means definitely absent. The filter rides along as a Literal —
    * the same shape Spark's InjectRuntimeFilter produces once its
    * scalar subquery is executed.
    */
  def mightContain(bloomBits: Array[Byte], c: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        Literal(bloomBits, BinaryType),
        ColumnBridge.expression(c)))
}
