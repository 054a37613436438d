package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{lit, max, min}

/** The 80%-of-span high-water-mark convention shared by every
  * incremental-merge scenario (the SCD2 dimension, the partsupp
  * grain): the at-rest artifact covers the first 80% of the corpus's
  * event-time span in exact integer-microsecond arithmetic, the
  * remainder is "the batch since the last run". One definition of the
  * fraction and of the 1-row artifact shape, so the two families
  * cannot drift independently.
  */
object Hwm {
  /** cutoff = min + (max − min) · 8/10 — exact integer micros. */
  def cutoffUs(minUs: Long, maxUs: Long): Long =
    minUs + (maxUs - minUs) * 8 / 10

  /** 1-row at-rest `cutoff_us` artifact derived from a micros
    * expression over `src`: the driver-side min/max scan runs once at
    * BUILD time (the same ingest-time scalar derivation as the IVF
    * nlist count); consumers read the single row — or push it as a
    * literal — and never re-derive the cutoff with a corpus scan at
    * query time.
    */
  def artifact(s: SparkSession, dir: String, name: String)(
      micros: Column, src: => DataFrame): DataFrame =
    Snapshots(s, dir, name) {
      val r = src.agg(min(micros), max(micros)).head()
      s.range(1).select(lit(cutoffUs(r.getLong(0), r.getLong(1))).as("cutoff_us"))
    }
}
