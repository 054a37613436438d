package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / document primitives for large-scale training-data pipelines:
  * tokenization, shingling, deterministic hashing, MinHash, SimHash.
  *
  * Everything is Catalyst built-ins (codegen-friendly, no UDFs), and
  * every primitive has an exact ANSI-SQL twin so results are
  * oracle-checkable: the hash is md5-based rather than xxhash64 because
  * md5 is the one digest Spark and DuckDB compute identically.
  */
object TextFunctions {

  /** Whitespace tokenization (single-space separated corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Deterministic 60-bit string hash: first 15 hex chars of md5 →
    * bigint. 15 hex digits < 2^60, so no sign/overflow issues.
    * DuckDB twin: CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT).
    */
  def stringHash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).try_cast("bigint")

  /** k-token shingles: one string per consecutive k-token window.
    * Docs shorter than k tokens yield a single whole-text shingle so
    * every doc participates in dedup. 1-based element_at, bounded by
    * sequence(), so safe under ANSI.
    *
    * The input is bound ONCE as a lambda variable (the
    * `transform(array(x), t => ...)` let-encoding): higher-order
    * functions evaluate interpreted (no codegen, no common-subexpr
    * elimination), so referencing `toks` directly inside the window
    * lambda would re-evaluate its whole subtree — typically a split()
    * — once per element_at per window, turning an O(n·k) shingle pass
    * into O(n·k) *re-tokenizations* per document (~30× slower,
    * measured at sf0.1).
    */
  def shingles(toks: Column, k: Int): Column =
    flatten(transform(array(toks), t => {
      val win = transform(
        sequence(lit(1), size(t) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(o => element_at(t, i + o)): _*),
      )
      when(size(t) >= k, win).otherwise(array(array_join(t, " ")))
    }))

  /** All ordered pairs (a < b by array position) from a SORTED array:
    * array<struct<a, b>>. The bounded-set pair-generation primitive —
    * when a join key's value set is bounded (sources per shingle,
    * docs per RARE shingle), exploding pairs from one collected set
    * replaces a self-join that re-plans the whole input lineage.
    * Lambda hygiene: `arr` must be a cheap reference (an attribute or
    * lambda variable), not a computed subtree — higher-order functions
    * re-evaluate referenced subtrees per element.
    */
  def orderedPairs(arr: Column): Column =
    flatten(transform(arr, (x, i) =>
      transform(slice(arr, i + 2, size(arr)),
        y => struct(x.as("a"), y.as("b")))))

  /** Document quality score in [0, 1]: half length saturation (100
    * tokens → full marks), half lexical diversity (distinct/total
    * tokens). The single formula behind q63 (scoring), q77 (gating)
    * and the TextPipeline gate stage — one definition, one oracle
    * twin, no drift.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    least(n / 100.0, lit(1.0)) * 0.5 +
      size(array_distinct(toks)).cast("double") / greatest(n, lit(1)) * 0.5
  }

  /** MinHash family: h_i(x) = (a_i * (x mod P) + b_i) mod P over the
    * 60-bit shingle hash. P = 2^31 - 1 (Mersenne); a_i/b_i are fixed
    * odd constants so signatures are reproducible across engines.
    */
  val MinhashP: Long = 2147483647L
  def minhashA(i: Int): Long = 1000003L * i + 12345L
  def minhashB(i: Int): Long = 777767777L * i + 3141593L

  def minhashExpr(shingleHash: Column, i: Int): Column =
    (lit(minhashA(i)) * (shingleHash % MinhashP) + minhashB(i)) % MinhashP

  /** SimHash bit-balance term: +1 if bit j of the token hash is set,
    * else -1; summed per document, bit j of the signature is 1 when the
    * balance is positive.
    */
  def simhashBitTerm(tokenHash: Column, j: Int): Column =
    when(shiftright(tokenHash, j).bitwiseAND(1) === 1, lit(1)).otherwise(lit(-1))

  def simhashFromBalances(balances: Seq[Column]): Column =
    balances.zipWithIndex.map { case (b, j) =>
      when(b > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Native one-pass SimHash ([[SimHash]]): bit-identical to the
    * explode + [[simhashBitTerm]] + [[simhashFromBalances]] pipeline
    * (fuzz-asserted in SimHashSpec) with zero exchange — the signature
    * is computed where the row is.
    */
  def simhashNative(text: Column, bits: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SimHash(ColumnBridge.expression(text), bits))
  }

  /** Native sorted-set intersection size ([[SortedIntersectCount]]):
    * equals `size(array_intersect(a, b))` on asc-sorted distinct
    * null-free bigint arrays (the doc-shingle-set artifact contract;
    * equivalence fuzz-asserted in SortedIntersectCountSpec) without
    * the per-row boxed hash set the built-in allocates — the Jaccard
    * verification hot path runs one primitive merge walk per
    * candidate pair.
    */
  def sortedIntersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
