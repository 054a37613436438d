package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** The reference's scalar/column operator surface (SURVEY.md §2.9–2.10),
  * re-expressed as pure Catalyst built-ins — zero UDFs, so every operator
  * stays inside whole-stage codegen and is usable at 100 TB without a
  * Python/JVM serialization boundary.
  *
  * Reference citations are to /root/reference (Phoom173/AIE321_Bigdata_
  * Movie_KPI_1M); semantics deviations are deliberate and documented
  * (SURVEY.md §7.4 H1–H8).
  */
object Ops {

  /** X1 — CSV-text → array parse (`parse_and_extract_names`,
    * transform.py:30-39): null / blank → `[]`; else split on `sep`,
    * trim each token, drop empty tokens.
    *
    * Clean semantics chosen over the reference's X2 `astype(str)` quirk
    * (transform.py:98 turns real nulls into literal `'None'` tokens) —
    * see SURVEY.md §7.4 H2: the quirk is a bug, not a contract.
    *
    * `sep` is treated as a literal, not a regex (pandas `str.split(',')`
    * is literal), hence the Pattern.quote.
    */
  def parseNameList(c: Column, sep: String = ","): Column = {
    // trim + regex-split + array_remove instead of the literal-split +
    // transform(trim) + filter composition: identical X1 semantics
    // (whole-string trim handles the edges, ' *' around the separator
    // trims each token, space-only tokens collapse to "" and are
    // removed), but every expression here is codegen'd — higher-order
    // functions (transform/filter) evaluate interpreted and fall out
    // of whole-stage codegen, measurably slowing wide scans. ' *' not
    // '\s*': trim() strips SPACES only (in Spark, DuckDB, and the old
    // per-token formulation alike), so the regex must too.
    val sepRe = " *" + java.util.regex.Pattern.quote(sep) + " *"
    array_remove(split(trim(coalesce(c, lit(""))), sepRe), "")
  }

  /** X2 — the reference's `astype(str)` quirk, reproducible on demand
    * (transform.py:98): pandas `astype(str)` renders a missing value as
    * the literal string `'nan'` (CSV-read NaN) or `'None'` (Python
    * None), which then passes `parse_and_extract_names`' guards and
    * yields a bogus one-token list instead of `[]`. The engine default
    * stays the clean X1 semantics (null → `[]`, SURVEY.md §7.4 H2 —
    * the quirk silently pollutes `movie_genre_fact` because F2's
    * `!= ''` filter never removes the token); this variant exists so a
    * user can reproduce the reference's output verbatim.
    *
    * @param missingToken `"nan"` for the CSV/NaN path (the reference's
    *                     actual dataflow), `"None"` for object-None.
    */
  def parseNameListParity(c: Column, sep: String = ",",
                          missingToken: String = "nan"): Column =
    when(c.isNull, array(lit(missingToken))).otherwise(parseNameList(c, sep))

  /** X6 — array → bracketed-string serialization (transform.py:129-130):
    * `'[' + ','.join(x) + ']'`, no spaces, no quotes, `[]` for empty/null.
    */
  def serializeList(c: Column): Column =
    concat(lit("["), array_join(coalesce(c, array()), ","), lit("]"))

  /** X3 — lenient numeric cast (`pd.to_numeric(errors='coerce')`,
    * transform.py:100-102): unparseable → null. `try_cast` keeps that
    * contract under Spark 4's default ANSI mode (plain `cast` throws).
    */
  def lenientDouble(c: Column): Column = c.try_cast(DoubleType)

  /** X4 — lenient date parse + year (transform.py:104):
    * `pd.to_datetime(errors='coerce').dt.year` → nullable int year.
    */
  def deriveYear(c: Column): Column = year(try_to_date(c))

  /** X5 — nullable integer cast (`astype('Int64')`, transform.py:105). */
  def lenientLong(c: Column): Column = c.try_cast(LongType)

  /** X7+X8 — ±Inf → null and NaN → null normalization
    * (publish.py:50-57). One pass instead of the reference's two;
    * establishes the engine-wide "nulls only, never NaN" invariant
    * (SURVEY.md §7.4 H1).
    */
  def normalizeFloat(c: Column): Column =
    when(
      isnan(c) || c === lit(Double.PositiveInfinity) ||
        c === lit(Double.NegativeInfinity),
      lit(null)
    ).otherwise(c)

  /** F1 — the reference's `notna()` row filter (transform.py:115-121).
    * pandas conflates NaN and missing; exact parity for double columns
    * therefore needs both checks (SURVEY.md §7.4 H1).
    */
  def notNaFilter(df: DataFrame, colName: String): DataFrame = {
    val c = col(colName)
    if (df.schema(colName).dataType == DoubleType)
      df.filter(c.isNotNull && !isnan(c))
    else df.filter(c.isNotNull)
  }

  /** G1 — explode with pandas semantics (transform.py:138): pandas
    * `df.explode` keeps one NaN row for an empty list; Spark's
    * `explode_outer` keeps one null row — same shape. The reference
    * always filters those rows out immediately afterwards (F2/F3), so
    * callers that do the same may use plain `explode` (narrower plan,
    * no null branch in codegen).
    */
  def explodePandas(c: Column): Column = explode_outer(c)

  /** A3 — per-column non-null counts (`df.info(show_counts=True)`,
    * check_data.py:34): one row, one count per column. Single partial-
    * aggregate pass over the table; no shuffle beyond the final reduce.
    */
  def nonNullCounts(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => count(col(c)).as(c)).toSeq: _*)
}
