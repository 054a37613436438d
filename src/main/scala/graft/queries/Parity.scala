package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Ops
import graft.util.{QueryDef, Tables}

/** Reference-parity queries — one per operator family from SURVEY.md §2,
  * mapped onto the TPC-H-ish test corpus (FIXTURES.md §B). The movie-KPI
  * shape (parse → explode → filter → aggregate → sort, transform.py:
  * 177-197) runs over `part.p_name` (multi-token string ≈ `genres`) with
  * `p_retailprice` as the revenue analog.
  *
  * Every query is deterministic (total ORDER BY with tiebreakers) and
  * rounds float aggregates in BOTH dialects (SURVEY.md §7.4 H4/H6).
  */
object Parity {

  import Tables.tbl

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Flagship: the genre_average_revenue pipeline (transform.py:177-197)
    // S→X1→G1→F3→A1→O1 in one declarative plan; Catalyst plans a partial
    // + final HashAggregate (map-side combine), so the shuffle carries
    // one row per (partition, token), not per input row.
    QueryDef(
      "q01_genre_avg_revenue",
      Some("""
        WITH exploded AS (
          SELECT p_partkey, p_retailprice,
                 unnest(list_filter(list_transform(string_split(coalesce(p_name, ''), ' '),
                        t -> trim(t)), t -> t != '')) AS genre_name
          FROM part)
        SELECT genre_name,
               round(avg(p_retailprice), 4) AS average_revenue,
               count(p_partkey) AS total_movies
        FROM exploded
        WHERE p_retailprice IS NOT NULL AND p_retailprice > 0
        GROUP BY genre_name
        ORDER BY average_revenue DESC, genre_name
      """),
    ) { (s, dir) =>
      tbl(s, dir, "part")
        .select(
          col("p_partkey"),
          col("p_retailprice"),
          explode(Ops.parseNameList(col("p_name"), " ")).as("genre_name"),
        )
        .filter(col("p_retailprice").isNotNull && col("p_retailprice") > 0)
        .groupBy("genre_name")
        .agg(
          round(avg("p_retailprice"), 4).as("average_revenue"),
          count(col("p_partkey")).as("total_movies"),
        )
        .orderBy(desc("average_revenue"), asc("genre_name"))
    },

    // ------------------------------------------------------------------
    // X1 + X6: comma-text → array parse → bracketed-string serialization
    // (transform.py:30-39, 129-130), incl. the null → '[]' branch.
    QueryDef(
      "q02_array_parse_serialize",
      Some("""
        SELECT p_partkey,
               '[' || coalesce(array_to_string(
                 list_filter(list_transform(string_split(coalesce(
                   CASE WHEN p_size % 7 = 0 THEN NULL
                        ELSE concat_ws(',', p_brand, ' ', p_type, '') END,
                 ''), ','), t -> trim(t)), t -> t != ''), ','), '') || ']' AS name_list
        FROM part
        ORDER BY p_partkey
      """),
    ) { (s, dir) =>
      val raw = when(col("p_size") % 7 === 0, lit(null))
        .otherwise(concat_ws(",", col("p_brand"), lit(" "), col("p_type"), lit("")))
      tbl(s, dir, "part")
        .select(
          col("p_partkey"),
          Ops.serializeList(Ops.parseNameList(raw)).as("name_list"),
        )
        .orderBy("p_partkey")
    },

    // ------------------------------------------------------------------
    // X3 + X4 + X5: lenient numeric cast (bad → null), lenient date parse
    // + year derivation, nullable long cast (transform.py:100-105).
    QueryDef(
      "q03_lenient_casts",
      Some("""
        SELECT o_orderkey,
               try_cast(substr(o_orderpriority, 1, 1) AS DOUBLE) AS prio_num,
               try_cast(o_orderstatus AS DOUBLE) AS status_num,
               year(try_cast(o_orderdate AS DATE)) AS o_year,
               try_cast(floor(o_totalprice) AS BIGINT) AS total_long
        FROM orders
        ORDER BY o_orderkey
        LIMIT 1000
      """),
    ) { (s, dir) =>
      // Sort+limit FIRST on the raw columns, cast AFTER (r21): with
      // the lenient-cast projection below the limit, the
      // TakeOrderedAndProject evaluated four try_cast/date-parse
      // chains for every orders row and kept 1000; projecting after
      // the limit parses exactly the surviving 1000. Same rows (the
      // sort key o_orderkey is untouched), same values, same oracle.
      tbl(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderstatus",
          "o_orderdate", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(1000)
        .select(
          col("o_orderkey"),
          Ops.lenientDouble(substring(col("o_orderpriority"), 1, 1)).as("prio_num"),
          Ops.lenientDouble(col("o_orderstatus")).as("status_num"),
          Ops.deriveYear(col("o_orderdate")).as("o_year"),
          // double→long cast truncates in Spark but rounds in DuckDB;
          // floor first so both dialects agree (SURVEY.md §7.4 seams).
          Ops.lenientLong(floor(col("o_totalprice"))).as("total_long"),
        )
    },

    // ------------------------------------------------------------------
    // F1 + H1: notna() filter with NaN injected — pandas notna() drops
    // NaN, Spark isNotNull alone would keep it (SURVEY.md §7.4 H1).
    QueryDef(
      "q04_filter_notna",
      Some("""
        WITH t AS (
          SELECT l_returnflag,
                 CASE WHEN l_orderkey % 100 = 0 THEN try_cast('NaN' AS DOUBLE)
                      WHEN l_orderkey % 97 = 0 THEN NULL
                      ELSE l_quantity END AS q
          FROM lineitem)
        SELECT l_returnflag, count(*) AS n, round(sum(q), 2) AS sum_q
        FROM t
        WHERE q IS NOT NULL AND NOT isnan(q)
        GROUP BY l_returnflag
        ORDER BY l_returnflag
      """),
    ) { (s, dir) =>
      val q = when(col("l_orderkey") % 100 === 0, lit(Double.NaN))
        .when(col("l_orderkey") % 97 === 0, lit(null))
        .otherwise(col("l_quantity"))
      tbl(s, dir, "lineitem")
        .select(col("l_returnflag"), q.as("q"))
        .filter(col("q").isNotNull && !isnan(col("q")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("q"), 2).as("sum_q"))
        .orderBy("l_returnflag")
    },

    // ------------------------------------------------------------------
    // F3: 4-term conjunctive filter before aggregation (transform.py:
    // 180-185). Catalyst pushes the conjunction into the parquet scan.
    QueryDef(
      "q05_filter_conjunctive",
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        WHERE l_extendedprice > 0 AND l_discount IS NOT NULL
          AND l_returnflag != '' AND l_quantity > 10
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """),
    ) { (s, dir) =>
      tbl(s, dir, "lineitem")
        .filter(
          col("l_extendedprice") > 0 && col("l_discount").isNotNull &&
            col("l_returnflag") =!= "" && col("l_quantity") > 10
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ------------------------------------------------------------------
    // P1/P2: column-subset projection + rename (transform.py:107-113,
    // 148-157). ReadSchema in the parquet scan must shrink to 3 columns.
    QueryDef(
      "q06_project_rename",
      Some("""
        SELECT o_orderkey AS order_id, o_totalprice AS total_price,
               upper(o_orderstatus) AS status
        FROM orders ORDER BY order_id LIMIT 100
      """),
    ) { (s, dir) =>
      tbl(s, dir, "orders")
        .select(
          col("o_orderkey").as("order_id"),
          col("o_totalprice").as("total_price"),
          upper(col("o_orderstatus")).as("status"),
        )
        .orderBy("order_id")
        .limit(100)
    },

    // ------------------------------------------------------------------
    // S3/O2 + H8: scan with limit — made deterministic by sorting first
    // (the reference's LIMIT-without-ORDER-BY is nondeterministic).
    QueryDef(
      "q07_scan_limit",
      Some("SELECT * FROM nation ORDER BY n_nationkey LIMIT 10"),
    ) { (s, dir) =>
      tbl(s, dir, "nation").orderBy("n_nationkey").limit(10)
    },

    // ------------------------------------------------------------------
    // G1 + H3: explode with pandas empty-list semantics (one null row per
    // empty array). DuckDB unnest drops empties, so the oracle injects
    // [NULL]; Spark's explode_outer matches pandas natively.
    QueryDef(
      "q08_explode_outer",
      Some("""
        WITH t AS (
          SELECT p_partkey,
                 list_filter(string_split(p_name, ' '), x -> x LIKE 's%') AS arr
          FROM part)
        SELECT p_partkey,
               unnest(CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END) AS token
        FROM t
        ORDER BY p_partkey, token NULLS FIRST
      """),
    ) { (s, dir) =>
      tbl(s, dir, "part")
        .select(
          col("p_partkey"),
          Ops.explodePandas(
            filter(split(col("p_name"), " "), x => x.like("s%"))
          ).as("token"),
        )
        .orderBy(asc("p_partkey"), asc_nulls_first("token"))
    },

    // ------------------------------------------------------------------
    // A1/A2 + H5: multi-aggregate with pandas count semantics —
    // count(col) is the NON-NULL count in pandas, Spark and DuckDB alike.
    QueryDef(
      "q09_agg_multi",
      Some("""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows, count(l_quantity) AS n_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(sum(l_extendedprice), 2) AS sum_price,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """),
    ) { (s, dir) =>
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("l_quantity")).as("n_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          min("l_extendedprice").as("min_price"),
          max("l_extendedprice").as("max_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ------------------------------------------------------------------
    // O1 + H6: global sort desc with total-order tiebreaker
    // (transform.py:197). Spark plans a range-partitioned sort; the
    // trailing limit collapses it to a TakeOrderedAndProject (top-k per
    // partition + driver merge — no full sort materialized).
    QueryDef(
      "q10_sort_desc_tiebreak",
      Some("""
        SELECT p_partkey, p_name, p_retailprice
        FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 50
      """),
    ) { (s, dir) =>
      tbl(s, dir, "part")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(desc("p_retailprice"), asc("p_partkey"))
        .limit(50)
    },

    // ------------------------------------------------------------------
    // A3: per-column non-null counts (df.info, check_data.py:34) — one
    // aggregate pass, no shuffle beyond the final single-row reduce.
    QueryDef(
      "q11_nonnull_counts",
      Some("""
        SELECT count(o_orderkey) AS o_orderkey, count(o_custkey) AS o_custkey,
               count(o_orderstatus) AS o_orderstatus,
               count(o_totalprice) AS o_totalprice,
               count(o_orderdate) AS o_orderdate,
               count(o_orderpriority) AS o_orderpriority,
               count(*) AS n_rows
        FROM orders
      """),
    ) { (s, dir) =>
      val df = tbl(s, dir, "orders")
      val aggs = df.columns.map(c => count(col(c)).as(c)) :+ count(lit(1)).as("n_rows")
      df.agg(aggs.head, aggs.tail.toSeq: _*)
    },

    // ------------------------------------------------------------------
    // X7/X8 + H1: ±Inf/NaN → null normalization before aggregation
    // (publish.py:50-57) — the engine-wide "nulls only" boundary.
    QueryDef(
      "q12_float_normalize",
      Some("""
        WITH t AS (
          SELECT l_returnflag,
                 CASE WHEN l_orderkey % 97 = 0 THEN try_cast('NaN' AS DOUBLE)
                      WHEN l_orderkey % 89 = 0 THEN try_cast('Infinity' AS DOUBLE)
                      ELSE l_quantity END AS x
          FROM lineitem),
        n AS (
          SELECT l_returnflag,
                 CASE WHEN isnan(x) OR isinf(x) THEN NULL ELSE x END AS x
          FROM t)
        SELECT l_returnflag, count(*) AS n_rows, count(x) AS n_valid,
               round(sum(x), 2) AS sum_x
        FROM n GROUP BY l_returnflag ORDER BY l_returnflag
      """),
    ) { (s, dir) =>
      val x = when(col("l_orderkey") % 97 === 0, lit(Double.NaN))
        .when(col("l_orderkey") % 89 === 0, lit(Double.PositiveInfinity))
        .otherwise(col("l_quantity"))
      tbl(s, dir, "lineitem")
        .select(col("l_returnflag"), Ops.normalizeFloat(x).as("x"))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("x")).as("n_valid"),
          round(sum("x"), 2).as("sum_x"),
        )
        .orderBy("l_returnflag")
    },

    // ------------------------------------------------------------------
    // X2 — the astype(str) quirk in PARITY mode (transform.py:98):
    // nulls become a literal 'nan' token that survives parsing and the
    // != '' filter, exactly like the reference's movie_genre_fact rows.
    // The 'nan' token count below equals the injected-null row count —
    // the quirk made observable and oracle-checked.
    QueryDef(
      "q13_parity_astype_quirk",
      Some("""
        WITH t AS (
          SELECT p_partkey,
                 CASE WHEN p_size % 7 = 0 THEN NULL ELSE p_type END AS s
          FROM part),
        p AS (
          SELECT p_partkey,
                 unnest(CASE WHEN s IS NULL THEN ['nan']
                        ELSE list_filter(list_transform(string_split(s, ' '),
                               x -> trim(x)), x -> x != '') END) AS tok
          FROM t)
        SELECT tok, count(*) AS n
        FROM p
        WHERE tok != ''
        GROUP BY tok
        ORDER BY tok
      """),
    ) { (s, dir) =>
      val raw = when(col("p_size") % 7 === 0, lit(null)).otherwise(col("p_type"))
      tbl(s, dir, "part")
        .select(
          col("p_partkey"),
          explode(Ops.parseNameListParity(raw, " ")).as("tok"),
        )
        .filter(col("tok") =!= "") // F2's filter — which does NOT drop 'nan'
        .groupBy("tok")
        .agg(count(lit(1)).as("n"))
        .orderBy("tok")
    },
  )
}
