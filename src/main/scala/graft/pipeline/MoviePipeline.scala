package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Ops
import graft.sources.{ParquetWarehouse, Warehouse}

/** The reference pipeline (run_pipeline.py:22-55: ingest → transform →
  * publish, sequential, fail-fast) re-expressed as lazy DataFrame
  * stages. Each stage is a pure DataFrame => DataFrame function so the
  * whole pipeline is ONE Catalyst plan per sink — the reference's
  * materialize-everything-between-steps pattern (transform.py eagerly
  * holds every intermediate in RAM) disappears; Spark streams
  * partition-wise and the shared prefix of the three sinks is planned
  * once per sink without driver-side materialization.
  */
object MoviePipeline {

  /** The seven comma-separated-text columns (transform.py:96). */
  val listCols: Seq[String] = Seq(
    "genres", "production_countries", "production_companies",
    "spoken_languages", "cast", "writers", "producers",
  )

  /** Leniently-coerced numeric columns (transform.py:100-102). */
  val numericCols: Seq[String] = Seq(
    "revenue", "budget", "runtime", "vote_count", "imdb_votes",
    "imdb_rating", "popularity",
  )

  /** movie_facts projection (transform.py:107-113) — 17 columns. */
  val movieFactsCols: Seq[String] = Seq(
    "movie_fact_id", "title", "original_title", "release_date",
    "release_year", "status", "original_language", "revenue", "budget",
    "runtime", "vote_average", "vote_count", "imdb_rating", "imdb_votes",
    "popularity", "genres_list", "production_countries_list",
  )

  /** Ingest (EP2, ingest.py:53-95): CSV with header + schema inference →
    * parquet, full replace. Spark derives DDL from the inferred
    * StructType (the reference's hand-rolled get_schema/DROP/CREATE/COPY
    * sequence is subsumed by write.mode(overwrite)).
    */
  /** CSV read options matching pandas' dialect (ingest.py:64): RFC-4180
    * doubled-quote escaping ("" inside a quoted field), not Spark's
    * default backslash escape — movie titles/overviews contain quotes
    * and commas, and the two dialects silently part ways on them.
    */
  private def csvReader(spark: SparkSession) =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("quote", "\"")
      .option("escape", "\"")

  def ingest(spark: SparkSession, csvPath: String, rawTablePath: String): Long = {
    val df = csvReader(spark).csv(csvPath)
    df.write.mode("overwrite").parquet(rawTablePath)
    spark.read.parquet(rawTablePath).count()
  }

  /** Warehouse-backed ingest: same S1 scan, sink chosen by the caller —
    * parquet natively, JDBC for Postgres parity (ingest.py:80-86), or
    * a catalog table (D1/D2).
    */
  def ingest(spark: SparkSession, csvPath: String, wh: Warehouse, table: String): Long = {
    val df = csvReader(spark).csv(csvPath)
    wh.write(df, table)
    wh.read(spark, table).count()
  }

  /** The cleaning/derivation stage (transform.py:96-105): list-parse the
    * text columns (X1, clean semantics per SURVEY §7.4 H2), coerce
    * numerics (X3), derive release_year (X4), cast id → movie_fact_id
    * (X5). Columns missing from the input are skipped, mirroring the
    * reference's reliance on the CSV carrying them.
    */
  def clean(raw: DataFrame): DataFrame = {
    val present = raw.columns.toSet
    val withLists = listCols.filter(present).foldLeft(raw) { (df, c) =>
      df.withColumn(s"${c}_list", Ops.parseNameList(col(c)))
    }
    val withNums = numericCols.filter(present).foldLeft(withLists) { (df, c) =>
      df.withColumn(c, Ops.lenientDouble(col(c)))
    }
    val withYear =
      if (present("release_date"))
        withNums.withColumn("release_year", Ops.deriveYear(col("release_date")))
      else withNums
    if (present("id"))
      withYear.withColumn("movie_fact_id", Ops.lenientLong(col("id")))
    else withYear
  }

  /** movie_facts (transform.py:107-133): keep rows with a non-null (and
    * non-NaN, H1) imdb_rating, project the 17 columns, serialize the
    * list columns to the reference's bracketed-string at-rest format
    * (X6). Natively we'd keep ArrayType in parquet; the stringified
    * variant preserves the reference's storage contract.
    */
  def movieFacts(cleaned: DataFrame): DataFrame = {
    val filtered = Ops.notNaFilter(cleaned, "imdb_rating")
    val present = filtered.columns.toSet
    val projected = filtered.select(movieFactsCols.filter(present).map(col): _*)
    projected.columns.filter(_.endsWith("_list")).foldLeft(projected) { (df, c) =>
      df.withColumn(c, Ops.serializeList(col(c)))
    }
  }

  /** movie_genre_fact (transform.py:135-157): explode genres, drop
    * null/empty genre rows (F2), project + rename to genre_name (P2).
    */
  def movieGenreFact(cleaned: DataFrame): DataFrame = {
    val filtered = Ops.notNaFilter(cleaned, "imdb_rating")
    filtered
      .select(
        col("movie_fact_id"), col("title"), col("release_year"),
        col("revenue"), col("budget"), col("imdb_rating"), col("popularity"),
        explode(col("genres_list")).as("genre_name"),
      )
      .filter(col("genre_name").isNotNull && col("genre_name") =!= "")
  }

  /** genre_average_revenue (transform.py:173-200): explode → 4-term
    * filter (F3) → groupBy mean/non-null-count (A1) → sort desc (O1,
    * with a tiebreaker the reference lacks, H6). Partial+final hash
    * aggregation keeps the shuffle at one row per (partition, genre).
    */
  def genreAverageRevenue(cleaned: DataFrame): DataFrame =
    cleaned
      .select(
        col("movie_fact_id"), col("revenue"),
        explode(col("genres_list")).as("genre_name"),
      )
      .filter(
        col("revenue").isNotNull && !isnan(col("revenue")) && col("revenue") > 0 &&
          col("genre_name").isNotNull && col("genre_name") =!= ""
      )
      .groupBy("genre_name")
      .agg(
        avg("revenue").as("average_revenue"),
        count(col("movie_fact_id")).as("total_movies"),
      )
      .orderBy(desc("average_revenue"), asc("genre_name"))

  /** Transform (EP3): raw table → the three production tables, full
    * replace (D2 semantics). Returns (facts, genreFact, genreAvg) row
    * counts for the reference's row-accounting logs (A2).
    */
  def transform(spark: SparkSession, rawTablePath: String, outDir: String): (Long, Long, Long) =
    transform(
      spark, clean(spark.read.parquet(rawTablePath)),
      // Facts partitioned by year at rest (SURVEY §4): per-year queries
      // (Q3 "movies per year" and every dashboard date filter) prune to
      // one directory instead of scanning the table.
      new ParquetWarehouse(outDir, Map("movie_facts" -> "release_year")),
    )

  /** Warehouse-backed transform: the three production tables land in
    * whichever backend the caller chose (parquet / JDBC / catalog) —
    * the reference's `production` schema boundary (transform.py:61-71).
    */
  def transform(spark: SparkSession, cleaned: DataFrame, wh: Warehouse): (Long, Long, Long) = {
    wh.write(movieFacts(cleaned), "movie_facts")
    wh.write(movieGenreFact(cleaned), "movie_genre_fact")
    wh.write(genreAverageRevenue(cleaned), "genre_average_revenue")
    (
      wh.read(spark, "movie_facts").count(),
      wh.read(spark, "movie_genre_fact").count(),
      wh.read(spark, "genre_average_revenue").count(),
    )
  }

  /** Full pipeline (R1): sequential fail-fast — exceptions propagate,
    * aborting later stages exactly like run_pipeline.py's early returns.
    */
  def run(spark: SparkSession, csvPath: String, warehouseDir: String,
          sink: ChunkedSink, rowLimit: Int = Publish.DefaultRowLimit): Unit = {
    ingest(spark, csvPath, s"$warehouseDir/raw/tmdb_movies_raw")
    transform(spark, s"$warehouseDir/raw/tmdb_movies_raw", s"$warehouseDir/production")
    Seq("movie_facts", "movie_genre_fact", "genre_average_revenue").foreach { t =>
      val read = spark.read.parquet(s"$warehouseDir/production/$t")
      // A partitioned table appends its partition column LAST on read
      // (movie_facts is partitioned by release_year); restore the
      // reference's published column order (transform.py:107-113) so
      // sheet consumers see the same layout.
      val ordered =
        if (t == "movie_facts") {
          val present = read.columns.toSet
          read.select(movieFactsCols.filter(present).map(col): _*)
        } else read
      Publish.publish(
        ordered, sink, t,
        limit = if (t == "genre_average_revenue") None else Some(rowLimit),
      )
    }
  }
}
