package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-scale end-to-end proof: the reference ingests a >1M-row
  * movie CSV (README.md:6, ingest.py:64 reads it whole into pandas);
  * this main generates a synthetic CSV of that size with the same
  * column surface and messiness profile (missing ratings, malformed
  * dates/numerics, RFC-4180 quoted titles with embedded commas and
  * doubled quotes, comma-separated list columns), runs
  * [[MoviePipeline.run]] end-to-end, and ASSERTS the row-accounting
  * contract (transform.py:116-121: facts = rows with a parseable
  * imdb_rating) plus the year-partitioned facts layout — with every
  * expected count derived INDEPENDENTLY from the raw table via SQL
  * string ops, not by re-running the pipeline's own functions.
  *
  * Generation is deterministic (hash-of-id, no rand()) and distributed
  * (spark.range) — the driver never holds the dataset, unlike the
  * reference's whole-file pandas read, which is the point: the same
  * code path ingests 100 TB by swapping the paths.
  *
  * Usage: runMain graft.pipeline.ScaleSmoke [rows] [rootDir]
  * Prints one JSON line with counts + stage wall times; exits nonzero
  * on any contract violation.
  */
object ScaleSmoke {

  private val Genres = Seq(
    "Action", "Adventure", "Animation", "Comedy", "Crime", "Drama",
    "Fantasy", "History", "Horror", "Music", "Mystery", "Romance",
    "Science Fiction", "Thriller", "War", "Western")
  private val Langs = Seq("en", "fr", "ja", "ko", "de", "es", "hi", "zh")
  private val Countries = Seq("US", "FR", "JP", "KR", "DE", "ES", "IN", "CN", "GB")

  /** Deterministic column generator over spark.range(n) — every value a
    * pure function of `id`, with planted dirt at fixed moduli so the
    * expected counts are exactly computable.
    */
  private[pipeline] def syntheticMovies(spark: SparkSession, rows: Long): DataFrame = {
    val id = col("id")
    def pick(options: Seq[String], salt: Int) =
      element_at(
        array(options.map(lit): _*),
        (pmod(xxhash64(id, lit(salt)), lit(options.size)) + 1).cast("int"))
    // 0-3 genres, comma-joined with assorted spacing; id%13==0 → empty.
    val nGenres = pmod(xxhash64(id, lit(1)), lit(4)).cast("int")
    val genreList = concat_ws(
      ", ",
      slice(shuffleLess(id), lit(1), nGenres))
    spark.range(rows).select(
      id.as("id"),
      // Every 97th title exercises the pandas quote dialect: embedded
      // doubled quotes AND a comma inside one quoted field.
      when(id % 97 === 0, concat(lit("The \"Quoted\", Part "), id))
        .otherwise(concat(lit("Movie "), id)).as("title"),
      concat(lit("Original "), id).as("original_title"),
      // Malformed / blank dates at fixed moduli; valid ISO otherwise.
      when(id % 41 === 0, lit("not-a-date"))
        .when(id % 53 === 0, lit(""))
        .otherwise(concat(
          (lit(1950) + pmod(xxhash64(id, lit(2)), lit(75))).cast("string"),
          lit("-"),
          lpad((pmod(xxhash64(id, lit(3)), lit(12)) + 1).cast("string"), 2, "0"),
          lit("-"),
          lpad((pmod(xxhash64(id, lit(4)), lit(28)) + 1).cast("string"), 2, "0"),
        )).as("release_date"),
      pick(Seq("Released", "Post Production", "In Production"), 5).as("status"),
      when(id % 29 === 0, lit("unknown"))
        .otherwise((pmod(xxhash64(id, lit(6)), lit(150)) + 45).cast("string"))
        .as("runtime"),
      when(id % 17 === 0, lit(""))
        .otherwise((pmod(xxhash64(id, lit(7)), lit(200000000))).cast("string"))
        .as("budget"),
      when(id % 19 === 0, lit("N/A"))
        .otherwise((pmod(xxhash64(id, lit(8)), lit(900000000))).cast("string"))
        .as("revenue"),
      round(pmod(xxhash64(id, lit(9)), lit(100)) / 10.0, 1).as("vote_average"),
      pmod(xxhash64(id, lit(10)), lit(50000)).as("vote_count"),
      // THE accounting column: id%5==0 blank, id%31==0 unparseable —
      // both must fall to the notna filter after lenient coercion.
      when(id % 5 === 0, lit(""))
        .when(id % 31 === 0, lit("N/A"))
        .otherwise(round(pmod(xxhash64(id, lit(11)), lit(90)) / 10.0 + 1.0, 1).cast("string"))
        .as("imdb_rating"),
      pmod(xxhash64(id, lit(12)), lit(2000000)).as("imdb_votes"),
      round(pmod(xxhash64(id, lit(13)), lit(10000)) / 100.0, 2).as("popularity"),
      pick(Langs, 14).as("original_language"),
      when(id % 13 === 0, lit("")).otherwise(genreList).as("genres"),
      pick(Countries, 15).as("production_countries"),
      concat(lit("Studio "), pmod(xxhash64(id, lit(16)), lit(500))).as("production_companies"),
      pick(Langs, 17).as("spoken_languages"),
      concat(lit("Actor A"), lit(", "), lit("Actor B")).as("cast"),
      concat(lit("Writer "), pmod(xxhash64(id, lit(18)), lit(1000))).as("writers"),
      concat(lit("Producer "), pmod(xxhash64(id, lit(19)), lit(1000))).as("producers"),
    )
  }

  /** A deterministic genre array per id (rotation of the static list —
    * cheap, and slice(_, 1, n) then varies membership by id). */
  private def shuffleLess(id: org.apache.spark.sql.Column) = {
    val rot = pmod(xxhash64(id, lit(20)), lit(Genres.size)).cast("int")
    // rotate the literal array by `rot`: concat(slice(a, rot+1, len), slice(a, 1, rot))
    val a = array(Genres.map(lit): _*)
    concat(slice(a, rot + 1, lit(Genres.size) - rot), slice(a, lit(1), rot))
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1200000L)
    val root =
      if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_scale_smoke").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.util.Tables.withSessionConf(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .appName("graft-scale-smoke")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val csvDir = s"$root/csv"
      val whDir = s"$root/wh"
      val sinkDir = s"$root/sink"
      val t0 = System.nanoTime()
      // Write in the pandas dialect the pipeline's reader expects
      // (doubled-quote escaping), header on, multiple part files —
      // spark.read.csv treats the directory as one logical CSV.
      syntheticMovies(spark, rows).write
        .option("header", "true").option("quote", "\"").option("escape", "\"")
        .mode("overwrite").csv(csvDir)
      val genSec = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      MoviePipeline.run(spark, csvDir, whDir, new CsvFileSink(sinkDir))
      val pipeSec = (System.nanoTime() - t1) / 1e9

      // ---- Row-accounting contract, expectations derived from the RAW
      // table with plain SQL (independent of the pipeline's Ops code).
      val raw = spark.read.parquet(s"$whDir/raw/tmdb_movies_raw")
      val rawN = raw.count()
      val expectedFacts = raw
        .filter(expr("try_cast(imdb_rating AS DOUBLE) IS NOT NULL AND NOT isnan(try_cast(imdb_rating AS DOUBLE))"))
        .count()
      // genre_fact: per surviving row, # of non-blank comma-separated
      // genre tokens (literal split + trim, straight off the raw text).
      val expectedGenreRows = raw
        .filter(expr("try_cast(imdb_rating AS DOUBLE) IS NOT NULL AND NOT isnan(try_cast(imdb_rating AS DOUBLE))"))
        .select(expr(
          "size(filter(transform(split(coalesce(genres, ''), ','), t -> trim(t)), t -> t != ''))").as("ng"))
        .agg(sum("ng")).head().getLong(0)

      val factsN = spark.read.parquet(s"$whDir/production/movie_facts").count()
      val genreN = spark.read.parquet(s"$whDir/production/movie_genre_fact").count()
      val avgN = spark.read.parquet(s"$whDir/production/genre_average_revenue").count()

      def check(name: String, got: Long, want: Long): Unit =
        if (got != want)
          sys.error(s"accounting violation: $name got $got want $want")
      check("raw_rows", rawN, rows)
      check("movie_facts", factsN, expectedFacts)
      check("movie_genre_fact", genreN, expectedGenreRows)
      if (avgN < 1 || avgN > Genres.size.toLong)
        sys.error(s"genre_average_revenue implausible: $avgN")

      // ---- Year-partitioned facts layout (SURVEY §4 / VERDICT r4 #7).
      val factsPath = new org.apache.hadoop.fs.Path(s"$whDir/production/movie_facts")
      val fs = factsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val yearDirs = fs.listStatus(factsPath)
        .filter(_.isDirectory).map(_.getPath.getName)
        .count(_.startsWith("release_year="))
      if (yearDirs < 2) sys.error(s"facts not year-partitioned: $yearDirs dirs")

      println(
        s"""{"metric":"scale_smoke","rows":$rawN,"movie_facts":$factsN,""" +
          s""""movie_genre_fact":$genreN,"genre_average_revenue":$avgN,""" +
          s""""year_partitions":$yearDirs,"gen_sec":$genSec,"pipeline_sec":$pipeSec}""")
    } finally spark.stop()
  }
}
