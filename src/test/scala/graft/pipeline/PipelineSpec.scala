package graft.pipeline

import java.nio.file.Files
import graft.SparkTestBase

/** Pipeline smoke test on a movie-shaped fixture (SURVEY.md §5.4):
  * mirrors the reference's row-count accounting (transform.py:116-121)
  * and checks the flagship aggregate end to end, including the
  * clear/header/chunk sink contract.
  */
class PipelineSpec extends SparkTestBase {

  private def writeFixtureCsv(dir: String): String = {
    // FIXTURES.md §A rows: padded genres, bad dates/numerics, nulls, ties.
    val csv =
      """id,title,original_title,release_date,status,original_language,revenue,budget,runtime,vote_average,vote_count,imdb_rating,imdb_votes,popularity,genres,production_countries,production_companies,spoken_languages,cast,writers,producers
        |1,Movie A,Movie A,2009-12-15,Released,en,2787965087,237000000,162,7.6,12000,7.9,95000,150.5,"Action, Adventure ,Sci-Fi",US,StudioX,en,Actor A,Writer A,Prod A
        |2,Movie B,Movie B,garbage,Released,en,0,1000,90,6.0,50,6.1,300,4.2,,US,StudioY,en,Actor B,Writer B,Prod B
        |3,Movie C,Movie C,,Post,fr,not-a-num,,,5.5,10,,5,0.1,Drama,FR,,fr,,,
        |4,Movie D,Movie D,1994-06-01,Released,en,300000000,55000000,142,8.7,9000,8.8,120000,88.0," , ,Drama",US,StudioZ,en,Actor D,Writer D,Prod D
        |5,Movie E,Movie E,2001-01-01,Released,ja,300000000,19000000,125,8.5,8000,8.6,70000,70.0,"Drama,Action",JP,Ghibli-ish,ja,Actor E,Writer E,Prod E
        |""".stripMargin
    val f = new java.io.File(dir, "movies.csv")
    Files.writeString(f.toPath, csv)
    f.getAbsolutePath
  }

  test("ingest → transform → publish: row accounting and flagship aggregate") {
    val dir = Files.createTempDirectory("graft_pipeline").toString
    val csvPath = writeFixtureCsv(dir)
    val wh = s"$dir/warehouse"

    val rawCount = MoviePipeline.ingest(spark, csvPath, s"$wh/raw/tmdb_movies_raw")
    assert(rawCount == 5)

    val (facts, genreFact, genreAvg) =
      MoviePipeline.transform(spark, s"$wh/raw/tmdb_movies_raw", s"$wh/production")
    // Movie C has no imdb_rating → filtered (F1). 4 facts remain.
    assert(facts == 4)

    // Facts are partitioned by release_year at rest; a year filter
    // prunes at the scan and null years land in the default partition.
    val factsDf = spark.read.parquet(s"$wh/production/movie_facts")
    val y2009 = factsDf.filter(factsDf("release_year") === 2009)
    assert(y2009.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(y2009.count() == 1)
    assert(factsDf.filter(factsDf("release_year").isNull).count() == 1) // Movie B's bad date
    // genre rows: A=3 (Action,Adventure,Sci-Fi), B=0 (empty), D=1 (Drama),
    // E=2 (Drama,Action) → 6; filter ≤ input invariant of transform.py:116-121.
    assert(genreFact == 6)
    assert(genreFact <= facts * 3)

    val avg = spark.read.parquet(s"$wh/production/genre_average_revenue")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    // revenue>0 filter (F3) drops Movie B's 0-revenue row; Movie C null revenue.
    // Action: (2787965087 + 300000000)/2; Drama: (300000000+300000000)/2.
    assert(avg.map(_._1).toSet == Set("Action", "Adventure", "Sci-Fi", "Drama"))
    assert(math.abs(avg.find(_._1 == "Action").get._2 - 1543982543.5) < 1e-6)
    assert(genreAvg == 4)
    // O1: sorted desc by average_revenue.
    assert(avg.map(_._2).toSeq == avg.map(_._2).sortBy(-_).toSeq)

    // Publish through the chunked-sink contract with a tiny chunk size.
    val sink = new CsvFileSink(s"$dir/sheets")
    val published = Publish.publish(
      spark.read.parquet(s"$wh/production/movie_facts"),
      sink, "movie_facts", limit = Some(3), chunkSize = 2,
    )
    assert(published == 3) // row cap applied
    val lines = scala.io.Source.fromFile(s"$dir/sheets/movie_facts.csv").getLines().toSeq
    assert(lines.length == 4) // header + 3 rows
    assert(lines.head.startsWith("movie_fact_id,"))
  }

  test("full orchestrator run: ingest → transform → publish all three tables (R1)") {
    val dir = Files.createTempDirectory("graft_full_run").toString
    val csvPath = writeFixtureCsv(dir)
    MoviePipeline.run(spark, csvPath, s"$dir/wh", new CsvFileSink(s"$dir/sheets"))
    // All three sinks published; the capped tables carry the row cap
    // semantics, genre_average_revenue publishes uncapped.
    Seq("movie_facts", "movie_genre_fact", "genre_average_revenue").foreach { t =>
      val f = new java.io.File(s"$dir/sheets/$t.csv")
      assert(f.exists, s"$t not published")
      assert(scala.io.Source.fromFile(f).getLines().size > 1, s"$t has no data rows")
    }
    val avgLines = scala.io.Source.fromFile(s"$dir/sheets/genre_average_revenue.csv")
      .getLines().toSeq
    assert(avgLines.length == 5) // header + 4 genres (fixture)

    // The published movie_facts layout must match the reference's
    // column order (transform.py:107-113) even though the table is
    // partitioned by release_year at rest (partition columns come
    // LAST on a parquet read — run() must restore the order).
    val factsHeader = scala.io.Source.fromFile(s"$dir/sheets/movie_facts.csv")
      .getLines().next().split(",").toSeq
    assert(factsHeader == MoviePipeline.movieFactsCols.filter(factsHeader.contains),
      s"published column order diverged: $factsHeader")
    assert(factsHeader.indexOf("release_year") == 4, factsHeader.toString)
  }

  test("CSV ingest parses RFC-4180 doubled quotes like pandas (quoted commas and quotes)") {
    val dir = Files.createTempDirectory("graft_csv_quotes").toString
    val csv =
      """id,title,genres
        |1,"Movie, with comma","Action, Drama"
        |2,"He said ""hi"" twice",Comedy
        |""".stripMargin
    val f = new java.io.File(dir, "quoted.csv")
    Files.writeString(f.toPath, csv)
    val n = MoviePipeline.ingest(spark, f.getAbsolutePath, s"$dir/raw")
    assert(n == 2)
    val rows = spark.read.parquet(s"$dir/raw").orderBy("id")
      .collect().map(r => (r.getAs[Any]("id").toString, r.getAs[String]("title")))
    assert(rows(0)._2 == "Movie, with comma")
    assert(rows(1)._2 == """He said "hi" twice""")
  }

  test("publish empty-frame guard skips the sink entirely (F5)") {
    val dir = Files.createTempDirectory("graft_publish_empty").toString
    import sqlImplicits._
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val sink = new CsvFileSink(dir)
    assert(Publish.publish(empty, sink, "t") == 0)
    assert(!new java.io.File(dir, "t.csv").exists())
  }
}
