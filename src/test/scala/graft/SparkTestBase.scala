package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — small core count and shuffle
  * partitions sized to it (the 32-thread bench config would slow tiny
  * unit-test plans down with scheduling overhead).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
  // Stable path for `import sqlImplicits._` in subclasses.
  val sqlImplicits: org.apache.spark.sql.SQLImplicits = SparkTestBase.session.implicits
}

/** Per-suite temp corpus dirs with deep cleanup in afterAll — fixture
  * parquet is multi-MB per encoding and would otherwise accumulate in
  * tmpdir across runs. Mix in, create dirs via [[tempCorpusDir]].
  */
trait TempCorpusDirs extends org.scalatest.BeforeAndAfterAll {
  this: org.scalatest.Suite =>
  private val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[String]
  def tempCorpusDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    tmpDirs.synchronized(tmpDirs += d)
    d
  }
  override def afterAll(): Unit = {
    import scala.jdk.CollectionConverters._
    tmpDirs.foreach { d =>
      val p = java.nio.file.Paths.get(d)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
    super.afterAll()
  }
}

/** Shared fixtures for the at-rest maintenance/retraction specs: the
  * parquet round-trip (merges and retractions must read the compact
  * AT-REST artifact, as production would, and the round-trip lets the
  * plan pins count source scans), canonical row strings, and the
  * explain-based scan counter. One definition — the helpers were
  * previously copied per suite, where the scan-counting convention
  * could drift — with [[TempCorpusDirs]] cleanup underneath.
  */
trait ArtifactSpecHelpers extends TempCorpusDirs {
  this: SparkTestBase =>

  def atRest(df: org.apache.spark.sql.DataFrame, name: String): org.apache.spark.sql.DataFrame = {
    val out = s"${tempCorpusDir(s"graft_atrest_$name")}/$name"
    df.write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
  }

  def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  /** How many scan nodes of `file` the final plan holds. */
  def scansOf(df: org.apache.spark.sql.DataFrame, file: String): Int =
    df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.count(l => l.contains("Location") && l.contains(file))

  def docScans(df: org.apache.spark.sql.DataFrame): Int = scansOf(df, "documents.parquet")
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = graft.util.Tables.withSessionConf(
      SparkSession.builder()
        .master("local[4]")
        .appName("graft-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        // Catalog-table tests (saveAsTable) must not litter the repo cwd.
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
