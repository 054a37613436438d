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
