package graft.queries

import java.nio.file.Files
import scala.util.Random

import graft.{SparkEntry, SparkTestBase}

/** Quality-level validation of the ANN stack on PLANTED clusters: with
  * well-separated clusters and one seed per cluster, the IVF coarse
  * quantizer must assign perfectly and cell-pruned search must agree
  * with brute force exactly (recall@3 = 1.0 for every query). On
  * random data (the oracle corpus) recall is whatever it is — q73
  * reports it; here the geometry makes the right answer known.
  */
class AnnQualitySpec extends SparkTestBase {
  import sqlImplicits._

  private val Dim = 64
  private val Clusters = 8
  private val PerCluster = 25

  private lazy val corpusDir: String = {
    val rng = new Random(7)
    val dir = Files.createTempDirectory("graft_ann_quality").toString
    // Cluster c's centroid is the basis vector at dim c → pairwise
    // orthogonal; members add ±0.05 noise, so intra-cluster cosine is
    // ≈0.99 and inter-cluster ≈0. vec_ids 0..7 are one member per
    // cluster (the deterministic seeds pick them up, making the
    // quantizer geometrically perfect); ids 8,9 land in clusters 0,1.
    def member(c: Int): Seq[Float] =
      Seq.tabulate(Dim)(d =>
        (if (d == c) 1f else 0f) + (rng.nextFloat() - 0.5f) * 0.1f)
    val rows =
      (0 until Clusters).map(c => (c.toLong, member(c), c)) ++
        Seq((8L, member(0), 0), (9L, member(1), 1)) ++
        (0 until Clusters).flatMap { c =>
          (0 until PerCluster - 1).map { j =>
            (10L + c * (PerCluster - 1) + j, member(c), c)
          }
        }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("IVF recall@3 is exactly 1.0 on separable clusters") {
    val recalls = SparkEntry.queries("q73_ivf_recall")(spark, corpusDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(recalls.size == 10)
    recalls.foreach { case (q, r) => assert(r == 1.0, s"query $q recall $r") }
  }

  test("cell-pruned top-3 equals brute-force top-3 per query") {
    def topSets(name: String, maxRank: Int): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, corpusDir)
        .select("query_id", "neighbor_id", "rank").collect()
        .filter(_.getInt(2) <= maxRank)
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val brute = topSets("q68_knn_bruteforce", 3)
    val ivf = topSets("q69_knn_ivf", 3)
    ivf.foreach { case (q, neigh) =>
      assert(neigh == brute(q), s"query $q: IVF found $neigh, brute top-3 ${brute(q)}")
    }
  }

  test("embedding near-dup pairs stay within their planted cluster") {
    val assigned = SparkEntry.queries("q71_embedding_neardup")(spark, corpusDir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(assigned.nonEmpty)
    // Cluster of a planted vec is recoverable from how ids were laid out.
    def clusterOf(id: Long): Long =
      if (id < 8) id else if (id < 10) id - 8 else (id - 10) / (PerCluster - 1)
    assigned.foreach { case (d1, d2, cos) =>
      assert(clusterOf(d1) == clusterOf(d2), s"cross-cluster pair ($d1,$d2)")
      assert(cos > 0.9, s"pair ($d1,$d2) cosine $cos suspiciously low")
    }
  }
}
