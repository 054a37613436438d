package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._
import graft.util.{QueryDef, Tables}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (ArrayType(FloatType), dim 64).
  *
  * - q68: brute-force cosine top-k — the exactness baseline. The query
  *   set is broadcast; the corpus is scanned once, map-side, inside
  *   whole-stage codegen (zip_with/aggregate, no UDF). At 100 TB this
  *   is the per-partition scan every ANN index still needs underneath.
  * - q69: IVF-pruned top-k with a DERIVED coarse quantizer: nlist seed
  *   vectors are chosen deterministically (smallest vec_ids — the
  *   sample-and-seed step of IVF training; at 100 TB the centroids are
  *   likewise trained on a small sample and shipped as a broadcast
  *   artifact), every vector is assigned in-plan to its most-cosine-
  *   similar seed, and search touches only the query's cell. Partition
  *   the table by cluster id at rest and partition pruning makes the
  *   restriction free.
  *
  * Norms are computed once per side; cosine = dot / (norm·norm) with
  * double accumulation in array order, matching DuckDB's
  * list_dot_product over a double list bit-for-bit.
  */
object Similarity {

  import Tables.tbl

  /** IVF cell count (nlist). Seeds are the nlist smallest vec_ids —
    * deterministic, so Spark and the oracle derive identical clusters.
    */
  private val NList = 8

  private val duckNorm =
    "sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE))," +
      " list_transform(embedding, x -> CAST(x AS DOUBLE))))"

  private def duckCos(a: String, b: String) =
    s"list_dot_product(list_transform($a.embedding, x -> CAST(x AS DOUBLE))," +
      s" list_transform($b.embedding, x -> CAST(x AS DOUBLE))) / ($a.nrm * $b.nrm)"

  /** Shared oracle CTEs: normed vectors `v` + coarse-quantizer
    * assignment `av` (vec_id, embedding, nrm, cluster) — the DuckDB
    * twin of [[assignedVectors]], generated from the same NList.
    */
  private val duckAssignedCte: String =
    s"""v AS (SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
        seeds AS (
          SELECT vec_id AS seed_id, embedding, nrm FROM v WHERE vec_id < $NList),
        sim AS (
          SELECT v.vec_id, s.seed_id,
                 row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY ${duckCos("v", "s")} DESC, s.seed_id) AS rk
          FROM v CROSS JOIN seeds s),
        av AS (
          SELECT v.vec_id, v.embedding, v.nrm, sim.seed_id AS cluster
          FROM v JOIN sim ON v.vec_id = sim.vec_id AND sim.rk = 1)"""

  /** Corpus vectors with norm + derived IVF cluster: nlist deterministic
    * seed vectors broadcast (a trained-centroid artifact is always tiny
    * relative to the corpus), one map-side scored pass, window ranked on
    * (similarity, seed_id) for total tie determinism. Parquet-
    * snapshotted per corpus — the assignment is THE index artifact an
    * IVF system persists; q69 (cell-pruned search) and q71 (in-cell
    * near-dup) both read it, and q69's own self-join reads it twice.
    */
  private def assignedVectors(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.util.Snapshots(s, dir, "ivf-assigned") {
      val v = tbl(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .withColumn("nrm", l2Norm(col("embedding")))
      val seeds = v.filter(col("vec_id") < NList)
        .select(
          col("vec_id").as("seed_id"),
          col("embedding").as("s_emb"),
          col("nrm").as("s_nrm"),
        )
      val aw = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("seed_id"))
      v.crossJoin(broadcast(seeds))
        .select(
          col("vec_id"), col("embedding"), col("nrm"), col("seed_id"),
          cosine(col("embedding"), col("s_emb"), col("nrm"), col("s_nrm")).as("sim"),
        )
        .withColumn("rk", row_number().over(aw))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("seed_id").as("cluster"))
    }

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    QueryDef(
      "q68_knn_bruteforce",
      Some(s"""
        WITH v AS (SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
        q AS (SELECT * FROM v WHERE vec_id < 10),
        scored AS (
          SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                 ${duckCos("q", "v")} AS cos,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ${duckCos("q", "v")} DESC, v.vec_id) AS rank
          FROM q JOIN v ON q.vec_id != v.vec_id)
        SELECT query_id, neighbor_id, round(cos, 4) AS cosine, rank
        FROM scored WHERE rank <= 5
        ORDER BY query_id, rank
      """),
    ) { (s, dir) =>
      val v = tbl(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .withColumn("nrm", l2Norm(col("embedding")))
      val q = v.filter(col("vec_id") < 10)
        .select(
          col("vec_id").as("query_id"),
          col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"),
        )
      val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
      v.join(broadcast(q), col("query_id") =!= col("vec_id"))
        .select(
          col("query_id"),
          col("vec_id").as("neighbor_id"),
          cosine(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm")).as("cos"),
        )
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // ------------------------------------------------------------------
    QueryDef(
      "q69_knn_ivf",
      Some(s"""
        WITH $duckAssignedCte,
        q AS (SELECT * FROM av WHERE vec_id < 10),
        scored AS (
          SELECT q.vec_id AS query_id, q.cluster, v.vec_id AS neighbor_id,
                 ${duckCos("q", "v")} AS cos,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ${duckCos("q", "v")} DESC, v.vec_id) AS rank
          FROM q JOIN av v ON q.cluster = v.cluster AND q.vec_id != v.vec_id)
        SELECT query_id, cluster, neighbor_id, round(cos, 4) AS cosine, rank
        FROM scored WHERE rank <= 3
        ORDER BY query_id, rank
      """),
    ) { (s, dir) =>
      val assigned = assignedVectors(s, dir)
      // vec_id < 10 is the window's partition key → Catalyst pushes it
      // below the window, so the query branch only assigns 10 vectors.
      val q = assigned.filter(col("vec_id") < 10)
        .select(
          col("vec_id").as("query_id"),
          col("cluster").as("q_cluster"),
          col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"),
        )
      val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
      assigned.join(
        broadcast(q),
        col("q_cluster") === col("cluster") && col("query_id") =!= col("vec_id"),
      )
        .select(
          col("query_id"),
          col("cluster"),
          col("vec_id").as("neighbor_id"),
          cosine(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm")).as("cos"),
        )
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(
          col("query_id"), col("cluster"), col("neighbor_id"),
          round(col("cos"), 4).as("cosine"), col("rank"),
        )
        .orderBy("query_id", "rank")
    },

    // ------------------------------------------------------------------
    // Embedding-cosine near-dup, SemDeDup-shaped (Abbas et al. '23:
    // cluster the embedding space, then compare only within cells):
    // pairwise cosine is computed ONLY inside each derived IVF cell and
    // the top pairs per cell are reported. At 100 TB nlist grows with
    // the corpus so cells stay bounded — the all-pairs comparison is
    // never materialized; a production run would filter cos ≥ τ, the
    // query keeps a deterministic top-3 per cell so the result is
    // non-empty on any corpus.
    QueryDef(
      "q71_embedding_neardup",
      Some(s"""
        WITH $duckAssignedCte,
        pairs AS (
          SELECT a.cluster, a.vec_id AS d1, b.vec_id AS d2,
                 ${duckCos("a", "b")} AS cos,
                 row_number() OVER (
                   PARTITION BY a.cluster
                   ORDER BY ${duckCos("a", "b")} DESC, a.vec_id, b.vec_id) AS rank
          FROM av a JOIN av b ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
        SELECT cluster, d1, d2, round(cos, 4) AS cosine, rank
        FROM pairs WHERE rank <= 3
        ORDER BY cluster, rank
      """),
    ) { (s, dir) =>
      val a = assignedVectors(s, dir)
        .select(col("cluster"), col("vec_id").as("d1"),
          col("embedding").as("e1"), col("nrm").as("n1"))
      val b = assignedVectors(s, dir)
        .select(col("cluster"), col("vec_id").as("d2"),
          col("embedding").as("e2"), col("nrm").as("n2"))
      val w = Window.partitionBy("cluster").orderBy(desc("cos"), asc("d1"), asc("d2"))
      a.join(b, Seq("cluster"))
        .filter(col("d1") < col("d2"))
        .select(
          col("cluster"), col("d1"), col("d2"),
          cosine(col("e1"), col("e2"), col("n1"), col("n2")).as("cos"),
        )
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("cluster"), col("d1"), col("d2"),
          round(col("cos"), 4).as("cosine"), col("rank"))
        .orderBy("cluster", "rank")
    },

    // ------------------------------------------------------------------
    // IVF index-quality evaluation: recall@3 of the cell-pruned search
    // (q69's construction) against brute-force ground truth (q68's),
    // per query. The operational metric every ANN deployment monitors —
    // pruning that silently loses neighbors shows up here, not in a
    // crash. Both rankings use identical cosines and tiebreaks, so the
    // overlap (and hence the oracle hash) is fully deterministic.
    QueryDef(
      "q73_ivf_recall",
      Some(s"""
        WITH $duckAssignedCte,
        q AS (SELECT * FROM av WHERE vec_id < 10),
        brute AS (
          SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                   row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY ${duckCos("q", "v")} DESC, v.vec_id) AS rank
            FROM q JOIN av v ON q.vec_id != v.vec_id)
          WHERE rank <= 3),
        ivf AS (
          SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                   row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY ${duckCos("q", "v")} DESC, v.vec_id) AS rank
            FROM q JOIN av v ON q.cluster = v.cluster AND q.vec_id != v.vec_id)
          WHERE rank <= 3),
        hits AS (
          SELECT b.query_id, count(*) AS n_hits
          FROM brute b JOIN ivf i
            ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
          GROUP BY b.query_id)
        SELECT q.vec_id AS query_id,
               round(coalesce(n_hits, 0) / 3.0, 4) AS recall_at_3
        FROM q LEFT JOIN hits ON q.vec_id = hits.query_id
        ORDER BY query_id
      """),
    ) { (s, dir) =>
      val assigned = assignedVectors(s, dir)
      val q = assigned.filter(col("vec_id") < 10)
        .select(
          col("vec_id").as("query_id"),
          col("cluster").as("q_cluster"),
          col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"),
        )
      val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
      def topk(joinCond: org.apache.spark.sql.Column) =
        assigned.join(broadcast(q), joinCond)
          .select(
            col("query_id"), col("vec_id").as("neighbor_id"),
            cosine(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm")).as("cos"),
          )
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select("query_id", "neighbor_id")
      val brute = topk(col("query_id") =!= col("vec_id"))
      val ivf = topk(col("q_cluster") === col("cluster") && col("query_id") =!= col("vec_id"))
      val hits = brute.join(ivf, Seq("query_id", "neighbor_id"))
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_hits"))
      q.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(
          col("query_id"),
          round(coalesce(col("n_hits"), lit(0)) / 3.0, 4).as("recall_at_3"),
        )
        .orderBy("query_id")
    },

    // ------------------------------------------------------------------
    // Multimodal plumbing, SQL-visible part: opaque binary payload +
    // typed metadata (byte length, content digest, a deterministic
    // stub "feature"). The batch decode path lives in
    // graft.ext.Multimodal (mapPartitions over binary columns).
    QueryDef(
      "q70_multimodal_meta",
      Some("""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               substr(md5(text), 1, 16) AS content_digest,
               CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 360 AS stub_hue
        FROM documents
        ORDER BY doc_id
      """),
    ) { (s, dir) =>
      val bin = col("text").cast("binary")
      tbl(s, dir, "documents")
        .select(
          col("doc_id"),
          length(bin).as("n_bytes"),
          substring(md5(bin), 1, 16).as("content_digest"),
          (conv(substring(md5(bin), 1, 8), 16, 10).try_cast("bigint") % 360)
            .as("stub_hue"),
        )
        .orderBy("doc_id")
    },
  )
}
