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
  * - q69: IVF-style pruned top-k — candidates restricted to the query's
  *   cluster (the `label` column stands in for a trained IVF coarse
  *   quantizer / LSH bucket). Same scan, 1/nlist of the corpus touched;
  *   partition the table by cluster id at rest and partition pruning
  *   makes the restriction free.
  *
  * Norms are computed once per side; cosine = dot / (norm·norm) with
  * double accumulation in array order, matching DuckDB's
  * list_dot_product over a double list bit-for-bit.
  */
object Similarity {

  import Tables.tbl

  private val duckNorm =
    "sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE))," +
      " list_transform(embedding, x -> CAST(x AS DOUBLE))))"

  private def duckCos(a: String, b: String) =
    s"list_dot_product(list_transform($a.embedding, x -> CAST(x AS DOUBLE))," +
      s" list_transform($b.embedding, x -> CAST(x AS DOUBLE))) / ($a.nrm * $b.nrm)"

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
        WITH v AS (SELECT vec_id, label, embedding, $duckNorm AS nrm FROM embeddings),
        q AS (SELECT * FROM v WHERE vec_id < 10),
        scored AS (
          SELECT q.vec_id AS query_id, q.label AS cluster, v.vec_id AS neighbor_id,
                 ${duckCos("q", "v")} AS cos,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ${duckCos("q", "v")} DESC, v.vec_id) AS rank
          FROM q JOIN v ON q.label = v.label AND q.vec_id != v.vec_id)
        SELECT query_id, cluster, neighbor_id, round(cos, 4) AS cosine, rank
        FROM scored WHERE rank <= 3
        ORDER BY query_id, rank
      """),
    ) { (s, dir) =>
      val v = tbl(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding"))
        .withColumn("nrm", l2Norm(col("embedding")))
      val q = v.filter(col("vec_id") < 10)
        .select(
          col("vec_id").as("query_id"),
          col("label").as("cluster"),
          col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"),
        )
      val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
      v.join(
        broadcast(q),
        col("cluster") === col("label") && col("query_id") =!= col("vec_id"),
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
