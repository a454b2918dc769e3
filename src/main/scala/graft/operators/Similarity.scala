package graft.operators

import graft.functions.VectorOps
import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Similarity search over the `embeddings` table (`array<float>` 64-dim):
  * brute-force cosine top-k as the exact baseline, and a sign-quantized
  * (1-bit LSH / IVF-style) bucketed variant as the scale path.
  *
  * Scale design: brute-force is a broadcast of the (small) query set
  * against a full scan — at 100 TB the corpus never shuffles, each
  * partition scores its rows and the per-query top-k reduces via the
  * window. The ANN variant joins only within coarse buckets (2^bits
  * cells), cutting scored pairs by ~bits orders of magnitude; recall is
  * property-tested against brute force in SimilaritySpec.
  *
  * Ranking ties are broken on rounded similarity then neighbor id, so
  * ordering is reproducible across engines (float associativity).
  */
object Similarity extends QueryPack {

  val K = 5
  val NQueries = 10
  val SignBits = 4

  /** Exact cosine top-k of `corpus` for each vector in `queries`. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_r", round(VectorOps.cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_r").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim_r"))
  }

  /** ANN: both sides sign-bucketed; each query probes only its bucket. */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      VectorOps.signBucket(col("embedding"), bits).as("bucket"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      VectorOps.signBucket(col("embedding"), bits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_r", round(VectorOps.cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_r").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim_r"))
  }

  private def sqlTopK(bucketJoin: Boolean): String = {
    val bucketExpr = (1 to SignBits).map { i =>
      s"CASE WHEN embedding[$i] >= 0 THEN ${1 << (i - 1)} ELSE 0 END"
    }.mkString(" + ")
    val joinCond =
      if (bucketJoin) "q.bucket = c.bucket AND q.query_id <> c.neighbor_id"
      else "q.query_id <> c.neighbor_id"
    s"""
      WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
               $bucketExpr AS bucket
        FROM embeddings WHERE vec_id < $NQueries
      ), c AS (
        SELECT vec_id AS neighbor_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv,
               $bucketExpr AS bucket
        FROM embeddings
      ), scored AS (
        SELECT query_id, neighbor_id,
               round(list_dot_product(qv, cv) /
                 (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS sim_r
        FROM q JOIN c ON $joinCond
      ), ranked AS (
        SELECT query_id, neighbor_id, sim_r,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY sim_r DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored
      )
      SELECT query_id, rank, neighbor_id, sim_r
      FROM ranked WHERE rank <= $K
    """.stripMargin
  }

  def queries: Map[String, Q] = Map(
    "q58_cosine_topk" -> Q(
      (s, d) => {
        val emb = T.embeddings(s, d)
        bruteForceTopK(emb.filter(col("vec_id") < NQueries), emb, K)
      },
      Some(sqlTopK(bucketJoin = false)),
      doc = "brute-force cosine top-k (exact ANN baseline)"),

    "q59_ann_sign_lsh" -> Q(
      (s, d) => {
        val emb = T.embeddings(s, d)
        annTopK(emb.filter(col("vec_id") < NQueries), emb, K, SignBits)
      },
      Some(sqlTopK(bucketJoin = true)),
      doc = "sign-quantized LSH-bucketed ANN top-k (scale path)"),

    // ---- embedding-cosine near-dup pairs (dedup family, vector flavor) ----
    "q61_embedding_neardup" -> Q(
      (s, d) => {
        val emb = T.embeddings(s, d)
        val side = emb.select(col("vec_id"), col("embedding"),
          VectorOps.signBucket(col("embedding"), SignBits).as("bucket"))
        val a = side.toDF("a_id", "a_emb", "bucket")
        val b = side.toDF("b_id", "b_emb", "bucket")
        a.join(b, Seq("bucket"))
          .filter(col("a_id") < col("b_id"))
          .withColumn("sim_r", round(VectorOps.cosine(col("a_emb"), col("b_emb")), 6))
          .filter(col("sim_r") >= 0.4)
          .select("a_id", "b_id", "sim_r")
      },
      Some {
        val bucketExpr = (1 to SignBits).map { i =>
          s"CASE WHEN embedding[$i] >= 0 THEN ${1 << (i - 1)} ELSE 0 END"
        }.mkString(" + ")
        s"""
          WITH e AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                   $bucketExpr AS bucket
            FROM embeddings
          )
          SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                 round(list_dot_product(a.v, b.v) /
                   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim_r
          FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.v, b.v) /
                   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
        """.stripMargin
      },
      doc = "embedding-cosine near-dup pairs within LSH buckets")
  )
}
