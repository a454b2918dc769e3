package graft.operators

import graft.multimodal.Binary
import graft.{Q, QueryPack, Tables => T}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: binary payload plumbing with metadata
  * extraction. The oracled query sticks to pure column ops (byte length /
  * deterministic derived metadata) so DuckDB can reproduce it; the
  * mapPartitions decode path is exercised in MultimodalSpec.
  */
object Multimodal extends QueryPack {

  def queries: Map[String, Q] = Map(
    "q60_binary_meta" -> Q(
      (s, d) => {
        import s.implicits._
        Binary.assetsFromDocuments(T.documents(s, d))
          .select(
            $"asset_id", $"media_type",
            length($"payload").as("byte_len"),
            Binary.FakeCodec.widthCol(length($"payload")).as("fake_width"),
            Binary.FakeCodec.heightCol(length($"payload")).as("fake_height"))
          .groupBy($"media_type")
          .agg(count(lit(1)).as("n_assets"),
            sum($"byte_len").as("total_bytes"),
            avg($"fake_width").as("avg_width"),
            avg($"fake_height").as("avg_height"))
      },
      Some("""
        WITH assets AS (
          SELECT doc_id AS asset_id, 'image/' || lang AS media_type,
                 octet_length(encode(text)) AS byte_len
          FROM documents
        )
        SELECT media_type, count(*) AS n_assets,
               CAST(sum(byte_len) AS BIGINT) AS total_bytes,
               avg(320 + byte_len % 640) AS avg_width,
               avg(240 + (byte_len * 7) % 480) AS avg_height
        FROM assets
        GROUP BY media_type
      """.stripMargin),
      doc = "binary payload metadata plumbing (multimodal surface)"),

    // ---- feature extraction: payload → vector → norm (ANN-ready) ----
    "q63_media_features" -> Q(
      (s, d) => {
        import s.implicits._
        import graft.functions.VectorOps
        Binary.extractFeatures(Binary.assetsFromDocuments(T.documents(s, d)), dim = 8)
          .select($"asset_id", $"media_type",
            round(VectorOps.norm($"features"), 6).as("feature_norm"))
      },
      Some("""
        WITH assets AS (
          SELECT doc_id AS asset_id, 'image/' || lang AS media_type,
                 octet_length(encode(text)) AS byte_len
          FROM documents
        )
        SELECT asset_id, media_type,
               round(sqrt(list_sum(list_transform(range(0, 8),
                 i -> pow(CAST((byte_len * (i + 1)) % 97 AS DOUBLE) / 97.0, 2)))), 6)
                 AS feature_norm
        FROM assets
      """.stripMargin),
      doc = "media feature-extraction plumbing feeding VectorOps"),

    // ---- frame sampling fan-out ----
    "q64_frame_sample" -> Q(
      (s, d) => Binary.frameSample(
        Binary.assetsFromDocuments(T.documents(s, d)), every = 5),
      Some("""
        WITH assets AS (
          SELECT doc_id AS asset_id,
                 1 + octet_length(encode(text)) % 30 AS n_frames
          FROM documents
        )
        SELECT asset_id, CAST(unnest(range(0, n_frames, 5)) AS INT) AS frame_idx
        FROM assets
      """.stripMargin),
      doc = "every-kth frame fan-out per media asset")
  )
}
