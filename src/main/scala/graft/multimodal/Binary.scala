package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}

/** Multimodal column plumbing (builder-prompt surface): media as opaque
  * `binary` columns with a typed metadata struct, plus batch
  * decode/feature-extract operators.
  *
  * The real decode (image/audio codecs) is STUBBED — this container has no
  * media libraries — behind [[FakeCodec]], a deterministic stand-in keyed
  * on the payload bytes. Everything Spark-side is real and tested: the
  * schema contract, the `mapPartitions` batch shape (one codec init per
  * partition, the same shape a Pandas-UDF/`mapInPandas` pipeline uses),
  * partitioning, and the feature-extraction projection.
  */
object Binary {

  /** Media asset schema: payload + typed metadata, the contract every
    * downstream operator sees. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("byte_len", IntegerType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = false)))

  /** Deterministic fake codec: "decodes" metadata from payload bytes.
    * STUB — replace with a real codec binding (e.g. JNI/FFI) in prod.
    * The column-level helpers below are the SAME formulas as expressions,
    * so row-level (mapPartitions) and column-level (projection) paths
    * cannot drift. */
  object FakeCodec {
    def width(n: Int): Int = 320 + n % 640
    def height(n: Int): Int = 240 + (n * 7) % 480
    def nFrames(n: Int): Int = 1 + n % 30
    def probe(payload: Array[Byte]): (Int, Int, Int) = {
      val n = if (payload == null) 0 else payload.length
      (width(n), height(n), nFrames(n))
    }
    // column-expression renditions of the same formulas
    def widthCol(len: Column): Column = lit(320) + pmod(len, lit(640))
    def heightCol(len: Column): Column = lit(240) + pmod(len * 7, lit(480))
    def nFramesCol(len: Column): Column = lit(1) + pmod(len, lit(30))
  }

  /** Wrap documents as media assets (payload = utf-8 bytes) — the offline
    * stand-in for a real binary-media table. Pure column ops. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      concat(lit("image/"), col("lang")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** Deterministic "feature extraction" stub: payload → fixed-dim vector
    * derived from byte length (a real embedding model would slot in behind
    * the same projection). The output feeds VectorOps/ANN directly; the
    * per-dim formula `((byte_len*(i+1)) mod 97)/97` is chosen to be
    * reproducible in the DuckDB oracle. Kept in float64 end-to-end: a
    * float32 quantization here is invisible to downstream math but flips
    * 1e-8-scale deltas at correctness-hash rounding boundaries unless the
    * oracle quantizes identically. */
  def extractFeatures(assets: DataFrame, dim: Int): DataFrame =
    assets.select(
      col("asset_id"), col("media_type"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => pmod(length(col("payload")) * (i + 1), lit(97)).cast("double") / 97.0)
        .as("features"))

  /** Metadata-level resize: records the target geometry, payload untouched
    * (pixel work is the codec's job — STUB boundary). */
  def resizeMeta(probed: DataFrame, w: Int, h: Int): DataFrame =
    probed.withColumn("meta", struct(
      col("meta.byte_len"), col("meta.codec"),
      lit(w).as("width"), lit(h).as("height"),
      col("meta.n_frames")))

  /** Frame sampling: one row per every-k-th frame of each asset (the
    * video→frames fan-out shape; frame payload slicing is codec work). */
  def frameSample(assets: DataFrame, every: Int): DataFrame = {
    val nFrames = FakeCodec.nFramesCol(length(col("payload")))
    assets.select(
      col("asset_id"),
      explode(sequence(lit(0), nFrames - 1, lit(every))).as("frame_idx"))
  }

  /** Batch "decode": mapPartitions so a real codec would be initialized
    * once per partition, not per row (the mapInPandas batch shape). */
  def probeMetadata(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(assetSchema.fields.toSeq)
    val rdd = assets.select("asset_id", "media_type", "payload").rdd
      .mapPartitions { rows =>
        // codec init would happen here, once per partition
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h, f) = FakeCodec.probe(payload)
          Row(r.getLong(0), r.getString(1), payload,
            Row(if (payload == null) 0 else payload.length, "fake", w, h, f))
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }
}
