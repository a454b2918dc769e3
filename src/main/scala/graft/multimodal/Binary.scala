package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}

/** Multimodal column plumbing (builder-prompt surface): media as opaque
  * `binary` columns with a typed metadata struct, plus batch
  * decode/feature-extract operators.
  *
  * The IMAGE path is REAL since round 10: [[Bmp]] encodes genuine 24-bit
  * BMP payloads and [[decodeImageStats]] decodes them with the JDK's
  * `javax.imageio.ImageIO` (a true codec, no external deps) inside the
  * `mapPartitions` batch seam, deriving pixel-level features — decoded
  * dimensions, per-channel means, an 8-bin luma histogram. q124 oracles
  * those features end-to-end: the synthetic pixels are deterministic
  * integer arithmetic of (asset_id, x, y), so DuckDB recomputes the
  * expected statistics WITHOUT decoding — any defect in the encoder OR
  * the decode path breaks the hash match.
  *
  * The AUDIO path is REAL since round 11: [[Wav]] encodes genuine
  * RIFF/WAV 16-bit PCM containers and [[decodeAudioStats]] decodes
  * them with the JDK's `javax.sound.sampled.AudioSystem` (a true WAV
  * parser, no external deps), deriving per-channel frame counts, peak,
  * zero crossings, energy, RMS and duration — q129 oracles those
  * against the sample generator's integer arithmetic, same trick.
  *
  * VIDEO remains the one declared stub behind [[FakeCodec]]: the JDK
  * ships no video container codec and this container has no media
  * libraries, so only its Spark-side plumbing — the schema contract,
  * the one-codec-init-per-partition batch shape (mapInPandas-
  * equivalent), partitioning, the feature projection — is real and
  * tested.
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

  /** Minimal 24-bit uncompressed BMP (BITMAPINFOHEADER) encoder — enough
    * of the real format for the JDK's ImageIO BMP reader to round-trip
    * losslessly: bottom-up rows, BGR byte order, 4-byte row padding.
    * Pixels come from `rgb(x, y)` (packed 0xRRGGBB, (0,0) = top-left). */
  object Bmp {
    def encode(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      require(width > 0 && height > 0, s"bad dims ${width}x$height")
      val rowSize = ((3 * width + 3) / 4) * 4
      val imageSize = rowSize * height
      val fileSize = 54 + imageSize
      val b = java.nio.ByteBuffer.allocate(fileSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
        .putShort(0).putShort(0).putInt(54) // reserved, pixel-data offset
      b.putInt(40).putInt(width).putInt(height) // positive height = bottom-up
        .putShort(1).putShort(24).putInt(0)     // planes, bpp, BI_RGB
        .putInt(imageSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = height - 1 // bottom-up storage, top-down generator coords
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val p = rgb(x, y)
          b.put((p & 0xff).toByte)          // B
            .put(((p >> 8) & 0xff).toByte)  // G
            .put(((p >> 16) & 0xff).toByte) // R
          x += 1
        }
        var pad = rowSize - 3 * width
        while (pad > 0) { b.put(0.toByte); pad -= 1 }
        y -= 1
      }
      b.array()
    }
  }

  /** The q124 synthetic corpus: one genuine BMP per document, geometry
    * and pixels pure integer arithmetic of (asset_id, x, y) — the
    * IbrdScale trick, letting DuckDB compute the expected DECODED
    * statistics without a codec. Encoding runs in `mapPartitions` (the
    * batch seam a real transcode job uses). */
  def syntheticBmpAssets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = docs.select("doc_id").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = (syntheticWidth(id), syntheticHeight(id))
        val bytes = Bmp.encode(w, h, (x, y) => {
          val red = ((id + 3L * x + 7L * y) % 256).toInt
          val green = ((5L * id + 11L * x + y) % 256).toInt
          val blue = ((2L * id + x + 13L * y) % 256).toInt
          (red << 16) | (green << 8) | blue
        })
        Row(id, "image/bmp", bytes)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  def syntheticWidth(id: Long): Int = (16 + id % 16).toInt
  def syntheticHeight(id: Long): Int = (8 + id % 8).toInt

  /** REAL image decode + pixel feature extraction: ImageIO-decode each
    * payload once (per-partition iterator — the batch codec seam),
    * derive decoded width/height, per-channel means (exact integer sums,
    * divided once — bit-stable in any engine) and an 8-bin integer-luma
    * histogram (ITU-R BT.709 integer weights, `luma/32` binning). All
    * arithmetic on decoded bytes is integer-exact, so the only way to
    * match the generator-arithmetic oracle is for encode→decode to
    * round-trip every pixel. */
  def decodeImageStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(
      StructField("asset_id", LongType, nullable = false) +:
      StructField("width", IntegerType, nullable = false) +:
      StructField("height", IntegerType, nullable = false) +:
      StructField("sum_r", LongType, nullable = false) +:
      StructField("sum_g", LongType, nullable = false) +:
      StructField("sum_b", LongType, nullable = false) +:
      (0 until 8).map(i => StructField(s"h$i", LongType, nullable = false)))
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        require(img != null, s"asset $id: ImageIO found no decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        val hist = new Array[Long](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val red = (p >> 16) & 0xff
            val green = (p >> 8) & 0xff
            val blue = p & 0xff
            sr += red; sg += green; sb += blue
            val luma = (red * 2126 + green * 7152 + blue * 722) / 10000
            hist(luma / 32) += 1
            x += 1
          }
          y += 1
        }
        // Seq[Any]: an untyped Seq would numerically WIDEN the Int
        // dims to Long and break the Row↔schema type contract
        Row.fromSeq(Seq[Any](id, w, h, sr, sg, sb) ++ hist)
      }
    }
    // channel sums leave the decoder as EXACT integers; the means divide
    // once and round(6) in the engine (HALF_UP on identical doubles in
    // Spark and DuckDB — no per-row float accumulation anywhere)
    val n = col("width").cast("long") * col("height").cast("long")
    spark.createDataFrame(rdd, outSchema)
      .select(Seq(
        col("asset_id"), col("width"), col("height"),
        round(col("sum_r").cast("double") / n, 6).as("mean_r"),
        round(col("sum_g").cast("double") / n, 6).as("mean_g"),
        round(col("sum_b").cast("double") / n, 6).as("mean_b")) ++
        (0 until 8).map(i => col(s"h$i")): _*)
  }

  /** Minimal RIFF/WAVE container around 16-bit little-endian signed PCM
    * — the real format, enough for the JDK's `javax.sound.sampled` WAV
    * reader to parse the header and hand back the frames. `samples` is
    * channel-interleaved (frame-major), the canonical WAV layout. */
  object Wav {
    def encode(sampleRate: Int, channels: Int,
               samples: Array[Short]): Array[Byte] = {
      require(channels > 0 && samples.length % channels == 0,
        s"${samples.length} samples not a multiple of $channels channels")
      val blockAlign = 2 * channels
      val dataSize = 2 * samples.length
      val b = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)                       // PCM
        .putShort(channels.toShort)
        .putInt(sampleRate)
        .putInt(sampleRate * blockAlign)   // byte rate
        .putShort(blockAlign.toShort)
        .putShort(16)                      // bits per sample
      b.put("data".getBytes("US-ASCII")).putInt(dataSize)
      var i = 0
      while (i < samples.length) { b.putShort(samples(i)); i += 1 }
      b.array()
    }
  }

  /** The q129 synthetic corpus (VERDICT r10 §next-2, the q124 recipe
    * for audio): one genuine RIFF/WAV asset per document — 16-bit PCM,
    * 8 kHz, mono or stereo — whose every sample is integer arithmetic
    * of (asset_id, frame, channel), so DuckDB recomputes the expected
    * DECODED statistics without any codec. */
  def syntheticWavAssets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = docs.select("doc_id").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = syntheticFrames(id)
        val ch = syntheticChannels(id)
        val samples = new Array[Short](n * ch)
        var t = 0
        while (t < n) {
          var c = 0
          while (c < ch) {
            samples(t * ch + c) = syntheticSample(id, t, c)
            c += 1
          }
          t += 1
        }
        Row(id, "audio/wav", Wav.encode(AudioRate, ch, samples))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  val AudioRate = 8000
  def syntheticFrames(id: Long): Int = (800 + id % 400).toInt
  def syntheticChannels(id: Long): Int = (1 + id % 2).toInt
  /** All-positive before the mod so Spark, JVM `%`, and DuckDB `%`
    * agree. The frame stride (4093, odd) makes the wave a full-range
    * sawtooth that wraps every ~16 frames — every asset genuinely
    * exercises the zero-crossing and peak logic (a small stride never
    * left the negative half-range and degenerated zc to 0). */
  def syntheticSample(id: Long, t: Long, c: Long): Short =
    (((31L * id + 4093L * t + 7919L * c) % 65536L) - 32768L).toShort

  /** REAL audio decode + per-channel feature extraction: each payload
    * runs through `javax.sound.sampled.AudioSystem`'s WAV parser once
    * (per-partition iterator — the batch codec seam, where a real codec
    * binding would be initialized once per partition), then the decoded
    * frames yield per-channel features in EXACT integer arithmetic —
    * frame count, peak |amplitude|, zero crossings (sign flips between
    * consecutive frames), sum of squares — plus RMS and duration, each
    * a single division/sqrt on exact integers (bit-identical in any
    * engine). One output row per (asset, channel). The only way to
    * match the generator-arithmetic oracle is for encode →
    * AudioSystem → sample walk to round-trip every frame. */
  def decodeAudioStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("channel", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("peak_abs", IntegerType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false),
      StructField("sumsq", LongType, nullable = false)))
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"asset $id: unexpected decoded format $fmt")
        val ch = fmt.getChannels
        val rate = fmt.getSampleRate.toInt
        val bytes = in.readAllBytes(); in.close()
        val frames = bytes.length / (2 * ch)
        val peak = new Array[Int](ch)
        val zc = new Array[Long](ch)
        val sumsq = new Array[Long](ch)
        val prev = new Array[Int](ch)
        var t = 0
        while (t < frames) {
          var c = 0
          while (c < ch) {
            val o = 2 * (t * ch + c)
            val s = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
            if (math.abs(s) > peak(c)) peak(c) = math.abs(s)
            sumsq(c) += s.toLong * s
            if (t > 0 && ((s >= 0) != (prev(c) >= 0))) zc(c) += 1
            prev(c) = s
            c += 1
          }
          t += 1
        }
        (0 until ch).map(c => Row(id, c, frames, rate, peak(c), zc(c), sumsq(c)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
      .select(col("asset_id"), col("channel"), col("n_frames"),
        col("peak_abs"), col("zero_crossings"), col("sumsq"),
        round(sqrt(col("sumsq").cast("double") / col("n_frames")), 6).as("rms"),
        round(col("n_frames").cast("double") / col("sample_rate"), 6)
          .as("duration_sec"))
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
