package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus the Spark-side plumbing for decode /
  * feature-extract / frame-sample stages.
  *
  * Two parallel paths share the same bounded-batch mapPartitions contract:
  *
  *  - STUB path ([[decodeStub]], [[frameSampleStub]],
  *    [[extractFeaturesStub]]): deterministic MD5/xxhash arithmetic that
  *    ANY engine can mirror — it exists so the plumbing (schema, batch
  *    shape, partition sizing, metadata propagation) gets a full
  *    hash-matched DuckDB oracle.
  *  - REAL path ([[synthesizeBmp]], [[decodeImages]], [[phash64]]):
  *    genuine image bytes end-to-end on the pure JDK — a hand-rolled BMP
  *    encoder, javax.imageio decode (BMP/PNG/JPEG/GIF readers ship with
  *    the JDK), BT.601 luma, and the classic 32×32-DCT perceptual hash.
  *    Audio/video codecs are not in this container; those decode steps
  *    remain stubs behind the same signatures.
  *
  * Scale design: payloads never pass through a shuffle — metadata is
  * projected out early and the binary column is carried only by narrow
  * (map-side) stages; feature extraction runs in mapPartitions with a
  * bounded batch size so executor memory holds `batchSize × maxPayload`
  * bytes, not a whole partition of media.
  */
object Multimodal {

  /** Media metadata schema carried alongside a payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("bytes", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a string column as a binary payload column (UTF-8). Stands in for
    * reading real media bytes; byte-length semantics are real (multi-byte
    * text exercises them). */
  def payloadFromText(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    encode(text, "UTF-8")

  /** ======= STUB ======= deterministic fake decode.
    * Real implementation: parse the container header (PNG/JPEG/WAV…) from
    * the leading bytes. Here: byte length is real; format/width/height are
    * derived deterministically from a payload hash so tests are stable.
    * Replace the body with a codec call to productionize — the signature
    * (binary → struct) is the contract. */
  def decodeStub(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = abs(xxhash64(payload))
    struct(
      length(payload).cast(LongType).as("bytes"),
      element_at(array(lit("png"), lit("jpeg"), lit("webp")), (h % 3 + 1).cast(IntegerType))
        .as("format"),
      (h % 1920 + 1).cast(IntegerType).as("width"),
      (h % 1080 + 1).cast(IntegerType).as("height"))
  }

  /** Attach decoded metadata to a payload column. */
  def withMediaMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("media_meta", decodeStub(col(payloadCol)))

  /** ======= STUB ======= frame sampling plumbing: split a payload into n
    * evenly-spaced "frames" (byte slices). Real impl: demux + keyframe
    * extraction. The slicing arithmetic, array-of-binary schema, and
    * explode-downstream shape are the real contract. */
  def frameSampleStub(payload: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val len = length(payload)
    val frame = (len / n).cast(IntegerType)
    array((0 until n).map { i =>
      substring(payload, lit(i).cast(IntegerType) * frame + 1, frame)
    }: _*)
  }

  // ======================================================== real codecs
  // The stubs above remain the ORACLE path (MD5 arithmetic any engine can
  // mirror). Below is the real-bytes path behind the same bounded-batch
  // mapPartitions contract: genuine image encode (hand-rolled BMP writer),
  // genuine decode (pure-JDK javax.imageio — BMP/PNG/JPEG/GIF readers ship
  // with the JDK), and a genuine 32×32 DCT perceptual hash. A production
  // deployment swaps the synthesizer for its real media source; decode and
  // pHash run as-is.

  /** Deterministic test-pattern gray value for pixel (x, y) of image `id` —
    * shared by the BMP synthesizer, the decode oracle SQL, and the specs. */
  @inline private[graft] def patternGray(id: Long, x: Int, y: Int): Int =
    (((id * 31 + x.toLong * 7 + y.toLong * 13) % 256L) + 256L).toInt % 256

  private[graft] def patternWidth(id: Long): Int = (8 + id % 9).toInt
  private[graft] def patternHeight(id: Long): Int = (8 + id % 7).toInt

  /** Encode one REAL 24-bit BMP (54-byte header + bottom-up BGR rows padded
    * to 4 bytes) of the deterministic test pattern. The bytes are a valid
    * image any viewer opens; javax.imageio parses them back. */
  private[graft] def encodeBmp(id: Long): Array[Byte] = {
    val w = patternWidth(id); val h = patternHeight(id)
    val rowBytes = (w * 3 + 3) / 4 * 4
    val size = 54 + rowBytes * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var y = h - 1 // BMP rows are stored bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val g = patternGray(id, x, y).toByte
        b.put(g).put(g).put(g) // B, G, R — gray
        x += 1
      }
      var pad = rowBytes - w * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** (id, payload): one REAL BMP of the deterministic pattern per input
    * row. Narrow (no shuffle); payloads are born distributed and never
    * leave their partition before [[decodeImages]]/[[phash64]]. */
  def synthesizeBmp(df: DataFrame, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(df.schema(idCol),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map(r => Row(r.get(idIdx), encodeBmp(r.getLong(idIdx))))
    }(encoder).toDF()
  }

  private def sniffFormat(p: Array[Byte]): String =
    if (p.length >= 2 && p(0) == 'B' && p(1) == 'M') "bmp"
    else if (p.length >= 4 && (p(0) & 0xFF) == 0x89 && p(1) == 'P'
      && p(2) == 'N' && p(3) == 'G') "png"
    else if (p.length >= 2 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8)
      "jpeg"
    else if (p.length >= 4 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F') "gif"
    else "unknown"

  private def readImage(p: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
    require(img != null, "decodeImages: payload is not a decodable image")
    img
  }

  /** ITU-R BT.601 luma of an ARGB pixel, in integer arithmetic (the exact
    * weights ×1000, rounded half-up) — deterministic across JVMs. */
  @inline private def luma(argb: Int): Int = {
    val r = (argb >> 16) & 0xFF; val g = (argb >> 8) & 0xFF; val b = argb & 0xFF
    (299 * r + 587 * g + 114 * b + 500) / 1000
  }

  /** REAL image decode via javax.imageio over bounded batches: returns
    * (id, format, width, height, gray_sum) where gray_sum is the sum of
    * per-pixel BT.601 luma — a value that only a genuine pixel decode can
    * produce (and that the deterministic test pattern lets a SQL oracle
    * predict). Peak memory is batchSize × payload, independent of
    * partition size. */
  def decodeImages(df: DataFrame, idCol: String, payloadCol: String,
                   batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(df.schema(idCol),
      StructField("format", StringType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("gray_sum", LongType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val payload = r.getAs[Array[Byte]](payIdx)
          val img = readImage(payload)
          var sum = 0L; var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              sum += luma(img.getRGB(x, y)); x += 1
            }
            y += 1
          }
          Row(r.get(idIdx), sniffFormat(payload),
            img.getWidth, img.getHeight, sum)
        }
      }
    }(encoder).toDF()
  }

  /** 32×32 DCT basis row u: cos((2x+1)·u·π/64), x = 0..31. */
  private lazy val dctBasis: Array[Array[Double]] =
    Array.tabulate(32, 32)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / 64.0))

  /** REAL perceptual hash (the classic pHash construction): decode →
    * BT.601 luma → nearest-neighbor 32×32 → separable 2-D DCT-II → the
    * top-left 8×8 low-frequency block → each AC coefficient thresholds
    * against the MEDIAN of the 63 AC coefficients → 64-bit hash (bit
    * u·8+v; DC bit 0 always clear). Near-duplicate images differ in a few
    * bits; unrelated images in ~32. Same bounded-batch contract as
    * [[decodeImages]]; returns (id, phash). Hamming-distance blocking
    * downstream is the [[graft.functions.Dedup.simhashSignatures]]
    * machinery — pHash is just another 64-bit signature. */
  def phash64(df: DataFrame, idCol: String, payloadCol: String,
              batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(df.schema(idCol),
      StructField("phash", LongType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val img = readImage(r.getAs[Array[Byte]](payIdx))
          val w = img.getWidth; val h = img.getHeight
          // nearest-neighbor luma resample to 32×32
          val p = Array.ofDim[Double](32, 32)
          var y = 0
          while (y < 32) {
            val sy = y * h / 32
            var x = 0
            while (x < 32) { p(y)(x) = luma(img.getRGB(x * w / 32, sy)); x += 1 }
            y += 1
          }
          // separable DCT, low-frequency 8×8 block only: rowPass = P·Cᵀ
          val rowPass = Array.ofDim[Double](32, 8)
          y = 0
          while (y < 32) {
            var v = 0
            while (v < 8) {
              var s = 0.0; var x = 0
              while (x < 32) { s += p(y)(x) * dctBasis(v)(x); x += 1 }
              rowPass(y)(v) = s; v += 1
            }
            y += 1
          }
          val coef = Array.ofDim[Double](8, 8)
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              var s = 0.0; var yy = 0
              while (yy < 32) { s += dctBasis(u)(yy) * rowPass(yy)(v); yy += 1 }
              coef(u)(v) = s; v += 1
            }
            u += 1
          }
          val ac = (for (i <- 0 until 8; j <- 0 until 8; if i != 0 || j != 0)
            yield coef(i)(j)).toArray
          val sorted = ac.sorted
          val median = sorted(31) // middle of 63
          var hash = 0L
          u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              if ((u != 0 || v != 0) && coef(u)(v) > median)
                hash |= 1L << (u * 8 + v)
              v += 1
            }
            u += 1
          }
          Row(r.get(idIdx), hash)
        }
      }
    }(encoder).toDF()
  }

  /** Feature extraction over payload batches via mapPartitions — the Scala
    * analog of a pandas-UDF/mapInPandas stage: rows are processed in bounded
    * batches so peak memory is batchSize × payload, independent of partition
    * size.
    *
    * ======= STUB ======= the per-payload "model" is a deterministic 8-dim
    * vector derived from the payload's MD5 (first two digest bytes → h ∈
    * [0, 65535]; feature i = float32 of (h·(i+1) mod 2¹⁶)/65535 − 0.5); a
    * real deployment runs the codec + encoder here (the only non-plumbing
    * lines are marked). MD5 rather than an ad-hoc JVM hash so the stub
    * arithmetic is reproducible by ANY engine — the driver's DuckDB oracle
    * mirrors it exactly (double math, then one round-to-float), giving the
    * mapPartitions plumbing a full hash-matched correctness check.
    */
  def extractFeaturesStub(spark: SparkSession, df: DataFrame, payloadCol: String,
                          idCol: String, batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val out: Dataset[Row] = df.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.grouped(batchSize).flatMap { batch =>
        // REAL IMPL HERE: decode batch of payloads + run feature model.
        batch.map { r =>
          val payload = r.getAs[Array[Byte]](payIdx)
          val dig = md.digest(payload) // resets the digest for the next row
          val h = ((dig(0) & 0xFF) << 8) | (dig(1) & 0xFF)
          val feats = Array.tabulate(8) { i =>
            ((h.toLong * (i + 1)) % 65536L).toDouble / 65535.0 - 0.5
          }.map(_.toFloat) // STUB features
          Row(r.get(idIdx), feats)
        }
      }
    }(encoder)
    out.toDF()
  }

  // ------------------------------------------------------------------ audio
  // REAL audio path — javax.sound.sampled ships with the JDK, so like the
  // BMP/imageio pair above this is a genuine encode → container parse →
  // sample decode chain, not a stub: the synthesizer writes valid RIFF/WAVE
  // PCM bytes any player opens, AudioSystem parses them back, and the
  // window features are integer arithmetic a SQL oracle predicts exactly.
  // (Video remains a documented stub: the container has no video codecs.)

  /** 20 ms at 8 kHz — the standard speech analysis frame. */
  val AudioWindow = 160
  val AudioRate = 8000

  /** Deterministic 16-bit PCM test sample i of clip `id` — shared by the
    * WAV synthesizer, the decode oracle SQL, and the specs. Non-negative
    * mod, like [[patternGray]]. */
  @inline private[graft] def patternSample(id: Long, i: Int): Int =
    ((((id * 31 + i.toLong * 7) % 65536L) + 65536L) % 65536L).toInt - 32768

  /** 5–7 whole windows (800–1120 samples, 0.10–0.14 s). */
  private[graft] def patternSampleCount(id: Long): Int =
    AudioWindow * (5 + (((id % 3L) + 3L) % 3L).toInt)

  /** Encode one REAL mono 16-bit PCM WAV (44-byte RIFF header + LE
    * samples) of the deterministic pattern. */
  private[graft] def encodeWav(id: Long): Array[Byte] = {
    val n = patternSampleCount(id)
    val dataBytes = n * 2
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val b = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(ascii)).putInt(36 + dataBytes)
      .put("WAVE".getBytes(ascii)).put("fmt ".getBytes(ascii))
      .putInt(16).putShort(1).putShort(1) // PCM, mono
      .putInt(AudioRate).putInt(AudioRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits/sample
      .put("data".getBytes(ascii)).putInt(dataBytes)
    var i = 0
    while (i < n) { b.putShort(patternSample(id, i).toShort); i += 1 }
    b.array()
  }

  /** (id, payload): one REAL WAV clip per input row. Narrow (no shuffle);
    * payloads never leave their partition before [[decodeAudioWindows]]. */
  def synthesizeWav(df: DataFrame, idCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(df.schema(idCol),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map(r => Row(r.get(idIdx), encodeWav(r.getLong(idIdx))))
    }(encoder).toDF()
  }

  /** REAL audio decode via javax.sound.sampled over bounded batches: the
    * RIFF container is parsed by AudioSystem (sample_rate and n_samples
    * come from the DECODED format/stream, not from our own header math),
    * the signed little-endian 16-bit samples are re-materialized, and each
    * 160-sample window emits integer features — (id, sample_rate,
    * n_samples, window_idx, energy = Σ s², peak_abs = max |s|). Energy
    * bounds: 160 · 32768² ≈ 1.7e11 per window — far inside Long. A wrong
    * header offset, byte order, or signedness changes every value. Peak
    * memory is batchSize × payload, independent of partition size. */
  def decodeAudioWindows(df: DataFrame, idCol: String, payloadCol: String,
                         batchSize: Int = 64): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(df.schema(idCol),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("window_idx", IntegerType),
      StructField("energy", LongType),
      StructField("peak_abs", IntegerType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val payload = r.getAs[Array[Byte]](payIdx)
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"decodeAudioWindows: expected mono 16-bit signed LE PCM, got $fmt")
          val nSamples = ais.getFrameLength.toInt
          val bytes = new Array[Byte](nSamples * 2)
          var off = 0
          while (off < bytes.length) {
            val k = ais.read(bytes, off, bytes.length - off)
            require(k > 0, "decodeAudioWindows: truncated PCM stream")
            off += k
          }
          val rate = fmt.getSampleRate.toInt
          val id = r.get(idIdx)
          (0 until nSamples / AudioWindow).iterator.map { w =>
            var energy = 0L; var peak = 0; var i = w * AudioWindow
            val end = i + AudioWindow
            while (i < end) {
              val s = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort.toInt
              energy += s.toLong * s
              val a = math.abs(s); if (a > peak) peak = a
              i += 1
            }
            Row(id, rate, nSamples.toLong, w, energy, peak)
          }
        }
      }
    }(encoder).toDF()
  }
}
