package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus the Spark-side plumbing for decode /
  * feature-extract / frame-sample stages.
  *
  * Container note: the image/audio codec libraries are not available in this
  * offline build, so the DECODE step is a clearly-marked deterministic STUB
  * (see [[decodeStub]]); everything around it — schema, batch shape,
  * partition sizing, metadata propagation — is real and tested. A production
  * deployment swaps `decodeStub` for a JNI/codec call with the same
  * signature.
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
}
