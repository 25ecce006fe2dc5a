package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed by batched per-partition operators.
  *
  * The Spark-side machinery (schema, partitioning, batch iteration,
  * output shape) is real and tested; the actual codec calls are STUBBED
  * with deterministic fakes because this container ships no image/audio
  * libraries — each stub is marked and takes the exact byte-array input a
  * real decoder would.
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("mime", StringType),
    StructField("byte_len", LongType)
  ))

  /** Wrap a string/binary column as a media column (payload + metadata).
    * In production the payload arrives as real image/audio bytes; here the
    * engine treats it opaquely either way.
    */
  def asMedia(df: DataFrame, payloadCol: String, kind: String, mime: String): DataFrame =
    df.withColumn("media", col(payloadCol).cast(BinaryType))
      .withColumn(
        "media_meta",
        struct(lit(kind).as("kind"), lit(mime).as("mime"),
          length(col(payloadCol).cast(BinaryType)).cast(LongType).as("byte_len"))
      )

  /** === STUB ===
    * Deterministic fake "decode": a real implementation would hand
    * `bytes` to an image/audio codec and return decoded dimensions /
    * samples. The fake derives stable pseudo-features (length, byte sum,
    * 4-bin byte histogram) so the distributed plumbing and schemas are
    * fully exercisable and verifiable.
    */
  def decodeStub(bytes: Array[Byte]): (Long, Long, Array[Long]) = {
    var sum = 0L
    val hist = new Array[Long](4)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      hist(b >> 6) += 1
      i += 1
    }
    (bytes.length.toLong, sum, hist)
  }

  /** Null/non-castable ids FAIL the job: Row.getLong would silently unbox
    * a null id to 0L and attribute the row's features to document 0 —
    * same fail-loudly contract as [[Packing.nextFitPack]].
    */
  private def checkedId(idCol: String): org.apache.spark.sql.Column = {
    val idc = col(idCol).cast(LongType)
    when(idc.isNull,
      raise_error(concat(lit(s"multimodal: null or non-numeric id in '$idCol': '"),
        coalesce(col(idCol).cast(StringType), lit("null")), lit("'")))).otherwise(idc)
      .as("id")
  }

  private val FeatureSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("byte_len", LongType),
    StructField("byte_sum", LongType),
    StructField("hist", ArrayType(LongType))
  ))

  /** Batched feature extraction over media payloads — the Scala analogue
    * of a `mapInPandas` decode stage: one partition = one batch stream,
    * constant memory, no shuffle. `idCol` must be long, `mediaCol` binary.
    */
  def extractFeatures(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val input = df.select(checkedId(idCol), col(mediaCol).cast(BinaryType))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(FeatureSchema))
    input.mapPartitions { rows =>
      rows.map { r =>
        if (r.isNullAt(1)) Row(r.getLong(0), 0L, 0L, Array.fill(4)(0L).toSeq)
        else {
          val (len, sum, hist) = decodeStub(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), len, sum, hist.toSeq)
        }
      }
    }
  }

  /** === STUB === resize: a real implementation decodes the image, scales
    * to a target resolution, re-encodes. The fake subsamples evenly-spaced
    * bytes down to `targetBytes` (identity when already smaller) —
    * deterministic, so the plumbing (payload replaced, metadata byte_len
    * updated, partition-local, no shuffle) is exactly verifiable.
    */
  def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
    if (bytes.length <= targetBytes) bytes
    else {
      val out = new Array[Byte](targetBytes)
      var i = 0
      while (i < targetBytes) {
        // evenly spaced source offsets, first byte always kept
        out(i) = bytes((i.toLong * bytes.length / targetBytes).toInt)
        i += 1
      }
      out
    }

  /** Batched media resize — same `mapPartitions` shape as
    * [[extractFeatures]]: one partition = one batch stream, constant
    * memory, no shuffle. Output: (id, media resized, media_meta with the
    * new byte_len; kind/mime carried through from `metaCol`).
    */
  def resize(
      df: DataFrame,
      idCol: String,
      mediaCol: String,
      targetBytes: Int,
      metaCol: String = "media_meta"
  ): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", MediaMetaType)
    ))
    val input = df.select(checkedId(idCol), col(mediaCol).cast(BinaryType),
      col(s"$metaCol.kind"), col(s"$metaCol.mime"))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    input.mapPartitions { rows =>
      rows.map { r =>
        if (r.isNullAt(1)) Row(r.getLong(0), null, Row(r.getString(2), r.getString(3), 0L))
        else {
          val resized = resizeStub(r.getAs[Array[Byte]](1), targetBytes)
          Row(r.getLong(0), resized,
            Row(r.getString(2), r.getString(3), resized.length.toLong))
        }
      }
    }
  }

  /** === STUB === frame sampling: a real implementation would seek video
    * keyframes; the fake slices the payload into fixed-size "frames" and
    * keeps every `everyN`-th — same schema and fan-out as the real op.
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      mediaCol: String,
      frameBytes: Int = 256,
      everyN: Int = 4
  ): DataFrame = {
    // validate up front: grouped(0) / % 0 would otherwise fail DEEP in
    // executor tasks (opaque stack after 4 retries), and a negative
    // everyN silently keeps only frame 0
    require(frameBytes > 0, s"frameBytes must be > 0: $frameBytes")
    require(everyN > 0, s"everyN must be > 0: $everyN")
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)
    ))
    val input = df.select(checkedId(idCol), col(mediaCol).cast(BinaryType))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.isNullAt(1)) Iterator.empty
        else {
          val bytes = r.getAs[Array[Byte]](1)
          val frames = bytes.grouped(frameBytes).toIndexedSeq
          frames.indices.filter(_ % everyN == 0).iterator.map { i =>
            Row(r.getLong(0), i, frames(i))
          }
        }
      }
    }
  }
}
