package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: media as opaque `binary` columns with a
  * typed metadata struct, processed by batched per-partition kernels.
  *
  * The image kernels are REAL codec work via `javax.imageio` (PNG/BMP —
  * in the JDK, no external deps): [[extractImageFeatures]] decodes actual
  * pixels and computes dimensions / exact integer channel sums / a 64-bit
  * average-hash; [[resizeBilinear]] does a fixed-point bilinear resample
  * and re-encodes. All pixel math is integer-space so results are
  * bit-exact across engines (the DuckDB oracle replays the same formulas).
  *
  * Scale shape: every kernel is `mapPartitions` — partition-local,
  * constant memory (one decoded image at a time), no shuffle; on a
  * 1000-executor cluster each task streams its split of the media column
  * through the codec. Only video frame-sampling remains payload-slicing
  * ([[sampleFrames]]): the JDK ships no video codec, and that operator
  * documents itself accordingly.
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("mime", StringType),
    StructField("byte_len", LongType)
  ))

  /** Wrap a string/binary column as a media column (payload + metadata).
    * The engine treats the payload opaquely; decode happens only inside
    * the image kernels below.
    */
  def asMedia(df: DataFrame, payloadCol: String, kind: String, mime: String): DataFrame =
    df.withColumn("media", col(payloadCol).cast(BinaryType))
      .withColumn(
        "media_meta",
        struct(lit(kind).as("kind"), lit(mime).as("mime"),
          length(col(payloadCol).cast(BinaryType)).cast(LongType).as("byte_len"))
      )

  /** Null/non-castable ids FAIL the job: Row.getLong would silently unbox
    * a null id to 0L and attribute the row's features to document 0 —
    * same fail-loudly contract as [[Packing.nextFitPack]].
    */
  private def checkedId(idCol: String): Column =
    IntegralId.checkedCol(idCol, "multimodal").as("id")

  // ---------------------------------------------------------------------
  // Deterministic synthetic-image fixtures
  // ---------------------------------------------------------------------

  /** Deterministic per-document test image: dimensions and every channel
    * value are pure integer functions of (id, x, y), so an oracle can
    * recompute expected decode results in SQL. Dimensions are multiples
    * of 8 (8/16/24) so the aHash 8×8 grid has uniform blocks.
    */
  def synthDims(id: Long): (Int, Int) =
    (8 * (1 + Math.floorMod(id, 3)).toInt, 8 * (1 + Math.floorMod(id / 3, 3)).toInt)

  def synthR(id: Long, x: Int, y: Int): Int = Math.floorMod(x * 7L + y * 13L + id, 256).toInt
  def synthG(id: Long, x: Int, y: Int): Int = Math.floorMod(x * 3L + y * 5L + 2 * id, 256).toInt
  def synthB(id: Long, x: Int, y: Int): Int = Math.floorMod(x * 11L + y * 2L + 3 * id, 256).toInt

  private def synthImage(id: Long): BufferedImage = {
    val (w, h) = synthDims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (synthR(id, x, y) << 16) | (synthG(id, x, y) << 8) | synthB(id, x, y))
        x += 1
      }
      y += 1
    }
    img
  }

  /** One reusable writer per (task, format): `ImageIO.write(_, _, out)`
    * does a synchronized registry scan per call AND spools through a
    * disk-backed FileCacheImageOutputStream (useCache defaults to true) —
    * per-row temp-file I/O that serializes concurrent encode tasks on
    * the filesystem (the write-side twin of the decode kernel's
    * MemoryCacheImageInputStream note below). Same codec, same bytes:
    * only the lookup and the cache stream change.
    */
  private final class Encoder {
    private val writers = scala.collection.mutable.Map[String, javax.imageio.ImageWriter]()
    def encode(img: BufferedImage, format: String): Array[Byte] = {
      val w = writers.getOrElseUpdate(format, {
        val it = ImageIO.getImageWritersByFormatName(format)
        if (!it.hasNext) throw new IllegalStateException(s"no ImageIO writer for format '$format'")
        it.next()
      })
      val baos = new ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      try {
        w.setOutput(ios)
        w.write(img)
      } finally {
        // detach the stream so a mid-encode throw can't leave the reused
        // writer holding stale output state for the partition's next row
        w.setOutput(null)
        ios.close() // flushes the cache stream into baos
      }
      baos.toByteArray
    }
    /** Release native/codec resources when the partition is exhausted. */
    def dispose(): Unit = {
      writers.valuesIterator.foreach(w => try w.dispose() catch { case _: Exception => () })
      writers.clear()
    }
  }

  /** Wrap a partition's row iterator so the task-scoped [[Encoder]] is
    * disposed once the rows are exhausted (ImageWriter instances hold
    * codec state that otherwise lives until task end). Idempotent:
    * post-exhaustion hasNext() calls re-dispose an empty map.
    */
  private def disposing(it: Iterator[Row], enc: Encoder): Iterator[Row] =
    new Iterator[Row] {
      def hasNext: Boolean = { val h = it.hasNext; if (!h) enc.dispose(); h }
      def next(): Row = it.next()
    }


  /** Generate the deterministic image corpus: one real encoded image per
    * id — even ids as PNG, odd as BMP, so BOTH JDK codecs are exercised
    * end-to-end (encode here, decode in the feature/resize kernels).
    * Output: (id, media binary, media_meta). This is the fixture-
    * generation stage; in production the payload arrives from storage.
    */
  def synthesizeImages(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", MediaMetaType)
    ))
    val input = df.select(checkedId(idCol))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    input.mapPartitions { rows =>
      val enc = new Encoder() // once per task, reused across the batch
      disposing(rows.map { r =>
        val id = r.getLong(0)
        val fmt = if (id % 2 == 0) "png" else "bmp"
        val bytes = enc.encode(synthImage(id), fmt)
        Row(id, bytes, Row("image", s"image/$fmt", bytes.length.toLong))
      }, enc)
    }
  }

  // ---------------------------------------------------------------------
  // Real decode → features
  // ---------------------------------------------------------------------

  private val ImageFeatureSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("r_sum", LongType),
    StructField("g_sum", LongType),
    StructField("b_sum", LongType),
    StructField("ahash_hi", LongType),
    StructField("ahash_lo", LongType)
  ))

  /** Decode + feature-extract one image, all-integer math:
    * exact per-channel sums and a 64-bit average-hash (8×8 block grid,
    * gray = (r+g+b)/3 floor, block avg = floor(sum/count), bit set when
    * avg > floor(mean-of-avgs)). The hash is returned as two longs
    * (bits 32–63 / 0–31) so SQL oracles never shift into the sign bit.
    */
  def imageFeatures(img: BufferedImage): (Long, Long, Long, Long, Long, Long, Long) = {
    val w = img.getWidth
    val h = img.getHeight
    var rs = 0L; var gs = 0L; var bs = 0L
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var y = 0
    while (y < h) {
      // Long cell arithmetic: y*8 in Int wraps past 2^28-pixel extents,
      // reachable when a caller raises maxDecodePixels — the index must
      // stay in [0,8) for ANY decodable dimension, not die off-kernel
      val by = (y.toLong * 8 / h).toInt
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        rs += r; gs += g; bs += b
        val idx = by * 8 + (x.toLong * 8 / w).toInt
        cellSum(idx) += (r + g + b) / 3
        cellCnt(idx) += 1
        x += 1
      }
      y += 1
    }
    var meanSum = 0L
    val avg = new Array[Long](64)
    var i = 0
    while (i < 64) {
      avg(i) = if (cellCnt(i) == 0) 0L else cellSum(i) / cellCnt(i)
      meanSum += avg(i)
      i += 1
    }
    val mean = meanSum / 64
    var hi = 0L; var lo = 0L
    i = 0
    while (i < 64) {
      if (avg(i) > mean) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (w.toLong, h.toLong, rs, gs, bs, hi, lo)
  }

  /** Default decode size cap: payloads whose HEADER declares more pixels
    * than this yield null features instead of being decoded. A raster is
    * ~4 bytes/pixel, so a ~100-byte corrupt header declaring 50000×50000
    * would otherwise make ImageIO allocate a ~10 GB array — an
    * OutOfMemoryError that kills the executor JVM and every concurrent
    * task on it, which no catch can make safe. The cap bounds AGGREGATE
    * decode pressure too, since every concurrent task can hold one
    * decode buffer: 16 M pixels ≈ 64 MB/raster ≈ 2 GB at 32 concurrent
    * tasks/JVM — sized for a default executor, and per-call configurable
    * (`maxDecodePixels` on the decode entry points) for deployments with
    * larger legitimate imagery or tighter task memory.
    */
  val DefaultMaxDecodePixels: Long = 16L * 1024 * 1024

  private def tryDecode(
      bytes: Array[Byte],
      maxPixels: Long = DefaultMaxDecodePixels): Option[BufferedImage] =
    try {
      // header-first: read declared dimensions WITHOUT decoding pixels,
      // and refuse rasters over the cap before ImageIO can allocate them.
      // MemoryCacheImageInputStream, not createImageInputStream: the
      // factory's default is a FileCacheImageInputStream that spools
      // every (already fully in-memory) payload to a disk temp file —
      // per-row temp-file I/O in the hot decode kernel
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            val w = r.getWidth(0).toLong
            val h = r.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > maxPixels) None
            else Option(r.read(0))
          } finally r.dispose()
        }
      } finally iis.close()
    }
    // NonFatal, not just IOException: the JDK PNG/BMP decoders throw
    // RuntimeExceptions (ArrayIndexOutOfBounds, IllegalArgument,
    // NegativeArraySize) on malformed headers — those rows must map to
    // null features like every other undecodable payload, not kill the job
    catch { case scala.util.control.NonFatal(_) => None }

  /** Batched REAL feature extraction: `javax.imageio` decode per row —
    * one partition = one batch stream, constant memory, no shuffle.
    * Null payloads and undecodable bytes yield null feature columns
    * (id kept) so corrupt media can be routed/filtered, not job-killing —
    * the dead-letter philosophy of the ingest path applied to pixels.
    */
  def extractImageFeatures(
      df: DataFrame,
      idCol: String,
      mediaCol: String,
      maxDecodePixels: Long = DefaultMaxDecodePixels): DataFrame = {
    val input = df.select(checkedId(idCol), col(mediaCol).cast(BinaryType))
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(ImageFeatureSchema))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val img =
          if (r.isNullAt(1)) None
          else tryDecode(r.getAs[Array[Byte]](1), maxDecodePixels)
        img match {
          case Some(im) =>
            val (w, h, rs, gs, bs, hi, lo) = imageFeatures(im)
            Row(id, w, h, rs, gs, bs, hi, lo)
          case None => Row(id, null, null, null, null, null, null, null)
        }
      }
    }
  }

  // ---------------------------------------------------------------------
  // Real resize: fixed-point bilinear + re-encode
  // ---------------------------------------------------------------------

  /** Fixed-point (8-bit fraction) bilinear resample, pixel-center
    * alignment, integer-exact: src sample position for output i is
    * (i+0.5)·src/dst − 0.5 in 1/256ths. At an exact 2× downscale this
    * reduces to out = (p00+p01+p10+p11+2)>>2 — the rounding 2×2 box
    * average — which is what the SQL oracle replays.
    */
  def bilinearResize(img: BufferedImage, dw: Int, dh: Int): BufferedImage = {
    require(dw > 0 && dh > 0, s"target dims must be positive: ${dw}x$dh")
    val sw = img.getWidth
    val sh = img.getHeight
    val out = new BufferedImage(dw, dh, BufferedImage.TYPE_INT_RGB)
    // precompute x sampling (x0, x1, frac) once per output column
    val x0s = new Array[Int](dw); val x1s = new Array[Int](dw); val fxs = new Array[Int](dw)
    var ox = 0
    while (ox < dw) {
      val fp = math.max(0L, (2L * ox + 1) * sw * 128 / dw - 128)
      val x0 = math.min((fp >> 8).toInt, sw - 1)
      x0s(ox) = x0
      x1s(ox) = math.min(x0 + 1, sw - 1)
      fxs(ox) = (fp & 255).toInt
      ox += 1
    }
    var oy = 0
    while (oy < dh) {
      val fp = math.max(0L, (2L * oy + 1) * sh * 128 / dh - 128)
      val y0 = math.min((fp >> 8).toInt, sh - 1)
      val y1 = math.min(y0 + 1, sh - 1)
      val fy = (fp & 255).toInt
      ox = 0
      while (ox < dw) {
        val p00 = img.getRGB(x0s(ox), y0); val p10 = img.getRGB(x1s(ox), y0)
        val p01 = img.getRGB(x0s(ox), y1); val p11 = img.getRGB(x1s(ox), y1)
        val fx = fxs(ox)
        val w00 = (256 - fx).toLong * (256 - fy); val w10 = fx.toLong * (256 - fy)
        val w01 = (256 - fx).toLong * fy; val w11 = fx.toLong * fy
        def ch(shift: Int): Int = {
          val v = (((p00 >> shift) & 0xff) * w00 + ((p10 >> shift) & 0xff) * w10 +
            ((p01 >> shift) & 0xff) * w01 + ((p11 >> shift) & 0xff) * w11 + 32768L) >> 16
          v.toInt
        }
        out.setRGB(ox, oy, (ch(16) << 16) | (ch(8) << 8) | ch(0))
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Batched REAL resize: decode → fixed-point bilinear to
    * (srcW·num/den, srcH·num/den), min 1 px — → re-encode as PNG.
    * Same `mapPartitions` shape as [[extractImageFeatures]]: partition-
    * local, constant memory, no shuffle. Output: (id, media, media_meta
    * with mime image/png + new byte_len; kind carried from `metaCol`).
    * Undecodable/null payloads pass through as null media (id kept).
    */
  def resizeBilinear(
      df: DataFrame,
      idCol: String,
      mediaCol: String,
      num: Int,
      den: Int,
      metaCol: String = "media_meta",
      maxDecodePixels: Long = DefaultMaxDecodePixels
  ): DataFrame = {
    require(num > 0 && den > 0, s"scale must be positive: $num/$den")
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", MediaMetaType)
    ))
    val input = df.select(checkedId(idCol), col(mediaCol).cast(BinaryType),
      col(s"$metaCol.kind"))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    input.mapPartitions { rows =>
      val enc = new Encoder() // once per task, reused across the batch
      disposing(rows.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(2)
        val img =
          if (r.isNullAt(1)) None
          else tryDecode(r.getAs[Array[Byte]](1), maxDecodePixels)
        // the OUTPUT raster is capped like the input: an upscale can
        // demand an arbitrarily large allocation (or Int-overflow the
        // buffer size) from a legitimately decodable source — over-cap
        // targets map to null media like any undecodable payload
        val dims = img.map { im =>
          (math.max(1L, im.getWidth.toLong * num / den),
            math.max(1L, im.getHeight.toLong * num / den))
        }
        (img, dims) match {
          // Int bounds FIRST: with both dims <= 2^31 the product fits a
          // Long, so the pixel-cap comparison itself cannot overflow
          case (Some(im), Some((dwL, dhL)))
              if dwL <= Int.MaxValue && dhL <= Int.MaxValue && dwL * dhL <= maxDecodePixels =>
            val bytes = enc.encode(bilinearResize(im, dwL.toInt, dhL.toInt), "png")
            Row(id, bytes, Row(kind, "image/png", bytes.length.toLong))
          case _ => Row(id, null, Row(kind, null, 0L))
        }
      }, enc)
    }
  }

  // ---------------------------------------------------------------------
  // Frame sampling (video)
  // ---------------------------------------------------------------------

  /** Frame sampling over an opaque payload: slices the payload into
    * fixed-size "frames" and keeps every `everyN`-th. The JDK ships no
    * video codec, so unlike the image kernels above this is payload
    * arithmetic, not a real keyframe seek — the schema and fan-out match
    * what a codec-backed implementation would produce.
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
          // step straight to the kept frames: grouped() materialized
          // EVERY frame (a full second copy of the payload) only to
          // discard (everyN-1)/everyN of them — per row, in the hot loop
          val id = r.getLong(0)
          val step = frameBytes.toLong * everyN
          (0L until bytes.length.toLong by step).iterator.map { off =>
            val idx = (off / frameBytes).toInt
            val end = math.min(off + frameBytes, bytes.length.toLong).toInt
            Row(id, idx, java.util.Arrays.copyOfRange(bytes, off.toInt, end))
          }
        }
      }
    }
  }
}
