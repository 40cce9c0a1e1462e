package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns with typed metadata, and per-partition batched
  * feature extraction — the Spark-side shape a real decode/embed stage
  * needs (schema, partitioning, batch iteration).
  *
  * The IMAGE path is REAL: payloads whose magic bytes identify a
  * PNG/JPEG/GIF/BMP are decoded with the JDK's `javax.imageio` (no
  * external dependency), and width/height/pixel statistics come from the
  * actual decoded raster. `resize` likewise operates on real decoded
  * pixels (deterministic nearest-neighbor) and re-encodes as PNG.
  *
  * The AUDIO path is REAL too: WAV and AIFF PCM payloads decode with the
  * JDK's `javax.sound.sampled.AudioSystem` (pure JDK, no external codec) —
  * sample rate, channel count and every PCM sample come from the actual
  * container parse, and [[extractAudioFeatures]] emits exact-integer
  * sample statistics an arithmetic SQL oracle verifies end-to-end.
  *
  * VIDEO is REAL for (animated) GIF — the one multi-frame container the
  * JDK decodes natively: [[extractVideoFeatures]] walks every frame with
  * the `javax.imageio` GIF reader, keeps every k-th, and emits exact
  * per-frame pixel statistics an arithmetic SQL oracle verifies
  * end-to-end; [[frameSample]] emits the kept frames as standalone PNGs.
  * True video codecs (mp4/webm) have no JDK decoder and fall back to a
  * deterministic fake so the batching/schema plumbing still exercises
  * end-to-end — and every stage that can take that fallback LABELS each
  * output row's provenance in a `decode_kind` column ("image"/"gif" =
  * real decode, "stub" = fabricated), so fabricated stats are never
  * mistakable for real ones. Swap `decodeStub`/`frameSampleStub` for
  * codec bindings; everything around them is production plumbing and is
  * tested.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pixel_sum", LongType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("rolling_fp", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false),
    // provenance of every stat row: "image" = real javax.imageio decode,
    // "stub" = fabricated from raw bytes (undecodable codec, e.g. mp4).
    // A consumer can always tell real stats from stand-ins — or refuse
    // stubs outright by filtering/asserting on this column.
    StructField("decode_kind", StringType, nullable = false)))

  val audioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("container", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sample_sum", LongType, nullable = false),
    StructField("sample_sq_sum", LongType, nullable = false)))

  /** Attach a fake binary payload column (utf-8 bytes of the text) — stands
    * in for an audio/video blob column read from parquet (exercises the
    * non-image fallback path).
    */
  def withPayload(docs: DataFrame, textCol: String = "text",
                  outCol: String = "content"): DataFrame =
    docs.withColumn(outCol, encode(col(textCol), "UTF-8"))

  /** Magic-byte sniff for the formats `javax.imageio` decodes out of the
    * box. Deliberately narrow: anything else routes to the stub fallback.
    */
  private[pipeline] def isImage(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (
      (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') ||
      (bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte) || // JPEG SOI
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8') ||
      (bytes(0) == 'B' && bytes(1) == 'M'))

  /** Deterministic grayscale PNG: width `16 + id % 17`, height
    * `16 + id % 13`, sample `(31x + 17y + 7·id) mod 256`. Every quantity a
    * decoder recovers from it (dimensions, raster samples) is closed-form
    * arithmetic in `id` — which is what lets a SQL oracle verify the REAL
    * encode→decode round-trip (`p_multimodal_decode`).
    */
  def synthesizePng(docId: Long): Array[Byte] = {
    val w = 16 + (docId % 17).toInt
    val h = 16 + (docId % 13).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((31L * x + 17L * y + 7L * docId) % 256L).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", bos), "JDK PNG writer unavailable")
    bos.toByteArray
  }

  /** Attach a REAL image payload column: a deterministic PNG synthesized
    * from the id column (see [[synthesizePng]]). Row-local, no shuffle.
    */
  def withImagePayload(docs: DataFrame, idCol: String = "doc_id",
                       outCol: String = "content"): DataFrame = {
    val mk = udf((id: Long) => synthesizePng(id))
    docs.withColumn(outCol, mk(col(idCol).cast("long")))
  }

  /** REAL image decode via `javax.imageio`: dimensions and pixel stats
    * come from the decoded raster (band 0; PNG gray round-trips samples
    * exactly). Fails loudly on bytes that sniff as an image but don't
    * decode — fabricating stats for a corrupt image would be worse than
    * an error.
    */
  private[pipeline] def decodeImage(bytes: Array[Byte]): (Int, Int, Long, Long, Array[Double]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload sniffed as an image but failed to decode")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val hist = new Array[Double](4)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = raster.getSample(x, y, 0)
        sum += v
        hist(v >> 6) += 1.0
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    (w, h, sum, n, hist.map(_ / n))
  }

  /** Magic-byte sniff for the audio containers `AudioSystem` parses out of
    * the box: RIFF/WAVE and FORM/AIFF.
    */
  private[pipeline] def isAudio(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && (
      (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') ||
      (bytes(0) == 'F' && bytes(1) == 'O' && bytes(2) == 'R' && bytes(3) == 'M' &&
        bytes(8) == 'A' && bytes(9) == 'I' && bytes(10) == 'F' && bytes(11) == 'F'))

  /** Deterministic mono PCM-16 clip: sample rate `8000 + 200·(id mod 7)`,
    * `256 + (id mod 64)·8` samples, sample `((31i + 7·id) mod 4096) −
    * 2048`; odd ids encode as AIFF (big-endian), even as WAV
    * (little-endian). Every quantity a decoder recovers (rate, count,
    * sample values) is closed-form arithmetic in `id` — which is what lets
    * a SQL oracle verify the REAL encode→decode round-trip
    * (`p_multimodal_audio`), exactly like [[synthesizePng]] does for
    * images.
    */
  def synthesizeAudio(docId: Long): Array[Byte] = {
    val aiff = docId % 2 == 1
    val sampleRate = 8000 + 200 * (docId % 7).toInt
    val n = 256 + (docId % 64).toInt * 8
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((31L * i + 7L * docId) % 4096L) - 2048L).toShort
      if (aiff) { data(2 * i) = (s >> 8).toByte; data(2 * i + 1) = s.toByte }
      else { data(2 * i) = s.toByte; data(2 * i + 1) = (s >> 8).toByte }
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, aiff)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    val typ = if (aiff) AudioFileFormat.Type.AIFF else AudioFileFormat.Type.WAVE
    require(AudioSystem.write(ais, typ, bos) > 0, "JDK audio writer unavailable")
    bos.toByteArray
  }

  /** Attach a REAL audio payload column (see [[synthesizeAudio]]).
    * Row-local, no shuffle.
    */
  def withAudioPayload(docs: DataFrame, idCol: String = "doc_id",
                       outCol: String = "content"): DataFrame = {
    val mk = udf((id: Long) => synthesizeAudio(id))
    docs.withColumn(outCol, mk(col(idCol).cast("long")))
  }

  /** REAL audio decode via `javax.sound.sampled`: container, sample rate,
    * channels and every PCM sample come from the actual parse. Restricted
    * to signed PCM ≤16-bit (what the JDK emits and real WAV corpora hold);
    * fails loudly on anything else — fabricating a sample rate for an
    * undecodable payload is worse than an error.
    */
  private[pipeline] def decodeAudio(bytes: Array[Byte]): (String, Int, Int, Int, Long, Long, Long) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED,
        s"only signed PCM audio is supported, got ${fmt.getEncoding}")
      val bits = fmt.getSampleSizeInBits
      require(bits == 8 || bits == 16, s"unsupported sample size: $bits")
      val raw = ais.readAllBytes()
      val bytesPerSample = bits / 8
      val nSamples = raw.length.toLong / bytesPerSample
      var (sum, sq) = (0L, 0L)
      var i = 0
      while (i < raw.length) {
        val s: Long =
          if (bits == 8) raw(i).toLong
          else if (fmt.isBigEndian) ((raw(i) << 8) | (raw(i + 1) & 0xff)).toShort.toLong
          else ((raw(i + 1) << 8) | (raw(i) & 0xff)).toShort.toLong
        sum += s
        sq += s * s
        i += bytesPerSample
      }
      val container = if (bytes(0) == 'F') "aiff" else "wav"
      (container, fmt.getSampleRate.round, fmt.getChannels, bits, nSamples, sum, sq)
    } finally ais.close()
  }

  /** Per-partition audio feature extraction over (doc_id, content): the
    * audio analogue of [[extractFeatures]], REAL end-to-end for WAV/AIFF.
    * Strictly per-row — `javax.sound` decodes one stream at a time, so
    * unlike the image path there is no batch seam for a codec binding to
    * amortize into. Fails loudly on payloads that don't sniff as audio —
    * route mixed-modality columns by magic bytes upstream.
    */
  def extractAudioFeatures(spark: SparkSession, docsWithPayload: DataFrame,
                           idCol: String = "doc_id",
                           payloadCol: String = "content"): DataFrame = {
    val rdd = docsWithPayload.select(col(idCol).cast("long"), col(payloadCol))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
          require(isAudio(bytes),
            s"payload for id ${r.getLong(0)} is not WAV/AIFF audio")
          val (c, sr, ch, bits, n, sum, sq) = decodeAudio(bytes)
          Row(r.getLong(0), bytes.length, c, sr, ch, bits, n, sum, sq)
        }
      }
    spark.createDataFrame(rdd, audioSchema)
  }

  /** Magic-byte sniff for multi-frame GIF — the one video-shaped container
    * the JDK decodes natively (`javax.imageio`'s GIF reader walks frame
    * sequences). Same magic as static GIF; frame count disambiguates at
    * decode time.
    */
  private[pipeline] def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8'

  /** Deterministic animated GIF: `2 + id mod 4` frames of `(8 + id mod 5)
    * × (8 + id mod 3)` pixels, sample `(x + 2y + 3f + id) mod 256` on an
    * identity 256-gray palette (TYPE_BYTE_INDEXED, so the GIF writer
    * stores our indices verbatim — no quantization). Every quantity a
    * decoder recovers (frame count, dimensions, per-frame samples) is
    * closed-form arithmetic in `(id, f)`, which is what lets a SQL oracle
    * verify the REAL encode→decode round-trip (`p_multimodal_video`),
    * exactly like [[synthesizePng]] / [[synthesizeAudio]].
    */
  def synthesizeGif(docId: Long): Array[Byte] = {
    val nFrames = 2 + (docId % 4).toInt
    val w = 8 + (docId % 5).toInt
    val h = 8 + (docId % 3).toInt
    val ramp = Array.tabulate(256)(i => i.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0,
              ((x + 2L * y + 3L * f + docId) % 256L).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.dispose()
    }
    bos.toByteArray
  }

  /** Attach a REAL video payload column (see [[synthesizeGif]]).
    * Row-local, no shuffle.
    */
  def withVideoPayload(docs: DataFrame, idCol: String = "doc_id",
                       outCol: String = "content"): DataFrame = {
    val mk = udf((id: Long) => synthesizeGif(id))
    docs.withColumn(outCol, mk(col(idCol).cast("long")))
  }

  /** REAL multi-frame GIF decode: one (width, height, pixelSum) per frame,
    * gray level read through `getRGB` (the composed color, not the raw
    * palette index — robust to any palette reordering an encoder might
    * do). Frames are read AS STORED: an encoder that writes delta frames
    * yields the delta's dimensions/pixels, not a composite over previous
    * frames (full-frame GIFs, like ours and most corpus GIFs, are
    * unaffected). Fails loudly on bytes that sniff as GIF but don't
    * decode.
    */
  private[pipeline] def decodeGifFrames(bytes: Array[Byte]): IndexedSeq[(Int, Int, Long)] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val readers = ImageIO.getImageReaders(iis)
    require(readers.hasNext, "payload sniffed as GIF but no reader accepts it")
    val reader = readers.next()
    try {
      reader.setInput(iis, false, false)
      val n = reader.getNumImages(true)
      require(n > 0, "payload sniffed as GIF but holds no frames")
      (0 until n).map { f =>
        val img = reader.read(f)
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += (img.getRGB(x, y) & 0xff); x += 1 }
          y += 1
        }
        (w, h, sum)
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  val videoSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pixel_sum", LongType, nullable = false),
    StructField("n_px", LongType, nullable = false)))

  /** Frame-sampled video feature extraction over (doc_id, content): REAL
    * end-to-end for (animated) GIF — decode every frame, keep every
    * `everyK`-th, emit exact per-frame pixel statistics the SQL oracle
    * recomputes arithmetically. One output row per KEPT frame — the
    * explode shape a video pipeline feeds to per-frame embedding. Strictly
    * per-row like the audio path (an `ImageReader` holds one stream).
    * Fails loudly on payloads that don't sniff as GIF — route true video
    * codecs (mp4/webm, no JDK decoder) to [[frameSampleStub]] upstream.
    */
  def extractVideoFeatures(spark: SparkSession, docsWithPayload: DataFrame,
                           everyK: Int, idCol: String = "doc_id",
                           payloadCol: String = "content"): DataFrame = {
    require(everyK > 0, s"everyK must be positive, got $everyK")
    val rdd = docsWithPayload.select(col(idCol).cast("long"), col(payloadCol))
      .rdd.mapPartitions { it =>
        it.flatMap { r =>
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
          require(isGif(bytes),
            s"payload for id ${r.getLong(0)} is not GIF video")
          val frames = decodeGifFrames(bytes)
          frames.zipWithIndex.collect {
            case ((w, h, sum), f) if f % everyK == 0 =>
              Row(r.getLong(0), frames.length, f, w, h, sum, w.toLong * h)
          }
        }
      }
    spark.createDataFrame(rdd, videoSchema)
  }

  /** ---- STUB ---- deterministic fake decoder for NON-IMAGE, NON-AUDIO,
    * NON-GIF payloads (true video codecs — mp4/webm — have no JDK
    * decoder). Derives "dimensions" from the first two bytes, "pixel"
    * stats from the raw bytes, and a 4-bin byte histogram as the
    * "embedding" so downstream stages have realistic shapes to consume.
    */
  private[pipeline] def decodeStub(bytes: Array[Byte]): (Int, Int, Long, Long, Array[Double]) = {
    val w = (if (bytes.nonEmpty) (bytes(0) & 0x7f) else 0) + 1
    val h = (if (bytes.length > 1) (bytes(1) & 0x7f) else 0) + 1
    val hist = new Array[Double](4)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sum += v
      hist(v >> 6) += 1.0
      i += 1
    }
    val n = math.max(bytes.length, 1).toDouble
    (w, h, sum, bytes.length.toLong, hist.map(_ / n))
  }

  /** REAL image resize: decode, deterministic nearest-neighbor resample
    * (`src = dst * srcDim / dstDim`, integer floor — no AWT rendering
    * variability), re-encode as PNG. Gray stays gray (exact samples);
    * other color models resample per-band the same way.
    */
  private[pipeline] def resizeImage(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload sniffed as an image but failed to decode")
    val srcR = img.getRaster
    val bands = srcR.getNumBands
    val out =
      if (bands == 1) new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      else new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val dstR = out.getRaster
    val outBands = dstR.getNumBands
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.getHeight / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.getWidth / w).toInt
        var b = 0
        while (b < outBands) {
          dstR.setSample(x, y, b, srcR.getSample(sx, sy, math.min(b, bands - 1)))
          b += 1
        }
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(out, "png", bos), "JDK PNG writer unavailable")
    bos.toByteArray
  }

  /** ---- STUB ---- non-image "resize": a real audio/video implementation
    * would transcode; the fake deterministically truncates/zero-pads the
    * payload to w·h bytes so downstream size invariants are testable.
    */
  private[pipeline] def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    System.arraycopy(bytes, 0, out, 0, math.min(bytes.length, out.length))
    out
  }

  /** ---- STUB ---- "frame sampling": a real implementation decodes every
    * k-th video frame; the fake slices the payload into `frameSize` chunks
    * and keeps every k-th chunk. The batching/shape contract is real.
    */
  private[pipeline] def frameSampleStub(bytes: Array[Byte], frameSize: Int,
                                        everyK: Int): Seq[Array[Byte]] =
    bytes.grouped(frameSize).zipWithIndex
      .collect { case (frame, i) if i % everyK == 0 => frame }
      .toSeq

  /** Resize stage over a payload column: per-partition batched, emits the
    * resized payload plus its post-resize byte count. Image payloads get
    * the REAL nearest-neighbor resample; others the labeled stub.
    */
  def resize(spark: SparkSession, docsWithPayload: DataFrame, w: Int, h: Int,
             idCol: String = "doc_id", payloadCol: String = "content"): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("resized", BinaryType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("decode_kind", StringType, nullable = false)))
    val rdd = docsWithPayload.select(col(idCol).cast("long"), col(payloadCol))
      .rdd.mapPartitions(_.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
        val (out, kind) =
          if (isImage(bytes)) (resizeImage(bytes, w, h), "image")
          else (resizeStub(bytes, w, h), "stub")
        Row(r.getLong(0), out, out.length, kind)
      })
    spark.createDataFrame(rdd, schema)
  }

  /** Frame-sampling stage: one row per kept frame, (doc_id, frame_no,
    * frame) — the explode shape a video pipeline feeds to per-frame
    * embedding. GIF payloads get REAL frames (decoded with the JDK reader,
    * every `everyK`-th kept, re-encoded as PNG so each emitted frame is a
    * self-contained decodable image); other payloads get the labeled
    * byte-slicing stub (`frameSize` applies only there).
    */
  def frameSample(spark: SparkSession, docsWithPayload: DataFrame,
                  frameSize: Int, everyK: Int,
                  idCol: String = "doc_id", payloadCol: String = "content"): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false),
      StructField("decode_kind", StringType, nullable = false)))
    val rdd = docsWithPayload.select(col(idCol).cast("long"), col(payloadCol))
      .rdd.mapPartitions(_.flatMap { r =>
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
        if (isGif(bytes)) gifFramesAsPng(bytes, everyK).map {
          case (frame, i) => Row(r.getLong(0), i, frame, "gif")
        }
        else frameSampleStub(bytes, frameSize, everyK).zipWithIndex.map {
          case (frame, i) => Row(r.getLong(0), i, frame, "stub")
        }
      })
    spark.createDataFrame(rdd, schema)
  }

  /** Every `everyK`-th GIF frame re-encoded as a standalone PNG, tagged
    * with its ORIGINAL frame index.
    */
  private[pipeline] def gifFramesAsPng(bytes: Array[Byte],
                                       everyK: Int): Seq[(Array[Byte], Int)] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val reader = ImageIO.getImageReaders(iis).next()
    try {
      reader.setInput(iis, false, false)
      (0 until reader.getNumImages(true)).collect {
        case f if f % everyK == 0 =>
          val src = reader.read(f)
          // resolve palette indices to COLORS before re-encoding: the GIF
          // writer reorders its color table, so the raw indexed raster is
          // not the gray value (encoding it directly would silently emit
          // index-valued pixels). Manual sample copy — a drawImage into
          // TYPE_BYTE_GRAY would apply a colorspace transform instead.
          val gray = new BufferedImage(src.getWidth, src.getHeight,
            BufferedImage.TYPE_BYTE_GRAY)
          val out = gray.getRaster
          var y = 0
          while (y < src.getHeight) {
            var x = 0
            while (x < src.getWidth) {
              out.setSample(x, y, 0, src.getRGB(x, y) & 0xff)
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          require(ImageIO.write(gray, "png", bos), "JDK PNG writer unavailable")
          (bos.toByteArray, f)
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Batched per-partition feature extraction over (doc_id, content) — the
    * Scala analogue of a `mapInPandas` decode stage: each partition's
    * iterator is consumed in fixed-size batches handed to `decodeBatch`
    * (where a codec amortizes handle setup per batch, not per row),
    * constant memory, no driver involvement. Output schema is
    * `featureSchema`; image payloads are decoded for REAL.
    */
  def extractFeatures(spark: SparkSession, docsWithPayload: DataFrame,
                      idCol: String = "doc_id", payloadCol: String = "content",
                      batchSize: Int = 64): DataFrame = {
    val rdd = docsWithPayload.select(col(idCol).cast("long"), col(payloadCol))
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val ids = batch.map(_.getLong(0))
          val payloads = batch.map { r =>
            val bytes = r.getAs[Array[Byte]](1)
            if (bytes == null) Array.empty[Byte] else bytes
          }
          decodeBatch(payloads).zip(ids).zip(payloads).map {
            case (((kind, (w, h, pxSum, nPx, feats)), id), safe) =>
              Row(id, safe.length, w, h, pxSum, nPx,
                TextPipeline.rollingHash(new String(safe, "UTF-8")), feats.toSeq,
                kind)
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Batch decode entry point: images decode via the REAL `javax.imageio`
    * path; audio payloads are refused (this stage's schema is pixel-shaped
    * — use [[extractAudioFeatures]], which decodes them for real); other
    * payloads (video stand-ins) fall back to the stub, LABELED in the
    * output's `decode_kind` so fabricated stats are always distinguishable
    * from real decodes.
    */
  private[pipeline] def decodeBatch(
      payloads: Seq[Array[Byte]]): Seq[(String, (Int, Int, Long, Long, Array[Double]))] =
    payloads.map { b =>
      if (isImage(b)) ("image", decodeImage(b))
      else {
        require(!isAudio(b),
          "audio payload in the image feature stage — use extractAudioFeatures")
        ("stub", decodeStub(b))
      }
    }
}
