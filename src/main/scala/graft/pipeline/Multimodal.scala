package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns with typed metadata, and per-partition batched
  * feature extraction — the Spark-side shape a real decode/embed stage
  * needs (schema, partitioning, batch iteration). The decoder itself is a
  * STUB (this environment has no image/audio libraries): a deterministic
  * fake that reads "dimensions" from the payload header bytes and emits a
  * byte-statistics feature vector. Swap `decodeStub` for a real codec
  * binding; everything around it — batching, schema, null handling — is
  * production plumbing and is tested.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("rolling_fp", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Attach a fake binary payload column (utf-8 bytes of the text) — stands
    * in for an image/audio blob column read from parquet.
    */
  def withPayload(docs: DataFrame, textCol: String = "text",
                  outCol: String = "content"): DataFrame =
    docs.withColumn(outCol, encode(col(textCol), "UTF-8"))

  /** ---- STUB ---- deterministic fake decoder. A real implementation would
    * hand the byte buffer to an image/audio codec here; the fake derives
    * "dimensions" from the first two bytes and a 4-bin byte histogram as the
    * "embedding" so downstream stages have realistic shapes to consume.
    */
  private[pipeline] def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    val w = (if (bytes.nonEmpty) (bytes(0) & 0x7f) else 0) + 1
    val h = (if (bytes.length > 1) (bytes(1) & 0x7f) else 0) + 1
    val hist = new Array[Double](4)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 6) += 1.0
      i += 1
    }
    val n = math.max(bytes.length, 1).toDouble
    (w, h, hist.map(_ / n))
  }

  /** ---- STUB ---- "resize": a real implementation re-encodes the decoded
    * image at (w, h); the fake deterministically truncates/zero-pads the
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
    * resized payload plus its post-resize byte count.
    */
  def resize(spark: SparkSession, docsWithPayload: DataFrame, w: Int, h: Int,
             idCol: String = "doc_id", payloadCol: String = "content"): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("resized", BinaryType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false)))
    val rdd = docsWithPayload.select(col(idCol).cast("long"), col(payloadCol))
      .rdd.mapPartitions(_.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
        val out = resizeStub(bytes, w, h)
        Row(r.getLong(0), out, out.length)
      })
    spark.createDataFrame(rdd, schema)
  }

  /** Frame-sampling stage: one row per kept frame, (doc_id, frame_no,
    * frame) — the explode shape a video pipeline feeds to per-frame
    * embedding.
    */
  def frameSample(spark: SparkSession, docsWithPayload: DataFrame,
                  frameSize: Int, everyK: Int,
                  idCol: String = "doc_id", payloadCol: String = "content"): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val rdd = docsWithPayload.select(col(idCol).cast("long"), col(payloadCol))
      .rdd.mapPartitions(_.flatMap { r =>
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
        frameSampleStub(bytes, frameSize, everyK).zipWithIndex.map {
          case (frame, i) => Row(r.getLong(0), i, frame)
        }
      })
    spark.createDataFrame(rdd, schema)
  }

  /** Batched per-partition feature extraction over (doc_id, content) — the
    * Scala analogue of a `mapInPandas` decode stage: each partition's
    * iterator is consumed in fixed-size batches handed to `decodeBatch`
    * (where a real codec would amortize model/handle setup per batch, not
    * per row), constant memory, no driver involvement. Output schema is
    * `featureSchema`.
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
            case (((w, h, feats), id), safe) =>
              Row(id, safe.length, w, h,
                TextPipeline.rollingHash(new String(safe, "UTF-8")), feats.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** ---- STUB ---- batch decode entry point: a real implementation
    * initializes the codec/model once here and decodes the whole batch.
    */
  private[pipeline] def decodeBatch(
      payloads: Seq[Array[Byte]]): Seq[(Int, Int, Array[Double])] =
    payloads.map(decodeStub)
}
