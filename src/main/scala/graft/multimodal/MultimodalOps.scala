package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Media payloads are opaque `BINARY` columns with a typed metadata struct
  * beside them — the layout that scales: parquet stores the blob once,
  * metadata predicates (format/width/duration) prune without touching
  * bytes, and all per-item compute runs inside `mapPartitions` so a 100 TB
  * corpus streams through executors batch-by-batch with no driver
  * involvement.
  *
  * The actual codecs (JPEG/PNG decode, audio resample, video frame-grab)
  * are NOT linked in this environment — `decodeStub` is a clearly-marked
  * deterministic fake standing in for the codec call. Everything around it
  * (schema, batching, partitioning, feature shape) is the real pipeline.
  */
object MultimodalOps {

  /** Typed metadata carried beside every payload. */
  val MetadataSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)))

  /** Attach a synthetic payload: the document text's UTF-8 bytes stand in
    * for a media blob (deterministic; real pipelines read files here). */
  def withSyntheticPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"))
        .as("meta"))

  /** Feature row produced per payload. */
  final case class MediaFeatures(id: Long, nBytes: Long, meanByte: Double,
      byteEntropy: Double, nFrames: Int)

  /** ==== STUB ====
    * Deterministic fake "decode + featurize" standing in for the real codec
    * (e.g. javax.imageio / ffmpeg bindings — not present in this
    * container). Consumes the raw bytes exactly as a decoder would; emits a
    * fixed-shape feature vector (byte histogram stats + frame count). */
  private[multimodal] def decodeStub(id: Long, bytes: Array[Byte], frameSize: Int): MediaFeatures = {
    val hist = new Array[Long](256)
    var sum = 0L
    bytes.foreach { b => val u = b & 0xFF; hist(u) += 1; sum += u }
    val n = bytes.length.toDouble
    val entropy = if (bytes.isEmpty) 0.0 else
      -hist.filter(_ > 0).map { c => val p = c / n; p * math.log(p) / math.log(2) }.sum
    MediaFeatures(id, bytes.length.toLong,
      if (bytes.isEmpty) 0.0 else sum / n,
      entropy,
      (bytes.length + frameSize - 1) / frameSize)
  }

  /** Batched per-partition media transform — the Scala analogue of
    * `mapInPandas`: iterate the partition in fixed-size batches (the shape
    * a vectorized codec wants), run the kernel per element, emit typed
    * rows. No shuffle: media transforms are embarrassingly parallel;
    * payload bytes never leave their partition. */
  private def mapBatched[T <: Product : org.apache.spark.sql.Encoder](
      payloads: DataFrame, idCol: String, batchSize: Int)(
      kernel: (Long, Array[Byte]) => T): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val ds: Dataset[T] = payloads
      .select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a vectorized codec would be invoked once
          batch.iterator.map { case (id, bytes) => kernel(id, bytes) }
        }
      }
    ds.toDF()
  }

  def extractFeatures(payloads: DataFrame, idCol: String,
      batchSize: Int = 64, frameSize: Int = 4096): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    mapBatched(payloads, idCol, batchSize)(decodeStub(_, _, frameSize))
  }

  /** Resize result row: output size plus exact integer checksums (byte sum
    * and position-weighted sum) that pin both content and order — chosen
    * over a binary hash because the oracle replays them bit-exactly from
    * the source bytes in SQL. */
  final case class ResizedMedia(id: Long, inBytes: Long, outBytes: Long,
      byteSum: Long, weightedSum: Long)

  /** ==== STUB ====
    * Deterministic fake "resize/downsample" standing in for a real codec
    * resample (image scale / audio decimation): keep every `factor`-th
    * byte. Consumes and produces bytes exactly as a resampler would. */
  private[multimodal] def resizeStub(id: Long, bytes: Array[Byte], factor: Int): ResizedMedia = {
    var j = 0L
    var sum = 0L
    var wsum = 0L
    var i = 0
    while (i < bytes.length) {
      val u = bytes(i) & 0xFF
      sum += u
      wsum += u * j
      j += 1
      i += factor
    }
    ResizedMedia(id, bytes.length.toLong, j, sum, wsum)
  }

  /** Batched per-partition resize — same [[mapBatched]] scaffold as
    * [[extractFeatures]], different kernel. */
  def resizePayloads(payloads: DataFrame, idCol: String,
      factor: Int = 4, batchSize: Int = 64): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    mapBatched(payloads, idCol, batchSize)(resizeStub(_, _, factor))
  }

  /** Frame sampling: cut the payload into fixed-size "frames" and keep every
    * `stride`-th — pure expressions (no decode), so pruning/pushdown and
    * codegen all apply. Output one row per kept frame. */
  def sampleFrames(payloads: DataFrame, idCol: String,
      frameSize: Int = 4096, stride: Int = 2): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast("double") / frameSize).cast("int")
    payloads.select(col(idCol), col("payload"), nFrames.as("n_frames"))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("n_frames") - 1), i => i % stride === 0)))
      .select(col(idCol), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameSize + 1, lit(frameSize))
          .as("frame_bytes"))
  }
}
