package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * The pattern for media at 100 TB: payloads are opaque `binary` columns
  * with a typed metadata struct alongside; decode / feature-extraction
  * runs as a *batched* per-partition map (the Scala analog of a
  * `mapInPandas` batch UDF) so codec initialization amortizes across a
  * batch and the operation needs no shuffle at all — features are a
  * map-side projection of the payload partition.
  *
  * THE CODEC IS A STUB. This container has no image/audio libraries, so
  * [[decodeStub]] derives deterministic fake "pixel statistics" from the
  * payload bytes. Everything around it — the binary schema, the typed
  * metadata, the batching shape, the partition-preserving execution —
  * is the real plumbing a production codec would drop into.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int,
                             n_frames: Int, format: String)
  final case class MediaRow(media_id: Long, kind: String,
                            content: Array[Byte], meta: MediaMeta)
  final case class MediaFeature(media_id: Long, kind: String, n_bytes: Int,
                                width: Int, height: Int,
                                mean_intensity: Double, phash: Long)

  /** Real media ingestion path: Spark's `binaryFile` source reads whole
    * files as (path, modificationTime, length, content) rows — the way
    * raw image/audio/video files enter the lake before any decode.
    * `pathGlobFilter` prunes by extension at LISTING time (no bytes
    * read for excluded files). Each file becomes ONE row — bound
    * outliers with `spark.sql.sources.binaryFile.maxLength` (session
    * conf; the read fails rather than OOMing an executor).
    */
  def readBinaryFiles(spark: org.apache.spark.sql.SparkSession, path: String,
                      globFilter: Option[String] = None): DataFrame = {
    val base = spark.read.format("binaryFile")
    globFilter.fold(base)(g => base.option("pathGlobFilter", g)).load(path)
  }

  /** Deterministic media table derived from `documents`: the UTF-8 bytes
    * of the text stand in for a real payload; metadata is synthesized
    * from stable columns. Kinds round-robin image/audio/video.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        ((pmod(col("doc_id"), lit(64)) + 1) * 16).cast("int").as("width"),
        ((pmod(col("doc_id"), lit(48)) + 1) * 16).cast("int").as("height"),
        lit(3).as("channels"),
        (pmod(col("n_chars"), lit(240)) + 1).cast("int").as("n_frames"),
        lit("synthetic").as("format")).as("meta"))

  /** STUB decoder — replace with a real codec (JPEG/PNG/WAV decode) in a
    * deployment. Deterministic in the payload: "mean intensity" is the
    * average unsigned byte value, "phash" a 64-bit FNV-1a fold.
    */
  private[ext] def decodeStub(bytes: Array[Byte]): (Double, Long) = {
    var sum = 0L
    var h = 0xcbf29ce484222325L // FNV-1a
    var i = 0
    while (i < bytes.length) {
      sum += bytes(i) & 0xff
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    (if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length, h)
  }

  /** Batched per-partition feature extraction. `batchSize` mirrors a
    * Pandas-UDF batch: the stub "codec" is handed `batchSize` payloads at
    * a time (codec/session init would sit at the batch boundary). No
    * shuffle — output partitioning follows input partitioning.
    */
  def mediaFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // real codec: init once per batch here
        batch.iterator.map { r =>
          val (meanI, ph) = decodeStub(r.content)
          MediaFeature(r.media_id, r.kind, r.content.length,
            r.meta.width, r.meta.height, meanI, ph)
        }
      }
    }
  }

  /** Resize plan: a metadata-level transform (the payload op is the
    * stubbed codec's job; scheduling-wise the operation is the same
    * map-side batch). Keeps aspect metadata consistent.
    */
  def resizeTo(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.channels").as("channels"),
        col("meta.n_frames").as("n_frames"),
        concat(col("meta.format"), lit(s"-resized")).as("format")))

  /** Frame sampling for video rows: every `nth` frame index from the
    * metadata becomes a row — pure expressions (sequence + filter +
    * explode), no decode, no shuffle.
    */
  def frameSample(media: DataFrame, nth: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.n_frames").as("n_frames"),
        explode(filter(sequence(lit(0), col("meta.n_frames") - 1),
          f => pmod(f, lit(nth)) === 0)).as("frame_idx"))
}
