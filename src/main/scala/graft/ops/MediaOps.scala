package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (north-star): treat image/audio/video as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extract / frame-sample as batch-shaped partition-local
  * transforms.
  *
  * The Spark-side plumbing is real — binary columns, typed Dataset rows,
  * `mapPartitions` with per-partition (batch) processing, fixed-width
  * feature schema — while the codec itself is a STUB (this container has
  * no image/audio libraries): `decodeStub` derives deterministic fake
  * dimensions/frames from the bytes where a real implementation would
  * call a decoder. Swap `decodeStub` for a real codec and nothing else
  * changes.
  *
  * Scale notes: decode is embarrassingly parallel (mapPartitions, no
  * shuffle); payload bytes never shuffle — downstream aggregations group
  * on the extracted metadata/features only.
  */
object MediaOps {

  /** One media item: opaque payload + source metadata. */
  case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded metadata + fixed-width feature vector per item. */
  case class MediaFeatures(
      media_id: Long, media_type: String,
      width: Int, height: Int, n_frames: Int, n_bytes: Long,
      features: Array[Float])

  val FeatureDim = 16

  /** Synthesizes a media table from `documents` (the fixtures ship no
    * binary table): payload = utf8 bytes, media_type from the source id. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** Raw-file ingestion via Spark's `binaryFile` source — how a real
    * multimodal corpus enters the engine (image/audio/video files on
    * object storage → one row per file, content as an opaque binary
    * column, no decoding on read). media_id is a stable hash of the
    * path; media_type comes from the file extension. The source
    * parallelizes over files, so a 100 TB media lake scans exactly like
    * any other table. */
  def fromBinaryFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        lower(element_at(split(col("path"), "\\."), -1)).as("media_type"),
        col("content").as("payload"),
        col("path"), col("length"))

  /** ---- STUB ---- deterministic fake decode: a real build links an
    * image/audio codec here. Metadata is a pure function of byte length
    * (so it is oracle-checkable); "frames" are byte slices. */
  def decodeStub(m: MediaRow): (Int, Int, Int, Array[Array[Byte]]) = {
    val len = m.payload.length
    val width = 64 + len % 640
    val height = 64 + len % 480
    val frameSize = 32
    val frames = m.payload.grouped(frameSize).toArray // frame-sample stub
    (width, height, frames.length, frames)
  }

  /** Batch feature extraction: rolling-hash bytes into a fixed-width
    * float vector (stands in for a CNN/spectrogram embedding). Partition-
    * local, allocation-light, deterministic. */
  private def extract(m: MediaRow): MediaFeatures = {
    val (w, h, nf, _) = decodeStub(m)
    val acc = new Array[Long](FeatureDim)
    var i = 0
    while (i < m.payload.length) {
      val b = m.payload(i) & 0xff
      acc(i % FeatureDim) = acc(i % FeatureDim) * 31 + b
      i += 1
    }
    val feats = acc.map(v => (v & 0xffffff).toFloat / 0xffffff)
    MediaFeatures(m.media_id, m.media_type, w, h, nf, m.payload.length.toLong, feats)
  }

  /** The decode/feature pipeline: typed rows → mapPartitions (batch shape:
    * one iterator per partition, reusable buffers) → typed features. */
  def decodeAndFeaturize(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(extract))
  }

  /** Metadata + feature-norm summary per media item. */
  def mediaFeatures(docs: DataFrame): DataFrame = {
    decodeAndFeaturize(mediaFromDocuments(docs)).toDF()
      .select(col("media_id"), col("media_type"),
        col("width"), col("height"), col("n_frames"), col("n_bytes"),
        col("features"))
  }

  /** Resize result: original + target dimensions and the resized payload
    * size (stub: 3 bytes/pixel RGB). */
  case class Resized(media_id: Long, width: Int, height: Int,
      new_w: Int, new_h: Int, resized_bytes: Long)

  /** Aspect-preserving resize into a `box`×`box` bounding box — STUB like
    * decode: the dimension arithmetic (the part a pipeline plans around:
    * shapes, batch memory) is real and oracle-checkable; the pixel
    * resample would live where `decodeStub` links a codec. Partition-
    * local map, no shuffle. */
  def resizeStub(media: DataFrame, box: Int = 64): Dataset[Resized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { m =>
      val (w, h, _, _) = decodeStub(m)
      val mx = math.max(w, h)
      val scale = if (mx > box) box.toDouble / mx else 1.0
      val nw = math.max(1, math.floor(w * scale).toInt)
      val nh = math.max(1, math.floor(h * scale).toInt)
      Resized(m.media_id, w, h, nw, nh, nw.toLong * nh * 3)
    })
  }

  /** One sampled frame: position, size, content digest. */
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Int,
      frame_md5: String)

  /** Frame sampling: the decode stub's frame slices, flat-mapped to
    * (media_id, frame_idx, size, md5) rows — the batch shape a video/audio
    * pipeline hands to per-frame feature extraction. Partition-local
    * flatMap; payload bytes never shuffle, only digests do. */
  def frameSample(media: DataFrame): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = "0123456789abcdef".toCharArray
      def md5Hex(b: Array[Byte]): String = {
        md.reset()
        val d = md.digest(b)
        val out = new Array[Char](32)
        var i = 0
        while (i < 16) {
          out(2 * i) = hex((d(i) >> 4) & 0xf); out(2 * i + 1) = hex(d(i) & 0xf)
          i += 1
        }
        new String(out)
      }
      it.flatMap { m =>
        val (_, _, _, frames) = decodeStub(m)
        frames.iterator.zipWithIndex.map { case (f, i) =>
          Frame(m.media_id, i, f.length, md5Hex(f))
        }
      }
    }
  }
}
