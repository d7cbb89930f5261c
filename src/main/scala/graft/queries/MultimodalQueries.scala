package graft.queries

import graft.Q
import graft.catalog.Catalog
import graft.ops.MediaOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal surface: binary-payload decode + feature extraction via
  * typed mapPartitions. The decode stub derives metadata as a pure
  * function of payload length, so the metadata projection is fully
  * oracle-checkable even though it flows through opaque partition-local
  * Scala code; the float feature vectors are spec-checked instead.
  */
object MultimodalQueries {

  /** Modality coverage audit — the cross-table completeness question a
    * multimodal training pipeline asks before every run: which media
    * items have a companion embedding row, per modality? One 8-byte-key
    * left join (media ids against distinct vector ids) and one
    * aggregate; the percentage is a single nullif-guarded mirrored
    * division. At 100 TB both sides join on ids only — payloads and
    * vectors never move. */
  def modalityCoverage(spark: SparkSession, dir: String): DataFrame = {
    val m = MediaOps.mediaFeatures(Catalog.load(spark, dir, "documents"))
      .select(col("media_id"), col("media_type"))
    val e = Catalog.load(spark, dir, "embeddings")
      .select(col("vec_id")).distinct()
    m.join(e, m("media_id") === e("vec_id"), "left")
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n"),
        count(col("vec_id")).as("n_emb"))
      .withColumn("coverage_pct",
        col("n_emb").cast("double") / nullif(col("n"), lit(0L)) * lit(100.0))
      .orderBy(col("media_type"))
  }

  private val modalityCoverageSql =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)]
      |      AS media_type
      |  FROM documents
      |), e AS (
      |  SELECT DISTINCT vec_id FROM embeddings
      |)
      |SELECT media_type, COUNT(*) AS n,
      |  CAST(COUNT(e.vec_id) AS BIGINT) AS n_emb,
      |  CAST(COUNT(e.vec_id) AS DOUBLE) / nullif(COUNT(*), 0) * 100.0
      |    AS coverage_pct
      |FROM m LEFT JOIN e ON m.media_id = e.vec_id
      |GROUP BY media_type
      |ORDER BY media_type""".stripMargin

  /** Metadata path (oracle-checked): media_id, type, dimensions, frames. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    MediaOps.mediaFeatures(Catalog.load(spark, dir, "documents"))
      .select("media_id", "media_type", "width", "height", "n_frames", "n_bytes")
      .orderBy(col("media_id"))

  private val mediaMetaSql =
    """SELECT doc_id AS media_id,
      |  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |  CAST(64 + strlen(text) % 640 AS INT) AS width,
      |  CAST(64 + strlen(text) % 480 AS INT) AS height,
      |  CAST(ceil(strlen(text) / 32.0) AS INT) AS n_frames,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes
      |FROM documents
      |ORDER BY media_id""".stripMargin

  /** Feature path (rows-only; determinism spec-checked): per-type mean
    * feature norms — the shape a downstream training pipeline consumes. */
  def mediaFeatureStats(spark: SparkSession, dir: String): DataFrame =
    MediaOps.mediaFeatures(Catalog.load(spark, dir, "documents"))
      .withColumn("feat_norm",
        sqrt(aggregate(transform(col("features"), x => x.cast("double") * x),
          lit(0.0), (a, x) => a + x)))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_items"),
        avg(col("feat_norm")).as("mean_feat_norm"))
      .orderBy(col("media_type"))

  /** Frame sampling (oracle-checked): the stub slices payloads into
    * 32-byte frames, so DuckDB can replicate positions/sizes/digests with
    * substr + md5 over the (all-ASCII) source text. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    MediaOps.frameSample(
        MediaOps.mediaFromDocuments(Catalog.load(spark, dir, "documents")))
      .toDF()
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_bytes").cast("long").as("frame_bytes"), col("frame_md5"))
      .orderBy(col("media_id"), col("frame_idx"))

  private val frameSampleSql =
    """SELECT doc_id AS media_id,
      |  CAST(i AS BIGINT) AS frame_idx,
      |  CAST(strlen(substr(text, CAST(i * 32 + 1 AS INT), 32)) AS BIGINT) AS frame_bytes,
      |  md5(substr(text, CAST(i * 32 + 1 AS INT), 32)) AS frame_md5
      |FROM documents,
      |  unnest(range(0, CAST(ceil(strlen(text) / 32.0) AS BIGINT))) AS u(i)
      |ORDER BY media_id, frame_idx""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q183_modality_coverage", modalityCoverage, Some(modalityCoverageSql),
      "modality coverage audit: per media type, how many items carry an " +
        "embedding (left join on 8-byte ids, nullif-guarded pct)"),
    Q("q75_media_meta", mediaMeta, Some(mediaMetaSql),
      "binary decode-stub metadata via typed mapPartitions (oracle on length-derived fields)"),
    Q("q76_media_feature_stats", mediaFeatureStats, None,
      "per-type feature-vector stats (spec-checked determinism)"),
    Q("q77_frame_sample", frameSample, Some(frameSampleSql),
      "frame sampling: payload → 32-byte frames with digests (flatMap, no payload shuffle)"),
    Q("q89_media_resize", mediaResize, Some(mediaResizeSql),
      "aspect-preserving resize dimensions into a 64px box (stubbed resample)"))

  /** Resize path (oracle-checked on the dimension arithmetic — same IEEE
    * scale expression on both engines). */
  def mediaResize(spark: SparkSession, dir: String): DataFrame =
    MediaOps.resize(
        MediaOps.mediaFromDocuments(Catalog.load(spark, dir, "documents")))
      .toDF()
      .select(col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("new_w").cast("long").as("new_w"),
        col("new_h").cast("long").as("new_h"),
        col("resized_bytes"))
      .orderBy(col("media_id"))

  // lazy: referenced from `all`, which is declared above this definition
  private lazy val mediaResizeSql =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    64 + strlen(text) % 640 AS w,
      |    64 + strlen(text) % 480 AS h
      |  FROM documents
      |), s AS (
      |  SELECT media_id, w, h,
      |    CASE WHEN greatest(w, h) > 64
      |         THEN 64.0 / greatest(w, h) ELSE 1.0 END AS scale
      |  FROM d
      |)
      |SELECT media_id,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(greatest(1, CAST(floor(w * scale) AS BIGINT)) AS BIGINT) AS new_w,
      |  CAST(greatest(1, CAST(floor(h * scale) AS BIGINT)) AS BIGINT) AS new_h,
      |  CAST(greatest(1, CAST(floor(w * scale) AS BIGINT))
      |     * greatest(1, CAST(floor(h * scale) AS BIGINT)) * 3 AS BIGINT) AS resized_bytes
      |FROM s
      |ORDER BY media_id""".stripMargin
}
