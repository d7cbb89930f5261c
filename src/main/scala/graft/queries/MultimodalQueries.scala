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

  /** Near-duplicate MEDIA pairs by perceptual average-hash — the
    * image-dedup gap next to the text near-dup family: hash every
    * payload to 64 bits partition-locally (real 8×8 luma grid for
    * decodable images; the same algorithm over byte cells for stub
    * payloads), band into 16 nibbles, equi-join candidates sharing a
    * band (lossless for Hamming ≤ 12 by pigeonhole; hot bands df-capped),
    * exact popcount filter. The oracle mirrors the byte-cell path
    * exactly — per-char cell sums, cross-multiplied threshold, the
    * same banding and cap — valid because the fixture's text payloads
    * never decode as images (the q75 stub-oracle precedent). */
  def mediaAhashDups(spark: SparkSession, dir: String): DataFrame =
    MediaOps.aHashNearDupPairs(
        MediaOps.mediaFromDocuments(Catalog.load(spark, dir, "documents")))
      .orderBy(col("media_a"), col("media_b"))

  /** The aHash near-dup CTE chain (hash → bands → df-cap → banded
    * candidate join → popcount verify), shared verbatim between the
    * q477 oracle and the multimodal composition below. */
  private val aHashPairCtes =
    """chars AS (
      |  SELECT doc_id, (i - 1) * 64 // strlen(text) AS c,
      |    CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS code
      |  FROM documents, unnest(range(1, strlen(text) + 1)) AS u(i)
      |  WHERE text IS NOT NULL AND strlen(text) > 0
      |), cells AS (
      |  SELECT doc_id, c, CAST(SUM(code) AS BIGINT) AS s_c,
      |    CAST(COUNT(*) AS BIGINT) AS n_c
      |  FROM chars GROUP BY 1, 2
      |), tot AS (
      |  SELECT doc_id, CAST(SUM(code) AS BIGINT) AS s,
      |    CAST(COUNT(*) AS BIGINT) AS l
      |  FROM chars GROUP BY 1
      |), bits AS (
      |  SELECT cells.doc_id, cells.c,
      |    CASE WHEN cells.s_c * tot.l > tot.s * cells.n_c
      |      THEN 1 ELSE 0 END AS bit
      |  FROM cells JOIN tot ON cells.doc_id = tot.doc_id
      |), bandsum AS (
      |  SELECT doc_id, c // 4 AS band_idx,
      |    CAST(SUM(bit << CAST(c % 4 AS INT)) AS BIGINT) AS band_val
      |  FROM bits GROUP BY 1, 2
      |), bands AS (
      |  SELECT tg.doc_id, tg.band_idx, COALESCE(b.band_val, 0) AS band_val
      |  FROM (SELECT t.doc_id, g.band_idx
      |        FROM tot t, unnest(range(0, 16)) AS g(band_idx)) tg
      |  LEFT JOIN bandsum b
      |    ON b.doc_id = tg.doc_id AND b.band_idx = tg.band_idx
      |), packed AS (
      |  SELECT doc_id, CAST(SUM(CASE WHEN bit = 1 THEN
      |      CASE WHEN c = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
      |        ELSE CAST(CAST(1 AS BIGINT) << CAST(c AS INT) AS HUGEINT)
      |      END ELSE 0 END) AS BIGINT) AS h
      |  FROM bits GROUP BY 1
      |), bh AS (
      |  SELECT bands.doc_id, band_idx, band_val, packed.h
      |  FROM bands JOIN packed ON bands.doc_id = packed.doc_id
      |), capped AS (
      |  SELECT band_idx, band_val FROM bands
      |  GROUP BY 1, 2 HAVING COUNT(*) <= 1000
      |)""".stripMargin

  private val aHashPairSelect =
    """SELECT DISTINCT a.doc_id AS media_a, b.doc_id AS media_b,
      |  CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
      |FROM bh a
      |JOIN capped k ON a.band_idx = k.band_idx AND a.band_val = k.band_val
      |JOIN bh b ON b.band_idx = a.band_idx AND b.band_val = a.band_val
      |  AND a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.h, b.h)) <= 12""".stripMargin

  private val mediaAhashDupsSql =
    s"""WITH $aHashPairCtes
       |$aHashPairSelect
       |ORDER BY media_a, media_b""".stripMargin

  /** MULTIMODAL near-dup verification — the cross-modality join a
    * training pipeline runs before trusting either signal alone: every
    * visually-near pair (the q477 aHash band join, byte-cell stub path)
    * is joined to the aligned embedding table (doc_id ≡ vec_id) and
    * scored with the EXACT scaled-int cosine (q64's machinery), so one
    * row carries both modality distances: perceptual `hamming` and
    * semantic `cos_sim`. Both legs are oracle-paired, so the whole
    * composition hash-checks — no all-pairs stage anywhere (candidates
    * come banded+df-capped from the aHash leg; the embedding join is
    * two 8-byte-key equi-joins; the cosine is a codegen kernel). */
  def multimodalNearDup(spark: SparkSession, dir: String): DataFrame = {
    val pairs = MediaOps.aHashNearDupPairs(
      MediaOps.mediaFromDocuments(Catalog.load(spark, dir, "documents")))
    val e = Catalog.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    pairs
      .join(e.select(col("vec_id").as("media_a"),
        col("embedding").as("__ea")), "media_a")
      .join(e.select(col("vec_id").as("media_b"),
        col("embedding").as("__eb")), "media_b")
      .select(col("media_a"), col("media_b"), col("hamming"),
        graft.functions.ScaledIntCosine
          .scaledCosine(col("__ea"), col("__eb")).as("cos_sim"))
      .orderBy(col("media_a"), col("media_b"))
  }

  private val multimodalNearDupSql =
    s"""WITH $aHashPairCtes, pairs AS (
       |$aHashPairSelect
       |), v AS (
       |  SELECT vec_id,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xi,
       |    unnest(range(len(embedding))) AS i
       |  FROM embeddings
       |), nn AS (
       |  SELECT vec_id, SUM(xi * xi) AS n2 FROM v GROUP BY 1
       |), dd AS (
       |  SELECT p.media_a, p.media_b, CAST(SUM(a.xi * b.xi) AS BIGINT) AS dot
       |  FROM pairs p
       |  JOIN v a ON a.vec_id = p.media_a
       |  JOIN v b ON b.vec_id = p.media_b AND a.i = b.i
       |  GROUP BY 1, 2
       |)
       |SELECT p.media_a AS media_a, p.media_b AS media_b, p.hamming,
       |  CAST(dot AS DOUBLE) /
       |    (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))) AS cos_sim
       |FROM pairs p
       |JOIN dd ON p.media_a = dd.media_a AND p.media_b = dd.media_b
       |JOIN nn x ON p.media_a = x.vec_id
       |JOIN nn y ON p.media_b = y.vec_id
       |ORDER BY p.media_a, p.media_b""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q521_multimodal_near_dup", multimodalNearDup,
      Some(multimodalNearDupSql),
      "cross-modality near-dup verification: every aHash-banded visual " +
        "pair joined to the aligned embeddings and scored with the exact " +
        "scaled-int cosine — one row carries both modality distances, " +
        "the whole composition oracle-checked"),
    Q("q477_media_ahash_dups", mediaAhashDups, Some(mediaAhashDupsSql),
      "near-dup media pairs by 64-bit perceptual average-hash (16-band " +
        "LSH, lossless at Hamming<=12, exact popcount verify) — image " +
        "dedup next to the text near-dup family"),
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
