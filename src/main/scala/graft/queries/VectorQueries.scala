package graft.queries

import graft.Q
import graft.catalog.Catalog
import graft.ops.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search surface over `embeddings` (north-star extensions).
  * The exact brute-force top-k and both centroid variants are fully
  * oracle-checked (scaled-integer arithmetic → engine-independent);
  * the LSH ANN path is rows-only + spec-checked recall.
  */
object VectorQueries {

  private def emb(spark: SparkSession, dir: String) =
    Catalog.load(spark, dir, "embeddings")

  private val K = 5
  private val NQ = 8 // query vectors: vec_id < 8

  def cosineTopK(spark: SparkSession, dir: String): DataFrame =
    VectorOps.cosineTopK(emb(spark, dir), col("vec_id") < NQ, K)
      .orderBy(col("query_id"), col("rn"))

  private val cosineTopKSql =
    s"""WITH v AS (
       |  SELECT vec_id,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xi,
       |    unnest(range(len(embedding))) AS i
       |  FROM embeddings
       |), n AS (
       |  SELECT vec_id, SUM(xi * xi) AS n2 FROM v GROUP BY 1
       |), dots AS (
       |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
       |         CAST(SUM(q.xi * d.xi) AS BIGINT) AS dot
       |  FROM v q JOIN v d ON q.i = d.i
       |  WHERE q.vec_id < $NQ AND d.vec_id <> q.vec_id
       |  GROUP BY 1, 2
       |), sims AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(dot AS DOUBLE) /
       |      (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(dn.n2 AS DOUBLE))) AS cos_sim
       |  FROM dots
       |  JOIN n qn ON query_id = qn.vec_id
       |  JOIN n dn ON neighbor_id = dn.vec_id
       |)
       |SELECT query_id, rn, neighbor_id, cos_sim FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rn
       |  FROM sims)
       |WHERE rn <= $K
       |ORDER BY query_id, rn""".stripMargin

  def annTopK(spark: SparkSession, dir: String): DataFrame =
    VectorOps.annTopK(emb(spark, dir), col("vec_id") < NQ, K)
      .orderBy(col("query_id"), col("rn"))

  private val centroidSql =
    """WITH v AS (
      |  SELECT label,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xi,
      |    unnest(range(len(embedding))) AS i
      |  FROM embeddings
      |)
      |SELECT label, CAST(i AS BIGINT) AS i,
      |  CAST(SUM(xi) AS DOUBLE) / COUNT(*) / 1000000.0 AS c
      |FROM v
      |GROUP BY label, i
      |ORDER BY label, i""".stripMargin

  def centroids(spark: SparkSession, dir: String): DataFrame =
    VectorOps.labelCentroids(emb(spark, dir)).orderBy(col("label"), col("i"))

  def centroidsUdaf(spark: SparkSession, dir: String): DataFrame =
    VectorOps.labelCentroidsUdaf(emb(spark, dir)).orderBy(col("label"), col("i"))

  val all: Seq[Q] = Seq(
    Q("q70_cosine_topk", cosineTopK, Some(cosineTopKSql),
      "exact brute-force cosine top-5 for 8 query vectors (scaled-int oracle)"),
    Q("q71_ann_lsh_topk", annTopK, None,
      "hyperplane-LSH multiprobe ANN top-5 (spec-checked recall)"),
    Q("q72_label_centroids", centroids, Some(centroidSql),
      "per-label embedding centroids, relational plan"),
    Q("q73_centroids_udaf", centroidsUdaf, Some(centroidSql),
      "per-label centroids via typed Aggregator UDAF (same oracle)"))
}
