package graft.queries

import graft.catalog.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session-scoped memoized BASKET frames — the market-basket siblings of
  * [[TradeGraph]]: the distinct (order, part) item table and its
  * aggregated pair-count frame, shared by the co-occurrence family
  * (q179 lift pairs, q236 item-item cosine, q318 triples, q334
  * association rules, q350 size histogram) instead of each query
  * re-running the same lineitem distinct + basket self-join. All
  * derivations are exact integer aggregates, so sharing is
  * bit-identical to the per-query builds it replaces (each consumer
  * stays pinned by its own DuckDB oracle).
  *
  * Scale posture unchanged: the self-join fans out per basket (C(k,2)),
  * the capped variants drop pathological mega-baskets BEFORE the join
  * ([[MaxBasketSize]], mirrored in every consumer's oracle), and the
  * pair aggregate shuffles once on (a, b). Memoization changes where
  * the bytes come from, not the plan shape past the shared frame.
  */
object BasketFrames {

  /** Mega-basket ceiling for the capped pair/triple miners (q318/q334):
    * a basket with more than this many distinct parts contributes
    * O(size²)–O(size³) rows to the self-joins — the same quadratic
    * blow-up the dedup candidate joins bound with a shingle df-cap.
    * Baskets above the cap are dropped BEFORE the self-joins, mirrored
    * in the oracles, so the per-key fan-out is bounded by C(cap,3) at
    * any corpus scale. TPC-H baskets are ≤7 lines, so the cap is inert
    * on the fixtures — it exists for the 100 TB pathological
    * mega-basket. */
  val MaxBasketSize = 64

  /** Distinct basket items: (ok, pk), one row per (order, part). */
  def items(spark: SparkSession, dir: String): DataFrame =
    SessionFrames.cached("basket_items", dir, spark) {
      Catalog.load(spark, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
    }

  /** [[items]] with [[MaxBasketSize]] applied. */
  def cappedItems(spark: SparkSession, dir: String): DataFrame =
    SessionFrames.cached("basket_items_capped", dir, spark) {
      items(spark, dir)
        .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("ok"))))
        .filter(col("bsz") <= MaxBasketSize)
        .select(col("ok"), col("pk"))
    }

  private def pairAgg(it: DataFrame): DataFrame =
    it.select(col("ok"), col("pk").as("a"))
      .join(it.select(col("ok"), col("pk").as("b")), "ok")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))

  /** Co-occurrence counts per UNORDERED part pair: (a, b, n_ab) with
    * a < b — the one basket self-join + one (a, b) shuffle the whole
    * pair-mining family needs. Consumers wanting the ordered (a ≠ b)
    * view use [[symmetrized]]: for an unordered pair the count is the
    * same in both directions, so the union-of-swap IS the a ≠ b
    * aggregate, bit for bit. */
  def pairCounts(spark: SparkSession, dir: String): DataFrame =
    SessionFrames.cached("basket_pairs", dir, spark) {
      pairAgg(items(spark, dir))
    }

  /** [[pairCounts]] over the capped item table (q318/q334's view). */
  def cappedPairCounts(spark: SparkSession, dir: String): DataFrame =
    SessionFrames.cached("basket_pairs_capped", dir, spark) {
      pairAgg(cappedItems(spark, dir))
    }

  /** The ordered (a ≠ b) pair view of an a < b pair-count frame. */
  def symmetrized(pairs: DataFrame): DataFrame =
    pairs.select(col("a"), col("b"), col("n_ab"))
      .union(pairs.select(col("b").as("a"), col("a").as("b"), col("n_ab")))
}
