package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the numeric
  * counterpart of DedupOps' connected components. Same scale posture:
  * each round is a distributed join + aggregate, nothing ever collects
  * to the driver, and every round is `localCheckpoint`ed so the plan
  * doesn't nest one join per iteration.
  */
object GraphOps {

  /** PageRank (damping 0.85, fixed `iters` rounds):
    * `pr₀(v) = 1; pr_{t+1}(v) = 0.15 + 0.85 · Σ_{u→v} pr_t(u) / deg(u)`
    * with the simplified dangling-node convention (a node with no
    * out-edges contributes nothing).
    *
    * The recurrence runs entirely in FIXED-POINT micro-rank units
    * (longs, 10⁻⁶ granularity, floor division) — the only formulation
    * of an iterative float recurrence that is bit-exact on ANY engine:
    * plain double sums are combine-order-dependent across a cluster, and
    * even the decimal-cast recipe diverges here because DuckDB's
    * double→DECIMAL cast rounds through a float multiply while Spark
    * expands the double exactly (observed: 1.7e-6 drift at sf0.1 after
    * 5 rounds). 64-bit integer `div`/`+`/`Σ` have exactly one answer
    * everywhere; ranks convert to doubles only on the final output
    * (exact — micro-ranks sit far below 2⁵³).
    *
    * @param edges directed edges as columns (u, v); deduplicated here */
  def pageRank(edges: DataFrame, iters: Int = 5): DataFrame = {
    val e = edges.select(col("u"), col("v")).distinct().localCheckpoint(true)
    val nodes = e.select(col("u").as("n"))
      .union(e.select(col("v").as("n"))).distinct()
      .localCheckpoint(true)
    // out-degree attached to the edge list ONCE — one join per round
    // instead of two (the degree never changes between rounds)
    val ed = e.join(e.groupBy(col("u")).agg(count(lit(1)).as("d")), "u")
      .localCheckpoint(true)
    var pr = nodes.withColumn("r", lit(1000000L)) // 1.0 in micro-units
    for (i <- 0 until iters) {
      val contrib = ed.join(pr, ed("u") === pr("n"))
        .select(col("v"), expr("r div d").as("x"))
        .groupBy(col("v")).agg(sum(col("x")).as("s")) // exact long sum
      pr = nodes.join(contrib, nodes("n") === contrib("v"), "left")
        .select(col("n"),
          expr("150000L + (85 * coalesce(s, 0L)) div 100").as("r"))
      // lazy checkpoint: truncates lineage for the NEXT round's planning
      // without forcing a blocking job per round (fixed iteration count —
      // no convergence action needs the intermediate result); the final
      // action runs the whole recurrence as one pipelined job
      if (i < iters - 1) pr = pr.localCheckpoint(false)
    }
    pr.select(col("n"), (col("r").cast("double") / 1000000.0).as("r"))
  }
}
