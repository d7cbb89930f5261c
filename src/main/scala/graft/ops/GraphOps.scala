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
    * out-edges contributes nothing). Per-edge contribution stays IEEE
    * double; each round's per-node sum goes through the decimal-cast
    * recipe ([[Det.dsum]]) so the result is ORDER-INDEPENDENT — on a
    * 1000-executor cluster a plain double sum would make every run (and
    * every engine) disagree in the last ulps, compounding per round.
    *
    * @param edges directed edges as columns (u, v); deduplicated here */
  def pageRank(edges: DataFrame, iters: Int = 5): DataFrame = {
    val e = edges.select(col("u"), col("v")).distinct().localCheckpoint(true)
    val nodes = e.select(col("u").as("n"))
      .union(e.select(col("v").as("n"))).distinct()
      .localCheckpoint(true)
    val deg = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true) // joined every round
    var pr = nodes.withColumn("r", lit(1.0))
    for (i <- 0 until iters) {
      val contrib = e.join(pr, e("u") === pr("n"))
        .join(deg, "u")
        .select(col("v"), (col("r") / col("d")).as("x"))
        .groupBy(col("v")).agg(Det.dsum(col("x")).as("s"))
      pr = nodes.join(contrib, nodes("n") === contrib("v"), "left")
        .select(col("n"),
          (lit(0.15) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("r"))
      // lazy checkpoint: truncates lineage for the NEXT round's planning
      // without forcing a blocking job per round (fixed iteration count —
      // no convergence action needs the intermediate result); the final
      // action runs the whole recurrence as one pipelined job
      if (i < iters - 1) pr = pr.localCheckpoint(false)
    }
    pr
  }
}
