package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Fleet-wide scale guard #2, next to [[CartesianSweepSpec]]: NO
  * registered query may plan an UNPARTITIONED window (empty
  * PARTITION BY — Spark's "Moving all data to a single partition"
  * warning) unless the frame it windows is on the explicit allowlist
  * below with a written bound. An unpartitioned window over a frame
  * that scales with a fact table or key dimension funnels 10⁸–10⁹ rows
  * through ONE task at 100 TB; the scale-safe exact equivalents
  * ([[graft.ops.GlobalRank]] row_number/ntile/running-sum,
  * [[graft.ops.StatsOps.globalRankPercentiles]]) exist precisely so no
  * query needs that shape — 22 queries were rewritten onto them in
  * round 11, and this sweep keeps the class extinct.
  *
  * Allowlist admission rule: the windowed frame must be COLLAPSED — a
  * prior aggregate whose grouping key has a data-scale-independent
  * cardinality (calendar spine, strata, vocabulary, bounded replicate
  * fan-out) — or top-k-pruned (WindowGroupLimit caps each task's
  * output before the single merge). "Per user/doc/part/supplier/order"
  * frames are NOT bounded and must use GlobalRank instead.
  */
class WindowSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** query → why its unpartitioned window frame stays bounded at 100 TB. */
  private val allowed: Map[String, String] = Map(
    // calendar spines: one row per day/week/month after aggregation —
    // a century of days is < 40k rows, independent of fact-table size
    "q155_pop_change" -> "daily revenue spine",
    "q157_acf" -> "daily series, 7 lag windows",
    "q164_cusum" -> "daily deviation spine",
    "q177_sweep_line" -> "daily in-flight delta spine",
    "q218_changepoint" -> "daily prefix sums",
    "q315_rolling_ols" -> "daily 14-row rolling frames",
    "q352_peak_days" -> "daily local-max frames",
    "q380_drawdown" -> "daily running peak",
    "q381_bollinger" -> "daily 7-row band frames",
    "q385_runs_test" -> "daily sign runs; median rank over days",
    "q388_open_orders" -> "daily backlog cumsum",
    "q502_durbin_watson" -> "daily residual spine",
    "q496_record_days" -> "daily running max + harmonic spine",
    "q442_pettitt_changepoint" -> "daily rank/U statistics",
    "q445_peak_concurrency" -> "daily net-change cumsum",
    "q443_growth_streaks" -> "weekly revenue spine",
    "q435_seasonal_index" -> "monthly spine, 12-lag windows",
    "q493_wilcoxon_signed" -> "12 month-of-year pair frame",
    // post-aggregate spines with literal-bounded cardinality
    "q217_decile_lift" -> "10-row decile spine (fact-sized ntile is GlobalRank)",
    "q120_mixture" -> "per-stratum remainder frame (|strata| rows)",
    "q524_token_budgeted_mixture" ->
      "per-language quota frame (|langs| rows; the per-doc leg is GlobalRank)",
    "q529_training_mixture_manifest" ->
      ("per-language quota frame (|langs| rows — q524's algebra over the " +
        "funnel survivors; the per-doc admission/packing leg is GlobalRank)"),
    "q476_capped_waterfill" -> "per-source water-fill frame (|sources| rows)",
    "q186_temperature_mix" -> "per-stratum weight frame (|strata| rows)",
    "q152_chi_square" -> "contingency cells (flag x status)",
    "q430_contingency_chi2" -> "contingency cells (priority x status)",
    "q279_skew_audit" -> "per-key-bucket counts over a fixed bucket grid",
    "q291_share_of_parent" -> "region/nation hierarchy rollup (25 rows)",
    "q444_priority_mix_drift" -> "priority x year cells (5 x years)",
    "q451_bh_correction" -> "per-nation p-values (25 rows)",
    "q221_bootstrap_ci" -> "B=200 bootstrap replicate means",
    "q122_skyline" -> "distinct part sizes (50 values)",
    "q256_km_hazard" -> "distinct whole-day durations (horizon-bounded)",
    "q497_logrank" -> "distinct whole-day durations (horizon-bounded)",
    // vocabulary spines: token types grow ~log of corpus size
    "q272_pareto_coverage" -> "token vocabulary frame",
    "q369_zipf_check" -> "token vocabulary frame",
    // top-k-pruned: WindowGroupLimit keeps 1000/task before the merge
    "q316_top_share" -> "rn<=1000 filter => WindowGroupLimit pruning")

  test("no registered query plans an unpartitioned window (allowlist excepted)") {
    val offenders = Registry.all.flatMap { q =>
      if (allowed.contains(q.name)) None
      else {
        try {
          val plan = q.build(spark, dir).queryExecution.optimizedPlan
          val hits = plan.collectWithSubqueries {
            case w: LWindow if w.partitionSpec.isEmpty =>
              w.windowExpressions.map(_.sql).mkString("; ").take(100)
          }
          if (hits.nonEmpty) Some(q.name -> hits.mkString(" || ").take(200))
          else None
        } catch {
          case e: Throwable => Some(q.name -> s"BUILD FAILED: ${e.getMessage}")
        }
      }
    }
    assert(offenders.isEmpty, offenders.map { case (n, l) => s"$n: $l" }
      .mkString("\n"))
  }

  test("allowlist carries no stale entries") {
    val stale = allowed.keySet -- Registry.byName.keySet
    assert(stale.isEmpty, s"allowlisted but not registered: $stale")
  }

  test("the rewritten scale-killer class stays off the allowlist") {
    val rewritten = Seq("q36_ranking_pack", "q135_equidepth_hist", "q159_rfm",
      "q171_quality_dup_profile", "q436_first_value_repeat",
      "q456_quintile_migration", "q154_rank_fusion", "q174_lorenz",
      "q371_abc_classes", "q347_catalog_coverage", "q397_length_curriculum",
      "q422_activity_gini", "q193_mann_whitney", "q437_kruskal_wallis",
      "q226_spearman", "q227_ks_test", "q254_cvm_test", "q210_roc_auc",
      "q200_conversion_latency", "q275_session_durations",
      "q284_time_to_convert")
    assert(rewritten.forall(n => !allowed.contains(n)))
  }
}
