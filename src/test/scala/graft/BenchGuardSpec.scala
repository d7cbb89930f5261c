package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.bench.BenchGuard

/** The sidecar-median outlier trigger's arithmetic (r13 verdict item 1):
  * the exact numbers that must and must not re-run / flag, pinned —
  * including the r13 escape (q135 official 11.79 s vs instrumented
  * 1.63 s) that motivated the trigger.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("outlier requires STRICTLY more than 3× the sidecar median AND " +
    "an absolute excess above the noise floor") {
    assert(BenchGuard.isOutlier(11.79, Some(1.63)), "the r13 q135 escape")
    assert(BenchGuard.isOutlier(5.0, Some(1.0)))
    assert(!BenchGuard.isOutlier(3.0, Some(1.0)), "exactly 3× is not an outlier")
    assert(!BenchGuard.isOutlier(2.57, Some(1.57)),
      "q36's 1.6× drift is below the ratio — not this trigger's job")
    // 4.5× but the excess is 70 ms: scheduler noise on a sub-second
    // query, not evidence-weakening pollution — no retry, no flag
    assert(!BenchGuard.isOutlier(0.09, Some(0.02)))
    // just past both gates
    assert(BenchGuard.isOutlier(1.30, Some(0.40)))
    assert(!BenchGuard.isOutlier(1.19, Some(0.40)), "2.975× — under the ratio")
    // a query with no reference row (new this round) is never an outlier
    assert(!BenchGuard.isOutlier(100.0, None))
  }

  test("median matches Bench's rep convention (upper median on even sizes)") {
    assert(BenchGuard.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(BenchGuard.median(Seq(4.0, 1.0, 3.0, 2.0)) == 3.0)
    assert(BenchGuard.median(Seq(7.5)) == 7.5)
  }

  test("sidecar parsing: per-line query→median(walls); junk, truncated, " +
    "and wall-less lines degrade to a smaller table, never an error") {
    val lines = Seq(
      """{"query":"q1_a","walls":[1.2,0.9,1.1],"retried":false}""",
      """{"query":"q2_b","walls":[2.0],"other_busy_frac":0.01}""",
      """{"query":"q3_c","walls":[],"retried":false}""", // no walls → skipped
      """{"walls":[1.0]}""",                             // no query → skipped
      """{"query":"q4_d","walls":[3.0,1.0""",            // truncated → skipped
      """not json at all""",
      """{"query":"q5_e","walls":[5.5,4.5,6.5],"walls_rejected":[9.0]}""")
    val m = BenchGuard.parseSidecarMedians(lines.iterator)
    assert(m == Map("q1_a" -> 1.1, "q2_b" -> 2.0, "q5_e" -> 5.5))
  }

  test("scale-factor filter: rows recorded at a different sf are dropped " +
    "(a 10× data-size mismatch must not read as a mass outlier event); " +
    "sf-less legacy rows are kept") {
    val lines = Seq(
      """{"query":"q1_a","walls":[1.0],"sf":"/data/sf0.1"}""",
      """{"query":"q2_b","walls":[2.0],"sf":"/data/sf1"}""",
      """{"query":"q3_c","walls":[3.0]}""") // pre-r14 row: no sf field
    val m = BenchGuard.parseSidecarMedians(lines.iterator,
      sf = Some("/data/sf0.1"))
    // the legacy sf-less row is kept at sf0.1 (the scale every pre-r14
    // sidecar was recorded at)…
    assert(m == Map("q1_a" -> 1.0, "q3_c" -> 3.0))
    // …but DROPPED at any other scale — keeping it at sf1 would make
    // the whole committed r13 reference a mass-outlier table
    val m1 = BenchGuard.parseSidecarMedians(lines.iterator,
      sf = Some("/data/sf1"))
    assert(m1 == Map("q2_b" -> 2.0))
    // no filter requested → everything parses
    assert(BenchGuard.parseSidecarMedians(lines.iterator).size == 3)
  }

  test("loadReference picks the highest ROUND number (numeric, not " +
    "lexicographic — r13 beats r9) and returns empty when nothing exists") {
    val dir = java.nio.file.Files.createTempDirectory("benchguard_").toString
    def write(name: String, body: String) =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        body.getBytes("UTF-8"))
    write("BENCH_STATS_r9_final.json",
      """{"query":"q1_a","walls":[9.0,9.0,9.0]}""")
    write("BENCH_STATS_r13_final.json",
      """{"query":"q1_a","walls":[1.0,2.0,3.0]}""")
    write("BENCH_STATS_r13_sweep1.json",
      """{"query":"q1_a","walls":[8.0,8.0,8.0]}""") // non-final: ignored
    assert(BenchGuard.loadReference(dir, explicit = None) ==
      Map("q1_a" -> 2.0))
    // explicit path wins over the directory scan
    assert(BenchGuard.loadReference(dir,
      explicit = Some(s"$dir/BENCH_STATS_r9_final.json")) ==
      Map("q1_a" -> 9.0))
    val empty = java.nio.file.Files.createTempDirectory("benchguard_e_").toString
    assert(BenchGuard.loadReference(empty, explicit = None).isEmpty)
  }

  test("loadReference EXCLUDES the current run's own stats output: a " +
    "round-final output name must not become (empty) reference and " +
    "disarm the trigger for the sweep writing it") {
    val dir = java.nio.file.Files.createTempDirectory("benchguard_x_").toString
    def write(name: String, body: String) =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        body.getBytes("UTF-8"))
    write("BENCH_STATS_r13_final.json",
      """{"query":"q1_a","walls":[1.0,2.0,3.0]}""")
    write("BENCH_STATS_r14_final.json", "") // the run's own, just created
    // without the exclusion the empty r14 file wins and the table is {}
    assert(BenchGuard.loadReference(dir, explicit = None).isEmpty)
    // with it, the previous round's table arms the trigger
    assert(BenchGuard.loadReference(dir, explicit = None,
      exclude = Some(s"$dir/BENCH_STATS_r14_final.json")) ==
      Map("q1_a" -> 2.0))
  }

  test("host-scaled outlier check: the canary ratio stretches the " +
    "reference, so a uniformly slower host stops flagging honest medians") {
    // r14's regime: host ~1.4× slower; a query at 3.5× its reference is
    // an outlier unscaled but NOT at scale 1.4 (3.5 < 3×1.4 = 4.2)
    assert(BenchGuard.isOutlier(3.5, Some(1.0)))
    assert(!BenchGuard.isOutlier(3.5, Some(1.0), hostScale = 1.4))
    // a genuine 6× outlier survives the scaled check
    assert(BenchGuard.isOutlier(6.0, Some(1.0), hostScale = 1.4))
    // the absolute excess floor scales with the reference too
    assert(!BenchGuard.isOutlier(0.09, Some(0.02), hostScale = 1.4))
    // scale 1 (no canary on either side) is the pre-r15 behavior exactly
    assert(BenchGuard.isOutlier(11.79, Some(1.63), hostScale = 1.0))
  }

  test("canaryScale: current/reference clamped to [1, MaxCanaryScale]; " +
    "missing or degenerate sides disable scaling (1.0)") {
    assert(BenchGuard.canaryScale(0.7, Some(0.5)) == 1.4)
    // a FASTER host must not tighten the trigger below its calibration
    assert(BenchGuard.canaryScale(0.3, Some(0.5)) == 1.0)
    // a pathological ratio can't disable the trigger outright
    assert(BenchGuard.canaryScale(10.0, Some(0.5)) == BenchGuard.MaxCanaryScale)
    // pre-r15 sidecar (no canary line) / broken probe → unscaled
    assert(BenchGuard.canaryScale(0.7, None) == 1.0)
    assert(BenchGuard.canaryScale(0.7, Some(0.0)) == 1.0)
    assert(BenchGuard.canaryScale(0.0, Some(0.5)) == 1.0)
  }

  test("canary kernel is deterministic and the probe measures real work " +
    "(scales with iterations)") {
    assert(BenchGuard.canaryValue(1000) == BenchGuard.canaryValue(1000))
    assert(BenchGuard.canaryValue(1000) != BenchGuard.canaryValue(2000))
    // tiny iteration counts so the spec costs ms, not seconds: 20× the
    // iterations must cost measurably more wall (JIT warmed by probe)
    val small = BenchGuard.canaryProbe(threads = 1, iters = 2000000, reps = 3)
    val big = BenchGuard.canaryProbe(threads = 1, iters = 40000000, reps = 3)
    assert(big > small * 2,
      s"40M iters ($big s) should dominate 2M iters ($small s)")
    // the multi-thread variant runs and returns a positive wall
    assert(BenchGuard.canaryProbe(threads = 4, iters = 2000000, reps = 1) > 0)
  }

  test("sidecar canary round-trip: parseSidecar reads back the canary " +
    "line Bench writes, un-filtered by sf; loadReferenceFull carries it") {
    val lines = Seq(
      // Bench's first sidecar line (recorded at sf0.1)
      """{"canary_iters":400000000,"canary_threads":32,"canary_s1":0.31,""" +
        """"canary_mt":0.48,"host_scale":1.0,"sf":"/data/sf0.1"}""",
      """{"query":"q1_a","walls":[1.0,1.2,1.1],"sf":"/data/sf0.1"}""")
    // canary survives even when the requested sf differs (host property,
    // not a data-scale property); the rows are still sf-filtered
    val atOther = BenchGuard.parseSidecar(lines.iterator, sf = Some("/x/sf1"))
    assert(atOther.canaryMtSec.contains(0.48) && atOther.medians.isEmpty)
    val atSame = BenchGuard.parseSidecar(lines.iterator,
      sf = Some("/other/root/sf0.1"))
    assert(atSame.canaryMtSec.contains(0.48) &&
      atSame.medians == Map("q1_a" -> 1.1))
    // pre-r15 sidecar: no canary line → None, scaling disabled
    assert(BenchGuard.parseSidecar(
      Iterator("""{"query":"q1_a","walls":[1.0]}""")).canaryMtSec.isEmpty)
    // a canary recorded with a DIFFERENT workload (retuned iters or
    // thread count) is not comparable — ignored, scaling disabled,
    // instead of reading as up-to-4x host drift
    assert(BenchGuard.parseSidecar(Iterator(
      """{"canary_iters":800000000,"canary_threads":32,"canary_mt":0.96}"""
    )).canaryMtSec.isEmpty)
    assert(BenchGuard.parseSidecar(Iterator(
      """{"canary_iters":400000000,"canary_threads":16,"canary_mt":0.48}"""
    )).canaryMtSec.isEmpty)
    // loadReferenceFull surfaces it from the highest-round file
    val dir = java.nio.file.Files.createTempDirectory("benchguard_c_").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "BENCH_STATS_r15_final.json"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    val ref = BenchGuard.loadReferenceFull(dir, explicit = None,
      sf = Some("/data/sf0.1"))
    assert(ref.canaryMtSec.contains(0.48) && ref.medians == Map("q1_a" -> 1.1))
  }
}
