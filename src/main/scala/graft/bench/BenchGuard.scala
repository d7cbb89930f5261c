package graft.bench

/** The SECOND trigger of the bench's outlier defense (r13 verdict item
  * 1). The first trigger — [[HostCpu]]'s >20 % other-CPU contention
  * retry — missed r13's own official outliers (q135 at 11.79 s vs a
  * 1.63 s same-code instrumented median; q36 at 2.57 vs 1.57): a host
  * burst below the threshold, or one landing inside the JVM's own
  * accounting window, leaves no other-CPU signature. This trigger
  * instead compares each query's measured median against the COMMITTED
  * instrumented-sweep sidecar from the previous round
  * (`BENCH_STATS_r{N}_final.json` — per-query walls under the identical
  * harness): a median more than [[Ratio]]× the sidecar's gets its rep
  * set re-run once (keeping the lower median — contention never makes a
  * JVM faster), and if STILL high is flagged `suspect` in both the
  * stats sidecar and the canonical metric line, so a polluted number
  * ships labeled as such instead of re-litigated next round.
  *
  * Pure arithmetic lives here (spec-pinned in BenchGuardSpec);
  * [[graft.Bench]] owns the wiring.
  */
object BenchGuard {

  /** Outlier ratio: official median > Ratio × sidecar median. */
  val Ratio = 3.0

  /** Absolute floor on the EXCESS (seconds): sub-second queries flip
    * 3× on scheduler noise alone, and a 0.04-vs-0.012 flip is not the
    * evidence-weakening outlier this defends against — require the
    * median to exceed the reference by at least this much wall time
    * before spending a retry or a flag. */
  val MinExcessSec = 0.25

  /** True when `medianSec` is an outlier against the committed sidecar
    * median for the same query (None = query not in the reference —
    * new this round — never an outlier). */
  def isOutlier(medianSec: Double, sidecarMedianSec: Option[Double]): Boolean =
    sidecarMedianSec.exists(ref =>
      medianSec > Ratio * ref && medianSec - ref > MinExcessSec)

  /** Median of a non-empty sequence (upper median for even sizes — the
    * same convention Bench's rep median uses). */
  def median(ts: Seq[Double]): Double = ts.sorted.apply(ts.size / 2)

  // one sidecar line: {"query":"q1_x","walls":[1.2,0.9,1.1],"sf":"…",...}
  private val QueryRe = """"query"\s*:\s*"([^"]+)"""".r
  private val WallsRe = """"walls"\s*:\s*\[([^\]]*)\]""".r
  private val SfRe = """"sf"\s*:\s*"([^"]+)"""".r

  /** Parse a stats sidecar (one JSON object per line) into
    * query → median(walls). Lines without both fields, or with empty
    * or unparseable walls, are skipped — a truncated sidecar (the
    * crash-resilient streamed format) degrades to a smaller reference
    * table, never an error. `sf`, when given, drops rows recorded at a
    * DIFFERENT scale factor — a 10× data-size mismatch would read as a
    * mass outlier event (every query legitimately ~10× its reference,
    * every rep set re-run, the whole suite flagged `suspect`). Rows
    * WITHOUT an sf field exist only in pre-r14 sidecars, which were all
    * recorded at the driver's sf0.1 — so they are kept exactly when the
    * requested sf IS an sf0.1 directory and dropped otherwise (r14+
    * rows carry the field and this rule never applies to them). */
  def parseSidecarMedians(lines: Iterator[String],
      sf: Option[String] = None): Map[String, Double] = {
    def sfMatches(line: String, want: String): Boolean =
      SfRe.findFirstMatchIn(line) match {
        // compare the SCALE (last path segment), not the full path: the
        // same sf0.1 data mounted at a different root must still match
        // (a path compare would silently disable the trigger), while
        // sf0.15 must NOT match sf0.1 (a substring test would re-open
        // the mass-outlier event on near-miss names)
        case Some(m) => scaleOf(m.group(1)) == scaleOf(want)
        case None => scaleOf(want) == LegacySidecarSf // pre-r14 row
      }
    lines.flatMap { line =>
      for {
        q <- QueryRe.findFirstMatchIn(line).map(_.group(1))
        ws <- WallsRe.findFirstMatchIn(line).map(_.group(1))
        if sf.forall(sfMatches(line, _))
        walls = ws.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
          .flatMap(_.toDoubleOption)
        if walls.nonEmpty
      } yield q -> median(walls)
    }.toMap
  }

  /** The one scale every pre-r14 (sf-field-less) sidecar was recorded
    * at — the driver's per-round sweep scale. */
  val LegacySidecarSf = "sf0.1"

  /** The scale component of an sf directory: its last non-empty path
    * segment ("/root/testdata/sf0.1" and "/mnt/data/sf0.1/" both →
    * "sf0.1"). */
  def scaleOf(sfDir: String): String =
    sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)

  /** Ceiling on sidecar-triggered re-measurements per sweep — a
    * defense-in-depth cap so that even a pathological reference (wrong
    * machine class, corrupted medians) costs at most this many extra
    * rep sets, not a doubled sweep; beyond it, outliers are still
    * FLAGGED `suspect` (the label is the contract) but not re-run. */
  val MaxOutlierReruns = 25

  /** The reference table: `SPARK_GRAFT_BENCH_REF` if set, else the
    * highest-round `BENCH_STATS_r<N>_final.json` in `dir`, else empty
    * (trigger disabled — e.g. a fresh clone). `exclude` names the file
    * the CURRENT run is writing: when the stats output is itself given
    * a round-final name (the per-round sweep that produces next round's
    * reference), the writer creates it — empty — before this load runs,
    * and without the exclusion it wins the highest-round pick and
    * silently disarms the trigger for exactly the run that was meant to
    * exercise it (observed r14: a 4.3× q135 shipped unflagged,
    * `retried: 0`). */
  def loadReference(dir: String = ".",
      explicit: Option[String] = sys.env.get("SPARK_GRAFT_BENCH_REF"),
      sf: Option[String] = None,
      exclude: Option[String] = None): Map[String, Double] = {
    val re = """BENCH_STATS_r(\d+)_final\.json""".r
    def canon(p: String) =
      try new java.io.File(p).getCanonicalPath
      catch { case _: Throwable => p }
    val ex = exclude.map(canon)
    val path = explicit.orElse {
      val d = new java.io.File(dir)
      Option(d.listFiles()).getOrElse(Array.empty).toSeq
        .flatMap(f => f.getName match {
          case re(n) if !ex.contains(canon(f.getPath)) =>
            Some((n.toInt, f.getPath))
          case _ => None
        })
        .sortBy(_._1).lastOption.map(_._2)
    }
    path.fold(Map.empty[String, Double]) { p =>
      try {
        val src = scala.io.Source.fromFile(p, "UTF-8")
        try parseSidecarMedians(src.getLines(), sf) finally src.close()
      } catch { case _: Throwable => Map.empty }
    }
  }
}
