package graft.bench

import scala.collection.concurrent.TrieMap

/** Per-stage wall timings for multi-stage pipeline queries — the r12
  * verdict's "surface q446's stage decomposition as data" ask: q446's
  * ~8 s is structural (two model trainings + three recall audits), but
  * that decomposition lived only in README prose, so every round
  * re-litigated "is q446 regressing?" from the one opaque total. A
  * pipeline query wraps its stages in [[time]]; [[graft.Bench]] emits
  * the recorded map as a `"stages"` field in the canonical metric line,
  * so the per-stage split ships in every BENCH_r{N}.json and a stage
  * regression is visible as data the round it happens.
  *
  * Last-write-wins per (query, stage): under the bench's 3-rep median
  * protocol the recorded value is the final (warmest) rep — the right
  * rep to compare across rounds. Insertion order of stages is kept so
  * the emitted JSON reads in pipeline order.
  */
object StageTimings {

  // (query → (stage → seconds)); TrieMap for the same single-writer
  // visibility reasons as SweepStats — queries run sequentially.
  private val timings = TrieMap.empty[String, TrieMap[String, Double]]
  private val stageOrder = TrieMap.empty[String, Vector[String]]

  def time[T](query: String, stage: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally {
      val sec = (System.nanoTime() - t0) / 1e9
      val m = timings.getOrElseUpdate(query, TrieMap.empty)
      if (!m.contains(stage))
        stageOrder.updateWith(query) {
          case Some(v) => Some(v :+ stage)
          case None => Some(Vector(stage))
        }
      m.put(stage, sec)
    }
  }

  /** Recorded stages, queries sorted, stages in first-recorded order. */
  def snapshot(): Seq[(String, Seq[(String, Double)])] =
    timings.keys.toSeq.sorted.map { q =>
      val m = timings(q)
      q -> stageOrder.getOrElse(q, Vector.empty)
        .flatMap(s => m.get(s).map(s -> _))
    }

  /** JSON of [[snapshot]], ms precision (for the bounded metric line). */
  def toJson: String =
    snapshot().map { case (q, stages) =>
      "\"" + q + "\":" + stages.map { case (s, v) =>
        "\"" + s + "\":" + (math.rint(v * 1000) / 1000)
      }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")

  def clear(): Unit = { timings.clear(); stageOrder.clear() }
}
