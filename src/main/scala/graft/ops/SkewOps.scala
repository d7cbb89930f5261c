package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join patterns for hot keys (SURVEY §4 / scale brief).
  *
  * AQE's skew-join split handles sort-merge skew automatically at runtime;
  * explicit salting is still the tool when a known-hot key must hash-join
  * against a non-broadcastable build side: the probe side spreads each key
  * over `factor` salted partitions and the build side is replicated
  * `factor`× — turning one straggler partition into `factor` even ones.
  * Results are identical to the plain join (spec-asserted).
  */
object SkewOps {

  /** Inner equi-join with salting: `left` (large, possibly skewed) joins
    * `right` (large-ish, replicated ×factor). Deterministic salt from the
    * row's own columns (no rand() — reproducible under retries/replays,
    * which nondeterministic salts are not). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int, saltFrom: Seq[String]): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(saltFrom.map(col): _*), lit(factor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Two-phase salted aggregation for a skewed group key: aggregate on
    * (key, salt) first — spreading one hot key's rows over `factor`
    * partial groups — then merge the partials per key. Only needed for
    * aggregates where ONE reducer per key is the bottleneck even after
    * map-side partial aggregation (e.g. count_distinct-style state that
    * partial combine can't shrink); plain sums/counts already combine
    * map-side and gain nothing. `aggs` maps each output column to the
    * pair (phase-1 aggregate over rows, phase-2 merge over partials) —
    * e.g. count: (count(*), sum), sum: (sum(x), sum), max: (max(x), max).
    * Deterministic salt from the row's own columns, like [[saltedJoin]]. */
  def saltedAgg(df: DataFrame, key: String, factor: Int,
      saltFrom: Seq[String],
      aggs: Seq[(String, (Column, Column => Column))]): DataFrame = {
    val phase1 = df.withColumn("__salt",
        pmod(xxhash64(saltFrom.map(col): _*), lit(factor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(aggs.head._2._1.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, (a, _)) => a.as(s"__p_$n") }: _*)
    phase1.groupBy(col(key))
      .agg(aggs.head._2._2(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, (_, m)) => m(col(s"__p_$n")).as(n) }: _*)
  }
}
