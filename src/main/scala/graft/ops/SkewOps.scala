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
}
