package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — the second classic "operator Spark lacks" (after
  * as-of). A naive point-in-interval join is a broadcast-nested-loop /
  * cartesian theta join; the scalable form buckets the domain: intervals
  * explode into the coarse buckets they cover, points map to their one
  * bucket, the join runs as an EQUI-join on the bucket key, and the exact
  * `between` predicate filters residually. Join cost goes from |L|·|R| to
  * Σ bucket co-occupancy — the standard interval-join plan (what
  * DuckDB/Trino do natively with an IEJoin, expressed here with Spark
  * primitives so Catalyst shuffles/broadcasts it like any equi-join.)
  */
object RangeJoinOps {

  /** @param points    DataFrame with a numeric point column `p`
    * @param intervals DataFrame with numeric `lo`/`hi` columns (inclusive)
    * @param bucket    bucket width in the same units */
  def pointInInterval(points: DataFrame, p: String,
      intervals: DataFrame, lo: String, hi: String,
      bucket: Long): DataFrame = {
    val pts = points.withColumn("__b", (col(p) / bucket).cast("long"))
    val ivs = intervals.withColumn("__b",
      explode(sequence((col(lo) / bucket).cast("long"), (col(hi) / bucket).cast("long"))))
    pts.join(ivs, Seq("__b"), "inner")
      .filter(col(p) >= col(lo) && col(p) <= col(hi))
      .drop("__b")
  }
}
