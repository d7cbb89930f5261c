package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact GLOBAL row_number / ntile without a single-partition window —
  * the scale-safe replacement for `ntile(k).over(Window.orderBy(...))`,
  * whose physical plan funnels the entire frame through ONE window task
  * (Spark even warns "Moving all data to a single partition"). At sf0.1
  * that is milliseconds; over a 10⁸–10⁹-row key dimension it is the
  * difference between a job and an outage.
  *
  * Recipe (the distributed zipWithIndex, expressed in the DataFrame
  * API so everything stays in whole-stage codegen):
  *
  *   1. `repartitionByRange` on the total order — a RANGE shuffle
  *      across all `spark.sql.shuffle.partitions` tasks, exactly like
  *      a global `orderBy`, except no downstream single-task funnel;
  *   2. `sortWithinPartitions` + `monotonically_increasing_id()` —
  *      the id encodes (partition, position-within-partition) as
  *      `pid << 33 | pos`, giving each row its local offset for free;
  *   3. a lazy `localCheckpoint` PINS the partition layout, so the
  *      tiny per-partition count job and the main consumer see the
  *      SAME pids even under AQE partition coalescing;
  *   4. per-partition counts (≤ numShufflePartitions rows) are
  *      collected driver-side — a manifest-sized collect, same class
  *      as k-means seeds — and folded into a broadcast-free `when`
  *      chain of cumulative bases: `rn = base(pid) + pos + 1`.
  *
  * The order MUST be total (include a unique tiebreak) for the result
  * to be deterministic — same contract as the window form. Bucket
  * assignment for [[withNtile]] reproduces Spark's `NTile` exactly
  * (first `n % k` buckets get `n/k + 1` rows), so swapping a
  * deterministic `ntile` window for this form is hash-identical
  * (GlobalRankSpec pins equality against the builtins).
  *
  * GROUPED ranks over a low-cardinality dimension (the q36/q135 shape:
  * partitioned by a 3-value status/flag column, each partition still
  * ~⅓ of the fact table) reduce to the global form: put the group
  * columns FIRST in the order, then subtract each group's global base
  * (`min(rn)` per group, a broadcast-sized aggregate) — groups are
  * contiguous in the global order, so `rn - min(rn) + 1` IS the
  * per-group row_number. [[ntileFromRowNumber]] then assigns buckets
  * from (per-group rn, per-group n) as columns.
  *
  * On a cluster the localCheckpoint writes the frame once to executor
  * storage (MEMORY_AND_DISK) — linear, distributed, and exactly what a
  * multi-pass rank algorithm needs; the alternative (recomputing the
  * range shuffle per pass) risks pid drift under adaptive re-planning.
  */
object GlobalRank {

  private val IdCol = "__grank_id"
  private val PosMask = (1L << 33) - 1

  /** Exact integer division for Column args (`a div b` for non-negative
    * longs) that never routes through doubles: `(a - a mod b) / b` on
    * decimal(38,0) is exact because the numerator is divisible. Spark's
    * Column `/` is true division (DoubleType for longs), which loses
    * exactness past 2^53 rows — decimal stays bit-exact at any frame
    * size this engine can shuffle. */
  private def intDiv(a: Column, b: Column): Column = {
    val ad = a.cast("decimal(38,0)")
    val bd = b.cast("decimal(38,0)")
    ((ad - pmod(ad, bd)) / bd).cast("long")
  }

  /** Range-partition + sort + pin layout; returns the pinned frame (with
    * the packed id column) and the per-partition counts in pid order. */
  private def pinned(df: DataFrame, order: Seq[Column])
      : (DataFrame, Array[(Long, Long)]) = {
    val spark = df.sparkSession
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val ck = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(IdCol, monotonically_increasing_id())
      .localCheckpoint(false)
    val counts = ck.groupBy(shiftright(col(IdCol), 33).as("pid"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    (ck, counts)
  }

  /** `df` + `out` (LongType): the exact 1-based global row number over
    * the total order `order`. */
  def withRowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame =
    withRowNumberAndTotal(df, order, out)._1

  /** [[withRowNumber]] plus the driver-known total row count (the free
    * byproduct of the per-partition count pass). */
  def withRowNumberAndTotal(df: DataFrame, order: Seq[Column], out: String)
      : (DataFrame, Long) = {
    val (ck, counts) = pinned(df, order)
    var acc = 0L
    val bases = counts.map { case (pid, c) => val b = acc; acc += c; (pid, b) }
    val pid = shiftright(col(IdCol), 33)
    val base = bases.foldLeft(lit(0L)) { case (e, (p, b)) =>
      when(pid === p, lit(b)).otherwise(e)
    }
    val rn = (col(IdCol).bitwiseAND(lit(PosMask)) + base + lit(1L)).as(out)
    (ck.withColumn(out, rn).drop(IdCol), acc)
  }

  /** Spark's exact `NTile(k)` bucket from a 1-based row number and the
    * frame size, both as columns (so grouped callers can feed per-group
    * n): the first `n % k` buckets take `n/k + 1` rows each, the rest
    * `n/k`. IntegerType, matching the builtin. */
  def ntileFromRowNumber(rn: Column, n: Column, k: Int): Column = {
    val kl = lit(k.toLong)
    val size = intDiv(n, kl)
    val rem = n - size * kl
    val padded = (size + lit(1L)) * rem
    when(rn <= padded, intDiv(rn - 1, size + lit(1L)) + 1)
      .otherwise(rem + intDiv(rn - padded - lit(1L), size) + 1)
      .cast("int")
  }

  /** `df` + `out` (IntegerType): the exact global `ntile(k)` over the
    * total order `order` — hash-identical to
    * `ntile(k).over(Window.orderBy(order))` with no single-partition
    * window in the plan. */
  def withNtile(df: DataFrame, k: Int, order: Seq[Column], out: String)
      : DataFrame = {
    require(k >= 1, s"ntile bucket count must be >= 1, got $k")
    val tmp = s"__ntile_rn_$out"
    val (rnDf, n) = withRowNumberAndTotal(df, order, tmp)
    if (n == 0) rnDf.withColumn(out, lit(null).cast("int")).drop(tmp)
    else rnDf
      .withColumn(out, ntileFromRowNumber(col(tmp), lit(n), k))
      .drop(tmp)
  }

  /** `df` + `out` (LongType): the exact global running sum of `value`
    * over the total order `order` — hash-identical to
    * `sum(value).over(Window.orderBy(order).rowsBetween(unboundedPreceding,
    * currentRow))` with no single-partition window. `value` must be an
    * EXACT integral column (LongType cents/counts — the engine's
    * standard exact-accumulation shape): integer addition reassociates
    * freely, so per-partition partial sums + broadcast prefix offsets
    * give bit-identical results; a DOUBLE column would change the FP
    * association and is rejected. The local cumsum window partitions by
    * the range-partition id, so each window task holds one shuffle
    * partition — bounded by partition size, never by frame size. */
  def withRunningSum(df: DataFrame, order: Seq[Column], value: Column,
      out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val v = s"__grank_v_$out"
    val ck = df.withColumn(v, value)
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(IdCol, monotonically_increasing_id())
      .localCheckpoint(false)
    require(ck.schema(v).dataType == org.apache.spark.sql.types.LongType,
      s"withRunningSum needs an exact LongType value, got ${ck.schema(v).dataType}")
    val sums = ck.groupBy(shiftright(col(IdCol), 33).as("pid"))
      .agg(sum(col(v)).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (pid, s) => val o = acc; acc += s; (pid, o) }
    val pid = shiftright(col(IdCol), 33)
    val offset = offsets.foldLeft(lit(0L)) { case (e, (p, o)) =>
      when(pid === p, lit(o)).otherwise(e)
    }
    val localW = Window.partitionBy(pid)
      .orderBy(col(IdCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ck.withColumn(out, sum(col(v)).over(localW) + offset)
      .drop(IdCol, v)
  }

  /** [[withRunningSum]] for SEVERAL exact integral columns in ONE range
    * shuffle, one offset-collect job and one local window pass — the
    * k-column form per-group prefix sums need (k chained single-column
    * calls pay k range shuffles and k checkpoints for identical
    * layouts; q511 measured 5 passes at ~4 s vs ~1 s fused).
    * Bit-identical to the chained form: integer partial sums
    * reassociate freely and all k window functions share one
    * WindowExec over the same pinned layout. */
  def withRunningSums(df: DataFrame, order: Seq[Column],
      values: Seq[(Column, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(values.nonEmpty, "withRunningSums needs at least one column")
    val spark = df.sparkSession
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val vNames = values.indices.map(i => s"__grank_mv_$i")
    val withVals = values.zip(vNames).foldLeft(df) {
      case (d, ((c, _), vn)) => d.withColumn(vn, c)
    }
    val ck = withVals
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(IdCol, monotonically_increasing_id())
      .localCheckpoint(false)
    vNames.foreach { vn =>
      require(ck.schema(vn).dataType == org.apache.spark.sql.types.LongType,
        s"withRunningSums needs exact LongType values, " +
          s"got ${ck.schema(vn).dataType} for $vn")
    }
    val sumAggs = vNames.map(vn => sum(col(vn)).as(s"s_$vn"))
    val sums = ck.groupBy(shiftright(col(IdCol), 33).as("pid"))
      .agg(sumAggs.head, sumAggs.tail: _*)
      .collect()
      .map(r => (r.getLong(0), vNames.indices.map(i => r.getLong(i + 1))))
      .sortBy(_._1)
    val acc = Array.fill(values.length)(0L)
    val offsets = sums.map { case (p, ss) =>
      val base = acc.clone().toSeq
      ss.zipWithIndex.foreach { case (s, i) => acc(i) += s }
      (p, base)
    }
    val pid = shiftright(col(IdCol), 33)
    val localW = Window.partitionBy(pid)
      .orderBy(col(IdCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withOuts = values.zip(vNames).zipWithIndex.foldLeft(ck) {
      case (d, (((_, out), vn), i)) =>
        val offset = offsets.foldLeft(lit(0L)) { case (e, (p, os)) =>
          when(pid === p, lit(os(i))).otherwise(e)
        }
        d.withColumn(out, sum(col(vn)).over(localW) + offset)
    }
    withOuts.drop(IdCol).drop(vNames: _*)
  }
}
