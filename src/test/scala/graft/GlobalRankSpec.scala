package graft

import graft.ops.GlobalRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[GlobalRank]] must be HASH-IDENTICAL to the builtin window forms it
  * replaces (the six rewritten queries keep their DuckDB-green hashes on
  * the strength of this equivalence) while planning NO single-partition
  * WindowExec. Equality is pinned against `row_number()`/`ntile(k)` over
  * a deterministic total order on seeded random data with heavy ties,
  * across frame sizes bracketing every div/mod edge (n < k, n = k,
  * n % k = 0, n % k ≠ 0, empty). */
class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(n: Int) = {
    val rnd = new scala.util.Random(42 + n)
    // v deliberately collides (mod 7) so ties straddle bucket boundaries
    (0 until n).map(i => (rnd.nextInt(7), i.toLong)).toDF("v", "id")
  }

  private val sizes = Seq(0, 1, 2, 3, 5, 23, 100, 1001)
  private val ks = Seq(1, 3, 4, 5, 10, 64)

  test("withRowNumber == row_number() over the global total order") {
    for (n <- sizes) {
      val df = frame(n)
      val expected = df.withColumn("rn",
          row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select("id", "rn").as[(Long, Long)].collect().sorted
      val got = GlobalRank.withRowNumber(df, Seq(col("v"), col("id")), "rn")
        .select("id", "rn").as[(Long, Long)].collect().sorted
      assert(got.toSeq == expected.toSeq, s"n=$n")
    }
  }

  test("withNtile == ntile(k) over the global total order") {
    for (n <- sizes; k <- ks) {
      val df = frame(n)
      val expected = df.withColumn("b",
          ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "b").as[(Long, Int)].collect().sorted
      val got = GlobalRank.withNtile(df, k, Seq(col("v"), col("id")), "b")
        .select("id", "b").as[(Long, Int)].collect().sorted
      assert(got.toSeq == expected.toSeq, s"n=$n k=$k")
    }
  }

  test("grouped form: per-group rn/ntile via group-first order + base subtraction") {
    val df = frame(500).withColumn("g", (col("id") % 3).cast("int"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val expected = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("b", ntile(10).over(w))
      .select("id", "rn", "b").as[(Long, Long, Int)].collect().sorted
    val r = GlobalRank.withRowNumber(df,
      Seq(col("g"), col("v"), col("id")), "grn")
    val bounds = r.groupBy(col("g"))
      .agg(min(col("grn")).as("g0"), count(lit(1)).as("gn"))
    val got = r.join(broadcast(bounds), "g")
      .withColumn("rn", col("grn") - col("g0") + 1)
      .withColumn("b", GlobalRank.ntileFromRowNumber(col("rn"), col("gn"), 10))
      .select("id", "rn", "b").as[(Long, Long, Int)].collect().sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("plans no unpartitioned WindowExec and no single-partition funnel") {
    val df = frame(1000)
    val out = GlobalRank.withNtile(df, 5, Seq(col("v"), col("id")), "b")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    // the pinned frame keeps the range shuffle's parallelism (the
    // shuffle itself sits behind the checkpoint, so it can't appear in
    // this plan string — the partition count is the visible witness)
    assert(out.rdd.getNumPartitions > 1, "frame collapsed to one partition")
  }

  test("withRunningSum == sum over unbounded-preceding window (exact longs)") {
    for (n <- sizes) {
      val df = frame(n).withColumn("c", (col("id") * 7 - 3).cast("long"))
      val expected = df.withColumn("cum",
          sum(col("c")).over(Window.orderBy(col("v"), col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("id", "cum").as[(Long, Long)].collect().sorted
      val got = GlobalRank.withRunningSum(df,
          Seq(col("v"), col("id")), col("c"), "cum")
        .select("id", "cum").as[(Long, Long)].collect().sorted
      assert(got.toSeq == expected.toSeq, s"n=$n")
    }
  }

  test("withRunningSum: NULL values (incl. all-null range partitions) " +
    "match the window form's null-skipping sum") {
    // Two null regimes in one frame: a leading null stretch (cumsum must
    // stay NULL until the first non-null of the WHOLE order) and a long
    // mid-order null stretch wide enough to swallow entire range
    // partitions (cumsum must CARRY the prior sum, not go NULL — and the
    // all-null partition must not NPE the offset collect).
    val df = (0 until 800).map { i =>
      val c = if (i < 50 || (i >= 200 && i < 600)) None else Some(i.toLong % 11)
      (i / 4, i.toLong, c)
    }.toDF("v", "id", "c")
    val expected = df.withColumn("cum",
        sum(col("c")).over(Window.orderBy(col("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").as[(Long, Option[Long])].collect().sorted
    val got = GlobalRank.withRunningSum(df,
        Seq(col("v"), col("id")), col("c"), "cum")
      .select("id", "cum").as[(Long, Option[Long])].collect().sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("withRunningSum rejects non-exact value types") {
    val df = frame(10).withColumn("d", col("id").cast("double"))
    intercept[IllegalArgumentException] {
      GlobalRank.withRunningSum(df, Seq(col("v"), col("id")), col("d"), "cum")
    }
  }

  test("withRunningSums (fused multi-column) ≡ k chained withRunningSum " +
    "calls, bit for bit") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 500)
      .map(i => (rnd.nextInt(50), i.toLong, rnd.nextInt(9).toLong,
        rnd.nextInt(9).toLong, rnd.nextInt(9).toLong))
      .toDF("v", "id", "a", "b", "c")
    val fused = GlobalRank.withRunningSums(df, Seq(col("v"), col("id")),
        Seq((col("a"), "ca"), (col("b"), "cb"), (col("c"), "cc")))
      .select("id", "ca", "cb", "cc")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val chained = Seq(("a", "ca"), ("b", "cb"), ("c", "cc"))
      .foldLeft(df) { case (d, (in, out)) =>
        GlobalRank.withRunningSum(d, Seq(col("v"), col("id")),
          col(in), out)
      }
      .select("id", "ca", "cb", "cc")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(fused.toSeq == chained.toSeq)
  }

  test("withRowNumberAndRunningSums (fused rank + k cumsums) ≡ chained " +
    "withRowNumber → withRunningSum calls, bit for bit") {
    val rnd = new scala.util.Random(12)
    val df = (0 until 400)
      .map(i => (rnd.nextInt(40), i.toLong, rnd.nextInt(9).toLong,
        rnd.nextInt(9).toLong))
      .toDF("v", "id", "a", "b")
    val ord = Seq(col("v"), col("id"))
    val fused = GlobalRank.withRowNumberAndRunningSums(df, ord, "rk",
        Seq((col("a"), "ca"), (col("b"), "cb")))
      .select("id", "rk", "ca", "cb")
      .as[(Long, Long, Long, Long)].collect().sorted
    val chained = GlobalRank.withRunningSum(
        GlobalRank.withRunningSum(
          GlobalRank.withRowNumber(df, ord, "rk"), ord, col("a"), "ca"),
        ord, col("b"), "cb")
      .select("id", "rk", "ca", "cb")
      .as[(Long, Long, Long, Long)].collect().sorted
    assert(fused.toSeq == chained.toSeq)
  }

  test("ntile formula handles the n just below/above k*threshold edges") {
    // exhaustive small sweep: every (n, k) with n <= 25, k <= 8
    for (n <- 0 to 25; k <- 1 to 8) {
      val df = (0 until n).map(i => (0, i.toLong)).toDF("v", "id")
      val expected = df.withColumn("b",
          ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "b").as[(Long, Int)].collect().sorted
      val got = GlobalRank.withNtile(df, k, Seq(col("v"), col("id")), "b")
        .select("id", "b").as[(Long, Int)].collect().sorted
      assert(got.toSeq == expected.toSeq, s"n=$n k=$k")
    }
  }
}
