package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Catalog

/** Catalog regression net: every declared schema loads, matches the
  * DataFrame schema exactly (post-normalization), and has rows at the
  * smallest scale factor.
  */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("all fixture tables load with declared schemas and non-zero rows") {
    for (t <- Catalog.all) {
      val df = t.load(spark, dir)
      assert(df.count() > 0, t.name)
      if (t.name != "events") assert(df.schema == t.schema, t.name)
      else {
        // events.ts is normalized LongType(ns) → TimestampType(µs)
        assert(df.schema("ts").dataType ==
          org.apache.spark.sql.types.TimestampType)
        assert(df.schema.fieldNames.sameElements(t.schema.fieldNames))
      }
    }
  }

  test("fixture freshness guard: real-testdata timestamps are wall-clock " +
    "sane, not unit-collapsed") {
    // Round-6 postmortem: the driver regenerated fixtures with a new
    // physical ts unit and every event-time query silently collapsed into
    // a 43-minute sliver of 1970 (µs read as ns ÷ 1000). This guard reads
    // the REAL fixtures through the catalog and asserts sane wall-clock
    // ranges — a wrong-unit load lands in 1970 (÷1000) or year ~56000
    // (×1000), both far outside the window — so physical-layout drift
    // fails loudly here instead of 28 queries deep in the oracle compare.
    import org.apache.spark.sql.functions.{min, max, year}
    val checks = Seq(
      ("events", "ts"), ("orders", "o_orderdate"), ("lineitem", "l_shipdate"))
    for ((table, col) <- checks) {
      val df = Catalog.load(spark, dir, table)
      val Array(lo, hi) = df.agg(
        year(min(org.apache.spark.sql.functions.col(col))),
        year(max(org.apache.spark.sql.functions.col(col)))).collect()(0)
        .toSeq.map(_.asInstanceOf[Int]).toArray
      assert(lo >= 1990 && hi <= 2035, s"$table.$col years [$lo,$hi]")
    }
  }

  test("declared-schema scans prune: single-column read touches one column") {
    val p = Catalog.load(spark, dir, "lineitem").select("l_quantity")
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<l_quantity:double>"))
  }
}
