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

  test("declared-schema scans prune: single-column read touches one column") {
    val p = Catalog.load(spark, dir, "lineitem").select("l_quantity")
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<l_quantity:double>"))
  }
}
