package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Declared-schema CSV scans (S2 analog): CSV round-trips must be
  * lossless under the catalog schema — including timestamps (UTC pinned)
  * and doubles — with no inference pass.
  */
class CsvSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def roundTrip(name: String): Unit = {
    val src = Catalog.load(spark, dir, name)
    val tmp = java.nio.file.Files.createTempDirectory(s"csv-$name").toString
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/$name.csv")
    val back = Catalog.loadCsv(spark, tmp, name)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("customer CSV round-trip is lossless (strings, ints, doubles)") {
    roundTrip("customer")
  }

  test("orders CSV round-trip is lossless (timestamps)") {
    roundTrip("orders")
  }

  test("csv scan plan has no inference job (schema comes from catalog)") {
    val tmp = java.nio.file.Files.createTempDirectory("csv-plan").toString
    Catalog.load(spark, dir, "region")
      .write.mode("overwrite").option("header", "true").csv(s"$tmp/region.csv")
    // schema must be the declared one before any action runs
    val df = Catalog.loadCsv(spark, tmp, "region")
    assert(df.schema == Catalog.region.schema)
  }
}
