package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q166's CMS audit on the real documents corpus: the structural
  * overestimate guarantee holds on every reported token and the excess
  * stays within a generous e*N/width envelope. (Matrix mergeability and
  * layout independence are pinned in AnalyticsSpec's CountMinAgg test.)
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("cms audit: every estimate >= exact, excess within 10*N/width") {
    val docs = graft.catalog.Catalog.load(spark, dir, "documents")
    val toks = graft.ops.TextOps.exploded(docs).select(col("tok")).as[String]
    val n = toks.count()
    val rows = graft.queries.TextQueries.cmsFreq(spark, dir)
      .select("tok", "exact_n", "est_n", "overest")
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows.length == 20)
    val bound = 10L * n / 1024 + 1
    for ((tok, exact, est, over) <- rows) {
      assert(over && est >= exact, s"$tok: est $est < exact $exact")
      assert(est - exact <= bound, s"$tok: excess ${est - exact} > $bound")
    }
  }
}
