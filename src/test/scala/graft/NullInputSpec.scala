package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Robustness sweep #2: nulls in nullable columns. A malformed upstream
  * row with NULL text/lang/source must contribute nothing (SQL
  * `string_split(NULL)` unnests to zero rows), never crash a compiled
  * tokenizer loop. Mirrors the fixture with nulls injected into the
  * documents string columns and runs the text/dedup query families.
  */
class NullInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val nullDir: String = {
    val d = java.nio.file.Files.createTempDirectory("null-sf").toString
    val src = "/root/testdata/sf0.001"
    Catalog.all.foreach { t =>
      val base = spark.read.schema(t.schema).parquet(s"$src/${t.name}.parquet")
      val out =
        if (t.name == "documents")
          base.withColumn("text",
              when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("text")))
            .withColumn("lang",
              when(col("doc_id") % 11 === 0, lit(null)).otherwise(col("lang")))
            .withColumn("source",
              when(col("doc_id") % 13 === 0, lit(null)).otherwise(col("source")))
        else base
      out.write.parquet(s"$d/${t.name}.parquet")
    }
    d
  }

  test("text/dedup/vector queries survive NULL text/lang/source rows") {
    val families = Registry.all.filter(q =>
      q.name.matches("q(5[0-9]|6[0-8]|9[789]|10[0-4]|108|109|113|114|120|" +
        "12[3-5]|127|132|184|186|188|191|199|205|208|219|223|229)_.*"))
    assert(families.nonEmpty)
    val failures = families.flatMap { q =>
      try { q.build(spark, nullDir).count(); None }
      catch { case e: Throwable =>
        Some(s"${q.name}: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).linesIterator.take(1).mkString)
      }
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }
}
