package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Catalog

/** Robustness sweep: every registered query runs against EMPTY fixture
  * tables without crashing (zero rows out is fine; an exception is not —
  * at 100 TB a partition-pruned read or a quiet day upstream routinely
  * hands an operator zero rows). Ops that genuinely cannot exist without
  * data (model training over an empty corpus) belong on the documented
  * exception list with the error they throw.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emptyDir: String = {
    val d = java.nio.file.Files.createTempDirectory("empty-sf").toString
    Catalog.all.foreach { t =>
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], t.schema)
        .write.parquet(s"$d/${t.name}.parquet")
    }
    d
  }

  /** Ops that REQUIRE data, with the failure they are allowed to raise. */
  private val requiresData: Set[String] = Set()

  test("every registered query tolerates empty inputs") {
    val failures = Registry.all.flatMap { q =>
      if (requiresData(q.name)) None
      else
        try { q.build(spark, emptyDir).count(); None }
        catch { case e: Throwable =>
          Some(s"${q.name}: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString)
        }
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }
}
