package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.ops.DedupOps
import graft.pipelines.{CorpusPublisher, Versioned}

/** The composed training-corpus publisher: conservation through the
  * stages, the two-threshold leakage guarantee, manifest/data agreement,
  * and group-snapshot consistency.
  */
class CorpusPublisherSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Catalog.load(spark, dir, "documents")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("corpus_pub_").toString

  test("publish: kept set == corpusClean; splits partition it; manifest " +
    "matches the published data; snapshot has all four tables") {
    val idx = tmp()
    val versions = CorpusPublisher.publish(docs, idx)
    assert(versions.keySet == Set(CorpusPublisher.TrainTable,
      CorpusPublisher.ValTable, CorpusPublisher.TestTable,
      CorpusPublisher.ManifestTable))
    val snap = Versioned.readGroup(spark, idx)
    val published = Seq(CorpusPublisher.TrainTable, CorpusPublisher.ValTable,
      CorpusPublisher.TestTable).map(snap)
    val allIds = published.flatMap(_.select("doc_id").as[Long].collect())
    // partition of the kept set: no doc in two splits, union == corpusClean
    assert(allIds.distinct.size == allIds.size)
    val kept = DedupOps.corpusClean(docs, qualityMin = 0.38)
      .select("doc_id").as[Long].collect().toSet
    assert(allIds.toSet == kept)
    // every published doc passes the quality gate
    published.foreach { t =>
      assert(t.filter(col("quality") < 0.38).count() == 0)
    }
    // manifest == recomputation from the published tables
    val manifest = snap(CorpusPublisher.ManifestTable)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val bySplit = Map(
      "train" -> snap(CorpusPublisher.TrainTable),
      "val" -> snap(CorpusPublisher.ValTable),
      "test" -> snap(CorpusPublisher.TestTable))
    val recomputed = bySplit.toSeq.sortBy(_._1).map { case (name, t) =>
      (name, t.count(),
        t.agg(coalesce(sum("token_count"), lit(0L))).as[Long].collect()(0),
        t.agg(coalesce(sum(length(col("text")).cast("long")), lit(0L)))
          .as[Long].collect()(0))
    }.filter(_._2 > 0)
    assert(manifest == recomputed)
  }

  test("two-threshold leakage guarantee: docs in the same near-dup cluster " +
    "at the LOOSER split threshold always land in the same split") {
    val idx = tmp()
    CorpusPublisher.publish(docs, idx)
    val snap = Versioned.readGroup(spark, idx)
    val withSplit = Seq(
      CorpusPublisher.TrainTable -> "train",
      CorpusPublisher.ValTable -> "val",
      CorpusPublisher.TestTable -> "test").map { case (t, s) =>
        snap(t).select(col("doc_id")).withColumn("split", lit(s))
      }.reduce(_ unionByName _)
    val clusters = DedupOps.dedupClusters(docs, threshold = 0.3)
      .select(col("doc_id"), col("cluster_rep"))
    val straddlers = withSplit.join(clusters, "doc_id")
      .groupBy(col("cluster_rep"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(straddlers.count() == 0)
  }
}
