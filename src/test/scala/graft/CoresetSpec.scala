package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.ops.{StatsOps, TextOps, VectorOps}

/** Round-5 sketch/selection operators: greedy k-center coreset, SemDeDup
  * semantic dedup, KMV set-similarity. Each is checked against a
  * brute-force recompute on the same data (these are the no-oracle
  * queries q213-q215's correctness gates).
  */
class CoresetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Catalog.load(spark, dir, "embeddings")

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("kCenterCoreset == brute-force greedy farthest-first") {
    val k = 8
    val got = VectorOps.kCenterCoreset(emb, k)
      .orderBy(col("rank")).as[(Int, Long, Double)].collect()
    val all = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    // brute-force greedy: seed = min id, then argmax of min-dist
    var chosen = Vector(all.head)
    var expect = Vector((1, all.head._1, 2.0))
    for (r <- 2 to k) {
      val cand = all.filter(p => !chosen.exists(_._1 == p._1))
        .map { p =>
          val d = chosen.map(c => 1.0 - cos(c._2, p._2)).min
          (p, d)
        }
      val best = cand.maxBy { case ((id, _), d) => (d, -id) }
      chosen :+= best._1
      expect :+= ((r, best._1._1, best._2))
    }
    assert(got.length == k)
    assert(got.map(x => (x._1, x._2)).toSeq == expect.map(x => (x._1, x._2)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-9, s"rank ${g._1}")
    }
    // cover radius at selection time never increases after the seed
    got.drop(1).sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 + 1e-12)
    }
  }

  test("semDedup: dropped ⇔ an earlier same-cell mate with cos ≥ tau") {
    val tau = 0.97
    val out = VectorOps.semDedup(emb, nCells = 16, tau = tau)
      .as[(Long, Int, Boolean)].collect()
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    assert(out.length == vecs.size) // every vector classified exactly once
    val byCell = out.groupBy(_._2)
    byCell.values.foreach { cell =>
      val ids = cell.map(_._1).sorted
      cell.foreach { case (id, _, isDup) =>
        val hasEarlierMate = ids.takeWhile(_ < id)
          .exists(e => cos(vecs(e), vecs(id)) >= tau)
        assert(hasEarlierMate == isDup, s"vec $id")
      }
    }
  }

  test("kmvJaccard within sketch error of exact vocabulary Jaccard") {
    val docs = Catalog.load(spark, dir, "documents")
    val toks = TextOps.exploded(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val est = StatsOps.kmvJaccard(toks, col("source"), col("tok"), k = 256)
      .select(col("grp_a"), col("grp_b"), col("union_est"),
        col("jaccard_est"))
      .as[(String, String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val vocab = toks.select(col("source"), col("tok")).distinct()
      .as[(String, String)].collect()
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    val pairs = vocab.keys.toSeq.sorted.combinations(2).toSeq
    assert(est.size == pairs.size)
    pairs.foreach { case Seq(a, b) =>
      val inter = (vocab(a) & vocab(b)).size.toDouble
      val uni = (vocab(a) | vocab(b)).size.toDouble
      val (uEst, jEst) = est((a, b))
      assert(math.abs(jEst - inter / uni) <= 0.15, s"$a x $b jaccard")
      assert(math.abs(uEst - uni) / uni <= 0.15, s"$a x $b union")
    }
  }
}
