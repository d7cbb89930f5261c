package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{DedupOps, TextOps}
import graft.catalog.Catalog
import org.apache.spark.sql.functions.{col, length, regexp_replace, sum}

/** Specs for the non-oracle-checkable dedup/text ops (engine-specific
  * hashing): MinHash-LSH recall vs exact Jaccard, SimHash behavior,
  * fingerprint determinism.
  */
class DedupTextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Catalog.load(spark, dir, "documents")

  test("minhash-lsh pairs == exact jaccard pairs at τ=0.5 (full recall here)") {
    val exact = DedupOps.jaccardPairs(docs, 5, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = DedupOps.minhashLshPairs(docs, 5, 64, 4, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // LSH candidates are exact-verified, so no false positives possible:
    assert(lsh.subsetOf(exact))
    // with 16 bands × 4 rows at s≥0.5 recall is ~1 on this corpus:
    assert(lsh == exact, s"missed=${exact -- lsh}")
  }

  test("default df cap leaves fixture near-dup output unchanged") {
    // 500 fixture docs, so no key can exceed DefaultMaxDf=1000: the capped
    // and uncapped forms must agree pair-for-pair
    val capped = DedupOps.jaccardPairsHashed(docs, 5, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val uncapped = DedupOps.jaccardPairsHashed(docs, 5, 0.5, maxDf = 0)
      .as[(Long, Long, Double)].collect().toSet
    assert(capped == uncapped)
  }

  test("prefix filter is lossless: PPJoin pairs == uncapped exact pairs, " +
    "and prefixes genuinely prune the postings") {
    val exact = DedupOps.jaccardPairsHashed(docs, 5, 0.5, maxDf = 0)
      .as[(Long, Long, Double)].collect().toSet
    val prefix = DedupOps.jaccardPairsPrefix(docs, 5, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(prefix == exact,
      s"missed=${exact -- prefix} extra=${prefix -- exact}")
    // at t=0.5 each doc keeps |x| - ceil(|x|/2) + 1 ≈ half its shingles:
    // the candidate join's postings must shrink accordingly
    val full = DedupOps.hashedShingles(docs, 5).count()
    val kept = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val sh = DedupOps.hashedShingles(docs, 5)
      val dfreq = sh.groupBy(col("sh_h")).agg(count(lit(1)).as("df"))
      sh.join(dfreq, "sh_h")
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh_h"))))
        .withColumn("n_sh", count(lit(1)).over(
          Window.partitionBy(col("doc_id"))))
        .filter(col("rnk") <= col("n_sh") - ceil(lit(0.5) * col("n_sh")) + 1)
        .count()
    }
    assert(kept <= full * 6 / 10, s"prefix kept $kept of $full postings")
  }

  test("simhash: identical texts get identical signatures; stable across runs") {
    val d = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "x y z w v u t"))
      .toDF("doc_id", "text")
    val sig = DedupOps.simhash(d).as[(Long, Long)].collect().toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
    val sig2 = DedupOps.simhash(d.repartition(7)).as[(Long, Long)].collect().toMap
    assert(sig == sig2) // partition-layout independent
  }

  test("row-local simhash is bit-equal to the relational formulation") {
    val rowLocal = DedupOps.simhash(docs).as[(Long, Long)].collect().toMap
    val relational = DedupOps.simhashRelational(docs).as[(Long, Long)].collect().toMap
    assert(rowLocal == relational)
  }

  test("simhash pairs: near-identical docs collide, distant ones don't") {
    // heavy token repetition → strong per-bit majority margins, so a
    // single-occurrence edit flips few bits (the realistic near-dup shape)
    val base = (1 to 20).flatMap(i => Seq.fill(10)(s"tok$i")).mkString(" ")
    val nearDup = ("changed" +: (1 to 20).flatMap(i =>
      Seq.fill(if (i == 1) 9 else 10)(s"tok$i"))).mkString(" ")
    val other = (1 to 20).flatMap(i => Seq.fill(10)(s"other$i")).mkString(" ")
    val d = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(d, maxHamming = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("winnowed fingerprints: shared runs share prints; disjoint docs don't") {
    val common = (1 to 30).map(i => s"shared$i").mkString(" ")
    val d = Seq(
      (1L, common + " tail1 a b c d e f g h"),
      (2L, "head2 x y z w v u t s " + common),
      (3L, (1 to 40).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val fp = DedupOps.winnowedFingerprints(d, k = 5, w = 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fp(1L) & fp(2L)).nonEmpty)  // 30-token shared run ⇒ shared prints
    assert((fp(1L) & fp(3L)).isEmpty)
    // density ≈ 2/(w+1): far fewer prints than k-grams
    assert(fp(3L).size < 36 && fp(3L).nonEmpty)
    val fp2 = DedupOps.winnowedFingerprints(d.repartition(5), 5, 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fp == fp2)
  }

  test("fingerprint: deterministic across partitionings and runs") {
    val f1 = TextOps.fingerprinted(docs).as[(Long, Long)].collect().toMap
    val f2 = TextOps.fingerprinted(docs.repartition(13)).as[(Long, Long)].collect().toMap
    assert(f1 == f2)
    assert(f1.values.toSet.size > 490) // essentially collision-free here
  }

  test("exact dedup groups: synthetic duplicates collapse to one keeper") {
    val d = Seq((10L, "same text"), (11L, "same text"), (12L, "unique text"))
      .toDF("doc_id", "text")
    val g = DedupOps.exactGroups(d).as[(String, Long, Long)].collect()
    val dup = g.find(_._3 == 2L).get
    assert(dup._2 == 10L) // min doc_id kept
    assert(g.length == 2)
  }

  test("repetitionStats: hand-computed Gopher metrics on planted docs") {
    val d = Seq(
      (1L, "a a a a a"),        // all one token
      (2L, "a b c d e f"),      // no repetition at all
      (3L, "x y x y x y x y"))  // alternating
      .toDF("doc_id", "text")
    val r = TextOps.repetitionStats(d)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) == ((5L, 1.0, 1.0, 0.0)))          // 1 distinct 5-gram of 1
    assert(r(2L) == ((6L, 1.0 / 6, 1.0 / 5, 0.0)))
    // top bigram "x y" 4 of 7; 5-grams: 2 distinct of 4 → dup 0.5
    assert(r(3L) == ((8L, 0.5, 4.0 / 7, 0.5)))
  }

  test("compressionRatio: repetitive text compresses below diverse text; " +
    "bounds hold; null/empty dropped") {
    val diverse = (0 until 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val d = Seq(
      (1L, "spam " * 200),            // maximally repetitive
      (2L, diverse),                  // high-entropy token stream
      (3L, null.asInstanceOf[String]),
      (4L, ""))
      .toDF("doc_id", "text")
    val r = TextOps.compressionRatio(d)
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(r.keySet == Set(1L, 2L)) // null/empty absent, not NaN rows
    assert(r(1L)._4 < r(2L)._4)     // redundancy compresses further
    assert(r.values.forall(t => t._4 > 0 && t._4 < 1.2 && t._3 > 0))
    assert(r(1L)._2 == 1000L)       // utf8 byte count is exact
  }

  test("scrubbed: masks emails/urls/long numbers and flags the docs") {
    val d = Seq(
      (1L, "contact bob@example.com or visit https://x.io/page ref 123456789"),
      (2L, "plain text with short 123 number"))
      .toDF("doc_id", "text")
    val out = TextOps.scrubbed(d)
      .as[(Long, String, Boolean, Boolean, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    assert(out(1L)._2 == "contact <EMAIL> or visit <URL> ref <NUM>")
    assert(out(1L)._3 && out(1L)._4 && out(1L)._5)
    assert(out(2L)._2 == "plain text with short 123 number")
    assert(!out(2L)._3 && !out(2L)._4 && !out(2L)._5)
  }

  test("tfidfTop: rare terms outrank corpus-wide ones; k rows per doc") {
    val d = Seq(
      (1L, "common rare1 rare1"),
      (2L, "common rare2 rare2"),
      (3L, "common rare3 rare3"))
      .toDF("doc_id", "text")
    val top1 = TextOps.tfidfTop(d, k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // "common" is in every doc (df=3); each rareN is df=1 → higher idf
    assert(top1 == Map(1L -> "rare1", 2L -> "rare2", 3L -> "rare3"))
    val all = TextOps.tfidfTop(d, k = 2).groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(all.values.forall(_ == 2L))
  }

  test("leakageSafeSplits: near-dup cluster members always share a split") {
    val common = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (7L, common),                    // near-dups of each other
      (203L, common + " tail"),        // 203 % 100 = 3 but rep is 7
      (185L, (1 to 40).map(i => s"x$i").mkString(" "))) // singleton
      .toDF("doc_id", "text")
    val s = DedupOps.leakageSafeSplits(d)
      .as[(Long, Long, String)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(s(7L)._1 == 7L && s(203L)._1 == 7L) // same cluster rep
    assert(s(7L)._2 == s(203L)._2)             // → same split, no leakage
    assert(s(7L)._2 == "train")                // 7 % 100 = 7 < 80
    assert(s(185L) == ((185L, "val")))         // singleton: 85 ∈ [80, 90)
  }

  test("contamination: planted eval overlap found; boilerplate-only ignored") {
    val leak = (1 to 20).map(i => s"bench$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$leak extra tokens beyond the benchmark run"), // contaminated
      (2L, (1 to 30).map(i => s"clean$i").mkString(" ")))   // clean
      .toDF("doc_id", "text")
    val evalSet = Seq((100L, leak)).toDF("doc_id", "text")
    val hits = DedupOps.contamination(corpus, evalSet, minCommon = 3)
      .as[(Long, Long, Long)].collect()
    assert(hits.map(h => (h._1, h._2)).toSeq == Seq((1L, 100L)))
    assert(hits.head._3 == 16L) // all 16 5-grams of the 20-token benchmark
  }

  test("contaminationBloom == contamination even at fpp=0.5 (false " +
    "positives die in the join, never in the result)") {
    val leak = (1 to 20).map(i => s"bench$i").mkString(" ")
    val corpus = ((1 to 30).map(i =>
      (i.toLong, (1 to 30).map(j => s"c${i}_$j").mkString(" "))) :+
      (31L -> s"$leak plus some trailing context here"))
      .toDF("doc_id", "text")
    val evalSet = Seq((100L, leak),
      (101L, (1 to 25).map(i => s"e$i").mkString(" "))).toDF("doc_id", "text")
    val exact = DedupOps.contamination(corpus, evalSet, minCommon = 3)
      .as[(Long, Long, Long)].collect().toSet
    // a deliberately terrible filter: half of everything "might match"
    val bloomed = DedupOps.contaminationBloom(corpus, evalSet,
        minCommon = 3, fpp = 0.5)
      .as[(Long, Long, Long)].collect().toSet
    assert(bloomed == exact)
    assert(exact.map(h => (h._1, h._2)) == Set((31L, 100L)))
  }

  test("chunked: window boundaries, overlap, short tails, exact multiples") {
    val d = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks, size 4 stride 3
      (2L, (1 to 6).map(i => s"s$i").mkString(" ")),  // exact multiple of stride
      (3L, "solo"))                                   // shorter than one window
      .toDF("doc_id", "text")
    val c = graft.ops.TextOps.chunked(d, size = 4, overlap = 1)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    // doc1: starts 0,3,6,9 → last chunk is the 1-token tail
    assert(c(1L) == Seq(("t1 t2 t3 t4", 4L), ("t4 t5 t6 t7", 4L),
      ("t7 t8 t9 t10", 4L), ("t10", 1L)))
    // doc2: 6 tokens, stride 3 → exactly two windows, second short
    assert(c(2L) == Seq(("s1 s2 s3 s4", 4L), ("s4 s5 s6", 3L)))
    assert(c(3L) == Seq(("solo", 1L)))
    // consecutive chunks share exactly `overlap` tokens
    assert(c(1L)(0)._1.split(' ').last == c(1L)(1)._1.split(' ').head)
  }

  test("collocations: hand-computed lift, low-frequency tail suppressed") {
    val d = ((1L to 5L).map(i => (i, "a b")) ++
      (6L to 10L).map(i => (i, "c d")) ++
      Seq((11L, "rare pair"))) // c_bg=1 < minCount → suppressed
      .toDF("doc_id", "text")
    val out = graft.ops.TextOps.collocations(d, topN = 10, minCount = 5)
      .as[(String, Long, Long, Long, Double)].collect()
    // n_tok=22; lift(a b) = 5·22/(5·5) = 4.4 — both pairs tie, bigram breaks
    assert(out.map(_._1).toSeq == Seq("a b", "c d"))
    assert(out.forall(_._5 == 5.0 * 22 / 25))
  }

  test("incrementalDedup: planted exact/near/chain cases get the right " +
    "verdicts; clean docs admitted") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val corpus = Seq(
      (1L, base),                        // exact twin of batch 100
      (2L, base.replace("w10", "zz")),   // near-dup of batch 101
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, base),                          // exact dup vs corpus
      (101L, base.replace("w9", "yy")),      // near-dup vs corpus doc 2? no — vs corpus 1
      (102L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"),  // clean: admitted
      (103L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 xx"),   // near-dup of SMALLER batch 102
      (104L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"))  // exact dup of batch 102
      .toDF("doc_id", "text")
    val out = DedupOps.incrementalDedup(corpus, batch, n = 5, threshold = 0.5)
      .as[(Long, String)].collect().toMap
    assert(out(100L) == "exact_dup")
    assert(out(101L) == "near_dup")   // shares 5-grams with corpus doc 1/2
    assert(out(102L) == "admitted")   // the batch keeper
    assert(out(103L) == "near_dup")   // greedy: loses to smaller batch id
    assert(out(104L) == "exact_dup")  // batch-internal exact dup
    assert(out.size == 5)
  }

  test("packSequences: hand-computed bin boundaries, straddling doc " +
    "belongs to the bin its first token lands in") {
    // per-group token counts 4,3,5,2 with budget 6:
    //   before = 0,4,7,12 → pack_id 0,0,1,2 ; offset 0,4,1,0
    val d = Seq((1L, "t t t t", "en"), (2L, "t t t", "en"),
      (3L, "t t t t t", "en"), (4L, "t t", "en"),
      (10L, "x x x x x x x", "es")) // second group packs independently
      .toDF("doc_id", "text", "lang")
    val out = TextOps.packSequences(d, budget = 6)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._3, r._4, r._5)).toMap
    assert(out(1L) == ((4L, 0L, 0L)))
    assert(out(2L) == ((3L, 0L, 4L)))
    assert(out(3L) == ((5L, 1L, 1L)))
    assert(out(4L) == ((2L, 2L, 0L)))
    assert(out(10L) == ((7L, 0L, 0L)))
  }

  test("stratifiedSample: every stratum sampled at ceil(frac*n), " +
    "deterministic across partitionings") {
    import org.apache.spark.sql.functions.col
    val sizes = docs.groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    val s = graft.ops.StatsOps.stratifiedSample(
      docs, col("doc_id"), col("lang"), frac = 0.2)
    val got = s.groupBy(col("stratum")).count().as[(String, Long)].collect().toMap
    assert(got == sizes.map { case (l, n) => l -> math.ceil(n * 0.2).toLong })
    val again = graft.ops.StatsOps.stratifiedSample(
        docs.repartition(13), col("doc_id"), col("lang"), frac = 0.2)
      .as[(Long, String, Long)].collect().toSet
    assert(again == s.as[(Long, String, Long)].collect().toSet)
  }

  test("langId: stopword votes pick the planted language") {
    val d = Seq(
      (1L, "the cat sat of the mat and a dog in town"),
      (2L, "el la de y es el la de y es"),
      (3L, "zz qq ww")) // no stopwords at all → und
      .toDF("doc_id", "text")
    val out = TextOps.langId(d).select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "und")
  }

  test("BPE: word-level merge mechanics, round-trip, monotone compression, " +
    "and the first trained merge equals q188's top pair") {
    val docs = graft.catalog.Catalog.load(
      spark, "/root/testdata/sf0.001", "documents")
    // mechanics on a known word: merging (a,b) then (ab,c)
    assert(TextOps.bpeEncodeWord("abcabc",
      Seq(("a", "b"), ("ab", "c"))).toSeq == Seq("abc", "abc"))
    assert(TextOps.bpeEncodeWord("aaa", Seq(("a", "a"))).toSeq
      == Seq("aa", "a")) // left-to-right non-overlapping
    // round-trip: symbols concatenate back to the word, at any depth
    val merges = TextOps.bpeTrainMerges(docs, 10)
    assert(merges.length == 10)
    for (w <- Seq("table", "window", "customer", "spark"))
      assert(TextOps.bpeEncodeWord(w, merges).mkString == w)
    // zero merges = character count
    val chars = TextOps.bpeEncode(docs, Nil)
      .agg(sum(col("n_symbols"))).as[Long].head()
    val charsExpected = docs
      .agg(sum(length(regexp_replace(col("text"), " ", ""))))
      .as[Long].head()
    assert(chars == charsExpected)
    // more merges never inflate the encoding
    val s5 = TextOps.bpeEncode(docs, merges.take(5))
      .agg(sum(col("n_symbols"))).as[Long].head()
    val s10 = TextOps.bpeEncode(docs, merges)
      .agg(sum(col("n_symbols"))).as[Long].head()
    assert(s10 <= s5 && s5 <= chars)
    // the trainer's first merge is exactly q188's top-ranked pair
    val topPair = TextOps.bpePairCandidates(docs, 1)
      .select(col("pair")).as[String].head()
    assert(merges.head._1 + merges.head._2 == topPair,
      s"first merge ${merges.head} vs q188 top $topPair")
    // the driver-memory cap: default never binds (same merges), and a
    // tight maxVocab still trains deterministically on the top-N words
    assert(TextOps.bpeTrainMerges(docs, 10,
      maxVocab = Int.MaxValue, minFreq = 1L) == merges)
    val capped = TextOps.bpeTrainMerges(docs, 5, maxVocab = 100)
    assert(capped.length == 5)
    assert(capped == TextOps.bpeTrainMerges(docs, 5, maxVocab = 100))
  }
}
