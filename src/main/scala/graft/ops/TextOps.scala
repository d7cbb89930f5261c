package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * per-document statistics, quality scoring, stopword-profile language ID,
  * term frequencies, content fingerprinting.
  *
  * All operators are declarative column algebra (codegen'd built-ins — no
  * UDFs), so they stay inside whole-stage codegen and scale linearly with
  * a shuffle only where a groupBy genuinely needs one.
  */
object TextOps {

  /** Whitespace tokenizer as an array column. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-style pre-tokenization: maximal runs of letters, digits, or
    * single punctuation marks — the segmentation a byte-pair tokenizer
    * starts from (the subsequent merge table lookup is vocabulary-bound
    * and sits outside the engine). */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeTokens(text: Column): Column = regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Per-document token statistics: counts are exact ints; ratios are
    * IEEE-deterministic divisions of exact ints. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct_tokens"),
      col("n_chars"),
      (length(regexp_replace(col("text"), " ", "")).cast("double") /
        size(t)).as("avg_token_len"),
      (size(array_distinct(t)).cast("double") / size(t)).as("lexical_diversity"),
      size(bpeTokens(col("text"))).cast("long").as("n_bpe_tokens"))
  }

  /** Stopword profiles per language (tiny heuristic sets; the operator
    * shape — explode → conditional count → argmax — is the real surface). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "in"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("de", "le", "shi", "he", "zai"))

  /** Explode to one row per token (keeps doc_id + lang labels). */
  def exploded(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))

  /** All word n-grams per document, NOT deduplicated (frequency-counting
    * input, unlike DedupOps.shingles' distinct sets). Compiled
    * partition-local loop — same rationale as shingling: the zip_with
    * HOF formulation runs interpreted. */
  def ngrams(docs: DataFrame, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = if (text == null) Array.empty[String]
            else text.split(" ", -1) // limit -1: SQL trailing-"" semantics
          if (toks.length < n) Iterator.empty
          else (0 to toks.length - n).iterator.map { i =>
            val sb = new java.lang.StringBuilder(64)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(toks(i + j)); j += 1
            }
            (id, sb.toString)
          }
        }
      }.toDF("doc_id", "ngram")
  }

  /** Quality score in [0,1]: length saturation + stopword density +
    * lexical diversity, all from exact counts. */
  def qualityScored(docs: DataFrame): DataFrame = {
    val en = stopwords("en")
    val perDoc = exploded(docs)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("tok").isInCollection(en), lit(1))).as("n_stop"),
        countDistinct(col("tok")).as("n_distinct"))
    perDoc.select(
      col("doc_id"), col("n_tokens"), col("n_stop"),
      (least(col("n_tokens").cast("double") / 100, lit(1.0)) * 0.4 +
        (col("n_stop").cast("double") / col("n_tokens")) * 0.3 +
        (col("n_distinct").cast("double") / col("n_tokens")) * 0.3)
        .as("quality"))
  }

  /** Stopword-vote language ID: count hits per language profile, predict
    * the argmax (ties broken by fixed language order). */
  def langId(docs: DataFrame): DataFrame = {
    val langs = Seq("en", "es", "de", "fr", "zh")
    val votes = langs.map { l =>
      count(when(col("tok").isInCollection(stopwords(l)), lit(1))).as(s"c_$l")
    }
    val scored = exploded(docs).groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val best = langs.map(l => col(s"c_$l")).reduce((a, b) => greatest(a, b))
    val pred = langs.foldRight(lit("und"): Column) { (l, rest) =>
      when(col(s"c_$l") === best && best > 0, l).otherwise(rest)
    }
    scored.select((col("doc_id") +: langs.map(l => col(s"c_$l"))) :+ pred.as("pred_lang"): _*)
  }

  /** 64-bit content fingerprint (xxhash64 — partition-order independent). */
  def fingerprinted(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), xxhash64(col("text")).as("fp64"))

  /** Corpus term frequencies, top-n with deterministic tie-break. */
  def termFreq(docs: DataFrame, topN: Int): DataFrame =
    exploded(docs)
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"), countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("freq").desc, col("tok"))
      .limit(topN)

  /** Gopher-style repetition metrics per document — the standard
    * quality-filter signals for LLM training corpora (most-frequent
    * unigram share, most-frequent bigram share, duplicated 5-gram
    * fraction). Every metric depends only on its own document, so all
    * three are computed in ONE compiled partition-local pass with ZERO
    * shuffles — the relational form would explode tokens + two n-gram
    * tables into three corpus-wide aggregates. Fractions are IEEE
    * divisions of exact counts (cross-engine deterministic). */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        // null text → doc absent (matches the SQL twin, and avoids 0/0
        // NaN metrics for a row that has no tokens to measure)
        it.filter(_._2 != null).map { case (id, text) =>
          val toks = text.split(" ", -1) // limit -1: SQL trailing-"" semantics
          val n = toks.length
          val uni = new java.util.HashMap[String, Int](n * 2)
          var maxUni = 0
          var i = 0
          while (i < n) {
            val c = uni.merge(toks(i), 1, (a, b) => a + b)
            if (c > maxUni) maxUni = c
            i += 1
          }
          var maxBi = 0
          if (n >= 2) {
            val bi = new java.util.HashMap[String, Int](n * 2)
            i = 0
            while (i < n - 1) {
              val c = bi.merge(toks(i) + " " + toks(i + 1), 1, (a, b) => a + b)
              if (c > maxBi) maxBi = c
              i += 1
            }
          }
          var d5 = 0
          if (n >= 5) {
            val g5 = new java.util.HashSet[String](n * 2)
            i = 0
            while (i <= n - 5) {
              val sb = new java.lang.StringBuilder(64)
              var j = 0
              while (j < 5) {
                if (j > 0) sb.append(' ')
                sb.append(toks(i + j)); j += 1
              }
              if (g5.add(sb.toString)) d5 += 1
              i += 1
            }
          }
          (id, n.toLong,
            maxUni.toDouble / n,
            if (n >= 2) maxBi.toDouble / (n - 1) else 0.0,
            if (n >= 5) 1.0 - d5.toDouble / (n - 4) else 0.0)
        }
      }.toDF("doc_id", "n_tokens", "top_unigram_frac", "top_bigram_frac",
        "dup_5gram_frac")
  }

  /** Per-document deflate compression ratio — the Gopher/RefinedWeb
    * quality signal the repetition metrics approximate: highly
    * repetitive or templated text compresses far below natural prose.
    * `ratio = deflated_bytes / utf8_bytes` (level 6, raw deflate), so
    * lower = more redundant. Partition-local single pass, one reused
    * Deflater per partition, zero shuffles. The byte stream a codec
    * emits is implementation-specific → no SQL oracle; bounds and
    * monotonicity are spec-checked instead (TextQueries registers the
    * rows-only form). */
  def compressionRatio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6, true)
        val buf = new Array[Byte](1 << 16)
        it.filter(t => t._2 != null && t._2.nonEmpty).map { case (id, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var out = 0L
          while (!deflater.finished())
            out += deflater.deflate(buf)
          (id, raw.length.toLong, out, out.toDouble / raw.length)
        }
      }.toDF("doc_id", "n_bytes", "n_deflated", "compression_ratio")
  }

  /** RAG chunking: split each document into overlapping token windows —
    * the unit a retrieval pipeline embeds and indexes (the reference IS
    * a RAG ingest pipeline; this is its missing center). Windows are
    * `size` tokens starting every `size - overlap` tokens; the tail
    * chunk may be short. Per-document arithmetic → one compiled
    * partition-local pass, zero shuffles, like every other per-doc op
    * here. Chunk count = ceil(n_tokens / stride). */
  def chunked(docs: DataFrame, size: Int = 32, overlap: Int = 8): DataFrame = {
    require(size > overlap && overlap >= 0, "need size > overlap >= 0")
    val stride = size - overlap
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = if (text == null) Array.empty[String]
            else text.split(" ", -1) // limit -1: SQL trailing-"" semantics
          val n = toks.length
          val nChunks = (n + stride - 1) / stride
          (0 until nChunks).iterator.map { k =>
            val from = k * stride
            val until = math.min(from + size, n)
            (id, k.toLong, toks.slice(from, until).mkString(" "),
              (until - from).toLong)
          }
        }
      }.toDF("doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens")
  }

  /** Greedy sequence packing for pre-training batches: documents are
    * laid end-to-end per `by` group in doc_id order and each is assigned
    * the context-window bin (`budget` tokens) its FIRST token lands in —
    * the concat-then-chunk packing every LLM data loader performs,
    * expressed as one running-sum window so the assignment is
    * deterministic and engine-independent (exact BIGINT arithmetic, `div`
    * integer division). Packing is per-group (per language here, per
    * shard in production) so the window never needs a global total order
    * — the 100 TB shape; a single global ORDER BY would serialize the
    * corpus through one partition. */
  def packSequences(docs: DataFrame, budget: Long = 2048,
      by: String = "lang"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(by)).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col(by),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col(by), col("n_tokens"),
        expr(s"before div $budget").as("pack_id"),
        (col("before") % budget).as("pack_offset"))
  }

  /** Corpus-relative length cut: keep documents whose token count lies
    * between the rank-selected loFrac and hiFrac percentiles of their
    * OWN stratum (language here, shard in production) — the
    * quality-filter cousin of a fixed length threshold, robust to
    * strata with different natural lengths. Percentiles are exact rank
    * picks (`ceil(frac·n)`-th order statistic, the
    * [[StatsOps.rankPercentiles]] recipe) so the cut is
    * engine-identical — quantile builtins interpolate engine-
    * specifically. One window per stratum + a broadcast bounds join;
    * no global sort. */
  def lengthPercentileFilter(docs: DataFrame, loFrac: Double = 0.1,
      hiFrac: Double = 0.9, by: String = "lang"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), col(by),
      size(tokens(col("text"))).cast("long").as("n_tokens"))
    val ranked = toks
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(by)).orderBy(col("n_tokens"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(by))))
    val bounds = ranked.groupBy(col(by)).agg(
      max(when(expr(s"rn = cast(ceil(n * $loFrac) as bigint)"),
        col("n_tokens"))).as("lo"),
      max(when(expr(s"rn = cast(ceil(n * $hiFrac) as bigint)"),
        col("n_tokens"))).as("hi"))
    toks.join(broadcast(bounds), by)
      .filter(col("n_tokens") >= col("lo") && col("n_tokens") <= col("hi"))
      .select(col("doc_id"), col(by), col("n_tokens"), col("lo"), col("hi"))
  }

  /** Collocation mining: top word pairs by LIFT — the rational form of
    * PMI, `P(xy) / (P(x)·P(y)) = c_xy · N / (c_x · c_y)` — over corpus
    * bigram and unigram counts (n-gram LM / tokenizer-merge data prep).
    * ln-free like [[tfidfTop]]'s idf: exact-count ratios are
    * bit-deterministic across engines and the ranking equals PMI's
    * (ln is monotonic). `minCount` suppresses the unstable low-frequency
    * tail, standard collocation practice. Two aggregates over compact
    * pairs + two broadcast-sized joins. */
  def collocations(docs: DataFrame, topN: Int = 20, minCount: Long = 5): DataFrame = {
    val uni = exploded(docs).groupBy(col("tok")).agg(count(lit(1)).as("c_tok"))
    val nTok = uni.agg(sum(col("c_tok")).as("n_tok"))
    val bg = ngrams(docs, 2).groupBy(col("ngram").as("bigram"))
      .agg(count(lit(1)).as("c_bg"))
      .filter(col("c_bg") >= minCount)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
    bg
      .join(uni.select(col("tok").as("w1"), col("c_tok").as("c_w1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c_tok").as("c_w2")), "w2")
      .crossJoin(broadcast(nTok))
      .withColumn("lift",
        col("c_bg").cast("double") * col("n_tok") / col("c_w1") / col("c_w2"))
      .select(col("bigram"), col("c_bg"), col("c_w1"), col("c_w2"), col("lift"))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(topN)
  }

  /** PII/URL scrubbing: mask emails, URLs, and long digit runs, and flag
    * which documents contained them. Patterns are deliberately restricted
    * to syntax RE2 and java.util.regex share (no lookaround, no
    * backreferences) so the same literal pattern runs on any engine.
    * Pure codegen'd column algebra — scrubbing is the archetypal
    * map-only 100 TB pass. */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val UrlPattern = "https?://[^ ]+"
  val LongNumberPattern = "[0-9]{9,}"
  def scrubbed(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), UrlPattern, "<URL>"),
          EmailPattern, "<EMAIL>"),
        LongNumberPattern, "<NUM>").as("clean_text"),
      col("text").rlike(EmailPattern).as("has_email"),
      col("text").rlike(UrlPattern).as("has_url"),
      col("text").rlike(LongNumberPattern).as("has_long_number"))

  /** Top-k terms per document by tf-idf (keyword extraction / corpus
    * summarization). The idf surrogate is the rational (n_docs+1)/(df+1)
    * — ln-free on purpose: exact-int ratios are bit-deterministic across
    * engines, a transcendental ln is not, and the RANKING it induces is
    * identical (ln is monotonic). Two aggregates on compact (doc, term)
    * pairs + one broadcast of the corpus-size scalar; the per-doc top-k
    * is a rank-k window (WindowGroupLimit keeps it partial). */
  def tfidfTop(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = exploded(docs).groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val score = col("tf").cast("double") *
      (col("n_docs") + 1).cast("double") / (col("df") + 1).cast("double")
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", score)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("tok"))))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("tok").as("term"), col("tf"), col("df"),
        col("tfidf"))
  }

  /** BPE merge-candidate mining — the first iteration of byte-pair-
    * encoding tokenizer training: count adjacent character pairs across
    * the corpus, weighted by word frequency (the pair a BPE trainer
    * would merge first is the top row). Runs on the distinct-word
    * aggregate, not raw tokens — the pair fan-out is |vocab|·word_len,
    * independent of corpus size, which is what makes tokenizer training
    * feasible over 100 TB: the only corpus-sized work is the word count
    * every pipeline already has. Pairs are 2-char substrings (one
    * compiled transform per word), so a pair occurring twice in a word
    * ("aaa" → "aa"×2) is counted per position, exactly like the BPE
    * frequency table. */
  def bpePairCandidates(docs: DataFrame, topN: Int = 20): DataFrame = {
    val words = exploded(docs).groupBy(col("tok")).agg(count(lit(1)).as("wc"))
    words.filter(length(col("tok")) >= 2)
      .select(col("tok"), col("wc"),
        explode(transform(sequence(lit(1), length(col("tok")) - 1),
          i => col("tok").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("wc")).as("total_count"),
        count(lit(1)).as("n_positions"),
        countDistinct(col("tok")).as("n_words"))
      .orderBy(col("total_count").desc, col("pair"))
      .limit(topN)
  }

  /** One BPE merge rule applied to a symbol sequence: every
    * non-overlapping adjacent (a, b) occurrence fuses left-to-right —
    * the standard apply order, shared by training and encoding. */
  private[graft] def applyMerge(syms: Array[String], a: String,
      b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Full BPE tokenizer training on the VOCAB aggregate: after the one
    * corpus-sized word count, every iteration counts weighted adjacent
    * symbol pairs over the (word, freq) table — model-sized even at web
    * scale (the vocabulary is corpus-bounded), which is why production
    * BPE trainers work off exactly this aggregate. q188 is the first
    * iteration of this loop as a relational query; here the loop runs
    * to `nMerges`, tie-breaking deterministically on (count desc, pair
    * asc). Returns merges in priority order.
    *
    * The driver-side vocabulary is explicitly bounded: a raw web corpus
    * has an unbounded distinct-token tail (typos, ids, urls), so the
    * collect keeps only the `maxVocab` most frequent words at
    * `minFreq`+ occurrences (deterministic tie-break on token). That is
    * the standard production-trainer prune — hapax tokens cannot win a
    * merge anyway — and turns the collect into a distributed
    * TakeOrderedAndProject with a fixed driver ceiling at any corpus
    * size. Defaults never bind on the fixtures. */
  def bpeTrainMerges(docs: DataFrame, nMerges: Int,
      maxVocab: Int = 1 << 20, minFreq: Long = 1L): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words: Seq[(Array[String], Long)] = exploded(docs)
      .groupBy(col("tok")).agg(count(lit(1)).as("wc"))
      .filter(col("wc") >= minFreq)
      .orderBy(col("wc").desc, col("tok"))
      .limit(maxVocab)
      .as[(String, Long)].collect().toSeq
      .map { case (w, c) => (w.split("").filter(_.nonEmpty), c) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var continue = true
    while (continue && merges.length < nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- words; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + c
      }
      if (counts.isEmpty) continue = false
      else {
        val (a, b) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }._1
        merges += ((a, b))
        words = words.map { case (syms, c) => (applyMerge(syms, a, b), c) }
      }
    }
    merges.toSeq
  }

  /** Encode one word with an ordered merge list (rule 1 everywhere,
    * then rule 2, ...). */
  private[graft] def bpeEncodeWord(word: String,
      merges: Seq[(String, String)]): Array[String] = {
    var syms = word.split("").filter(_.nonEmpty)
    for ((a, b) <- merges) syms = applyMerge(syms, a, b)
    syms
  }

  /** Apply a trained merge list to the corpus: per document, encode
    * every word and report word/symbol counts — the tokenize step a
    * pre-training pipeline runs after [[bpeTrainMerges]]. One
    * partition-local compiled pass with the model-sized merge list as a
    * closure reference and a per-partition word→encoding memo (the
    * vocabulary is tiny next to the corpus, so each word encodes once
    * per partition, not once per occurrence). */
  def bpeEncode(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.Map[String, Array[String]]()
        it.map { case (id, text) =>
          val words = if (text == null) Array.empty[String]
            else text.split(" ", -1)
          var nSyms = 0L
          var maxLen = 0
          for (w <- words) {
            val enc = memo.getOrElseUpdate(w, bpeEncodeWord(w, merges))
            nSyms += enc.length
            for (s <- enc) if (s.length > maxLen) maxLen = s.length
          }
          (id, words.length.toLong, nSyms, maxLen.toLong)
        }
      }.toDF("doc_id", "n_words", "n_symbols", "max_symbol_len")
  }

  /** CCNet-style cross-document boilerplate removal at segment
    * granularity: each document is cut into fixed `width`-token
    * segments, and a segment whose exact text occurs in >= `minDf`
    * distinct documents is boilerplate (the repeated headers / footers /
    * licence blocks web-crawl pipelines strip before training). Returns
    * per document the segment counts and the text rebuilt from the
    * surviving segments in order. The corpus-wide document-frequency
    * count and the flag join both run on the 8-byte xxhash64 of the
    * segment (the hashed-shingle trick), so the df shuffle moves hashes
    * + doc ids only; segment text is shuffled exactly once, keyed by its
    * own 8-byte doc_id, to rebuild the document. */
  def boilerplateClean(docs: DataFrame, width: Int = 8,
      minDf: Int = 2): DataFrame = {
    require(width > 0 && minDf > 1, "need width > 0 and minDf > 1")
    val words = tokens(col("text"))
    val segs = docs
      .select(col("doc_id"), posexplode(transform(
          sequence(lit(0),
            ceil(size(words) / lit(width.toDouble)).cast("int") - 1),
          i => array_join(slice(words, i * lit(width) + 1, lit(width)), " ")))
        .as(Seq("seg_idx", "seg")))
      .withColumn("h", xxhash64(col("seg")))
      // lazy checkpoint: segs feeds BOTH the df count and the flag join
      // — without it the split/transform/posexplode segmentation pass
      // re-executes (the q61/q101 double-shingle lesson)
      .localCheckpoint(false)
    val dfreq = segs.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
    segs.join(dfreq, "h")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        count(when(col("df") >= minDf, 1)).as("n_boiler"),
        array_join(transform(
            sort_array(collect_list(when(col("df") < minDf,
              struct(col("seg_idx"), col("seg"))))),
            s => s("seg")), " ").as("clean_text"))
  }
}
