package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import graft.functions.CosineSimilarity.cosineSim

/** Similarity-search operators over `array<float>` embedding columns
  * (north-star extensions): exact brute-force cosine top-k (the oracle
  * baseline), random-hyperplane LSH with multiprobe (the scale path),
  * per-label centroids via a typed Aggregator UDAF.
  *
  * Determinism: the oracle-checked path scales floats to exact integers
  * (floor(x·10⁶)) so dot products and norms are exact BIGINT sums —
  * order-independent and engine-independent; only the final
  * divide-by-sqrt runs in (deterministic, single-operation) IEEE double.
  *
  * Scale notes: top-k for a query batch broadcasts the queries and
  * computes partial top-k per partition before the final window — no
  * all-pairs shuffle. LSH reduces candidates to same-bucket vectors
  * (multiprobe widens recall); at 100 TB you shard buckets over
  * executors and the per-bucket rerank stays local.
  */
object VectorOps {

  /** floor(x·10⁶) as exact long — the determinism contract above. */
  def scaled(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 1000000).cast("long"))

  /** Brute-force exact cosine top-k neighbors for a set of query vectors.
    * Queries are broadcast; similarity is the fused codegen
    * [[graft.functions.ScaledIntCosine]] (bit-identical to the oracle's
    * scaled-integer arithmetic, no intermediate arrays); ranking is a
    * window over each query's candidates with deterministic tie-break. */
  def cosineTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"))
    val queries = base.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    base.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        graft.functions.ScaledIntCosine.scaledCosine(col("qv"), col("embedding"))
          .as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").cast("long").as("rn"),
        col("neighbor_id"), col("cos_sim"))
  }

  /** Contrastive hard-negative mining: for each query vector, the top-k
    * most cosine-similar vectors with a DIFFERENT label — the negatives
    * that actually teach an embedding model (random negatives are too
    * easy; these sit right at the decision boundary). Same plan shape
    * and scaled-int determinism contract as [[cosineTopK]]: queries
    * broadcast, fused codegen similarity, partial top-k per partition
    * before the final window. */
  def hardNegatives(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"), col("label"))
    val queries = base.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    base.join(broadcast(queries), col("label") =!= col("qlabel"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        col("label").as("neg_label"),
        graft.functions.ScaledIntCosine.scaledCosine(col("qv"), col("embedding"))
          .as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").cast("long").as("rn"),
        col("neighbor_id"), col("neg_label"), col("cos_sim"))
  }

  /** Seeded Gaussian Johnson–Lindenstrauss matrix (outDim × inDim),
    * scaled 1/√outDim so expected inner products are preserved. */
  def jlMatrix(outDim: Int, inDim: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(outDim)(Array.fill(inDim)(
      (rnd.nextGaussian() / math.sqrt(outDim)).toFloat))
  }

  /** Random projection (Johnson–Lindenstrauss): map embeddings to
    * `outDim` dimensions through a seeded Gaussian matrix — the cheap
    * scale lever for ANN over high-dimensional embeddings: pairwise
    * angles are approximately preserved (distortion ~1/√outDim, bounded
    * in the spec) while every downstream bucket/rerank touches
    * outDim/inDim of the bytes. LIMIT, honestly: top-k rankings survive
    * only when neighbor margins exceed that noise floor — on
    * near-orthogonal corpora (like the synthetic fixture) 2× compression
    * blurs fine rankings, so use it for coarse candidate generation with
    * full-dimension rerank, not as the final scorer. Map-only: the
    * matrix rides as a codegen reference object
    * ([[graft.functions.MatVec]]), no shuffle, no row inflation;
    * deterministic for a fixed seed on any cluster layout. */
  def randomProject(emb: DataFrame, outDim: Int, inDim: Int = 64,
      seed: Long = 42L): DataFrame =
    emb.withColumn("embedding",
      graft.functions.MatVec.matVec(col("embedding"),
        jlMatrix(outDim, inDim, seed)))

  /** Deterministic pseudo-random hyperplanes (fixed seed). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH bucket id: sign bits of the vector against `planes`, via the
    * fused codegen expression (one compiled loop over all planes). */
  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    graft.functions.LshBucketExpr.lshBucket(v, planes)

  /** Approximate cosine top-k: multi-table random-hyperplane LSH with
    * hamming-1 multiprobe, exact rerank inside probed buckets via the
    * codegen'd CosineSimilarity expression.
    *
    * Candidate set = union over `nTables` independent hash tables of the
    * query's bucket and the `nPlanes` buckets one bit away. Recall is
    * data-dependent (near-orthogonal corpora need more tables/probes) and
    * tunable via (nTables, nPlanes); with the defaults the sf0.001 spec
    * measures ≥0.9 recall@5. Cost per query ≈ nTables·(nPlanes+1) bucket
    * lookups instead of a full scan — at scale, buckets shard across
    * executors and the rerank stays bucket-local.
    */
  def annTopK(emb: DataFrame, queryPred: Column, k: Int,
      nTables: Int = 6, nPlanes: Int = 5, dim: Int = 64): DataFrame = {
    def perTable(vCol: String, out: String) = (0 until nTables).map { t =>
      val planes = hyperplanes(nPlanes, dim, seed = 42L + t)
      struct(lit(t).as("tbl"), lshBucket(col(vCol), planes).as(out))
    }
    // Corpus side: streamed straight into the join — never cached. The
    // query side re-derives its buckets from the (tiny, broadcast-bound)
    // filtered rows instead of reusing the corpus plan, so nothing needs
    // to be materialized in executor storage memory.
    val base = emb.select(col("vec_id"), col("embedding"),
        explode(array(perTable("embedding", "bucket"): _*)).as("tb"))
      .select(col("vec_id"), col("embedding"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val flips = lit(0) +: (0 until nPlanes).map(j => lit(1 << j))
    val queries = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode(array(perTable("embedding", "qbucket"): _*)).as("tb"))
      .select(col("query_id"), col("qv"), col("tb.tbl").as("tbl"),
        explode(array(flips: _*)).as("flip"), col("tb.qbucket").as("qbucket"))
      .select(col("query_id"), col("qv"), col("tbl"),
        col("qbucket").bitwiseXOR(col("flip")).as("probe"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    base.join(broadcast(queries),
        base("tbl") === queries("tbl") && base("bucket") === queries("probe") &&
          base("vec_id") =!= queries("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qv"), col("embedding"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosineSim(col("qv"), col("embedding")).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").cast("long").as("rn"),
        col("neighbor_id"), col("cos_sim"))
  }

  /** Deterministic k-means (Lloyd's) coarse-quantizer training: init from
    * the first k corpus vectors, then `iters` rounds of assign (broadcast
    * centroids, codegen cosine) + recompute (exact scaled-int means, like
    * labelCentroids). Training reads only a bounded deterministic prefix
    * of the corpus (`trainCap` vectors) — standard IVF practice: the
    * coarse quantizer needs a representative sample, never the full
    * 100 TB corpus. Only the k tiny centroid vectors ever reach the
    * driver — the model, not the data — so the loop is cluster-safe. */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int = 2,
      trainCap: Int = 4096): Seq[(Int, Array[Float])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val train = emb.filter(col("vec_id") < trainCap)
    var centroids: Seq[(Int, Array[Float])] = train.filter(col("vec_id") < k)
      .orderBy("vec_id").select("embedding").as[Array[Float]]
      .collect().toSeq.zipWithIndex.map(_.swap)
    // an empty corpus has no quantizer to train — return the empty model
    // (ivfTopKWith degrades to an empty search result)
    if (centroids.isEmpty) return Nil
    for (_ <- 0 until iters) {
      // fused argmin assignment: one compiled pass over the broadcast
      // centroid array per vector — no k× crossJoin inflation, no window
      // exchange (bit-identical assignments to the relational form,
      // asserted in VectorOpsSpec)
      val assigned = train.select(
        element_at(graft.functions.NearestCentroids.nearestCells(
          col("embedding"), centroids, 1), 1).as("label"),
        col("embedding"))
      centroids = labelCentroids(assigned)
        .groupBy(col("label")).agg(
          sort_array(collect_list(struct(col("i"), col("c")))).as("cs"))
        .select(col("label"),
          transform(col("cs"), s => s.getField("c").cast("float")).as("cv"))
        .as[(Int, Array[Float])].collect().toSeq.sortBy(_._1)
    }
    centroids
  }

  /** IVF (inverted-file) approximate top-k: the second ANN scale path
    * next to LSH. Coarse quantizer = k-means-trained centroids
    * ([[kmeansCentroids]]; pass `trainIters = 0` for the raw first-k
    * init). Every vector is assigned to its nearest cell (one pass,
    * broadcast centroids); queries probe their `nProbe` nearest cells and
    * rerank exactly inside them. At scale the cell assignment is a
    * partitioning key: each executor owns whole cells and the rerank
    * never leaves the node. */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int,
      nCells: Int = 16, nProbe: Int = 6, trainIters: Int = 2): DataFrame =
    ivfTopKWith(emb, queryPred, k, kmeansCentroids(emb, nCells, trainIters),
      nProbe)

  /** IVF search against an ALREADY-TRAINED coarse quantizer — the
    * production shape: at scale you train the centroids once
    * ([[kmeansCentroids]], a bounded-prefix job), persist the model-sized
    * Seq, and serve every subsequent query batch from it without paying
    * the training loop again (IvfModelSpec asserts search-with-reused-
    * model ≡ train-inside-the-call). */
  def ivfTopKWith(emb: DataFrame, queryPred: Column, k: Int,
      model: Seq[(Int, Array[Float])], nProbe: Int = 6): DataFrame = {
    // an empty corpus trains an empty quantizer: the search result is
    // the empty top-k frame, not a crash (zero-row inputs are routine —
    // a pruned partition, a quiet ingest day)
    if (model.isEmpty)
      return emb.sparkSession.createDataFrame(
        emb.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("query_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rn",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("neighbor_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cos_sim",
            org.apache.spark.sql.types.DoubleType))))
    // fused cell search ([[graft.functions.NearestCentroids]]): the
    // corpus-side assignment is ONE compiled pass per vector over the
    // reference-object centroid array — the previous
    // crossJoin-all-centroids + rank-1 window inflated every corpus row
    // k× before filtering, the dominant cost at realistic cell counts
    def cells(vCol: Column, n: Int): Column =
      graft.functions.NearestCentroids.nearestCells(vCol, model, n)
    val assigned = emb.select(col("vec_id"), col("embedding"),
      element_at(cells(col("embedding"), 1), 1).as("cell"))
    val queryProbes = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode(cells(col("embedding"), nProbe)).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    assigned.join(broadcast(queryProbes),
        assigned("cell") === queryProbes("cell") &&
          assigned("vec_id") =!= queryProbes("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineSim(col("qv"), col("embedding")).as("cos_sim"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").cast("long").as("rn"),
        col("neighbor_id"), col("cos_sim"))
  }

  /** MMR (maximal marginal relevance) diverse top-k: greedily pick the
    * candidate maximizing λ·sim(query, d) − (1−λ)·max_{s∈selected}
    * sim(d, s) — the standard diversity rerank between retrieval and a
    * RAG prompt, which plain top-k (near-duplicate neighbors) can't
    * give. Two stages with the standard serving contract: the CLUSTER
    * ranks a bounded candidate list (exact [[cosineTopK]] — broadcast
    * query, partial per-partition top-k), then the greedy loop reranks
    * those `candidates` rows driver-side — k·candidates model-sized
    * work on a list that is bounded by construction at any corpus
    * scale, exactly where every production MMR implementation runs it.
    * Ties break on lower vec_id; the loop is single-threaded over
    * doubles → deterministic. */
  def mmrTopK(emb: DataFrame, queryPred: Column, k: Int,
      lambda: Double = 0.7, candidates: Int = 50): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cand = cosineTopK(emb, queryPred, candidates)
      .select(col("neighbor_id"), col("cos_sim"))
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding")),
        "neighbor_id")
      .as[(Long, Double, Array[Float])].collect()
      .sortBy { case (id, rel, _) => (-rel, id) }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0) 0.0 else dot / d
    }
    val selectedVecs = scala.collection.mutable.ArrayBuffer[Array[Float]]()
    val selected = scala.collection.mutable.ArrayBuffer[(Long, Double, Double)]()
    val pool = scala.collection.mutable.ArrayBuffer(cand: _*)
    while (selected.length < k && pool.nonEmpty) {
      var bestIdx = -1; var bestScore = Double.NegativeInfinity
      var bestId = Long.MaxValue
      for (i <- pool.indices) {
        val (id, rel, v) = pool(i)
        val pen =
          if (selectedVecs.isEmpty) 0.0
          else selectedVecs.map(s => cos(v, s)).max
        val score = lambda * rel - (1 - lambda) * pen
        if (score > bestScore || (score == bestScore && id < bestId)) {
          bestScore = score; bestIdx = i; bestId = id
        }
      }
      val (id, rel, v) = pool.remove(bestIdx)
      selectedVecs += v
      selected += ((id, rel, bestScore))
    }
    selected.zipWithIndex
      .map { case ((id, rel, score), i) => (i + 1L, id, rel, score) }
      .toSeq.toDF("rn", "vec_id", "relevance", "mmr_score")
  }

  /** Mutable buffer for [[CentroidAgg]]: element-wise sums + row count. */
  case class CentroidBuf(sums: Array[Long], n: Long)

  /** Typed Aggregator UDAF: element-wise sum of scaled-long vectors →
    * exact centroid. Demonstrates the Aggregator surface (SURVEY §2.7)
    * with an order-independent (exact integer) merge, so the result is
    * reproducible under any partitioning. */
  class CentroidAgg(dim: Int) extends Aggregator[Array[Long], CentroidBuf, Array[Double]] {
    def zero: CentroidBuf = CentroidBuf(Array.fill(dim)(0L), 0L)
    def reduce(b: CentroidBuf, a: Array[Long]): CentroidBuf = {
      var i = 0; while (i < dim && i < a.length) { b.sums(i) += a(i); i += 1 }
      CentroidBuf(b.sums, b.n + 1)
    }
    def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
      var i = 0; while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
      CentroidBuf(x.sums, x.n + y.n)
    }
    def finish(r: CentroidBuf): Array[Double] =
      r.sums.map(s => s.toDouble / r.n / 1000000.0)
    def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Per-label centroids via the relational plan (partial+final hash agg
    * on exact ints), exploded to (label, i, c) rows for the oracle. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(scaled(col("embedding"))).as(Seq("i", "xi")))
      .groupBy(col("label"), col("i"))
      .agg((sum(col("xi")).cast("double") / count(lit(1)) / 1000000.0).as("c"))
      .select(col("label"), col("i").cast("long").as("i"), col("c"))

  /** Per-label centroids via the [[CentroidAgg]] UDAF — same exact result
    * as [[labelCentroids]] (asserted in spec; shares its oracle). */
  def labelCentroidsUdaf(emb: DataFrame, dim: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("label"), scaled(col("embedding")).as("sv"))
      .as[(Int, Array[Long])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new CentroidAgg(dim).toColumn.name("centroid"))
      .toDF("label", "centroid")
      .select(col("label"), posexplode(col("centroid")).as(Seq("i", "c")))
      .select(col("label"), col("i").cast("long").as("i"), col("c"))
  }

  /** Product-quantization codebooks: split the `dim`-dim embedding into
    * `m` contiguous subspaces and train an independent [[kmeansCentroids]]
    * codebook per subspace (same bounded deterministic training prefix,
    * same fused-argmin assignment). m·k tiny centroid slices — the
    * model — are all that reaches the driver. PQ is how a 100 TB corpus
    * fits serving memory: d floats become m small codes (d=64, m=8,
    * k=16 → 8 nibbles ≈ 64× compression), and IVF-PQ is the standard
    * production ANN layout (coarse cells from [[kmeansCentroids]],
    * residual codes from here). */
  def pqTrain(emb: DataFrame, m: Int = 8, k: Int = 16, dim: Int = 64,
      iters: Int = 2, trainCap: Int = 4096): Seq[Seq[(Int, Array[Float])]] = {
    require(m > 0 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val spark = emb.sparkSession
    import spark.implicits._
    val sub = dim / m
    // ALL m subspace codebooks train JOINTLY: one checkpoint of the
    // bounded training prefix, one init collect, and ONE assignment +
    // moment job per Lloyd round for every subspace together — versus
    // the per-subspace form's m independent loops (m checkpoints,
    // m·(iters+1) driver actions of fixed scheduling overhead each;
    // measured ~1.5-2.5 s of pure job latency per IVF-PQ build at any
    // scale, since the prefix is trainCap rows). Arithmetic is
    // bit-identical to per-subspace [[kmeansCentroids]] — same init
    // (first k prefix rows), same fused-argmin assignment against the
    // same float centroids, same scaled-integer exact means — asserted
    // element-wise in VectorOpsSpec.
    val train = emb.filter(col("vec_id") < trainCap)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(false)
    val first = train.filter(col("vec_id") < k).orderBy("vec_id")
      .select("embedding").as[Array[Float]].collect()
    if (first.isEmpty) return Seq.fill(m)(Nil)
    var books: IndexedSeq[Seq[(Int, Array[Float])]] = (0 until m).map { s =>
      first.zipWithIndex
        .map { case (v, i) => (i, v.slice(s * sub, (s + 1) * sub)) }.toSeq
    }
    for (_ <- 0 until iters) {
      // (subspace, label, i, xi) in one projection: per subspace the
      // fused-argmin label against the current codebook plus the
      // scaled-integer slice — then one grouped exact-mean job
      val perSub = array((0 until m).map { s =>
        val sl = slice(col("embedding"), s * sub + 1, sub)
        struct(lit(s).as("s"),
          element_at(graft.functions.NearestCentroids.nearestCells(
            sl, books(s), 1), 1).as("label"),
          scaled(sl).as("sv"))
      }: _*)
      val moments = train.select(explode(perSub).as("a"))
        .select(col("a.s").as("s"), col("a.label").as("label"),
          posexplode(col("a.sv")).as(Seq("i", "xi")))
        .groupBy(col("s"), col("label"), col("i"))
        .agg((sum(col("xi")).cast("double") / count(lit(1)) / 1000000.0)
          .as("c"))
        .as[(Int, Int, Int, Double)].collect()
      books = (0 until m).map { s =>
        moments.filter(_._1 == s).groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (label, rows) =>
            (label, rows.sortBy(_._3).map(_._4.toFloat).toArray)
          }
      }
    }
    books.map(_.toSeq)
  }

  /** The round-8 per-subspace training loop, kept verbatim as the
    * equality oracle for the joint [[pqTrain]] (VectorOpsSpec asserts
    * element-wise identical codebooks). */
  private[graft] def pqTrainPerSubspace(emb: DataFrame, m: Int = 8,
      k: Int = 16, dim: Int = 64, iters: Int = 2,
      trainCap: Int = 4096): Seq[Seq[(Int, Array[Float])]] = {
    require(m > 0 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val sub = dim / m
    (0 until m).map { s =>
      kmeansCentroids(
        emb.filter(col("vec_id") < trainCap)
          .select(col("vec_id"),
            slice(col("embedding"), s * sub + 1, sub).as("embedding"))
          .localCheckpoint(false),
        k, iters, trainCap)
    }
  }

  /** Encode every vector as its m nearest-subcentroid codes — one fused
    * [[graft.functions.NearestCentroids]] pass per subspace over the
    * broadcast codebooks, all m inside a single projection (no joins,
    * no shuffle, codegen end to end). */
  def pqEncode(emb: DataFrame, books: Seq[Seq[(Int, Array[Float])]],
      dim: Int = 64): DataFrame = {
    // an empty corpus trains empty codebooks — encode nothing, same
    // zero-row contract as ivfTopKWith
    if (books.isEmpty || books.exists(_.isEmpty))
      return emb.select(col("vec_id"),
        array().cast("array<int>").as("codes")).limit(0)
    val m = books.size
    val sub = dim / m
    val codes = array((0 until m).map { s =>
      element_at(graft.functions.NearestCentroids.nearestCells(
        slice(col("embedding"), s * sub + 1, sub), books(s), 1), 1)
    }: _*)
    emb.select(col("vec_id"), codes.as("codes"))
  }

  /** Reconstruction audit: decode each vector's codes back to the
    * concatenated subspace centroids and report cosine(original,
    * reconstruction) — the distortion number that decides (m, k) before
    * trusting PQ distances at scale. Codes come from the codegen
    * [[pqEncode]] path (single source of truth for assignment); the
    * decode+cosine is one partition-local typed pass with the
    * model-sized codebooks as a closure reference — nothing shuffles
    * but the 8-byte-keyed code join. */
  def pqAudit(emb: DataFrame, books: Seq[Seq[(Int, Array[Float])]],
      dim: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val m = books.size
    val sub = dim / m
    // code -> centroid lookup per subspace (cell ids are 0..k-1 from
    // kmeansCentroids; map is robust to gaps after empty-cluster drops)
    val lookup: Array[Map[Int, Array[Float]]] =
      books.map(_.toMap).toArray
    emb.select(col("vec_id"), col("embedding"))
      .join(pqEncode(emb, books, dim), "vec_id")
      .as[(Long, Array[Float], Array[Int])]
      .mapPartitions(_.map { case (id, v, codes) =>
        var dot = 0.0; var nx = 0.0; var ny = 0.0
        var s = 0
        while (s < m) {
          val cv = lookup(s)(codes(s))
          var i = 0
          while (i < sub) {
            val xi = v(s * sub + i).toDouble
            val yi = cv(i).toDouble
            dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
          }
          s += 1
        }
        val denom = math.sqrt(nx) * math.sqrt(ny)
        (id, codes, if (denom == 0.0) 0.0 else dot / denom)
      })
      .toDF("vec_id", "codes", "cos_recon")
  }

  /** The empty `(query_id, rn, neighbor_id, cos_sim)` frame — what every
    * ANN search returns over an empty corpus / empty model. */
  private def emptyTopKFrame(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rn",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("neighbor_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cos_sim",
          org.apache.spark.sql.types.DoubleType))))

  /** Residuals v − centroid(nearest cell) against a FROZEN coarse model:
    * `(vec_id, embedding = residual, cell)`. One fused-argmin pass +
    * one partition-local subtract — no shuffle. Shared by the one-shot
    * [[ivfPqTopK]] and the published-index build/append paths
    * ([[graft.ops.AnnIndex]]), so both quantize identically. */
  def ivfResiduals(emb: DataFrame,
      coarse: Seq[(Int, Array[Float])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val coarseMap = coarse.toMap
    emb.select(col("vec_id"), col("embedding"),
        element_at(graft.functions.NearestCentroids.nearestCells(
          col("embedding"), coarse, 1), 1).as("cell"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions(_.map { case (id, v, cell) =>
        val c = coarseMap(cell)
        val r = new Array[Float](v.length)
        var i = 0
        while (i < v.length) { r(i) = v(i) - c(i); i += 1 }
        (id, r, cell)
      }).toDF("vec_id", "embedding", "cell")
  }

  /** The m-subspace PQ code array as ONE projection over a residual
    * frame's `embedding` column — the same per-subspace fused-argmin
    * expressions as [[pqEncode]], but composable into an existing
    * select so encode rides the residual pass with NO vec_id join (the
    * join form shuffles the corpus on vec_id just to glue `cell` back
    * onto `codes` that were computed from the same rows). */
  private def pqCodes(books: Seq[Seq[(Int, Array[Float])]],
      dim: Int): Column = {
    val m = books.size
    val sub = dim / m
    array((0 until m).map { s =>
      element_at(graft.functions.NearestCentroids.nearestCells(
        slice(col("embedding"), s * sub + 1, sub), books(s), 1), 1)
    }: _*)
  }

  /** Encode a corpus against a FROZEN IVF-PQ model: assign cells,
    * compute residuals, PQ-encode them → `(vec_id, cell, codes)` — the
    * complete compressed representation the serving tier stores (~m
    * small codes + a cell id per vector instead of d floats). One
    * map-only pass: cell assignment, residual subtract, and all m code
    * lookups fuse into a single projection — no join, no shuffle. This
    * is the O(batch) admission path: appending a new batch to a
    * published index runs exactly this over the batch, never touching
    * the existing corpus ([[graft.ops.AnnIndex.append]]). */
  def ivfPqEncodeWith(emb: DataFrame, coarse: Seq[(Int, Array[Float])],
      books: Seq[Seq[(Int, Array[Float])]], dim: Int = 64): DataFrame =
    encodeResiduals(ivfResiduals(emb, coarse), books, dim)

  /** `(vec_id, cell, codes)` over an ALREADY-COMPUTED residual frame —
    * for callers holding a (checkpointed) [[ivfResiduals]] output, like
    * [[graft.ops.AnnIndex.build]]. Same zero-join projection. */
  def encodeResiduals(residuals: DataFrame,
      books: Seq[Seq[(Int, Array[Float])]], dim: Int = 64): DataFrame = {
    if (books.isEmpty || books.exists(_.isEmpty))
      return residuals.select(col("vec_id"), lit(0).as("cell"),
        array().cast("array<int>").as("codes")).limit(0)
    residuals.select(col("vec_id"), col("cell"), pqCodes(books, dim).as("codes"))
  }

  /** Rank probed-cell candidates for `queries` `(query_id, qv)` against
    * a compressed corpus `(vec_id, cell, codes)` under a frozen model:
    * recon = centroid(cell) + decode(codes), cosine(qv, recon),
    * deterministic (cos desc, id asc) top-k. The rank join touches
    * probed cells only; queries keep their original (asymmetric)
    * vectors. Bit-identical between the one-shot and published-index
    * paths because recon depends only on (cell, codes, model) — all of
    * which round-trip parquet exactly. */
  def ivfPqRank(codes: DataFrame, queries: DataFrame, k: Int,
      coarse: Seq[(Int, Array[Float])], books: Seq[Seq[(Int, Array[Float])]],
      nProbe: Int = 6, dim: Int = 64): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val m = books.size
    val sub = dim / m
    val coarseMap = coarse.toMap
    val lookup: Array[Map[Int, Array[Float]]] = books.map(_.toMap).toArray
    val recon = codes
      .select(col("vec_id"), col("cell"), col("codes"))
      .as[(Long, Int, Array[Int])]
      .mapPartitions(_.map { case (id, cell, cs) =>
        val out = coarseMap(cell).clone()
        var s = 0
        while (s < m) {
          val cv = lookup(s)(cs(s))
          var i = 0
          while (i < sub) { out(s * sub + i) += cv(i); i += 1 }
          s += 1
        }
        (id, cell, out)
      }).toDF("vec_id", "cell", "recon")
    val queryProbes = queries.select(col("query_id"), col("qv"),
      explode(graft.functions.NearestCentroids.nearestCells(
        col("qv"), coarse, nProbe)).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    recon.join(broadcast(queryProbes),
        recon("cell") === queryProbes("cell") &&
          recon("vec_id") =!= queryProbes("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineSim(col("qv"), col("recon")).as("cos_sim"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn").cast("long").as("rn"),
        col("neighbor_id"), col("cos_sim"))
  }

  /** IVF-PQ search — the composed production ANN layout: a coarse
    * quantizer partitions the corpus into cells ([[kmeansCentroids]]),
    * PQ codebooks are trained on the RESIDUALS v − centroid(cell)
    * (residuals are smaller than raw vectors, so the same code budget
    * quantizes finer — the standard IVF-PQ detail), and each query
    * probes its `nProbe` nearest cells ranking candidates by
    * cosine(query, centroid + residual-reconstruction). Corpus vectors
    * are represented by cell id + m codes only: at 100 TB the serving
    * tier holds ~1 byte-per-subspace per vector instead of d floats,
    * cells shard across executors, and the rank join touches probed
    * cells only. Queries keep their original (asymmetric) vectors.
    *
    * This one-shot form trains, encodes, and searches in a single call;
    * the production decomposition — publish the trained model + codes
    * once, serve and append O(batch) forever after — is
    * [[graft.ops.AnnIndex]], built from the same [[ivfResiduals]] /
    * [[pqTrain]] / [[ivfPqEncodeWith]] / [[ivfPqRank]] stages, so the
    * two paths return bit-identical rankings (AnnIndexSpec). */
  def ivfPqTopK(emb: DataFrame, queryPred: Column, k: Int,
      nCells: Int = 16, nProbe: Int = 6, m: Int = 8, pqK: Int = 16,
      dim: Int = 64): DataFrame = {
    val coarse = kmeansCentroids(emb, nCells)
    if (coarse.isEmpty) return emptyTopKFrame(emb.sparkSession)
    val residuals = ivfResiduals(emb, coarse)
      .localCheckpoint(false) // feeds pqTrain (m passes) + encode
    val books = pqTrain(residuals, m, pqK, dim)
    // compressed representation: (vec_id, cell, codes) is ALL the
    // serving tier keeps; recon = centroid(cell) + decode(codes).
    // Codes are ONE projection over the checkpointed residuals — no
    // vec_id self-join (the old form shuffled the corpus just to glue
    // cell onto codes computed from the same rows)
    val codes = residuals.select(col("vec_id"), col("cell"),
      pqCodes(books, dim).as("codes"))
    val queries = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    ivfPqRank(codes, queries, k, coarse, books, nProbe, dim)
  }

  /** PQ asymmetric-distance top-k (ADC): rank corpus vectors for each
    * query by cosine(query_original, reconstruction(corpus_codes)) —
    * the search the compressed serving tier actually runs. Implemented
    * by substituting reconstructions for corpus embeddings and reusing
    * the exact [[cosineTopK]] machinery (broadcast queries, partial
    * per-partition top-k); queries keep their ORIGINAL vectors, which
    * is the "asymmetric" in ADC. */
  def pqTopK(emb: DataFrame, queryPred: Column, k: Int,
      books: Seq[Seq[(Int, Array[Float])]], dim: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val m = books.size
    val sub = dim / m
    val lookup: Array[Map[Int, Array[Float]]] = books.map(_.toMap).toArray
    val recon = emb.select(col("vec_id"), col("embedding"))
      .join(pqEncode(emb, books, dim), "vec_id")
      .as[(Long, Array[Float], Array[Int])]
      .mapPartitions(_.map { case (id, _, codes) =>
        val out = new Array[Float](dim)
        var s = 0
        while (s < m) {
          System.arraycopy(lookup(s)(codes(s)), 0, out, s * sub, sub)
          s += 1
        }
        (id, out)
      }).toDF("vec_id", "recon")
    val substituted = emb.join(recon, "vec_id")
      .select(col("vec_id"),
        when(queryPred, col("embedding")).otherwise(col("recon"))
          .as("embedding"))
    cosineTopK(substituted, queryPred, k)
  }

  /** Greedy k-center (farthest-first / Gonzalez) coreset selection — the
    * diversity-sampling pass that picks k maximally-spread exemplars
    * (2-approx to the optimal cover radius): seed with the smallest
    * vec_id, then k−1 times add the point FARTHEST (in cosine distance
    * 1−cos) from everything chosen so far, ties to the smallest id.
    *
    * Each round is one broadcast map over the corpus (the ≤k chosen
    * vectors ride as literals) + a 1-row argmax aggregate — k driver
    * round-trips of one row each, never the data. min-distance over
    * chosen is recomputed per round (k² per row total), trading a tiny
    * recompute for NO iterative lineage/checkpoint state.
    *
    * @return (rank, vec_id, min_dist) — min_dist is the selection-time
    *   distance to the already-chosen set (the cover radius after rank−1
    *   centers); the seed's is 2.0 (the cosine-distance supremum). */
  def kCenterCoreset(emb: DataFrame, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.select(col("vec_id"), col("embedding"))
      .localCheckpoint(false) // scanned k times below
    val seed = base.orderBy(col("vec_id")).limit(1)
      .as[(Long, Array[Float])].collect()
    if (seed.isEmpty) return Seq.empty[(Int, Long, Double)]
      .toDF("rank", "vec_id", "min_dist")
    var chosen = Vector((seed(0)._1, seed(0)._2, 2.0))
    for (_ <- 1 until k) {
      val minDist = chosen.map { case (_, v, _) =>
        lit(1.0) - cosineSim(typedLit(v), col("embedding"))
      }.reduce(least(_, _))
      val next = base.filter(!col("vec_id").isInCollection(chosen.map(_._1)))
        .select(col("vec_id"), col("embedding"), minDist.as("d"))
        .agg(max(struct(col("d"), (-col("vec_id")).as("nid"),
          col("embedding"))).as("m"))
        .select(col("m.d"), (-col("m.nid")).as("vec_id"),
          col("m.embedding"))
        .as[(Double, Long, Array[Float])].collect()
      if (next.nonEmpty) chosen :+= ((next(0)._2, next(0)._3, next(0)._1))
    }
    chosen.zipWithIndex
      .map { case ((id, _, d), i) => (i + 1, id, d) }
      .toDF("rank", "vec_id", "min_dist")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    * the corpus with the IVF coarse quantizer ([[kmeansCentroids]], one
    * broadcast argmin pass per vector), then inside each cluster drop
    * every vector that has an earlier (smaller vec_id) cluster-mate with
    * cosine ≥ tau. Cluster scoping is the scale contract: the quadratic
    * pair join runs per cell, cells partition the corpus, and nothing
    * crosses cells — exactly the published algorithm's reason for
    * clustering first. Chains collapse to their smallest id (the
    * keep-one-per-group policy, deterministic on any engine).
    *
    * @return (vec_id, cell, is_dup) for every input vector. */
  def semDedup(emb: DataFrame, nCells: Int = 16, tau: Double = 0.97,
      trainIters: Int = 2): DataFrame = {
    val model = kmeansCentroids(emb, nCells, trainIters)
    if (model.isEmpty)
      return emb.select(col("vec_id"), lit(0).as("cell"),
        lit(false).as("is_dup")).filter(lit(false))
    val assigned = emb.select(col("vec_id"), col("embedding"),
        element_at(graft.functions.NearestCentroids.nearestCells(
          col("embedding"), model, 1), 1).as("cell"))
      .localCheckpoint(false) // both sides of the in-cell pair join
    val dropped = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id") &&
          cosineSim(col("a.embedding"), col("b.embedding")) >= tau)
      .select(col("b.vec_id").as("vec_id")).distinct()
    assigned.join(dropped.withColumn("is_dup", lit(true)),
        Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }

  /** Typed Aggregator for the upper-triangle gram matrix Σ xᵢxⱼ (i ≤ j)
    * of a scaled-integer embedding corpus — the d(d+1)/2 exact sums that
    * feed covariance/PCA. ONE pass, map-side partial aggregation of a
    * flat long array, a single d²-sized reduce — at 100 TB the shuffle
    * carries one 2080-long buffer per map task, nothing row-shaped
    * (contrast the relational posexplode self-join, which inflates every
    * row d(d+1)/2×). Overflow contract: per-term |xᵢxⱼ| ≤ scale², so a
    * long holds ≥ 9.2e18/scale² rows — scale 10⁴ gives ~9e10 rows of
    * headroom; drop scale (coarser quantization) to buy more. */
  class GramAgg(dim: Int, scale: Double)
      extends Aggregator[Array[Float], Array[Long], Array[Long]] {
    private val len = dim * (dim + 1) / 2
    def zero: Array[Long] = new Array[Long](len)
    def reduce(b: Array[Long], v: Array[Float]): Array[Long] = {
      val s = new Array[Long](dim)
      var i = 0
      while (i < dim) { s(i) = math.floor(v(i) * scale).toLong; i += 1 }
      var k = 0; i = 0
      while (i < dim) {
        var j = i
        while (j < dim) { b(k) += s(i) * s(j); j += 1; k += 1 }
        i += 1
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var k = 0; while (k < len) { x(k) += y(k); k += 1 }; x
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Embedding gram matrix as (i, j, g) rows (upper triangle, exact
    * scaled-int), via [[GramAgg]]. The index arrays mapping the flat
    * buffer position back to (i, j) ride as literals — no join, no UDF. */
  def gramMatrix(emb: DataFrame, dim: Int = 64,
      scale: Double = 10000.0): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val iIdx = (0 until dim).flatMap(i => (i until dim).map(_ => i))
    val jIdx = (0 until dim).flatMap(i => i until dim)
    emb.select(col("embedding")).as[Array[Float]]
      .select(new GramAgg(dim, scale).toColumn.name("g"))
      .select(posexplode(col("g")).as(Seq("k", "g")))
      .select(
        element_at(typedLit(iIdx), col("k") + 1).cast("long").as("i"),
        element_at(typedLit(jIdx), col("k") + 1).cast("long").as("j"),
        col("g"))
  }

  /** Dominant eigenvector of the embedding gram matrix (the top
    * principal direction, un-centered PCA) by fixed-point power
    * iteration. The cluster's only job is the ONE-pass [[GramAgg]]
    * reduce; the d×d model then iterates driver-side — the same
    * model-sized-work-on-the-driver contract as [[mmrTopK]] and
    * kmeans, valid at any corpus scale. All arithmetic is integer
    * (gram and vector renormalized to ±10⁶ micro-units each step;
    * BigInt for the normalize product, mirroring the oracle's
    * HUGEINT), so the result is bit-identical on any engine and any
    * cluster layout — the Det.scala iterative-recurrence rule. */
  def powerIteration(emb: DataFrame, dim: Int = 64, scale: Double = 10000.0,
      iters: Int = 8): Seq[(Int, Long)] = {
    val g = Array.ofDim[Long](dim, dim)
    gramMatrix(emb, dim, scale).collect().foreach { r =>
      val (i, j, v) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2))
      g(i)(j) = v; g(j)(i) = v
    }
    val gmax = g.flatMap(_.map(math.abs)).max max 1L
    def norm(x: Long, m: Long): Long =
      if (x < 0) -((BigInt(-x) * 1000000) / m).toLong
      else ((BigInt(x) * 1000000) / m).toLong
    val gn = g.map(_.map(norm(_, gmax)))
    var vv = Array.fill(dim)(1000000L)
    for (_ <- 0 until iters) {
      val w = Array.tabulate(dim) { i =>
        var s = 0L; var j = 0
        while (j < dim) { s += gn(i)(j) * vv(j); j += 1 }
        s
      }
      val m = w.map(math.abs).max max 1L
      vv = w.map(norm(_, m))
    }
    (0 until dim).map(i => (i, vv(i)))
  }

  /** Full ranked retrieval per query vector with a same-label relevance
    * flag — the shared scaffold for rank-quality metrics (MRR, average
    * precision). Same contract as [[cosineTopK]]: queries broadcast,
    * fused scaled-int cosine, deterministic (cos desc, id asc) ranks. */
  def rankedRetrieval(emb: DataFrame, queryPred: Column): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"), col("label"))
    val queries = base.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    base.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qlabel"),
        col("vec_id").as("neighbor_id"),
        (col("label") === col("qlabel")).as("rel"),
        graft.functions.ScaledIntCosine.scaledCosine(col("qv"), col("embedding"))
          .as("cos_sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
  }
}
