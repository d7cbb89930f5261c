package graft.ops

import graft.pipelines.Versioned
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Published IVF-PQ index — the serving-layer decomposition of
  * [[VectorOps.ivfPqTopK]] (which trains + encodes + searches in one
  * call, retraining on every invocation). Here the build products
  * become a VERSIONED TABLE FAMILY under one directory:
  *
  *   - `ann_centroids`  (cell, centroid)            — coarse quantizer
  *   - `ann_codebooks`  (subspace, code, centroid)  — residual PQ model
  *   - `ann_codes`      (vec_id, cell, codes, batch) — compressed corpus,
  *                      Hive-partitioned by ingest batch
  *
  * published through [[Versioned.publishGroupMembers]] so every reader
  * resolves a CONSISTENT cross-table snapshot ([[Versioned.readGroup]]):
  * model and codes always belong to the same transaction, even while an
  * append or rebuild is landing.
  *
  * The three operations a 100 TB ANN tier actually runs:
  *
  *   - [[build]]: train once over the corpus (the only full-scan job),
  *     publish model + batch-0 codes atomically.
  *   - [[serveTopK]]: read the snapshot, probe/rank ONLY — no training,
  *     no full-corpus pass. Rankings are bit-identical to the one-shot
  *     path (AnnIndexSpec) because recon depends only on (cell, codes,
  *     model), all of which round-trip parquet exactly.
  *   - [[append]]: encode a NEW batch against the FROZEN model
  *     (the incremental-dedup admission pattern), stage only that
  *     batch's partition, and link everything else — model tables
  *     journal at their existing versions ([[Versioned.GroupLink]]),
  *     prior code batches link through the partition manifest
  *     ([[Versioned.GroupDelta]] reuse). Cost is O(batch) in both
  *     compute and bytes staged, never O(corpus).
  *
  * Freezing the codebooks is the standard production trade: appended
  * vectors quantize against centroids trained on the build-time
  * distribution, so recall degrades slowly under drift and the answer
  * is a periodic [[build]] (full retrain), not per-batch retraining —
  * exactly how FAISS/ScaNN index lifecycles work.
  */
object AnnIndex {

  val CentroidsTable = "ann_centroids"
  val CodebooksTable = "ann_codebooks"
  val CodesTable = "ann_codes"

  /** Index hyperparameters, persisted implicitly by the published model
    * shapes (nCells = centroid rows, m = distinct subspaces, pqK = codes
    * per subspace, dim = centroid length). */
  final case class Params(nCells: Int = 16, m: Int = 8, pqK: Int = 16,
      dim: Int = 64)

  /** Train the IVF-PQ model over `emb`, encode the full corpus, and
    * publish all three tables as one atomic group transaction. Returns
    * the published (table → version) map. The ONLY operation that scans
    * the whole corpus; everything after serves from the index. */
  def build(emb: DataFrame, indexDir: String, p: Params = Params(),
      keep: Int = 3): Map[String, Long] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val coarse = VectorOps.kmeansCentroids(emb, p.nCells)
    require(coarse.nonEmpty,
      "cannot build an ANN index over an empty corpus (no quantizer to train)")
    val residuals = VectorOps.ivfResiduals(emb, coarse)
      .localCheckpoint(false) // feeds pqTrain (m passes) + encode
    val books = VectorOps.pqTrain(residuals, p.m, p.pqK, p.dim)
    // cell-sorted within files: parquet row-group min/max on `cell`
    // become tight disjoint ranges, so serveTopK's pushed In(cell, …)
    // filter skips unprobed cells' bytes (the IVF layout contract).
    // Encode is a zero-join projection over the checkpointed residuals.
    val codes = VectorOps.encodeResiduals(residuals, books, p.dim)
      .withColumn("batch", lit(0L))
      .sortWithinPartitions(col("cell"), col("vec_id"))
    val centroidsDf = coarse.toDF("cell", "centroid")
    val booksDf = books.zipWithIndex
      .flatMap { case (book, s) => book.map { case (c, v) => (s, c, v) } }
      .toDF("subspace", "code", "centroid")
    Versioned.publishGroupMembers(Seq(
      Versioned.GroupFull(CentroidsTable, centroidsDf),
      Versioned.GroupFull(CodebooksTable, booksDf),
      Versioned.GroupDelta(CodesTable, codes, "batch", reuse = Nil)),
      indexDir, keep)
  }

  /** The frozen model from the last committed group snapshot: coarse
    * centroids + per-subspace codebooks, reconstructed in the exact
    * `Seq` shapes [[VectorOps]] trains (floats round-trip parquet
    * bit-exactly, so a served model IS the built model). Model-sized
    * driver collect — nCells + m·pqK small vectors, never the corpus. */
  def loadModel(spark: SparkSession, indexDir: String)
      : (Seq[(Int, Array[Float])], Seq[Seq[(Int, Array[Float])]]) = {
    import spark.implicits._
    val snap = Versioned.readGroup(spark, indexDir)
    val coarse = snap(CentroidsTable)
      .as[(Int, Array[Float])].collect().sortBy(_._1).toSeq
    val books = snap(CodebooksTable)
      .as[(Int, Int, Array[Float])].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(r => (r._2, r._3)).toSeq }
    (coarse, books)
  }

  /** Serve top-k from the published index: load the model (driver-sized),
    * read the codes snapshot, and run ONLY the probe/rank stages
    * ([[VectorOps.ivfPqRank]]). `queries` is `(query_id, qv)` — external
    * query vectors or a corpus slice; a query also present in the corpus
    * never matches itself. No training, no full-corpus scan: the probe
    * CELL SET (bounded by nCells no matter how many queries — one tiny
    * distinct over the small side) is collected and pushed into the
    * codes scan as an `In(cell, …)` parquet filter, so with the
    * cell-sorted layout [[build]]/[[append]] write, row-group min/max
    * statistics skip every unprobed cell's bytes — the scan reads
    * O(probed cells), not O(corpus), which is the entire point of an
    * inverted file. AnnIndexSpec pins both the pushdown and
    * pruned ≡ unpruned results. */
  def serveTopK(spark: SparkSession, indexDir: String, queries: DataFrame,
      k: Int, nProbe: Int = 6): DataFrame = {
    import spark.implicits._
    val (coarse, books) = loadModel(spark, indexDir)
    val dim = coarse.head._2.length
    val probeCells = queries.select(
        explode(graft.functions.NearestCentroids.nearestCells(
          col("qv"), coarse, nProbe)).as("cell"))
      .distinct().as[Int].collect().sorted
    val all = Versioned.readGroup(spark, indexDir)(CodesTable)
    val codes =
      if (probeCells.isEmpty) all.filter(lit(false)) // no queries → no scan
      else all.filter(col("cell").isInCollection(probeCells.toSeq))
    VectorOps.ivfPqRank(codes, queries, k, coarse, books, nProbe, dim)
  }

  /** Append a new vector batch to the published index: encode the batch
    * against the FROZEN model ([[VectorOps.ivfPqEncodeWith]] — one
    * map-only pass over the batch), stage it as one new `batch=`
    * partition, and journal a new group transaction that LINKS the
    * model tables at their existing versions and reuses every prior
    * batch partition through the manifest. Bytes staged and rows
    * scanned are O(batch); the existing corpus is never read. Returns
    * the new (table → version) map; an empty batch is a no-op returning
    * the current versions. */
  def append(batch: DataFrame, indexDir: String, batchId: Long,
      keep: Int = 3, skipIfExists: Boolean = false): Map[String, Long] = {
    val spark = batch.sparkSession
    val (coarse, books) = loadModel(spark, indexDir)
    val dim = coarse.head._2.length
    val centroidsV = Versioned.latestVersion(indexDir, CentroidsTable).get
    val codebooksV = Versioned.latestVersion(indexDir, CodebooksTable).get
    val codesV = Versioned.latestVersion(indexDir, CodesTable).get
    val current = Map(CentroidsTable -> centroidsV,
      CodebooksTable -> codebooksV, CodesTable -> codesV)
    if (batch.isEmpty) return current
    val reuse = Versioned.manifest(indexDir, CodesTable, codesV)
      .getOrElse(throw new IllegalStateException(
        s"$CodesTable v$codesV has no partition manifest — not an AnnIndex build?"))
      .entries
    if (reuse.exists(_._1 == batchId.toString)) {
      // the manifest doubles as an idempotence ledger: a batch id that
      // already landed is either a caller bug (fail) or a micro-batch
      // REPLAY after a failure (skip) — `skipIfExists` is how
      // [[ingestStream]] gets exactly-once admission from at-least-once
      // delivery, the same move as streaming-sink epoch dedup
      if (skipIfExists) return current
      throw new IllegalArgumentException(
        s"batch $batchId already exists in the index (appends must use fresh ids)")
    }
    val codes = VectorOps.ivfPqEncodeWith(batch, coarse, books, dim)
      .withColumn("batch", lit(batchId))
      .sortWithinPartitions(col("cell"), col("vec_id")) // IVF layout, as in build
    Versioned.publishGroupMembers(Seq(
      Versioned.GroupLink(CentroidsTable, centroidsV),
      Versioned.GroupLink(CodebooksTable, codebooksV),
      Versioned.GroupDelta(CodesTable, codes, "batch", reuse)),
      indexDir, keep)
  }

  /** Continuous micro-batch admission: each streamed embedding
    * micro-batch becomes one [[append]] (batch id = epoch + 1, so batch
    * 0 stays the build). foreachBatch replays after a failure re-deliver
    * an epoch — `skipIfExists` turns the manifest into an idempotence
    * ledger, giving exactly-once index admission over at-least-once
    * delivery without any extra state. Every appended batch is
    * immediately visible to [[serveTopK]]'s next snapshot. */
  def ingestStream(embStream: DataFrame,
      indexDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    embStream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          epoch: Long) =>
        append(b, indexDir, batchId = epoch + 1L, skipIfExists = true)
        ()
      }
      .start()

  /** Rewrite all code batches into one `batch=0` partition (model tables
    * linked unchanged, one group transaction). Run when many small
    * appends have fragmented the codes table — the LSM/OPTIMIZE trade:
    * an O(corpus-codes) rewrite now buys back per-scan planning and
    * open-file costs forever after. Compacting the COMPRESSED codes is
    * cheap relative to the corpus: m small ints + 2 ids per vector. A
    * post-compaction [[serveTopK]] returns exactly what it did before
    * (AnnIndexSpec); batch-id idempotence history is deliberately reset
    * (the ledger compacts with the data, like sink epoch logs past a
    * checkpoint). */
  def compact(spark: SparkSession, indexDir: String,
      keep: Int = 3): Map[String, Long] = {
    val centroidsV = Versioned.latestVersion(indexDir, CentroidsTable).get
    val codebooksV = Versioned.latestVersion(indexDir, CodebooksTable).get
    val merged = Versioned.readGroup(spark, indexDir)(CodesTable)
      .select(col("vec_id"), col("cell"), col("codes"),
        lit(0L).as("batch"))
      .sortWithinPartitions(col("cell"), col("vec_id")) // restore IVF layout
    Versioned.publishGroupMembers(Seq(
      Versioned.GroupLink(CentroidsTable, centroidsV),
      Versioned.GroupLink(CodebooksTable, codebooksV),
      Versioned.GroupDelta(CodesTable, merged, "batch", reuse = Nil)),
      indexDir, keep)
  }
}
