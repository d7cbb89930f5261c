package graft.ops

import graft.pipelines.{Fs, Versioned}
import org.apache.hadoop.fs.Path
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
  * The serving-lifecycle operations a 100 TB ANN tier actually runs:
  *
  *   - [[build]]: train once over the corpus (the only full-scan job),
  *     publish model + batch-0 codes atomically.
  *   - [[serveTopK]]: resolve ONE group snapshot, probe/rank ONLY — no
  *     training, no full-corpus pass. The (model tables → versions)
  *     part of the snapshot keys a driver-side model cache, so repeated
  *     serves against an unchanged model read no model files at all
  *     ([[modelLoads]] counts actual loads; AnnIndexSpec pins the second
  *     serve at zero). Rankings are bit-identical to the one-shot path
  *     (AnnIndexSpec) because recon depends only on (cell, codes,
  *     model), all of which round-trip parquet exactly.
  *   - [[delete]]: row-level erasure WITHOUT a retrain — victims land
  *     as a tombstone delta (`ann_tombstones`, the fourth family
  *     member) and every serve anti-joins them out; [[compact]] folds
  *     them into the codes rewrite and drops the table from the
  *     snapshot; [[build]] clears them (the caller retrains over the
  *     already-erased corpus). A GDPR erasure is one O(victims)
  *     metadata transaction, not an O(corpus) retrain.
  *   - [[append]]: encode a NEW batch against the FROZEN model
  *     (the incremental-dedup admission pattern), stage only that
  *     batch's partition, and link everything else — model tables
  *     journal at their existing versions ([[Versioned.GroupLink]]),
  *     prior code batches link through the partition manifest
  *     ([[Versioned.GroupDelta]] reuse). Cost is O(batch) in both
  *     compute and bytes staged, never O(corpus).
  *   - [[recallAudit]] / [[maybeRebuild]]: the drift loop — sampled
  *     recall@k of the served index against exact brute force, per
  *     published version, and the measured rebuild trigger it feeds.
  *
  * Freezing the codebooks is the standard production trade: appended
  * vectors quantize against centroids trained on the build-time
  * distribution, so recall degrades slowly under drift. The answer is a
  * periodic [[build]] (full retrain), not per-batch retraining — and
  * "periodic" is not a policy until something measures the decay, which
  * is exactly what [[recallAudit]] does and [[maybeRebuild]] acts on.
  */
object AnnIndex {

  val CentroidsTable = "ann_centroids"
  val CodebooksTable = "ann_codebooks"
  val CodesTable = "ann_codes"
  val TombstonesTable = "ann_tombstones"

  private val AllTables =
    Seq(CentroidsTable, CodebooksTable, CodesTable, TombstonesTable)

  /** Run `body` as THE writer of this index — every mutating lifecycle
    * op wraps itself in this ([[Versioned.withFamilyLease]] over all
    * four member tables), so its read-snapshot → decide → publish span
    * can never interleave with another writer's: a delete racing an
    * append would otherwise commit a journal whose LINKED codes version
    * silently rolls back the append (lost update), and a compact racing
    * a delete could fold a tombstone set it never read. Re-entrant, so
    * the inner `publishGroupMembers` (which leases its members itself)
    * and a `delete`-triggered `compact` nest for free; a SECOND
    * process's writer is refused loudly
    * ([[Versioned.ConcurrentWriterException]]). */
  private def asIndexWriter[A](indexDir: String)(body: => A): A =
    Versioned.withFamilyLease(indexDir, AllTables)(body)

  /** Index hyperparameters, persisted implicitly by the published model
    * shapes (nCells = centroid rows, m = distinct subspaces, pqK = codes
    * per subspace, dim = centroid length). */
  final case class Params(nCells: Int = 16, m: Int = 8, pqK: Int = 16,
      dim: Int = 64)

  // ---- batch-admission ledger (high-water mark) -----------------------
  // The codes manifest doubles as the idempotence ledger for micro-batch
  // replays — but compact/build collapse the manifest to batch=0, which
  // would forget every admitted id and re-admit a failure-replay of an
  // epoch that landed just before the rewrite (duplicating its vectors).
  // The sidecar high-water mark survives those rewrites: batch ids are
  // monotone for the lifetime of the index DIRECTORY (the Delta-sink
  // txnVersion contract — ingestStream's durable checkpoint guarantees
  // it for streamed epochs), so `batchId <= hwm` means "already admitted
  // at some point", whether or not the manifest still remembers it.

  private def hwmPath(indexDir: String) = new Path(s"$indexDir/_batch_hwm")

  private def readHwm(indexDir: String): Long = {
    val p = hwmPath(indexDir)
    if (!Fs.exists(p)) -1L
    else {
      val raw = Fs.readString(p).trim
      // a missing ledger means "nothing admitted yet" — but an
      // UNPARSEABLE one must never be treated as missing or low: a
      // silently-lowered high-water mark would re-admit replayed
      // pre-compaction batches, exactly the duplication the ledger
      // exists to prevent. Fail loud with the recovery recipe.
      raw.toLongOption.getOrElse(throw new IllegalStateException(
        s"corrupt ANN admission ledger $p (content: '${raw.take(32)}') — " +
          "refusing to guess a high-water mark. Recover by writing the " +
          "highest batch id ever admitted to this index directory " +
          "(at least the max batch= value in the current codes manifest) " +
          "followed by a newline."))
    }
  }

  /** Atomic ledger write: stage to a temp sibling, then rename over the
    * live path — a crash mid-write can no longer leave an empty or
    * truncated ledger (the failure ADVICE r10 flagged: '' wedges every
    * subsequent append, '4' from '42' silently re-admits replays). */
  private def writeHwm(indexDir: String, value: Long): Unit = {
    val p = hwmPath(indexDir)
    val tmp = new Path(s"$indexDir/_batch_hwm.tmp")
    Fs.writeString(tmp, s"$value\n")
    try Fs.rename(tmp, p)
    catch {
      case _: java.io.IOException if Fs.exists(p) =>
        // some filesystems refuse rename-over-existing; delete + retry.
        // A crash between the two leaves NO ledger, which both callers
        // tolerate: advanceHwm runs BEFORE a manifest-collapsing
        // publish (ids still manifested) and append's ledger write runs
        // AFTER its commit (id already manifested) — missing is safe,
        // truncated is not, and staging makes truncation impossible.
        Fs.deleteRecursive(p)
        Fs.rename(tmp, p)
    }
  }

  /** Raise the ledger to cover `atLeast` and every batch id the CURRENT
    * codes manifest names. Called BEFORE a manifest-collapsing rewrite
    * (compact/rebuild) so a crash between ledger write and publish still
    * leaves every admitted id covered by manifest ∪ ledger. */
  private def advanceHwm(indexDir: String, atLeast: Long): Long = {
    val manifestMax = Versioned.latestVersion(indexDir, CodesTable)
      .flatMap(v => Versioned.manifest(indexDir, CodesTable, v))
      .map(_.entries.flatMap(_._1.toLongOption)
        .foldLeft(-1L)(math.max))
      .getOrElse(-1L)
    val next = math.max(math.max(readHwm(indexDir), manifestMax), atLeast)
    writeHwm(indexDir, next)
    next
  }

  /** Train the IVF-PQ model over `emb`, encode the full corpus, and
    * publish all three tables as one atomic group transaction. Returns
    * the published (table → version) map. The ONLY operation that scans
    * the whole corpus; everything after serves from the index. A rebuild
    * into an existing directory carries the admission ledger forward
    * (see the high-water notes above): batch ids stay monotone across
    * index generations, so a replay of a pre-rebuild epoch can never be
    * re-admitted as fresh data. Any pending tombstones are CLEARED (the
    * new journal omits the table): the caller retrains over the
    * current, already-erased corpus, so the erase is physical in the
    * new generation. */
  def build(emb: DataFrame, indexDir: String, p: Params = Params(),
      keep: Int = 3): Map[String, Long] = asIndexWriter(indexDir) {
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
    // ledger BEFORE the manifest-collapsing publish (crash-safe order)
    advanceHwm(indexDir, 0L)
    Versioned.publishGroupMembers(Seq(
      Versioned.GroupFull(CentroidsTable, centroidsDf),
      Versioned.GroupFull(CodebooksTable, booksDf),
      Versioned.GroupDelta(CodesTable, codes, "batch", reuse = Nil)),
      indexDir, keep)
  }

  // ---- model loading (driver-sized, memoized per published version) ---

  private type Model = (Seq[(Int, Array[Float])], Seq[Seq[(Int, Array[Float])]])

  // keyed by (indexDir, centroids version, codebooks version, commit
  // stamp): an append LINKS the model tables at their existing versions,
  // so the cache stays hot across appends and invalidates exactly when a
  // rebuild publishes new model versions. The commit-marker stamp
  // ([[Versioned.commitStamp]]) guards the delete-and-rebuild-same-path
  // hazard ADVICE r10 flagged: a fresh incarnation restarts versions at
  // 0, but its markers carry new mtimes, so a stale model from the
  // previous incarnation can never serve against the new codes.
  // Model-sized values (nCells + m·pqK vectors).
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long, Long), Model]()
  private val modelLoadCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Number of ACTUAL model-parquet loads since JVM start — the
    * observability hook AnnIndexSpec uses to prove that a repeated serve
    * against an unchanged model reads no model files. */
  def modelLoads: Long = modelLoadCount.get

  /** Test/maintenance hook: drop every cached model. */
  def invalidateModelCache(): Unit = modelCache.clear()

  /** The frozen model from the last committed group snapshot: coarse
    * centroids + per-subspace codebooks, reconstructed in the exact
    * `Seq` shapes [[VectorOps]] trains (floats round-trip parquet
    * bit-exactly, so a served model IS the built model). Model-sized
    * driver collect — nCells + m·pqK small vectors, never the corpus —
    * and memoized by published version, so it runs at most once per
    * (directory, model generation) per JVM. */
  def loadModel(spark: SparkSession, indexDir: String): Model =
    loadModelAt(spark, indexDir, Versioned.latestGroupVersions(indexDir))

  private def loadModelAt(spark: SparkSession, indexDir: String,
      versions: Map[String, Long]): Model = {
    import spark.implicits._
    val key = (indexDir, versions(CentroidsTable), versions(CodebooksTable),
      Versioned.commitStamp(indexDir, CentroidsTable,
        versions(CentroidsTable)))
    val hit = modelCache.get(key)
    if (hit != null) return hit
    val coarse = Versioned.read(spark, indexDir, CentroidsTable,
        Some(versions(CentroidsTable)))
      .as[(Int, Array[Float])].collect().sortBy(_._1).toSeq
    val books = Versioned.read(spark, indexDir, CodebooksTable,
        Some(versions(CodebooksTable)))
      .as[(Int, Int, Array[Float])].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(r => (r._2, r._3)).toSeq }
    modelLoadCount.incrementAndGet()
    if (modelCache.size > 64) modelCache.clear() // bound a long session
    modelCache.put(key, (coarse, books))
    (coarse, books)
  }

  /** One row per tombstoned id with its widest batch CUTOFF — the scope
    * a tombstone erases: codes batches admitted AT OR BEFORE the delete
    * (`batch <= cutoff`), never batches appended after it. Scoping by
    * `vec_id` alone (the pre-r13 shape, ADVICE r12) silently hid a
    * legitimate post-delete append reusing an erased id (re-consent /
    * id recycling) from every serve and let the next compact physically
    * drop it while the corpus upsert kept the doc — exactly the
    * table-vs-index divergence [[graft.pipelines.Erasure]] exists to
    * prevent. Tables written before the `cutoff` column existed read as
    * cutoff = ∞ (their historical "ids are never reusable" semantics).
    * A re-deleted id keeps its widest cutoff via `max` — the later
    * delete's scope covers the earlier one's. */
  private def tombstoneScope(spark: SparkSession, indexDir: String,
      version: Long): DataFrame = {
    val raw = Versioned.read(spark, indexDir, TombstonesTable, Some(version))
    val scoped =
      if (raw.columns.contains("cutoff"))
        raw.select(col("vec_id"),
          coalesce(col("cutoff"), lit(Long.MaxValue)).as("cutoff"))
      else raw.select(col("vec_id"), lit(Long.MaxValue).as("cutoff"))
    scoped.groupBy("vec_id").agg(max("cutoff").as("cutoff"))
      .select(col("vec_id").as("__t_vec_id"), col("cutoff").as("__t_cutoff"))
  }

  /** Anti-join the snapshot's tombstones (if the snapshot carries any)
    * out of a codes frame, scoped to each victim's admission cutoff
    * ([[tombstoneScope]]). Applied AFTER the probed-cell filter so the
    * `In(cell, …)` parquet pushdown is untouched. The tombstone side is
    * one id-sized aggregate: Catalyst broadcasts it while it fits the
    * broadcast budget and falls back to a shuffle anti-join beyond that
    * — correct either way, and [[delete]]'s `compactAbove` bound forces
    * a physical fold before the set can grow without limit (AnnIndexSpec
    * pins both regimes). Indexes published before any [[delete]] have no
    * tombstone member in their snapshot and skip the join entirely. */
  private def antiTombstones(spark: SparkSession, indexDir: String,
      snapshot: Map[String, Long], codes: DataFrame): DataFrame =
    snapshot.get(TombstonesTable).fold(codes) { v =>
      val t = tombstoneScope(spark, indexDir, v)
      codes.join(t,
        codes("vec_id") === t("__t_vec_id") &&
          codes("batch") <= t("__t_cutoff"),
        "left_anti")
    }

  /** Row-level DELETE from the published index — the GDPR-erasure path.
    * Victims (`vec_id` rows; extra columns ignored) are staged as one
    * new tombstone batch partition carrying a batch CUTOFF (the highest
    * code batch admitted at delete time: manifest ∪ ledger); codes and
    * model tables are LINKED unchanged, so the transaction stages
    * O(victims) bytes and zero corpus data. Every subsequent
    * [[serveTopK]] / [[serveTopKFiltered]] anti-joins the snapshot's
    * tombstones out of the probed candidates SCOPED to that cutoff
    * (`batch <= cutoff`), so an erased vector can never be returned —
    * while a LATER [[append]] legitimately reusing the id (re-consent,
    * id recycling) lands above the cutoff and stays fully servable
    * (AnnIndexSpec pins both; serve ≡ filtered-serve-over-the-complement
    * stays bit-identical). Tombstones are folded into the data (and the
    * table dropped from the snapshot) by the next [[compact]] or
    * [[build]]; [[maybeRebuild]] counts deletion pressure toward its
    * rebuild trigger. Deleting an id twice, or an id the index never
    * held, is a harmless no-op (set semantics); an EMPTY victims frame
    * returns the current snapshot untouched.
    *
    * BOUNDED standing set: when the folded tombstone count (DISTINCT
    * ids — a re-deleted id contributes one anti-join key no matter how
    * many delete generations name it) reaches the effective bound, this
    * call runs [[compact]] itself (one O(codes) rewrite) instead of
    * letting the set grow without limit — between folds an oversized
    * set only degrades the serve anti-join from broadcast to shuffle
    * (correct, slower), but nothing else would ever bound it when
    * callers skip `physical` erasure and never schedule compaction.
    * The effective bound is `min(compactAbove, [[compactTrigger]])`:
    * the trigger derives from the session's
    * `spark.sql.autoBroadcastJoinThreshold` so "bounded" means
    * "broadcastable" — the serve anti-join stays in the broadcast
    * regime instead of silently crossing into shuffle-anti well before
    * a fixed cap trips (the r13 mismatch: a 2²⁰-id cap ≈ 16 MB of
    * key+cutoff sat above Spark's 10 MB broadcast default).
    * `compactAbove` remains the absolute backstop for sessions that
    * disable auto-broadcast (threshold ≤ 0) or raise it past the cap.
    * A single oversized delete batch can still exceed the bound once
    * (the count runs after its publish) — the shuffle-anti regime is
    * correct there too (AnnIndexSpec pins it) and the fold fires
    * immediately. */
  def delete(victims: DataFrame, indexDir: String, keep: Int = 3,
      compactAbove: Long = 1L << 20): Map[String, Long] =
      asIndexWriter(indexDir) {
    val spark = victims.sparkSession
    val snapshot = Versioned.latestGroupVersions(indexDir)
    val dedup = victims.select(col("vec_id")).distinct()
    if (dedup.isEmpty) return snapshot
    // scope: erase only batches admitted up to NOW (manifest ∪ ledger —
    // the ledger covers ids a compact's manifest collapse forgot, the
    // manifest covers a crash before append's ledger write)
    val cutoff = admittedHwm(indexDir)
    val fresh = dedup.withColumn("cutoff", lit(cutoff))
    val (reuse, nextBatch, stage) = snapshot.get(TombstonesTable) match {
      case Some(v) =>
        val m = Versioned.manifest(indexDir, TombstonesTable, v)
          .getOrElse(throw new IllegalStateException(
            s"$TombstonesTable v$v has no partition manifest"))
        val prior = Versioned.read(spark, indexDir, TombstonesTable, Some(v))
        if (prior.columns.contains("cutoff"))
          (m.entries, m.entries.flatMap(_._1.toLongOption)
            .foldLeft(-1L)(math.max) + 1L, fresh)
        else
          // one-time O(tombstones) migration of a pre-cutoff-era table:
          // rewrite the legacy rows (cutoff = ∞, their historical
          // semantics) into this batch instead of linking them — linked
          // partitions with a DIFFERENT parquet schema would silently
          // drop the new column on read
          (Seq.empty[(String, String)], 0L,
            prior.select(col("vec_id"))
              .withColumn("cutoff", lit(Long.MaxValue))
              .unionByName(fresh))
      case None => (Seq.empty[(String, String)], 0L, fresh)
    }
    val published = Versioned.publishGroupMembers(Seq(
      Versioned.GroupLink(CentroidsTable, snapshot(CentroidsTable)),
      Versioned.GroupLink(CodebooksTable, snapshot(CodebooksTable)),
      Versioned.GroupLink(CodesTable, snapshot(CodesTable)),
      Versioned.GroupDelta(TombstonesTable,
        stage.withColumn("batch", lit(nextBatch)), "batch", reuse)),
      indexDir, keep)
    // the bound: one id-only DISTINCT count of the folded set per delete
    // (rows would overcount re-deleted ids — the anti-join key set is
    // what must stay broadcastable, and that set is distinct by
    // construction in [[tombstoneScope]])
    val folded = Versioned.read(spark, indexDir, TombstonesTable,
        Some(published(TombstonesTable)))
      .select(col("vec_id")).distinct().count()
    if (folded >= math.min(compactAbove, compactTrigger(spark)))
      compact(spark, indexDir, keep)
    else published
  }

  /** In-memory bytes a broadcast tombstone entry costs, conservatively:
    * 16 bytes of payload (vec_id + cutoff longs) plus hash-relation
    * key/slot overhead. Used to translate the session's broadcast byte
    * budget into an id-count trigger. */
  val BytesPerTombstoneId = 32L

  /** The distinct-tombstone-id count above which [[delete]] forces a
    * [[compact]], derived from the session's
    * `spark.sql.autoBroadcastJoinThreshold` (bytes) so the standing set
    * stays inside the broadcast budget — i.e. the serve anti-join keeps
    * its BroadcastHashJoin shape. Sessions with auto-broadcast disabled
    * (threshold ≤ 0) get `Long.MaxValue` here and fall back to
    * [[delete]]'s absolute `compactAbove` backstop. */
  def compactTrigger(spark: SparkSession): Long = {
    val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
    if (threshold <= 0) Long.MaxValue
    else math.max(threshold / BytesPerTombstoneId, 1L)
  }

  /** The highest batch id ever ADMITTED to this index directory (−1
    * before any admission): ledger ∪ current codes manifest — the same
    * two-source union [[delete]] uses for its cutoff and [[append]]
    * uses for replay detection, because each source alone has a crash
    * window (the ledger is written AFTER append's commit, so a crash
    * between the two leaves a manifest-admitted batch the ledger
    * doesn't know; the manifest collapses at compact, which only the
    * ledger survives). Exposed so the streaming composition
    * ([[graft.streaming.Streams.ingestDedupedIndexed]]) can recognize
    * an engine-level epoch REPLAY before its index leg runs and scope
    * the corpus leg accordingly (the replay-after-erase note there). */
  def admittedHwm(indexDir: String): Long = {
    val manifestMax = Versioned.latestVersion(indexDir, CodesTable)
      .flatMap(v => Versioned.manifest(indexDir, CodesTable, v))
      .map(_.entries.flatMap(_._1.toLongOption).foldLeft(-1L)(math.max))
      .getOrElse(-1L)
    math.max(readHwm(indexDir), manifestMax)
  }

  /** The vec_ids currently SERVABLE from the latest snapshot: codes
    * minus scoped tombstones, id-projected (one O(codes) id scan, no
    * vectors read). The membership oracle the streaming corpus leg uses
    * on replayed epochs: a doc whose vector was delivered but is not
    * servable was ERASED between the epoch's original run and its
    * replay, and must not be re-published. */
  def servableIds(spark: SparkSession, indexDir: String): DataFrame = {
    val snapshot = Versioned.latestGroupVersions(indexDir)
    antiTombstones(spark, indexDir, snapshot,
      Versioned.read(spark, indexDir, CodesTable, Some(snapshot(CodesTable))))
      .select(col("vec_id")).distinct()
  }

  /** (live codes rows, DEAD codes rows) for the current snapshot — the
    * deletion-pressure measurement [[maybeRebuild]] folds into its
    * trigger. "Dead" counts tombstoned ids ACTUALLY PRESENT in the
    * codes (a tombstone for an id the index never held is the
    * documented no-op and must not pressure a retrain); "live" is the
    * remainder, so pressure = dead / (live + dead) is the true erased
    * fraction of the index. Id-only semi-join counts; never reads
    * vectors. */
  def deletionPressure(spark: SparkSession, indexDir: String): (Long, Long) = {
    val snapshot = Versioned.latestGroupVersions(indexDir)
    val codes = Versioned.read(spark, indexDir, CodesTable,
      Some(snapshot(CodesTable)))
    val total = codes.count()
    val dead = snapshot.get(TombstonesTable) match {
      case None => 0L
      case Some(v) =>
        val t = tombstoneScope(spark, indexDir, v)
        codes.join(t,
          codes("vec_id") === t("__t_vec_id") &&
            codes("batch") <= t("__t_cutoff"),
          "left_semi").count()
    }
    (total - dead, dead)
  }

  /** Serve top-k from the published index: resolve ONE group snapshot,
    * load its model (driver-sized, cached per model version), and run
    * ONLY the probe/rank stages ([[VectorOps.ivfPqRank]]). `queries` is
    * `(query_id, qv)` — external query vectors or a corpus slice; a
    * query also present in the corpus never matches itself. No training,
    * no full-corpus scan: the probe CELL SET (bounded by nCells no
    * matter how many queries — one tiny distinct over the small side) is
    * collected and pushed into the codes scan as an `In(cell, …)`
    * parquet filter, so with the cell-sorted layout [[build]]/[[append]]
    * write, row-group min/max statistics skip every unprobed cell's
    * bytes — the scan reads O(probed cells), not O(corpus), which is
    * the entire point of an inverted file. Model and codes both come
    * from the SAME journaled transaction: a rebuild committing between
    * any two reads here can never mix generations. AnnIndexSpec pins
    * the pushdown, pruned ≡ unpruned results, and the zero-model-read
    * repeat serve. */
  def serveTopK(spark: SparkSession, indexDir: String, queries: DataFrame,
      k: Int, nProbe: Int = 6): DataFrame = {
    import spark.implicits._
    val snapshot = Versioned.latestGroupVersions(indexDir)
    val (coarse, books) = loadModelAt(spark, indexDir, snapshot)
    val dim = coarse.head._2.length
    val probeCells = queries.select(
        explode(graft.functions.NearestCentroids.nearestCells(
          col("qv"), coarse, nProbe)).as("cell"))
      .distinct().as[Int].collect().sorted
    val all = Versioned.read(spark, indexDir, CodesTable,
      Some(snapshot(CodesTable)))
    val codes =
      if (probeCells.isEmpty) all.filter(lit(false)) // no queries → no scan
      else antiTombstones(spark, indexDir, snapshot,
        all.filter(col("cell").isInCollection(probeCells.toSeq)))
    VectorOps.ivfPqRank(codes, queries, k, coarse, books, nProbe, dim)
  }

  /** FILTERED serve — "top-k WHERE metadata predicate", the most common
    * real-world vector-search request: `allowed` is the (vec_id) key set
    * a metadata predicate admits (the caller filters its metadata table
    * and projects the key — any predicate, any table), and ranking runs
    * ONLY over admitted candidates, so k survivors are k TRUE matches.
    * The over-fetch-and-post-filter alternative (serve k', then drop
    * disallowed) loses recall under selective filters: a filter keeping
    * 1% of the corpus leaves ~k'/100 usable results.
    *
    * Plan shape: the probed-cell `In(cell, …)` parquet pushdown prunes
    * the codes scan exactly as [[serveTopK]] does, then a LEFT SEMI join
    * on vec_id admits survivors (Catalyst broadcasts a small key set,
    * shuffles a large one — both scale-safe), and only those are ADC-
    * ranked. Model/codes come from one journaled snapshot, same as the
    * unfiltered path. AnnIndexSpec pins: filtered serve ≡ one-shot
    * IVF-PQ over the filtered corpus (bit-identical), recall@k under a
    * selective filter vs brute-force-with-filter, and the pushdown. */
  def serveTopKFiltered(spark: SparkSession, indexDir: String,
      queries: DataFrame, allowed: DataFrame, k: Int,
      nProbe: Int = 6): DataFrame = {
    import spark.implicits._
    val snapshot = Versioned.latestGroupVersions(indexDir)
    val (coarse, books) = loadModelAt(spark, indexDir, snapshot)
    val dim = coarse.head._2.length
    val probeCells = queries.select(
        explode(graft.functions.NearestCentroids.nearestCells(
          col("qv"), coarse, nProbe)).as("cell"))
      .distinct().as[Int].collect().sorted
    val all = Versioned.read(spark, indexDir, CodesTable,
      Some(snapshot(CodesTable)))
    val codes =
      if (probeCells.isEmpty) all.filter(lit(false))
      else antiTombstones(spark, indexDir, snapshot,
        all.filter(col("cell").isInCollection(probeCells.toSeq)))
        .join(allowed.select(col("vec_id")).distinct(), Seq("vec_id"),
          "left_semi")
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
    * the current versions. Batch ids must be MONOTONE per index
    * directory (ingestStream's epoch ids are): the manifest plus the
    * compaction-surviving high-water ledger together decide replays. */
  def append(batch: DataFrame, indexDir: String, batchId: Long,
      keep: Int = 3, skipIfExists: Boolean = false): Map[String, Long] =
      asIndexWriter(indexDir) {
    val spark = batch.sparkSession
    val snapshot = Versioned.latestGroupVersions(indexDir)
    val (coarse, books) = loadModelAt(spark, indexDir, snapshot)
    val dim = coarse.head._2.length
    val current = snapshot
    if (batch.isEmpty) return current
    val reuse = Versioned.manifest(indexDir, CodesTable,
        snapshot(CodesTable))
      .getOrElse(throw new IllegalStateException(
        s"$CodesTable v${snapshot(CodesTable)} has no partition manifest — " +
          "not an AnnIndex build?"))
      .entries
    // the manifest is the primary idempotence ledger; the high-water
    // mark covers ids the manifest forgot at the last compact/rebuild.
    // Either way: a batch id that already landed is a caller bug (fail)
    // or a micro-batch REPLAY after a failure (skip) — `skipIfExists`
    // is how [[ingestStream]] gets exactly-once admission from
    // at-least-once delivery, the same move as streaming-sink epoch dedup
    if (reuse.exists(_._1 == batchId.toString) ||
        batchId <= readHwm(indexDir)) {
      if (skipIfExists) return current
      throw new IllegalArgumentException(
        s"batch $batchId already admitted to the index " +
          "(appends must use fresh, monotone ids)")
    }
    val codes = VectorOps.ivfPqEncodeWith(batch, coarse, books, dim)
      .withColumn("batch", lit(batchId))
      .sortWithinPartitions(col("cell"), col("vec_id")) // IVF layout, as in build
    // tombstones (if any) ride along at their current version — an
    // append must never resurrect erased ids by dropping the tombstone
    // member from the snapshot
    val published = Versioned.publishGroupMembers(Seq(
      Versioned.GroupLink(CentroidsTable, snapshot(CentroidsTable)),
      Versioned.GroupLink(CodebooksTable, snapshot(CodebooksTable)),
      Versioned.GroupDelta(CodesTable, codes, "batch", reuse)) ++
      snapshot.get(TombstonesTable)
        .map(v => Versioned.GroupLink(TombstonesTable, v)).toSeq,
      indexDir, keep)
    // ledger AFTER the commit: an id is only "admitted" once its data is
    // readable (a crash before this line is re-caught by the manifest)
    advanceHwm(indexDir, batchId)
    published
  }

  /** Bootstrap-or-grow admission for streamed corpora
    * ([[graft.streaming.Streams.ingestDedupedIndexed]]): the FIRST call
    * trains and publishes the index over its batch ([[build]]) and then
    * raises the admission ledger to `batchId`, so a failure-replay of
    * the bootstrap epoch is recognized and skipped like any other
    * replay (without the raise, the bootstrap's vectors would re-append
    * under the replay's fresh batch id — duplication); later calls are
    * plain frozen-model [[append]]s with `skipIfExists` — exactly-once
    * admission over at-least-once delivery. An empty batch is a no-op
    * (and never trains). The ledger raise happens BEFORE the build's
    * publish: a crash between the two leaves no committed codes, so
    * the replay bootstraps again (idempotent — the orphan staging dir
    * ages out via vacuum/retention); the reverse order would let a
    * crash after the publish replay the bootstrap vectors as a fresh
    * batch id, duplicating every one of them. */
  def buildOrAppend(batch: DataFrame, indexDir: String, batchId: Long,
      p: Params = Params(), keep: Int = 3): Map[String, Long] =
    asIndexWriter(indexDir) {
      // the bootstrap-or-grow DECISION is inside the writer span too: a
      // second writer between this check and the build would otherwise
      // race two bootstraps into one directory
      if (Versioned.latestVersion(indexDir, CodesTable).isEmpty) {
        if (batch.isEmpty) Map.empty
        else {
          Fs.mkdirs(new Path(indexDir))
          advanceHwm(indexDir, batchId)
          build(batch, indexDir, p, keep)
        }
      } else append(batch, indexDir, batchId, keep, skipIfExists = true)
    }

  /** Continuous micro-batch admission: each streamed embedding
    * micro-batch becomes one [[append]] (batch id = epoch + 1, so batch
    * 0 stays the build). The checkpoint location is DURABLE (defaulting
    * to `<indexDir>/_stream_checkpoint`), so epoch ids keep increasing
    * across stream restarts — without it Spark would use a temporary
    * checkpoint, restart epochs at 0, and `skipIfExists` would silently
    * drop genuinely-new batches that collide with already-landed ids.
    * foreachBatch replays after a failure re-deliver an epoch —
    * `skipIfExists` turns manifest + high-water ledger into an
    * idempotence check, giving exactly-once index admission over
    * at-least-once delivery without any extra state. Every appended
    * batch is immediately visible to [[serveTopK]]'s next snapshot. */
  def ingestStream(embStream: DataFrame, indexDir: String,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    embStream.writeStream
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$indexDir/_stream_checkpoint"))
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
    * (AnnIndexSpec). The manifest's batch-id entries collapse with the
    * data, but the admission ledger does NOT: the high-water mark is
    * advanced over every currently-manifested id BEFORE the rewrite, so
    * a failure-replay of a pre-compaction epoch is still recognized and
    * skipped (AnnIndexSpec pins this). */
  def compact(spark: SparkSession, indexDir: String,
      keep: Int = 3): Map[String, Long] = asIndexWriter(indexDir) {
    val snapshot = Versioned.latestGroupVersions(indexDir)
    // tombstones FOLD IN here: the rewrite anti-joins erased ids out of
    // the merged codes, and the new group journal simply omits the
    // tombstone member — the erase becomes physical and the snapshot
    // carries no tombstone table until the next delete
    val merged = antiTombstones(spark, indexDir, snapshot,
        Versioned.read(spark, indexDir, CodesTable,
          Some(snapshot(CodesTable))))
      .select(col("vec_id"), col("cell"), col("codes"),
        lit(0L).as("batch"))
      .sortWithinPartitions(col("cell"), col("vec_id")) // restore IVF layout
    // ledger BEFORE the manifest-collapsing publish (crash-safe order:
    // until the new version commits, the old manifest still names every
    // id; after it commits, the ledger does)
    advanceHwm(indexDir, -1L)
    val published = Versioned.publishGroupMembers(Seq(
      Versioned.GroupLink(CentroidsTable, snapshot(CentroidsTable)),
      Versioned.GroupLink(CodebooksTable, snapshot(CodebooksTable)),
      Versioned.GroupDelta(CodesTable, merged, "batch", reuse = Nil)),
      indexDir, keep)
    // Tombstone cleanup after the fold commits. At ERASURE retention
    // (keep <= 1) the whole table dir goes: the victim id list must not
    // remain enumerable on disk once the erase is folded (the GDPR
    // point of `physical = true` in [[graft.pipelines.Erasure]], which
    // calls compact with keep = 1) — a reader mid-scan on the
    // pre-compact snapshot already races normal keep=1 version pruning
    // (the documented "size keep to exceed your longest query" trade),
    // so the dir removal adds no new hazard class. At keep > 1 the fold
    // leaves the table UNPUBLISHED forever, so per-table retention
    // (which only runs inside a publish to that table) would never
    // prune it again and the victim ids would stay enumerable on disk
    // indefinitely (ADVICE r12) — instead, retire every tombstone
    // version that no journal inside the retention window still
    // references ([[Versioned.pruneExcept]] keeps manifest-linked dirs
    // alive): time travel to the last `keep` group snapshots keeps
    // working, and once those journals age out of the window the next
    // compact removes the remainder. Both paths run even when THIS
    // snapshot carried no tombstones, so a crash between a previous
    // erase-compact's commit and its cleanup is healed by the next one.
    if (keep <= 1) {
      val tombDir = new Path(s"$indexDir/$TombstonesTable")
      if (Fs.exists(tombDir)) Fs.deleteRecursive(tombDir)
    } else {
      val referenced = Versioned.recentGroupVersions(indexDir, keep)
        .flatMap(_.get(TombstonesTable)).toSet
      Versioned.pruneExcept(indexDir, TombstonesTable, referenced)
    }
    published
  }

  // ---- recall-drift observability -------------------------------------

  /** Sampled recall@k of the SERVED index against exact brute-force
    * cosine, for the current published snapshot — the measurement that
    * turns "periodically rebuild" into a policy. `corpus` is the
    * ground-truth vector table the index currently covers (the index
    * stores only compressed codes, so exact similarities need the raw
    * vectors); queries are a deterministic hash-ordered sample of its
    * ids. One row: the audited versions, the sample size, and
    * recall@k = |served ∩ exact| / |exact|. Cost is O(sample × corpus)
    * for the ground truth — run it on a sample, per published version,
    * not per query. */
  def recallAudit(spark: SparkSession, indexDir: String, corpus: DataFrame,
      nQueries: Int = 32, k: Int = 10, nProbe: Int = 6): DataFrame = {
    import spark.implicits._
    val vs = Versioned.latestGroupVersions(indexDir)
    val ids = corpus.select(col("vec_id"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nQueries).as[Long].collect().sorted.toSeq
    val pred = col("vec_id").isInCollection(ids)
    val queries = corpus.filter(pred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val truth = VectorOps.cosineTopK(corpus, pred, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(false) // denominator + hit join below
    val served = serveTopK(spark, indexDir, queries, k, nProbe)
      .select(col("query_id"), col("neighbor_id"))
    val nTruth = truth.count()
    val hits = truth.join(served, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    Seq((vs(CodesTable), vs(CentroidsTable), ids.size.toLong, k.toLong,
        nProbe.toLong, hits,
        if (nTruth == 0) 1.0 else hits.toDouble / nTruth))
      .toDF("codes_version", "model_version", "n_queries", "k", "n_probe",
        "n_hits", "recall_at_k")
  }

  /** The measured rebuild trigger: audit the current snapshot's recall
    * and, when it has drifted below `minRecall` — or when DELETION
    * PRESSURE (tombstoned ids / live codes, see [[deletionPressure]])
    * reaches `maxDeletedFrac` — retrain over `corpus` ([[build]] — new
    * model generation, ledger carried forward, tombstones cleared) and
    * re-audit. Deletions count toward drift because the quantizer was
    * trained on a distribution that erased rows no longer represent,
    * and every serve pays the anti-join until a rewrite folds them in.
    * Returns one decision row either way, so a scheduler can log the
    * drift → rebuild loop per run. */
  def maybeRebuild(corpus: DataFrame, indexDir: String, minRecall: Double,
      nQueries: Int = 32, k: Int = 10, nProbe: Int = 6,
      p: Params = Params(), keep: Int = 3,
      maxDeletedFrac: Double = 1.0): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def audit() = recallAudit(spark, indexDir, corpus, nQueries, k, nProbe)
      .select(col("codes_version"), col("recall_at_k"))
      .as[(Long, Double)].head()
    val (vBefore, rBefore) = audit()
    val deletePressured = maxDeletedFrac < 1.0 && {
      val (live, dead) = deletionPressure(spark, indexDir)
      dead > 0 && dead.toDouble / math.max(live + dead, 1L) >= maxDeletedFrac
    }
    val rebuilt = rBefore < minRecall || deletePressured
    if (rebuilt) build(corpus, indexDir, p, keep)
    val (vAfter, rAfter) = if (rebuilt) audit() else (vBefore, rBefore)
    Seq((vBefore, rBefore, minRecall, rebuilt, vAfter, rAfter))
      .toDF("audited_version", "recall_before", "min_recall", "rebuilt",
        "current_version", "recall_after")
  }
}
