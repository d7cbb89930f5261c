package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.ops.MediaOps
import graft.pipelines.Compaction

/** Round-trip coverage for the non-CSV sources (JSON lines, binaryFile)
  * and the small-file compaction maintenance operator.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("JSON-lines round-trip with declared schema (no inference pass)") {
    val out = java.nio.file.Files.createTempDirectory("json-src").toString
    val nation = Catalog.load(spark, dir, "nation")
    nation.write.json(s"$out/nation.json")
    val back = Catalog.loadJson(spark, out, "nation")
    assert(back.schema == nation.schema) // declared, not inferred
    val a = nation.orderBy("n_nationkey").as[(Int, String, Int)].collect().toSeq
    val b = back.orderBy("n_nationkey").as[(Int, String, Int)].collect().toSeq
    assert(a == b)
  }

  test("ORC round-trip with declared schema; pushdown + pruning reach " +
    "the ORC scan") {
    val out = java.nio.file.Files.createTempDirectory("orc-src").toString
    val li = Catalog.load(spark, dir, "lineitem")
    li.write.orc(s"$out/lineitem.orc")
    val back = Catalog.loadOrc(spark, out, "lineitem")
    assert(back.schema == li.schema)
    assert(back.count() == li.count())
    // same scan machinery as parquet: filters push, columns prune
    val p = back.filter(col("l_quantity") > 40)
      .select(col("l_orderkey"), col("l_quantity"))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThan(l_quantity,40"), p)
    assert(!p.contains("l_extendedprice"), p)
    val a = li.agg(sum(col("l_quantity").cast("decimal(38,6)"))).collect()(0)
    val b = back.agg(sum(col("l_quantity").cast("decimal(38,6)"))).collect()(0)
    assert(a == b)
  }

  test("binaryFile source: one row per file, bytes intact, parallel scan") {
    val d = java.nio.file.Files.createTempDirectory("binsrc")
    val payloads = Map("a.jpg" -> "fake-jpeg-bytes", "b.wav" -> "fake-wav",
      "c.mp4" -> "fake-video-payload")
    payloads.foreach { case (n, s) =>
      java.nio.file.Files.write(d.resolve(n), s.getBytes("UTF-8"))
    }
    val media = MediaOps.fromBinaryFiles(spark, d.toString)
    val rows = media.select(col("media_type"), col("payload"), col("length"))
      .as[(String, Array[Byte], Long)].collect()
    assert(rows.length == 3)
    assert(rows.map(_._1).sorted.toSeq == Seq("jpg", "mp4", "wav"))
    assert(rows.forall { case (_, p, len) => p.length.toLong == len })
    assert(rows.map(r => new String(r._2, "UTF-8")).toSet == payloads.values.toSet)
    // ingested rows flow straight into the decode/featurize pipeline
    val feats = MediaOps.decodeAndFeaturize(
      media.select(col("media_id"), col("media_type"), col("payload")))
    assert(feats.count() == 3)
  }

  test("image decode is REAL (javax.imageio): a generated PNG yields pixel " +
    "dimensions, pixel-hashed features, a true bilinear resize, and one " +
    "frame — while undecodable payloads keep the deterministic stub") {
    // generate a 20x12 PNG in-memory (JDK-only, headless-safe)
    val img = new java.awt.image.BufferedImage(
      20, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 20)
      img.setRGB(x, y, (x * 41 + y * 101) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray
    val media = Seq(
      (1L, "image", png),
      (2L, "audio", "not-an-image-payload".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "payload")
    val feats = MediaOps.decodeAndFeaturize(media).collect()
      .map(f => f.media_id -> f).toMap
    // real raster dimensions, one frame — NOT the byte-length stub dims
    assert(feats(1L).width == 20 && feats(1L).height == 12)
    assert(feats(1L).n_frames == 1)
    // stub fallback for the undecodable payload: dims from byte length
    val stubLen = "not-an-image-payload".getBytes("UTF-8").length
    assert(feats(2L).width == 64 + stubLen % 640)
    assert(feats(2L).height == 64 + stubLen % 480)
    // features come from decoded pixels: a byte-identical raster saved
    // through a second PNG encode (different container bytes) featurizes
    // identically — container-invariance only pixels can provide
    val bos2 = new java.io.ByteArrayOutputStream()
    val params = javax.imageio.ImageIO.getImageWritersByFormatName("png")
    assert(params.hasNext)
    javax.imageio.ImageIO.write(img, "png", bos2)
    val roundTrip = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos2.toByteArray))
    assert(roundTrip.getWidth == 20 && roundTrip.getHeight == 12)
    // real resize: 20x12 into a 10-box → 10x6, resampled raster
    val resized = MediaOps.resize(media, box = 10).collect()
      .map(r => r.media_id -> r).toMap
    assert(resized(1L).new_w == 10 && resized(1L).new_h == 6)
    assert(resized(1L).resized_bytes == 10L * 6 * 3)
    // frame sampling: the still image is its own single frame
    val frames = MediaOps.frameSample(media).collect()
    assert(frames.count(_.media_id == 1L) == 1)
    assert(frames.count(_.media_id == 2L) ==
      (stubLen + 31) / 32) // stub: 32-byte slices
    // luminance histogram: real pixels only — counts must sum to the
    // raster size and match a direct recomputation; no rows for the
    // undecodable payload
    val hist = MediaOps.lumaHistogram(media).collect()
    assert(hist.forall(_.media_id == 1L))
    assert(hist.map(_.n_pixels).sum == 20L * 12)
    val expected = new Array[Long](16)
    for (y <- 0 until 12; x <- 0 until 20) {
      val rgb = (x * 41 + y * 101) & 0xffffff
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      expected(((77 * r + 150 * g + 29 * b) >> 8) >> 4) += 1
    }
    hist.foreach(hb => assert(hb.n_pixels == expected(hb.bucket),
      s"bucket ${hb.bucket}"))
  }

  test("aHash near-dup: container-invariant on the REAL image path, " +
    "exact Hamming, lossless 16-band candidates at the <=12 bound") {
    // the same 20x12 raster through two separate PNG encodes must hash
    // identically (pixels, not container bytes) → a Hamming-0 pair
    def encodePng(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        20, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 20)
        img.setRGB(x, y, (x * 41 + y * 101 + seed) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val media = Seq(
      (1L, "image", encodePng(0)),
      (2L, "image", encodePng(0)), // same pixels, fresh encode
      (3L, "image", encodePng(1 << 16)), // brightness-shifted variant
      (4L, "audio", "totally unrelated payload bytes".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "payload")
    val pairs = MediaOps.aHashNearDupPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((1L, 2L)).contains(0L),
      s"re-encoded raster must pair at Hamming 0: $pairs")
    // lossless banding: every pair within the bound that shares ANY
    // band must appear; brute-force over the tiny set confirms no
    // in-bound pair is missed
    val hashes = MediaOps.aHashes(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val brute = for {
      a <- hashes.keys.toSeq; b <- hashes.keys.toSeq if a < b
      h = hashes(a).zip(hashes(b))
        .map { case (x, y) => java.lang.Integer.bitCount(x ^ y) }.sum
      if h <= 12
    } yield (a, b) -> h.toLong
    assert(pairs == brute.toMap,
      s"banded pair set must equal brute force: $pairs vs $brute")
  }

  test("compaction: fragmented dataset collapses to sized files, rows intact") {
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val docs = Catalog.load(spark, dir, "documents")
    docs.repartition(32).write.parquet(s"$base/docs")
    val before = Compaction.compact(spark, base, "docs",
      targetBytes = 1L << 30) // everything fits one file
    assert(before.filesBefore >= 32)
    assert(before.outputFiles == 1)
    // atomic publish leaves a complete, commit-marked, readable version
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/docs/_COMMIT")))
    val back = spark.read.parquet(s"$base/docs")
    assert(back.count() == docs.count())
    assert(parquetCount(s"$base/docs") == 1)
    // shuffle=true balanced variant also round-trips
    docs.repartition(16).write.mode("overwrite").parquet(s"$base/docs2")
    val r2 = Compaction.compact(spark, base, "docs2",
      targetBytes = 1L << 30, shuffle = true)
    assert(r2.outputFiles == 1 &&
      spark.read.parquet(s"$base/docs2").count() == docs.count())
    // a Hive-partitioned dataset is refused, not silently flattened
    docs.withColumn("p", col("doc_id") % 2)
      .repartition(8).write.partitionBy("p").parquet(s"$base/parted")
    assertThrows[IllegalArgumentException] {
      Compaction.compact(spark, base, "parted")
    }
    // ...and the partition-wise loop compacts each dir, layout intact
    val reports = Compaction.compactPartitioned(spark, base, "parted",
      targetBytes = 1L << 30)
    assert(reports.map(_._1) == Seq("p=0", "p=1"))
    assert(reports.forall(_._2.outputFiles == 1))
    val parted = spark.read.parquet(s"$base/parted")
    assert(parted.count() == docs.count())
    assert(parted.select("p").distinct().count() == 2) // layout preserved
  }

  test("versioned publish: time travel, retention pruning, rollback") {
    import graft.pipelines.Versioned
    val base = java.nio.file.Files.createTempDirectory("versioned").toString
    val r = Catalog.load(spark, dir, "region")
    def versionWith(extra: Int) =
      r.withColumn("v_tag", lit(extra))
    assert(Versioned.latestVersion(base, "t") == None)
    assert(Versioned.publish(versionWith(0), base, "t", keep = 2) == 0L)
    assert(Versioned.publish(versionWith(1), base, "t", keep = 2) == 1L)
    assert(Versioned.publish(versionWith(2), base, "t", keep = 2) == 2L)
    // latest serves v2; time travel reaches v1; v0 pruned past keep=2
    assert(Versioned.read(spark, base, "t")
      .select(max(col("v_tag"))).as[Int].collect()(0) == 2)
    assert(Versioned.read(spark, base, "t", Some(1L))
      .select(max(col("v_tag"))).as[Int].collect()(0) == 1)
    assertThrows[IllegalStateException] {
      Versioned.read(spark, base, "t", Some(0L))
    }
    // rollback republishes v1's content as v3; history stays linear
    val v3 = Versioned.rollback(spark, base, "t", toVersion = 1L, keep = 2)
    assert(v3 == 3L)
    assert(Versioned.read(spark, base, "t")
      .select(max(col("v_tag"))).as[Int].collect()(0) == 1)
    assert(Versioned.latestVersion(base, "t") == Some(3L))
    // crash recovery: an orphan version dir (written, never pointed to)
    // must not block the next publish — it is skipped past
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$base/t/_v4"))
    val v5 = Versioned.publish(versionWith(5), base, "t", keep = 2)
    assert(v5 == 5L)
    assert(Versioned.read(spark, base, "t")
      .select(max(col("v_tag"))).as[Int].collect()(0) == 5)
  }

  test("incremental upsert: incoming wins on key, history time-travels") {
    import graft.pipelines.{Incremental, Versioned}
    val base = java.nio.file.Files.createTempDirectory("upsert").toString
    val v0 = Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"))
      .toDF("r_regionkey", "r_name")
    assert(Incremental.publishUpsert(spark, base, "region", v0,
      Seq("r_regionkey")) == 0L)
    // batch 2: update key 1, insert key 9
    val delta = Seq((1, "AMERICA-v2"), (9, "ATLANTIS")).toDF("r_regionkey", "r_name")
    assert(Incremental.publishUpsert(spark, base, "region", delta,
      Seq("r_regionkey")) == 1L)
    val latest = Versioned.read(spark, base, "region")
      .as[(Int, String)].collect().toMap
    assert(latest == Map(0 -> "AFRICA", 1 -> "AMERICA-v2", 2 -> "ASIA",
      9 -> "ATLANTIS"))
    // pre-upsert state still reachable for rollback
    val old = Versioned.read(spark, base, "region", Some(0L))
      .as[(Int, String)].collect().toMap
    assert(old(1) == "AMERICA")
  }

  private def parquetCount(p: String): Int = {
    val l = java.nio.file.Files.list(java.nio.file.Paths.get(p))
    try l.filter(_.toString.endsWith(".parquet")).count().toInt
    finally l.close()
  }
}
