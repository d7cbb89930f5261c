package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipelines.Runner

class RunnerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("gate short-circuits on missing inputs (no work, no marker)") {
    val out = java.nio.file.Files.createTempDirectory("runner-gated").toString
    val report = Runner.run(spark, "/tmp/definitely-missing-sf",
      Runner.SingleFileCsvSink(out), markerDir = Some(out))
    assert(report.gated)
    assert(report.statuses.isEmpty)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/transform_SUCCESS")))
  }

  test("full run: three marts fan out, statuses Right, marker + _SUCCESS written") {
    val out = java.nio.file.Files.createTempDirectory("runner-out").toString
    val date = java.time.LocalDate.of(2026, 8, 12)
    val report = Runner.run(spark, dir, Runner.SingleFileCsvSink(out),
      runDate = date, markerDir = Some(out))
    assert(!report.gated)
    assert(report.statuses.keySet == Set("attack", "defense", "discipline"))
    assert(report.statuses.values.forall(_.isRight))
    for (m <- Seq("attack", "defense", "discipline")) {
      val d = java.nio.file.Paths.get(s"$out/$m")
      assert(java.nio.file.Files.exists(d.resolve("_SUCCESS"))) // committer marker
      val csvs = java.nio.file.Files.list(d).filter(_.toString.endsWith(".csv"))
      assert(csvs.count() == 1) // K3 single-file semantics
    }
    val marker = java.nio.file.Paths.get(s"$out/transform_SUCCESS")
    assert(java.nio.file.Files.readString(marker) == "2026-08-12")
  }

  test("per-mart error isolation: one failing sink → Left, others complete, no marker") {
    val out = java.nio.file.Files.createTempDirectory("runner-isolate").toString
    final case class FailOn(inner: Runner.Sink, name: String) extends Runner.Sink {
      def write(df: org.apache.spark.sql.DataFrame, n: String): Unit =
        if (n == name) throw new RuntimeException("injected sink failure")
        else inner.write(df, n)
    }
    val report = Runner.run(spark, dir,
      FailOn(Runner.PartitionedParquetSink(out, Nil), "defense"),
      markerDir = Some(out))
    assert(report.statuses("defense").isLeft)
    assert(report.statuses("attack").isRight)
    assert(report.statuses("discipline").isRight)
    // partial success must NOT publish the completion marker
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/transform_SUCCESS")))
    // ...but the failing mart gets its per-mart _ERROR marker (reference
    // parity: dag-extract.py's per-table error markers) so a downstream
    // gate can skip just that mart
    val errMarker = java.nio.file.Paths.get(s"$out/defense_ERROR")
    assert(java.nio.file.Files.exists(errMarker))
    assert(java.nio.file.Files.readString(errMarker)
      .contains("injected sink failure"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/attack_ERROR")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/discipline_ERROR")))

    // a later clean run must retract the stale defense_ERROR marker —
    // otherwise transform_SUCCESS and defense_ERROR coexist and the
    // downstream per-mart gates read a contradiction
    val report2 = Runner.run(spark, dir,
      Runner.PartitionedParquetSink(out, Nil), markerDir = Some(out))
    assert(report2.statuses.values.forall(_.isRight))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/transform_SUCCESS")))
    assert(!java.nio.file.Files.exists(errMarker))
  }

  test("expectations: whole rule set compiles to ONE aggregate pass; " +
    "violation counts exact; requireExpectations lists every failure") {
    import graft.pipelines.Guard
    import graft.pipelines.Guard.Expectations
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(
      (1L, "ok", 5.0), (2L, null, 50.0), (3L, "bad", -1.0), (4L, "ok", 7.0))
      .toDF("id", "status", "score")
    val e = Expectations(
      notNull = Seq("status"),
      accepted = Map("status" -> Seq("ok", "retry")),
      ranges = Map("score" -> (0.0, 10.0)),
      minRows = 10L)
    val rep = Guard.expectations(df, e)
    // single aggregate pass: no join, no window, at most the one
    // final-aggregate exchange
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
    val row = rep.collect()(0)
    assert(row.getAs[Long]("rows") == 4L)
    assert(row.getAs[Long]("null_status") == 1L)
    assert(row.getAs[Long]("domain_status") == 2L) // null + 'bad'
    assert(row.getAs[Long]("range_score") == 2L)   // 50.0 and -1.0
    val err = intercept[IllegalArgumentException] {
      Guard.requireExpectations(df, e)
    }
    assert(err.getMessage.contains("rows=4 below minRows=10") &&
      err.getMessage.contains("domain_status: 2") &&
      err.getMessage.contains("range_score: 2"))
    // a clean frame passes the gate
    Guard.requireExpectations(
      Seq((1L, "ok", 5.0)).toDF("id", "status", "score"),
      e.copy(minRows = 1L))
  }

  test("schemaDrift: missing/extra/type-changed columns reported; " +
    "order never flagged; requireSchema throws with the full list") {
    import graft.pipelines.Guard
    import org.apache.spark.sql.types._
    val spark0 = spark
    import spark0.implicits._
    val expected = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType), StructField("c", IntegerType)))
    val df = Seq(("x", 1L, 2.0)).toDF("b", "a", "d") // reordered, c→d, no c
    val drift = Guard.schemaDrift(df.withColumn("a", $"a"), expected)
    assert(drift.exists(_.contains("missing column: c")))
    assert(drift.exists(_.contains("unexpected column: d")))
    // pure reorder with right types: clean
    val ok = Seq((1L, "x", 3)).toDF("a", "b", "c").select("c", "a", "b")
    assert(Guard.schemaDrift(ok, expected).isEmpty)
    Guard.requireSchema(ok, expected) // no throw
    // type change detected
    val retyped = Seq((1, "x", 3)).toDF("a", "b", "c") // a is Int not Long
    assert(Guard.schemaDrift(retyped, expected)
      .exists(_.contains("type int != expected bigint")))
    val e = intercept[IllegalArgumentException] {
      Guard.requireSchema(df, expected)
    }
    assert(e.getMessage.contains("missing column: c") &&
      e.getMessage.contains("unexpected column: d"))
  }

  test("runGrouped: all three marts publish as one atomic group; " +
    "readGroup serves the complete run") {
    import graft.pipelines.Versioned
    val out = java.nio.file.Files.createTempDirectory("runner-group").toString
    val v = Runner.runGrouped(spark, dir, out).get
    assert(v.keySet == Set("attack", "defense", "discipline"))
    val g = Versioned.readGroup(spark, out)
    assert(g.keySet == v.keySet)
    g.values.foreach(df => assert(df.count() > 0))
    assert(g("attack").columns.contains("run_date"))
  }

  test("mart timeout: finite timeout → Left(TimeoutException); default is unbounded") {
    import scala.concurrent.duration._
    val out = java.nio.file.Files.createTempDirectory("runner-timeout").toString
    final case class SlowSink(inner: Runner.Sink, delayMs: Long) extends Runner.Sink {
      def write(df: org.apache.spark.sql.DataFrame, n: String): Unit = {
        Thread.sleep(delayMs); inner.write(df, n)
      }
    }
    // a mart that completes — but past the configured timeout — is a Left
    val slow = Runner.run(spark, dir,
      SlowSink(Runner.PartitionedParquetSink(out, Nil), delayMs = 5000),
      retries = 0, timeout = 200.millis)
    assert(slow.timeout == 200.millis)
    assert(slow.statuses.values.forall(s => s.isLeft &&
      s.left.exists(_.isInstanceOf[java.util.concurrent.TimeoutException])))
    // the default (Duration.Inf) never times a healthy mart out
    val ok = Runner.run(spark, dir,
      SlowSink(Runner.PartitionedParquetSink(
        java.nio.file.Files.createTempDirectory("runner-timeout2").toString,
        Nil), delayMs = 50))
    assert(ok.timeout == Duration.Inf)
    assert(ok.statuses.values.forall(_.isRight))
  }

  test("retry with backoff: once-failing sink succeeds on the retry") {
    val out = java.nio.file.Files.createTempDirectory("runner-retry").toString
    val failedOnce = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    final case class FlakySink(inner: Runner.Sink) extends Runner.Sink {
      def write(df: org.apache.spark.sql.DataFrame, n: String): Unit = {
        if (failedOnce.add(n)) throw new RuntimeException("transient failure")
        inner.write(df, n)
      }
    }
    val report = Runner.run(spark, dir,
      FlakySink(Runner.PartitionedParquetSink(out, Nil)),
      markerDir = Some(out), retries = 2,
      backoff = scala.concurrent.duration.Duration(50, "ms"))
    assert(report.statuses.values.forall(_.isRight))
    assert(failedOnce.size == 3) // every mart really did fail once
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/transform_SUCCESS")))
    // retries=0 keeps the old fail-fast behavior: the one transient
    // failure is terminal
    failedOnce.clear()
    val report0 = Runner.run(spark, dir,
      FlakySink(Runner.PartitionedParquetSink(
        java.nio.file.Files.createTempDirectory("runner-retry0").toString, Nil)),
      retries = 0)
    assert(report0.statuses.values.forall(_.isLeft))
  }

  test("quality guard: metrics ride the write job, thresholds validate after") {
    import graft.pipelines.Guard
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "c"))
      .toDF("id", "name")
    val (guarded, obs) = Guard.withMetrics(df, Seq("name"))
    val out = java.nio.file.Files.createTempDirectory("guard").toString
    guarded.write.parquet(s"$out/t") // the ONE job; metrics collected here
    assert(Guard.check(obs, minRows = 1, maxNullFrac = 0.5, Seq("name")) ==
      Right(Map("name" -> 1L, "rows" -> 3L)))
    val (g2, obs2) = Guard.withMetrics(df, Seq("name"))
    g2.count()
    val strict = Guard.check(obs2, minRows = 10, maxNullFrac = 0.0, Seq("name"))
    assert(strict.isLeft && strict.left.toOption.get.size == 2)
  }

  test("atomic sink: commit manifest present, old version fully replaced") {
    val out = java.nio.file.Files.createTempDirectory("runner-atomic").toString
    val sink = Runner.AtomicParquetSink(out, "r1")
    val r1 = Runner.run(spark, dir, sink)
    assert(r1.statuses.values.forall(_.isRight))
    val commit = java.nio.file.Paths.get(s"$out/attack/_COMMIT")
    assert(java.nio.file.Files.readString(commit).startsWith("r1\n"))
    val n1 = spark.read.parquet(s"$out/attack").count()
    // second publish replaces atomically; no staging/old dirs remain
    val r2 = Runner.run(spark, dir, Runner.AtomicParquetSink(out, "r2"))
    assert(r2.statuses.values.forall(_.isRight))
    assert(java.nio.file.Files.readString(commit).startsWith("r2\n"))
    assert(spark.read.parquet(s"$out/attack").count() == n1)
    val stray = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .filter(p => p.getFileName.toString.startsWith(".staging") ||
        p.getFileName.toString.startsWith(".old"))
    assert(stray.count() == 0)
  }

  test("atomic sink self-heals a crash between the two swap renames: the " +
    "stranded .old aside is restored/replaced on the next run and all " +
    "debris is swept") {
    import graft.pipelines.Fs
    import org.apache.hadoop.fs.Path
    val out = java.nio.file.Files.createTempDirectory("runner-heal").toString
    val sink1 = Runner.AtomicParquetSink(out, "r1")
    val df1 = spark.range(5).toDF("v")
    sink1.write(df1, "t")
    // simulate the crash window: target renamed aside, process dies
    // before the staging rename-in (plus a stale COMMITTED staging dir
    // from the same doomed run — commit-less staging is unattributable
    // and deliberately left alone)
    Fs.rename(new Path(s"$out/t"), new Path(s"$out/.old-t-rX"))
    Fs.mkdirs(new Path(s"$out/.staging-t-rX"))
    Fs.writeString(new Path(s"$out/.staging-t-rX/_COMMIT"), "rX\nt\n")
    assert(!Fs.exists(new Path(s"$out/t")))
    // next run heals first (previous version restored), then publishes
    val sink2 = Runner.AtomicParquetSink(out, "r2")
    sink2.write(spark.range(9).toDF("v"), "t")
    assert(spark.read.parquet(s"$out/t").count() == 9L)
    val stray = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .filter(p => p.getFileName.toString.startsWith(".staging") ||
        p.getFileName.toString.startsWith(".old"))
    assert(stray.count() == 0, "crash debris must be swept by the next run")
    // heal-only path: crash again, then verify a reader-visible restore
    // happens even when the next run writes the SAME data
    Fs.rename(new Path(s"$out/t"), new Path(s"$out/.old-t-rY"))
    Runner.AtomicParquetSink(out, "r3").write(spark.range(3).toDF("v"), "t")
    assert(spark.read.parquet(s"$out/t").count() == 3L)
  }

  test("PRE-NAME-FORMAT asides (commit line 2 is a parquet part, not a " +
    "mart name) heal when the dir-name parse is provably this mart's " +
    "(dashless tag, no dash-prefix sibling); the rest is manual vacuum") {
    import graft.pipelines.Fs
    import org.apache.hadoop.fs.Path
    val out = java.nio.file.Files.createTempDirectory("runner-legacy").toString
    Runner.AtomicParquetSink(out, "r1").write(spark.range(5).toDF("v"), "t")
    // age the commit to the pre-r13 format: no name line — exactly the
    // debris ADVICE r13 flagged as stranded forever. NOTE the recorded
    // tag (the WRITING run's, r1) differs from the aside's dir tag (the
    // RENAMING run's, r2) — the genuine-debris shape.
    val parts = Fs.list(new Path(s"$out/t")).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).sorted.mkString("\n")
    Fs.writeString(new Path(s"$out/t/_COMMIT"), s"r1\n$parts\n")
    // crash window: run r2 renamed the target aside, process died
    Fs.rename(new Path(s"$out/t"), new Path(s"$out/.old-t-r2"))
    assert(!Fs.exists(new Path(s"$out/t")))
    // next run HEALS first — observe the restore itself by making the
    // new publish fail after the heal
    intercept[Throwable] {
      Runner.AtomicParquetSink(out, "r3").write(
        spark.range(1).selectExpr("raise_error('boom') as v"), "t")
    }
    assert(Fs.exists(new Path(s"$out/t")),
      "an unambiguous old-format aside must be restored, not stranded")
    assert(spark.read.parquet(s"$out/t").count() == 5L)
    // ...and once a target exists, the same rule lets the sweep take
    // old-format debris
    Fs.mkdirs(new Path(s"$out/.old-t-r5"))
    Fs.writeString(new Path(s"$out/.old-t-r5/_COMMIT"), "rW\npart.parquet\n")
    Runner.AtomicParquetSink(out, "r6").write(spark.range(9).toDF("v"), "t")
    assert(!Fs.exists(new Path(s"$out/.old-t-r5")), "unambiguous → swept")
    // DASHED dir tag ('.old-t-r7-x' could be mart t tag r7-x or a mart
    // t-r7 tag x — and the old format records no witness): never
    // restored, never swept — manual vacuum
    Fs.mkdirs(new Path(s"$out/.old-t-r7-x"))
    Fs.writeString(new Path(s"$out/.old-t-r7-x/_COMMIT"), "rZ\npart.parquet\n")
    Fs.deleteRecursive(new Path(s"$out/t"))
    intercept[Throwable] {
      Runner.AtomicParquetSink(out, "r8").write(
        spark.range(1).selectExpr("raise_error('boom') as v"), "t")
    }
    assert(!Fs.exists(new Path(s"$out/t")),
      "a dashed-tag old-format aside must not be restored on a guess")
    // CROSS-WIRE guard: mart 't-k9' sees '.old-t-k9-x' — a multi-dash
    // dir name admits several (name, tag) parses (mart t tag k9-x, or
    // mart t-k9 tag x) and no filesystem state can prove which, so NO
    // mart may claim it, even the one whose own parse looks dashless
    Runner.AtomicParquetSink(out, "r9").write(spark.range(2).toDF("v"), "t")
    Fs.mkdirs(new Path(s"$out/.old-t-k9-x"))
    Fs.writeString(new Path(s"$out/.old-t-k9-x/_COMMIT"), "rY\npart.parquet\n")
    intercept[Throwable] {
      Runner.AtomicParquetSink(out, "r10").write(
        spark.range(1).selectExpr("raise_error('boom') as v"), "t-k9")
    }
    assert(!Fs.exists(new Path(s"$out/t-k9")),
      "a multi-dash old-format aside must never be claimed by any mart")
    assert(Fs.exists(new Path(s"$out/.old-t-k9-x")))
  }

  test("a failed run retracts a stale transform_SUCCESS from an earlier " +
    "run (the mirror of the per-mart error retraction)") {
    val out = java.nio.file.Files.createTempDirectory("runner-stale").toString
    val ok = Runner.run(spark, dir, Runner.PartitionedParquetSink(out, Nil),
      markerDir = Some(out))
    assert(ok.statuses.values.forall(_.isRight))
    val marker = java.nio.file.Paths.get(s"$out/transform_SUCCESS")
    assert(java.nio.file.Files.exists(marker))
    final case class FailAll() extends Runner.Sink {
      def write(df: org.apache.spark.sql.DataFrame, n: String): Unit =
        throw new RuntimeException("injected")
    }
    val bad = Runner.run(spark, dir, FailAll(), markerDir = Some(out))
    assert(bad.statuses.values.forall(_.isLeft))
    assert(!java.nio.file.Files.exists(marker),
      "yesterday's transform_SUCCESS must not survive a failed run")
  }

  test("partitioned parquet sink round-trips with partition pruning layout") {
    val out = java.nio.file.Files.createTempDirectory("runner-parq").toString
    val report = Runner.run(spark, dir,
      Runner.PartitionedParquetSink(out, Seq("run_date")),
      runDate = java.time.LocalDate.of(2026, 8, 12))
    assert(report.statuses.values.forall(_.isRight))
    // Hive-style layout (reference key template analog) + readable back
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/attack/run_date=2026-08-12")))
    val back = spark.read.parquet(s"$out/attack")
    assert(back.count() == report.statuses("attack").toOption.get)
    assert(back.columns.contains("run_date"))
  }
}
