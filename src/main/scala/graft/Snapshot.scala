package graft

import org.apache.spark.sql.SparkSession

/** Rewrite-equivalence harness: snapshot named query outputs to parquet
  * (mode=save) BEFORE a plan-shape rewrite, then prove the rewritten
  * queries bit-identical (mode=check) — row-for-row, column-dtype-for-
  * dtype — before the change ships. This is how the round-11
  * [[graft.ops.GlobalRank]] migration certified all 22 window rewrites
  * against the previous hash-green implementations without re-running
  * the DuckDB oracle.
  *
  *   runMain graft.Snapshot save  /tmp/snap <sfDir> q1,q2,...
  *   runMain graft.Snapshot check /tmp/snap <sfDir> q1,q2,...
  */
object Snapshot {
  def main(args: Array[String]): Unit = {
    val mode = args(0) // save | check
    val outDir = args(1)
    val sfDir = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = 0
    names.foreach { n =>
      val df = Registry.byName(n).build(spark, sfDir)
      if (mode == "save") {
        df.write.mode("overwrite").parquet(s"$outDir/$n.parquet")
        println(s"SAVED $n")
      } else {
        val prev = spark.read.parquet(s"$outDir/$n.parquet")
        val cur = df
        val sameSchema = prev.schema.map(f => (f.name, f.dataType)).sortBy(_._1) ==
          cur.schema.map(f => (f.name, f.dataType)).sortBy(_._1)
        val cols = prev.columns.sorted.toSeq
        // canonical value: binary/array columns become Seqs (Array's ==
        // is reference equality -- identical bytes would read MISMATCH);
        // nested rows/maps normalize recursively
        def canon(v: Any): Any = v match {
          case a: Array[Byte] => a.toSeq
          case a: Array[_] => a.toSeq.map(canon)
          case s: scala.collection.Seq[_] => s.map(canon).toSeq
          case r: org.apache.spark.sql.Row => r.toSeq.map(canon)
          case m: scala.collection.Map[_, _] =>
            m.toSeq.map { case (k, x) => (canon(k), canon(x)) }
              .sortBy(_.toString())
          case x => x
        }
        // sort key: LENGTH-PREFIXED delimited field encodings -- a bare
        // delimiter join lets distinct rows collide (("ab","c") vs
        // ("a","bc") under "", or fields containing the delimiter) and
        // pair differently across the two sides, producing spurious
        // MISMATCH on genuinely identical outputs
        // 'N'/'V' tags keep SQL NULL distinct from the string "null"
        // AT EVERY NESTING LEVEL (String.valueOf renders a null inside
        // an array as 'null' too — Array(null) vs Array("null") would
        // tie in the sort and let identical outputs pair differently
        // across sides). canon has already normalized values to
        // primitives / Seqs / (k, v) tuples.
        def enc(v: Any): String = v match {
          case null => "N"
          case s: scala.collection.Seq[_] =>
            s.map(enc).mkString("A[", ",", "]")
          case (a, b) => s"T(${enc(a)},${enc(b)})"
          case x => val s = String.valueOf(x); s"V${s.length}:$s"
        }
        def key(row: Seq[Any]): String = row.map(enc).mkString("\u0001")
        def rows(d: org.apache.spark.sql.DataFrame) =
          d.select(cols.map(org.apache.spark.sql.functions.col): _*)
            .collect()
            .map(r => r.toSeq.map(canon))
            .sortBy(key)
        val ok = sameSchema && {
          val a = rows(prev); val b = rows(cur)
          a.length == b.length && a.zip(b).forall { case (x, y) => x == y }
        }
        if (!ok) failed += 1
        println(s"${if (ok) "MATCH" else "MISMATCH"} $n (schemaOk=$sameSchema)")
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
