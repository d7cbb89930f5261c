package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table registry: name → declared schema + loader.
  *
  * The reference infers every schema at read time (19×
  * `inferSchema=True`, reference dag-transform.py:134-163) which costs an
  * extra pass per scan and breaks silently on upstream drift. Here every
  * table has an explicit `StructType` (SURVEY §1.4): scans carry a declared
  * schema, so CSV needs no inference pass and Parquet scans prune columns
  * against a known catalog. At 100 TB an inference pass per read is a full
  * extra scan — declared schemas are a scale requirement, not a style choice.
  */
object Catalog {

  /** One fixture table: explicit schema, parquet file layout
    * `<dir>/<name>.parquet`, plus an optional normalization applied after
    * the scan (used for physical-vs-logical type mismatches) and an
    * optional loader override (used when the scan itself must adapt to
    * the file's physical types, e.g. events.ts — see [[eventsFrom]]). */
  final case class TableDef(
      name: String, schema: StructType,
      post: DataFrame => DataFrame = identity,
      loader: Option[(SparkSession, String) => DataFrame] = None) {
    def path(sfDir: String): String = s"$sfDir/$name.parquet"
    /** Schema-declared parquet scan — no footer-merge/inference job. */
    def load(spark: SparkSession, sfDir: String): DataFrame =
      loader match {
        case Some(f) => f(spark, sfDir)
        case None    => post(spark.read.schema(schema).parquet(path(sfDir)))
      }
  }

  val region = TableDef("region", StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType))))

  val nation = TableDef("nation", StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType))))

  val customer = TableDef("customer", StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType))))

  val supplier = TableDef("supplier", StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType))))

  val part = TableDef("part", StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType))))

  val orders = TableDef("orders", StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType))))

  val lineitem = TableDef("lineitem", StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType))))

  // events.ts has shipped as BOTH parquet TIMESTAMP(MICROS) and raw
  // INT64 nanoseconds across fixture generations. Spark 4 maps µs to
  // TimestampType natively but refuses TIMESTAMP(NANOS)
  // ([PARQUET_TYPE_ILLEGAL]), so the loader probes the footer (driver-side
  // metadata read, cached per path — no job) and branches: µs files scan
  // straight to TimestampType; ns files scan as LongType and truncate to
  // µs (matching DuckDB's epoch_ns(ts)//1000). Either way callers see one
  // logical schema: ts TIMESTAMP(µs).
  val events = TableDef("events", StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType))),
    loader = Some((spark, sfDir) => eventsFrom(spark, s"$sfDir/events.parquet")))

  /** events schema as stored when ts is raw INT64 nanoseconds. */
  val eventsNsSchema: StructType = StructType(events.schema.map {
    case f if f.name == "ts" => f.copy(dataType = LongType)
    case f => f
  })

  private val tsNanosCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** True when the parquet file(s) at `path` store `ts` as INT64
    * nanoseconds — either annotated TIMESTAMP(NANOS) or an unannotated
    * INT64. Reads one footer via parquet-hadoop (no Spark job); result is
    * cached per path. `path` may be a single file or a directory of
    * parquet files (first file wins — fixtures are unit-homogeneous). */
  def tsIsNanos(spark: SparkSession, path: String): Boolean =
    tsNanosCache.computeIfAbsent(path, { p =>
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import org.apache.parquet.schema.LogicalTypeAnnotation
      import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
      val conf = spark.sessionState.newHadoopConf()
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(hp).isDirectory)
          fs.listStatus(hp).map(_.getPath)
            .filter(q => q.getName.endsWith(".parquet"))
        else Array(hp)
      if (files.isEmpty)
        // nothing to probe (e.g. a stream dir awaiting its first file):
        // assume the current µs layout; a later ns file would fail the
        // read loudly rather than silently mis-scale
        java.lang.Boolean.FALSE
      else {
        val reader =
          ParquetFileReader.open(HadoopInputFile.fromPath(files.head, conf))
        try {
          val schema = reader.getFileMetaData.getSchema
          schema.getType(schema.getFieldIndex("ts"))
            .asPrimitiveType().getLogicalTypeAnnotation match {
            case t: TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case null => true // bare INT64: the ns-era physical layout
            case _    => false
          }
        } finally reader.close()
      }
    })

  /** Unit-aware events scan over an explicit path (file or directory):
    * always yields the logical schema (ts TIMESTAMP(µs)) regardless of the
    * file's physical unit. */
  def eventsFrom(spark: SparkSession, path: String): DataFrame =
    if (tsIsNanos(spark, path))
      spark.read.schema(eventsNsSchema).parquet(path)
        .withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else spark.read.schema(events.schema).parquet(path)

  val documents = TableDef("documents", StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType))))

  val embeddings = TableDef("embeddings", StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType))))

  val all: Seq[TableDef] = Seq(
    region, nation, customer, supplier, part, orders, lineitem,
    events, documents, embeddings)

  private val byName: Map[String, TableDef] = all.map(t => t.name -> t).toMap

  /** Load a fixture table by name with its declared schema. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    byName(name).load(spark, sfDir)

  /** Declared-schema CSV scan (S2 analog, reference dag-transform.py:
    * 134-163): the catalog supplies the schema, so — unlike the
    * reference's 19× `inferSchema=True` — reading CSV costs exactly one
    * pass, same as parquet. Layout: `<csvDir>/<name>.csv/` as written by
    * `df.write.option("header",true).csv(...)`. */
  def loadCsv(spark: SparkSession, csvDir: String, name: String): DataFrame = {
    val t = byName(name)
    t.post(spark.read.schema(t.schema).option("header", "true")
      .csv(s"$csvDir/${t.name}.csv"))
  }

  /** Declared-schema JSON-lines scan (data-lake interchange format):
    * like [[loadCsv]], the catalog supplies the schema so the read costs
    * one pass — no sampling inference job. Layout: `<jsonDir>/<name>.json/`
    * as written by `df.write.json(...)`. */
  def loadJson(spark: SparkSession, jsonDir: String, name: String): DataFrame = {
    val t = byName(name)
    t.post(spark.read.schema(t.schema).json(s"$jsonDir/${t.name}.json"))
  }

  /** Declared-schema ORC scan — the second columnar format next to
    * parquet, same predicate-pushdown/column-pruning machinery (ORC jars
    * ship with Spark). Layout: `<orcDir>/<name>.orc/` as written by
    * `df.write.orc(...)`. */
  def loadOrc(spark: SparkSession, orcDir: String, name: String): DataFrame = {
    val t = byName(name)
    t.post(spark.read.schema(t.schema).orc(s"$orcDir/${t.name}.orc"))
  }

  /** S1 analog: JDBC full-table scan (reference dag-extract.py:61-62,
    * `MySqlHook.get_pandas_df("SELECT * FROM {table}")` — one machine,
    * one cursor). Here the read is split into `numPartitions`
    * range-partitioned queries over `partitionCol`, so every executor
    * pulls its own slice concurrently — the only JDBC-ingest shape that
    * survives a table too big for one connection. Bounds are probed with
    * a single MIN/MAX query (an indexed O(1) lookup on a sane schema)
    * rather than asked of the caller, matching the reference's
    * zero-config "give me the table" contract.
    *
    * `partitionCol` must be an integral column; an empty table degrades
    * to a single-partition read. */
  def loadJdbc(spark: SparkSession, url: String, table: String,
      partitionCol: String, numPartitions: Int): DataFrame = {
    val bounds = spark.read.format("jdbc")
      .option("url", url)
      // ANSI-quoted: Spark's JDBC writer creates case-sensitive lowercase
      // identifiers, which an unquoted reference would upcase away
      .option("query",
        s"""SELECT MIN("$partitionCol") AS lo, MAX("$partitionCol") AS hi FROM $table""")
      .load().collect()(0)
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    if (bounds.isNullAt(0)) base.load()
    else base
      .option("partitionColumn", partitionCol)
      .option("lowerBound", bounds.get(0).toString)
      .option("upperBound", bounds.get(1).toString)
      .option("numPartitions", numPartitions.toString)
      .load()
  }

  /** Incremental (watermark) JDBC pull: rows with `watermarkCol` STRICTLY
    * greater than `lastSeen` — the delta-extract every recurring ingest
    * runs instead of the reference's full-table pull per day
    * (dag-extract.py:62 re-reads everything daily). The predicate is
    * pushed into the source query, so the database scans its index range
    * and ships only the delta; partitioned like [[loadJdbc]] but with
    * MIN/MAX probed over the delta only. Pair with
    * `Incremental.publishUpsert` for ingest-merge-publish; track the new
    * high-water mark with `max(watermarkCol)` on the returned frame
    * BEFORE merging (the merged table may carry older rows). */
  def loadJdbcIncremental(spark: SparkSession, url: String, table: String,
      watermarkCol: String, lastSeen: Long, partitionCol: String,
      numPartitions: Int): DataFrame = {
    val delta = s"""SELECT * FROM $table WHERE "$watermarkCol" > $lastSeen"""
    val bounds = spark.read.format("jdbc")
      .option("url", url)
      .option("query",
        s"""SELECT MIN("$partitionCol") AS lo, MAX("$partitionCol") AS hi
           |FROM ($delta) d""".stripMargin.replace('\n', ' '))
      .load().collect()(0)
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", s"($delta) d")
    if (bounds.isNullAt(0)) base.load()
    else base
      .option("partitionColumn", partitionCol)
      .option("lowerBound", bounds.get(0).toString)
      .option("upperBound", bounds.get(1).toString)
      .option("numPartitions", numPartitions.toString)
      .load()
  }

  /** Load every fixture table (used by pipelines / the runner). */
  def loadAll(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    byName.map { case (n, t) => n -> t.load(spark, sfDir) }
}
