package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-Lines ingest/sink — the de-facto interchange format for LLM
  * training corpora (The Pile, RedPajama, Dolma, FineWeb all ship as
  * `.jsonl`/`.jsonl.gz`/`.jsonl.zst`: one JSON document object per
  * line). Built entirely on Spark's native JSON source — text-file
  * splitting, codec detection (`.gz` et al.), and per-line parse all
  * inherit Spark's distributed machinery, so a directory of thousands
  * of shards reads as one frame with per-file parallelism and column
  * pruning into the parse (Spark's JacksonParser skips unprojected
  * fields).
  *
  * Corrupt-line contract (the part raw `spark.read.json` gets wrong
  * by default): real corpus shards contain truncated lines (killed
  * writers), interleaved garbage, and schema drift. PERMISSIVE mode
  * with an explicit corrupt-record column keeps every input line
  * accounted for — a parsed row XOR a quarantined raw line — so
  * ingest can alert on corruption rate instead of silently dropping
  * data (`DROPMALFORMED`) or killing a 100 TB backfill on one bad
  * byte (`FAILFAST`). `readCounted` materializes that contract as
  * (clean frame, quarantine frame) without a second file pass: both
  * derive from ONE cached parse.
  *
  * Schema is REQUIRED, not inferred: inference scans every shard
  * twice and unions drifting field sets into chaos; a corpus reader
  * declares its contract. (`sample` exists for exploration.) */
object Jsonl {

  val CorruptCol = "_corrupt"

  /** Make `.jsonl.zst` shards readable: append [[GraftZstdCodec]] to
    * the Hadoop codec list (extension-matched by
    * CompressionCodecFactory), preserving the defaults and any
    * user-configured codecs. Idempotent; called by every read path.
    * NOTE: setting `io.compression.codecs` REPLACES ServiceLoader
    * codec discovery, so when the key was unset the list is seeded
    * from `CompressionCodecFactory.getCodecClasses` — the discovered
    * set (Snappy/LZ4/Deflate/native-Zstandard and anything a user
    * registered via ServiceLoader), not a hardcoded subset that
    * would silently drop extension resolution session-wide. */
  def registerZstd(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "io.compression.codecs"
    val cls = classOf[GraftZstdCodec].getName
    val cur = conf.get(key)
    if (cur == null) {
      val discovered = org.apache.hadoop.io.compress
        .CompressionCodecFactory.getCodecClasses(conf)
      val names = new scala.collection.mutable.ArrayBuffer[String]()
      discovered.forEach(c => names += c.getName)
      conf.set(key, (names.filterNot(_ == cls) :+ cls).mkString(","))
    } else if (!cur.split(",").map(_.trim).contains(cls))
      conf.set(key, cur + "," + cls)
  }

  /** Read `.jsonl`(.gz) files under `path` with an explicit document
    * schema; malformed lines land raw in `_corrupt` instead of being
    * dropped. The returned frame has `schema`'s fields plus the
    * `_corrupt` string column (null for clean rows). */
  def read(spark: SparkSession, path: String,
           schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"document schema may not declare a '$CorruptCol' field")
    registerZstd(spark)
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType,
        nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      // one doc per LINE is the jsonl contract; multiLine=false is
      // Spark's default but load-bearing here (multiLine parses the
      // whole file as one value and kills split parallelism)
      .option("multiLine", "false")
      .json(path)
  }

  /** The ingest-with-quarantine shape: (clean, corrupt) frames off
    * one parse. `clean` carries exactly `schema`'s columns; `corrupt`
    * carries the raw offending lines. A PERMISSIVE parse emits a row
    * per input line, so `clean.count + corrupt.count` = input lines —
    * the accounting identity a corruption-rate alert needs. */
  def readCounted(spark: SparkSession, path: String,
                  schema: StructType): (DataFrame, DataFrame) = {
    // NOTE: a line that is valid JSON but mismatches the schema in
    // every declared field (e.g. `{}`) parses as all-null with a null
    // _corrupt — that is Spark's PERMISSIVE semantics ("missing
    // fields are null"), not corruption; only unparseable text lands
    // in quarantine.
    // BOTH frames parse off the TEXT source via from_json (same
    // Jackson parser, same options as the native reader): the native
    // json source refuses any query whose referenced columns reduce
    // to the corrupt column alone (QUERY_ONLY_CORRUPT_RECORD_COLUMN
    // — which `corrupt` always does, and `clean.count()` does after
    // column pruning), and its documented workaround — cache the
    // whole parse — is the wrong trade for a corpus-scale ingest.
    // Cost: each materialized frame is one text scan; Catalyst's
    // json-expression optimization still prunes unused fields out of
    // the from_json for narrow projections over `clean`. `read()`
    // stays on the native source for quarantine-free consumers.
    registerZstd(spark)
    val lines = spark.read.text(path).select(col("value").as("line"))
    val parsed = parseLines(lines, "line", schema)
    val clean = parsed.where(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val corrupt = parsed.where(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, corrupt)
  }

  /** Serialize `cols` of `df` as one JSON object per row — the
    * in-plan half of the sink, exposed so tests and in-memory
    * round-trips share the exact production serialization. */
  def toJsonLines(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(to_json(struct(cols.map(col): _*)).as("line"))

  /** Write `df` as sharded `.jsonl.gz` under `path`. Text-source
    * writes shard per partition — the caller controls file count via
    * its own repartition (the same knob as every parquet sink). */
  def write(df: DataFrame, cols: Seq[String], path: String): Unit =
    toJsonLines(df, cols)
      .write.mode("overwrite")
      .option("compression", "gzip")
      .text(path)

  /** Write `df` as sharded `.jsonl.zst` under `path` — the format
    * real corpora (Dolma, FineWeb) actually release. Same sharding
    * contract as [[write]]; the codec is [[GraftZstdCodec]]
    * (zstd-jni, no native libhadoop needed). */
  def writeZst(df: DataFrame, cols: Seq[String], path: String): Unit = {
    registerZstd(df.sparkSession)
    toJsonLines(df, cols)
      .write.mode("overwrite")
      .option("compression", classOf[GraftZstdCodec].getName)
      .text(path)
  }

  /** Parse a column of JSONL text with the same corrupt-line contract
    * as the file reader — for streams and in-memory round-trips.
    * Emits `schema`'s fields plus `_corrupt`. */
  def parseLines(lines: DataFrame, lineCol: String,
                 schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"document schema may not declare a '$CorruptCol' field")
    val parsed: Column = from_json(col(lineCol),
      schema.add(StructField(CorruptCol, StringType, nullable = true)),
      Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> CorruptCol).asJava)
    // from_json(null) is a null STRUCT, which `__p.*` explodes into
    // all-null fields with a null _corrupt — a null input line would
    // silently count as a CLEAN row and break the module's accounting
    // identity (clean + corrupt = input lines). Files never produce
    // null lines, but streaming callers can; quarantine them with a
    // sentinel so they stay visible on the corrupt side.
    lines
      .select(parsed.as("__p"), col(lineCol).isNull.as("__null_line"))
      .select(schema.fieldNames.map(f => col(s"__p.$f")).toSeq :+
        when(col("__null_line"), lit("<null input line>"))
          .otherwise(col(s"__p.$CorruptCol")).as(CorruptCol): _*)
  }

  private implicit class MapOps(m: Map[String, String]) {
    def asJava: java.util.Map[String, String] = {
      val jm = new java.util.HashMap[String, String]()
      m.foreach { case (k, v) => jm.put(k, v) }
      jm
    }
  }
}
