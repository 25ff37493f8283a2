package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500 / WARC-1.0) ingest — the standard
  * container for web crawls (Common Crawl et al.), i.e. the raw input
  * of a web-scale training-data pipeline. Pure-JVM parser off the
  * public spec: each record is
  * `WARC/1.0\r\n` + header lines (`Name: value`) + `\r\n` +
  * `Content-Length` payload bytes + `\r\n\r\n`, records concatenated;
  * `.warc.gz` files are per-record (or whole-file) gzip MEMBERS, which
  * `GZIPInputStream` decodes as one concatenated stream.
  *
  * Scale shape: one WARC file = one self-contained record stream, so
  * the natural parallelism is per-FILE (Spark's `binaryFile` source;
  * Common Crawl ships ~1 GB segments in the thousands). Parsing is
  * `flatMap` over file rows — no shuffle; downstream ops see a normal
  * (url, type, date, content_type, payload) frame and prune columns
  * as usual. Malformed tails fail soft (parsed prefix is kept) — one
  * truncated segment must not kill a 100 TB ingest. */
object Warc {

  case class Record(url: String, warcType: String, date: String,
                    contentType: String, payload: Array[Byte])

  private val Gzip = Array[Byte](0x1f.toByte, 0x8b.toByte)

  /** Parse a (possibly gzipped) byte stream of concatenated WARC
    * records. Tolerant: stops at the first structural violation and
    * returns the records parsed so far. */
  def parseRecords(raw: Array[Byte]): Seq[Record] = {
    val bytes =
      if (raw.length >= 2 && raw(0) == Gzip(0) && raw(1) == Gzip(1)) {
        // multi-member gzip: GZIPInputStream reads ALL members.
        // Decompress incrementally and keep what decoded so far — a
        // segment cut mid-member must fail soft (parsed prefix kept),
        // same as plain-byte truncation below, not kill the task.
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(raw))
        // size hint clamped: raw.length * 4 overflows Int for ≥512 MiB
        // segments (Common Crawl ships ~1 GB) and a negative initial
        // size throws — outside the try, killing the task
        val acc = new java.io.ByteArrayOutputStream(
          math.min(raw.length.toLong * 4, Int.MaxValue - 8L).toInt)
        val buf = new Array[Byte](64 * 1024)
        try {
          var n = in.read(buf)
          while (n >= 0) { acc.write(buf, 0, n); n = in.read(buf) }
        } catch { case _: java.io.IOException => /* truncated member */ }
        finally in.close()
        acc.toByteArray
      } else raw
    val out = scala.collection.mutable.ArrayBuffer.empty[Record]
    var p = 0
    def line(): String = { // up to CRLF (spec-mandated line ending)
      var i = p
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) { // no CRLF before EOF: consume rest
        val s = new String(bytes, p, bytes.length - p, "UTF-8")
        p = bytes.length; s
      } else {
        val s = new String(bytes, p, i - p, "UTF-8"); p = i + 2; s
      }
    }
    while (p < bytes.length) {
      // skip inter-record blank lines
      while (p < bytes.length - 1 && bytes(p) == '\r' && bytes(p + 1) == '\n')
        p += 2
      if (p >= bytes.length) return out.toSeq
      val version = line()
      if (!version.startsWith("WARC/")) return out.toSeq
      var url = ""; var typ = ""; var date = ""; var ct = ""
      var len = -1L
      // collect header lines first, unfolding ISO 28500 continuations
      // (a line starting with SP/HT extends the PREVIOUS header's
      // value — naive per-line parsing would truncate folded URLs, or
      // worse, read a folded line containing "content-length:" as a
      // new header and desync every later record's payload offset)
      val headers = scala.collection.mutable.ArrayBuffer.empty[String]
      var h = line()
      while (h.nonEmpty) {
        if ((h.head == ' ' || h.head == '\t') && headers.nonEmpty)
          headers(headers.length - 1) = headers.last + " " + h.trim
        else headers += h
        h = line()
      }
      headers.foreach { h =>
        val i = h.indexOf(':')
        if (i > 0) {
          // Locale.ROOT: default-locale lowercasing breaks header
          // matching on e.g. tr-TR JVMs ("URI" -> "urı")
          val name = h.substring(0, i).trim
            .toLowerCase(java.util.Locale.ROOT)
          val value = h.substring(i + 1).trim
          name match {
            case "warc-target-uri" => url = value
            case "warc-type" => typ = value
            case "warc-date" => date = value
            case "content-type" => ct = value
            case "content-length" => len =
              try value.toLong catch { case _: NumberFormatException => -1L }
            case _ =>
          }
        }
      }
      // overflow-safe bound: compare len against the REMAINING bytes
      // (p + len could wrap a hostile Content-Length past Long range)
      if (len < 0 || len > (bytes.length - p).toLong) return out.toSeq
      out += Record(url, typ, date, ct,
        java.util.Arrays.copyOfRange(bytes, p, p + len.toInt))
      p += len.toInt
      // spec: two CRLFs close a record; the skip loop above eats them
    }
    out.toSeq
  }

  /** Crawl scan: WARC files (plain or .gz) → one row per record.
    * Per-file parallelism via the `binaryFile` source; parse is a
    * shuffle-free flatMap. `maxPartitionBytes` has no effect here —
    * binaryFile yields whole files; size executor memory for the
    * largest segment (Common Crawl: ~1 GB gz). */
  def readWarcFiles(spark: SparkSession, pathGlob: String): DataFrame =
    toRecords(spark.read.format("binaryFile").load(pathGlob))

  /** Streaming crawl ingest: segments LANDING in a bucket stream out
    * as records — `readStream` over the same binaryFile source, the
    * same shuffle-free parse. Composes directly with the standing
    * pipeline sinks (`Streaming.appendDedupedStream` /
    * `cleanCorpusStream` / `dsirScoreStream`): parse here, hand the
    * frame to the sink of choice. File sources track processed files
    * in the checkpoint, so a replayed segment re-parses idempotently. */
  def readWarcStream(spark: SparkSession, pathGlob: String): DataFrame =
    // streaming file sources require an explicit schema; binaryFile's
    // is fixed by the format
    toRecords(spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, " +
        "length BIGINT, content BINARY")
      .load(pathGlob))

  /** Per-URL latest-capture dedup over a crawl-record frame (the
    * re-crawl step: a URL captured in many segments/snapshots keeps
    * only its newest response). Ordering parses WARC-Date as a real
    * timestamp — raw string order misorders mixed-precision ISO 8601
    * ("…00Z" sorts AFTER "…00.999Z" because '.' < 'Z'), which WARC
    * 1.0/1.1 writer mixes produce; unparseable dates sort last. The
    * raw string, file, and size break exact ties deterministically.
    * One URL-keyed shuffle + a WindowGroupLimit-eligible rank-1
    * window — the canonical per-key top-1 at corpus scale (URL
    * cardinality partitions it; no skew beyond one URL's capture
    * count). Records without a target URI (warcinfo etc.) are
    * dropped — they describe segments, not pages. */
  def latestCapture(records: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("url"))
      .orderBy(col("date").cast("timestamp").desc_nulls_last,
        col("date").desc, col("file").desc, col("n_bytes").desc)
    records
      .where(col("warc_type") === "response" && length(col("url")) > 0)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** (path, content) segment rows → one row per parsed WARC record —
    * the parse half of `readWarcFiles`/`readWarcStream`, public so
    * in-memory segments (tests, the t87 synthesized crawl) run the
    * SAME shuffle-free flatMap as file-backed ones. */
  def records(files: DataFrame): DataFrame = toRecords(files)

  private def toRecords(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        parseRecords(content).map(r =>
          (path, r.url, r.warcType, r.date, r.contentType, r.payload))
      }
      .toDF("file", "url", "warc_type", "date", "content_type",
        "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
  }
}
