package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native reader for WARC web-archive files (ISO 28500 — the public
  * format Common Crawl and every crawler-side training-data pipeline
  * ingests). The reference stops at the WRDS/SAS boundary; a crawl
  * boundary is the equivalent entry point for the text-curation stack
  * here (SURVEY §2.8): WARC → HTTP response bodies →
  * [[graft.operators.Curation.stripHtml]] → every downstream operator.
  *
  * Format (WARC/1.0-1.1): records of `WARC/1.x\r\n`, `Name: value\r\n`
  * header lines, a blank line, exactly `Content-Length` payload bytes,
  * then `\r\n\r\n`. Payload parsing is LENGTH-DRIVEN (never delimiter
  * scanning — bodies legally contain `\r\n\r\n`). For `response` /
  * `request` records the payload is an HTTP message: the status/request
  * line and headers are split off and the HTTP body is exposed
  * separately. `.warc.gz` files are concatenated per-record gzip members;
  * `GZIPInputStream` streams across member boundaries, so one sequential
  * pass decodes the whole file.
  *
  * ==Scale shape==
  * Like [[Sas7bdat]]: a WARC file is a sequential stream (gzip members
  * are the only split points and finding them means scanning), so
  * parallelism is PER FILE — exactly how crawl archives arrive (Common
  * Crawl ships ~100k ~1 GB segment files per snapshot; a directory read
  * is one task per segment). Records stream through a bounded buffer;
  * `maxRecordBytes` REFUSES oversized records loudly rather than
  * silently OOMing an executor.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("warc_date", TimestampType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("body", BinaryType, nullable = true)))

  /** One parsed record; `body` is the HTTP body for response/request
    * records, the raw payload otherwise. */
  private def parseRecord(
      in: DataInputStream, maxRecordBytes: Int, where: String): Option[Row] = {
    val first = readLine(in) match {
      case None => return None
      case Some(l) if l.isEmpty => // tolerate stray blank lines between records
        var l2 = readLine(in)
        while (l2.exists(_.isEmpty)) l2 = readLine(in)
        l2 match { case None => return None; case Some(v) => v }
      case Some(l) => l
    }
    require(first.startsWith("WARC/"),
      s"$where: expected a WARC/1.x version line, got '${first.take(40)}'")
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var line = readLine(in).getOrElse(
      throw new IllegalArgumentException(s"$where: EOF inside record headers"))
    while (line.nonEmpty) {
      val i = line.indexOf(':')
      require(i > 0, s"$where: malformed header line '${line.take(60)}'")
      headers(line.substring(0, i).trim.toLowerCase) = line.substring(i + 1).trim
      line = readLine(in).getOrElse(
        throw new IllegalArgumentException(s"$where: EOF inside record headers"))
    }
    val len = headers.getOrElse("content-length",
      throw new IllegalArgumentException(s"$where: record without Content-Length")).toLong
    require(len <= maxRecordBytes,
      s"$where: record of $len bytes exceeds maxRecordBytes=$maxRecordBytes — " +
        "raise the limit explicitly rather than buffering unbounded payloads")
    val payload = new Array[Byte](len.toInt)
    in.readFully(payload)
    // trailing \r\n\r\n (tolerate \n\n)
    skipRecordTrailer(in)

    val wtype = headers.get("warc-type").orNull
    val ts = headers.get("warc-date").map(parseWarcDate).orNull
    var httpStatus: Integer = null
    var httpCt: String = null
    var body = payload
    if ((wtype == "response" || wtype == "request") &&
        headers.get("content-type").exists(_.startsWith("application/http"))) {
      val (status, ct, off) = parseHttpHead(payload)
      httpStatus = status
      httpCt = ct
      body = java.util.Arrays.copyOfRange(payload, off, payload.length)
    }
    Some(Row(
      wtype,
      headers.get("warc-record-id").orNull,
      ts,
      headers.get("warc-target-uri").orNull,
      headers.get("content-type").orNull,
      len,
      httpStatus,
      httpCt,
      body))
  }

  /** `YYYY-MM-DDThh:mm:ssZ` (w14:1.0 allows fractional seconds) → UTC
    * timestamp. */
  private def parseWarcDate(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  /** Split an HTTP message head: (status-or-null, content-type-or-null,
    * body offset). The head/body boundary is the first CRLFCRLF (LFLF
    * tolerated) — legal here because HTTP HEADERS cannot contain a blank
    * line; only the head is scanned. */
  private def parseHttpHead(p: Array[Byte]): (Integer, String, Int) = {
    var i = 0
    var boundary = -1
    var boundaryLen = 0
    while (boundary < 0 && i < p.length - 1) {
      if (p(i) == '\n' &&
          (i + 1 < p.length && p(i + 1) == '\n')) { boundary = i; boundaryLen = 2 }
      else if (p(i) == '\n' && i + 2 < p.length && p(i + 1) == '\r' && p(i + 2) == '\n') {
        boundary = i; boundaryLen = 3
      }
      i += 1
    }
    if (boundary < 0) return (null, null, 0) // not an HTTP head — raw payload
    val head = new String(p, 0, boundary, StandardCharsets.ISO_8859_1)
    val lines = head.split("\r?\n")
    val status: Integer =
      if (lines.nonEmpty && lines(0).startsWith("HTTP/")) {
        val parts = lines(0).split(" ")
        if (parts.length >= 2 && parts(1).forall(_.isDigit)) Integer.valueOf(parts(1))
        else null
      } else null
    val ct = lines.drop(1).collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring("content-type:".length).trim
    }.orNull
    (status, ct, boundary + boundaryLen)
  }

  /** One header line, CRLF-terminated (bare LF tolerated); None at EOF. */
  private def readLine(in: DataInputStream): Option[String] = {
    val buf = new java.io.ByteArrayOutputStream(80)
    var b = in.read()
    if (b < 0) return None
    while (b >= 0 && b != '\n') {
      buf.write(b)
      b = in.read()
    }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
            else bytes.length
    Some(new String(bytes, 0, n, StandardCharsets.UTF_8))
  }

  private def skipRecordTrailer(in: DataInputStream): Unit = {
    // exactly two line terminators follow the payload; tolerate LF-only
    var seen = 0
    while (seen < 2) {
      readLine(in) match {
        case Some(l) if l.isEmpty => seen += 1
        case Some(l) => throw new IllegalArgumentException(
          s"unexpected bytes after record payload: '${l.take(40)}' — " +
            "Content-Length disagrees with the record body")
        case None => seen = 2 // EOF right after the last record is fine
      }
    }
  }

  private def open(f: String, conf: org.apache.hadoop.conf.Configuration): InputStream = {
    val fp = new Path(f)
    val fs = fp.getFileSystem(conf)
    val raw = new BufferedInputStream(fs.open(fp), 1 << 16)
    if (f.toLowerCase.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16) else raw
  }

  private def recordIterator(
      f: String, maxRecordBytes: Int,
      conf: org.apache.hadoop.conf.Configuration): Iterator[Row] = {
    val in = new DataInputStream(open(f, conf))
    // a consumer that stops early (limit/take, downstream failure) never
    // reaches the clean-EOF close below — close with the task instead of
    // leaking the handle (ADVICE r6)
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit] { _ =>
        try in.close() catch { case _: java.io.IOException => () }
      })
    new Iterator[Row] {
      private var nextRow: Option[Row] = fetch()
      private def fetch(): Option[Row] = {
        // clean EOF is only ever BETWEEN records (parseRecord returns
        // None); an EOFException mid-record means a torn file and MUST
        // fail loudly — swallowing it would silently drop the truncated
        // record and present a shortened archive as complete
        val parsed =
          try parseRecord(in, maxRecordBytes, f)
          catch {
            case e: EOFException =>
              in.close()
              throw new IllegalArgumentException(
                s"$f: truncated WARC record (unexpected EOF mid-record)", e)
          }
        if (parsed.isEmpty) in.close()
        parsed
      }
      def hasNext: Boolean = nextRow.isDefined
      def next(): Row = {
        val r = nextRow.get
        nextRow = fetch()
        r
      }
    }
  }

  /** Read one `.warc`/`.warc.gz` file or a directory of them — one task
    * per file (see class doc). */
  def read(
      spark: SparkSession, path: String,
      maxRecordBytes: Int = 64 << 20): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath).toSeq
          .filter { f =>
            val n = f.getName.toLowerCase
            n.endsWith(".warc") || n.endsWith(".warc.gz")
          }
          .sortBy(_.getName).map(_.toString)
      else Seq(p.toString)
    require(files.nonEmpty, s"no .warc/.warc.gz files under $path")
    // ship the SESSION Hadoop conf into the tasks — a fresh Configuration()
    // on the executor loses credentials/endpoint settings that the
    // driver-side listing above used, so object-store paths that list fine
    // would fail (or bind the wrong FileSystem) at task time (ADVICE r6)
    val confBc = spark.sparkContext.broadcast(
      new graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val rdd = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap(recordIterator(_, maxRecordBytes, confBc.value.value))
    spark.createDataFrame(rdd, schema)
  }

  /** The crawl→corpus step: HTML response bodies as text documents —
    * (record_id, target_uri, warc_date, html). Compose with
    * [[graft.operators.Curation.stripHtml]] for clean text. */
  def htmlDocs(
      spark: SparkSession, path: String,
      maxRecordBytes: Int = 64 << 20): DataFrame = {
    import org.apache.spark.sql.functions._
    read(spark, path, maxRecordBytes)
      .where(col("warc_type") === "response" &&
        col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html"))
      .select(col("record_id"), col("target_uri"), col("warc_date"),
        // decode is a projection; charset sniffing beyond UTF-8 is the
        // caller's concern (crawl pipelines normalize to UTF-8 upstream)
        col("body").cast("string").as("html"))
  }
}
