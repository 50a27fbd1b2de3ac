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
      conf: org.apache.hadoop.conf.Configuration): Iterator[Row] =
    recordIterator(new DataInputStream(open(f, conf)), f, maxRecordBytes)

  private def recordIterator(
      in: DataInputStream, label: String, maxRecordBytes: Int): Iterator[Row] = {
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
          try parseRecord(in, maxRecordBytes, label)
          catch {
            case e: EOFException =>
              in.close()
              throw new IllegalArgumentException(
                s"$label: truncated WARC record (unexpected EOF mid-record)", e)
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

  // ------------------------------------------------- gzip-member splits

  /** Bounds a raw stream to `limit` bytes — the range fence for
    * member-aligned splits (the gzip decoder then sees EOF exactly at the
    * next range's first member and stops cleanly). */
  private[graft] final class LimitedInputStream(in: InputStream, private var limit: Long)
      extends InputStream {
    override def read(): Int =
      if (limit <= 0) -1
      else { val b = in.read(); if (b >= 0) limit -= 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (limit <= 0) return -1
      val n = in.read(b, off, math.min(len.toLong, limit).toInt)
      if (n > 0) limit -= n
      n
    }
    // GZIPInputStream only crosses a member trailer into the next
    // concatenated member while available() > 0; inheriting
    // InputStream's constant 0 would report clean EOF mid-range whenever
    // the wrapping buffer drains exactly at a trailer — silently dropping
    // the rest of the split. Report >=1 while bytes remain (a blocked
    // underlying stream costs one blocking read, never a lost record);
    // exactly 0 only at the true range end, which keeps termination
    // correct because cuts are member-aligned.
    override def available(): Int =
      if (limit <= 0) 0
      else math.max(1, math.min(in.available().toLong, limit).toInt)
    override def close(): Unit = in.close()
  }

  /** True iff a verified WARC gzip member starts at `off`: inflate a
    * probe prefix from the offset and require the decompressed bytes to
    * open with `WARC/`. Compressed payload bytes can contain the gzip
    * magic, so candidates must prove themselves — a false candidate dies
    * here (bad deflate stream or wrong prefix), never in the decode. */
  private def isMemberStart(
      fs: org.apache.hadoop.fs.FileSystem, p: Path, off: Long): Boolean = {
    val raw = fs.open(p)
    try {
      raw.seek(off)
      val gz = new GZIPInputStream(new BufferedInputStream(raw, 1 << 14))
      val head = new Array[Byte](5)
      var got = 0
      while (got < 5) {
        val r = gz.read(head, got, 5 - got)
        if (r < 0) return false
        got += r
      }
      new String(head, StandardCharsets.US_ASCII) == "WARC/"
    } catch {
      case _: java.io.IOException => false // covers ZipException
    } finally raw.close()
  }

  /** First verified member start at-or-after `from` (scanning raw bytes
    * for the `1f 8b 08` magic, probe-verifying each candidate), or None
    * before `until`. */
  private def nextMemberStart(
      fs: org.apache.hadoop.fs.FileSystem, p: Path, from: Long,
      until: Long): Option[Long] = {
    val raw = fs.open(p)
    try {
      raw.seek(from)
      val in = new BufferedInputStream(raw, 1 << 16)
      var pos = from
      var w0 = -1; var w1 = -1 // rolling 2-byte window
      while (pos < until) {
        val b = in.read()
        if (b < 0) return None
        if (w0 == 0x1f && w1 == 0x8b && b == 0x08) {
          val cand = pos - 2
          if (isMemberStart(fs, p, cand)) return Some(cand)
        }
        w0 = w1; w1 = b; pos += 1
      }
      None
    } finally raw.close()
  }

  /** Read ONE `.warc.gz` segment with `splits`-way parallelism — the
    * SURVEY §12.b gap: [[read]] is one task per file, the right shape
    * when crawls arrive pre-sharded, but a single giant segment
    * serializes. Per-record gzip members (the Common Crawl layout) make
    * member starts legal split points; they are DISCOVERED, not indexed:
    * one tiny job probes the first verified member start at-or-after
    * each of the `splits−1` ideal byte cuts (O(splits) probes, each
    * scanning ~one record of raw bytes — never a full-file decode), then
    * the read job decodes each [cut, nextCut) range through a
    * byte-limited gzip stream, so every task parses whole members and
    * the union of ranges is record-identical to the sequential read
    * (spec-proven, including payloads that embed the gzip magic).
    * Plain `.warc` files refuse: without member framing there is no
    * verifiable split point. */
  def readSplit(
      spark: SparkSession, file: String, splits: Int,
      maxRecordBytes: Int = 64 << 20): DataFrame = {
    require(splits >= 1, s"readSplit: need splits >= 1, got $splits")
    require(file.toLowerCase.endsWith(".warc.gz"),
      s"readSplit: only per-record-gzip segments split safely, got $file " +
        "(plain .warc has no verifiable member boundaries — use read)")
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    val confBc = spark.sparkContext.broadcast(
      new graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    require(isMemberStart(fs, p, 0L),
      s"readSplit: $file does not open with a WARC gzip member at offset 0")
    val targets = (1 until splits).map(i => len * i / splits)
      .filter(t => t > 0 && t < len)
    val cuts: Array[Long] =
      if (targets.isEmpty) Array.empty
      else spark.sparkContext.parallelize(targets, targets.size)
        .flatMap { t =>
          val c = confBc.value.value
          val pp = new Path(file)
          nextMemberStart(pp.getFileSystem(c), pp, t, len)
        }
        .collect().distinct.sorted
    val bounds = (0L +: cuts :+ len).distinct.sorted
    val ranges = bounds.zip(bounds.tail).filter { case (s, e) => e > s }
    val rdd = spark.sparkContext
      .parallelize(ranges.toSeq, ranges.length)
      .flatMap { case (s, e) =>
        val c = confBc.value.value
        val pp = new Path(file)
        val raw = pp.getFileSystem(c).open(pp)
        raw.seek(s)
        val in = new DataInputStream(new GZIPInputStream(
          new BufferedInputStream(new LimitedInputStream(raw, e - s), 1 << 16), 1 << 16))
        recordIterator(in, s"$file[$s,$e)", maxRecordBytes)
      }
    spark.createDataFrame(rdd, schema)
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
