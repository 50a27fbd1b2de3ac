package graft

import graft.sources.Warc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the WARC reader against generator fixtures that an INDEPENDENT
  * spec-driven re-parser validated at generation time
  * (tools/make_warc_fixtures.py) — plain and per-record-gzip layouts. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = new java.io.File("src/test/resources/warc").getAbsolutePath

  private def rid(n: Int) = f"<urn:uuid:00000000-0000-0000-0000-${n}%012d>"

  test("reads plain + gzip member files; one task per file; all records decode") {
    val df = Warc.read(spark, dir)
    assert(df.rdd.getNumPartitions == 2, "one task per file")
    val rows = df.orderBy("record_id").collect()
    assert(rows.length == 7)
    val byId = rows.map(r => r.getString(1) -> r).toMap
    // warcinfo: no HTTP split, raw payload
    val info = byId(rid(1))
    assert(info.getString(0) == "warcinfo")
    assert(info.get(6) == null && info.get(7) == null)
    assert(new String(info.getAs[Array[Byte]](8), "UTF-8").startsWith("software: graft-fixture"))
    // HTML response: status/content-type split off, UTF-8 body intact
    val html = byId(rid(2))
    assert(html.getInt(6) == 200)
    assert(html.getString(7) == "text/html; charset=utf-8")
    val body = new String(html.getAs[Array[Byte]](8), "UTF-8")
    assert(body.contains("Página uno") && body.startsWith("<html>"))
    assert(html.getString(3) == "http://example.com/one")
    assert(html.getTimestamp(2).toInstant == java.time.Instant.parse("2026-08-14T10:00:01Z"))
    // the length-driven guarantee: a body containing \r\n\r\n survives whole
    assert(new String(byId(rid(3)).getAs[Array[Byte]](8), "UTF-8")
      == "first\r\n\r\nsecond\r\n\r\nthird")
    // request records split the HTTP head too (no status line -> null status)
    val req = byId(rid(4))
    assert(req.getString(0) == "request" && req.get(6) == null)
    // 404 and empty-body records
    assert(byId(rid(5)).getInt(6) == 404)
    assert(byId(rid(6)).getAs[Array[Byte]](8).length == 0)
  }

  test("readSplit: member-aligned ranges are record-identical to the sequential read") {
    // synthesize a many-member segment with per-record gzip framing; some
    // payloads deliberately EMBED the gzip magic (1f 8b 08) so candidate
    // verification, not magic scanning alone, decides the split points
    val rnd = new java.util.Random(5L)
    val f = java.nio.file.Files.createTempDirectory("graft-warc-split")
      .resolve("big.warc.gz").toFile
    val out = new java.io.FileOutputStream(f)
    (1 to 120).foreach { i =>
      val decoy = Array[Byte](0x1f.toByte, 0x8b.toByte, 0x08.toByte)
      val noise = new Array[Byte](40 + rnd.nextInt(200))
      rnd.nextBytes(noise)
      val body = ("payload %04d ".format(i).getBytes("UTF-8") ++ decoy ++ noise)
      val rec = (s"WARC/1.0\r\n" +
        s"WARC-Type: resource\r\n" +
        f"WARC-Record-ID: <urn:uuid:11111111-0000-0000-0000-$i%012d>\r\n" +
        s"Content-Length: ${body.length}\r\n" +
        "\r\n").getBytes("UTF-8") ++ body ++ "\r\n\r\n".getBytes("UTF-8")
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(rec)
      gz.finish() // one member per record, stream stays open
    }
    out.close()

    val seq = Warc.read(spark, f.getAbsolutePath)
      .orderBy("record_id").collect().toSeq
    assert(seq.length == 120)
    for (splits <- Seq(1, 4, 7)) {
      val par = Warc.readSplit(spark, f.getAbsolutePath, splits)
      if (splits > 1)
        assert(par.rdd.getNumPartitions > 1, s"splits=$splits must use >1 task")
      val rows = par.orderBy("record_id").collect().toSeq
      assert(rows == seq, s"splits=$splits: split read must be record-identical")
    }
    // plain .warc has no member framing: refuse rather than guess
    val e = intercept[IllegalArgumentException] {
      Warc.readSplit(spark, new java.io.File(dir, "sample_a.warc").getAbsolutePath, 2)
    }
    assert(e.getMessage.contains("per-record-gzip"))
  }

  test("LimitedInputStream.available crosses member trailers when the buffer drains") {
    // Regression: GZIPInputStream only continues past a member trailer into
    // the next concatenated member while available() > 0 (or >26 leftover
    // bytes sit in the inflater). A LimitedInputStream inheriting
    // InputStream's constant-0 available() reports clean EOF whenever the
    // wrapping BufferedInputStream drains exactly at a trailer — dropping
    // every later member in the range. Reproduce that alignment exactly:
    // an underlying stream that (a) never returns bytes across a member
    // boundary in one read and (b) reports available() = 0, like a drained
    // buffer over a seekable file stream.
    val payloads = (1 to 3).map(i => s"WARC/member $i payload ${"x" * 50}")
    val memberBytes = payloads.map { s =>
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(s.getBytes("UTF-8")); gz.close()
      bos.toByteArray
    }
    val all = memberBytes.reduce(_ ++ _)
    val boundaries = memberBytes.scanLeft(0)(_ + _.length).tail
    class ChunkedZeroAvailable extends java.io.InputStream {
      private var pos = 0
      override def read(): Int =
        if (pos >= all.length) -1 else { val b = all(pos) & 0xff; pos += 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (pos >= all.length) return -1
        val stop = boundaries.find(_ > pos).getOrElse(all.length)
        val n = math.min(len, stop - pos)
        System.arraycopy(all, pos, b, off, n); pos += n; n
      }
      override def available(): Int = 0
    }
    val limited = new Warc.LimitedInputStream(new ChunkedZeroAvailable, all.length.toLong)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.BufferedInputStream(limited, 1 << 16), 1 << 16)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var r = in.read(buf)
    while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
    assert(out.toString("UTF-8") == payloads.mkString(""),
      "all concatenated members must decode through the range fence")
    // and the fence still terminates: at the true range end available() is 0
    val spent = new Warc.LimitedInputStream(new ChunkedZeroAvailable, 0L)
    assert(spent.available() == 0 && spent.read() == -1)
  }

  test("htmlDocs keeps only 200 text/html responses, decoded as strings") {
    val docs = Warc.htmlDocs(spark, dir).orderBy("record_id").collect()
    assert(docs.map(_.getString(0)).toSeq == Seq(rid(2), rid(6)))
    assert(docs.head.getString(3).contains("Hello crawl world &amp; friends"))
  }

  test("oversized records refuse loudly instead of buffering unbounded") {
    val e = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, dir, maxRecordBytes = 16).collect()
    }
    assert(e.getCause != null &&
      String.valueOf(e.getCause.getMessage).contains("maxRecordBytes"),
      String.valueOf(e.getCause))
  }

  test("crawl-to-corpus composition: htmlDocs feeds stripHtml") {
    val clean = graft.operators.Curation.stripHtml(
      Warc.htmlDocs(spark, dir), "html", "clean_text")
      .where(length(col("clean_text")) > 0)
      .select("record_id", "clean_text").collect()
    assert(clean.length == 1)
    assert(clean.head.getString(1) == "Página uno Hello crawl world & friends")
  }
}
