package graft

import graft.sources.Warc
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the WARC reader: random archives are WRITTEN by an
  * in-spec emitter that follows the ISO 28500 grammar independently of
  * the reader's code paths, in both plain and per-record-gzip layouts,
  * and every decoded field must match the generation plan — including
  * payloads full of record-delimiter bytes, empty bodies, absent URIs,
  * and multi-hundred-KB records. Torn files must refuse loudly. */
class WarcPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private case class Plan(
      rid: String, wtype: String, uri: Option[String], date: String,
      ctype: Option[String], payload: Array[Byte],
      httpStatus: Option[Int], httpCt: Option[String], body: Array[Byte])

  private def emit(p: Plan): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "WARC/1.0\r\n"
    sb ++= s"WARC-Type: ${p.wtype}\r\n"
    sb ++= s"WARC-Record-ID: ${p.rid}\r\n"
    sb ++= s"WARC-Date: ${p.date}\r\n"
    p.uri.foreach(u => sb ++= s"WARC-Target-URI: $u\r\n")
    p.ctype.foreach(c => sb ++= s"Content-Type: $c\r\n")
    sb ++= s"Content-Length: ${p.payload.length}\r\n\r\n"
    sb.toString.getBytes("UTF-8") ++ p.payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def randomPlans(rnd: scala.util.Random, n: Int): Seq[Plan] =
    (0 until n).map { i =>
      val rid = f"<urn:uuid:00000000-0000-0000-0000-${i}%012d>"
      val date = f"2026-08-${1 + rnd.nextInt(28)}%02dT${rnd.nextInt(24)}%02d:00:00Z"
      val kind = rnd.nextInt(4)
      if (kind == 0) {
        // raw metadata/warcinfo record, body may contain \r\n\r\n
        val body = (0 until rnd.nextInt(2000)).map(_ => rnd.nextInt(256).toByte).toArray ++
          "\r\n\r\ntrailing".getBytes("UTF-8")
        Plan(rid, if (i % 2 == 0) "warcinfo" else "metadata",
          if (rnd.nextBoolean()) Some(s"http://x/$i") else None, date,
          Some("application/warc-fields"), body, None, None, body)
      } else {
        val bodyLen = rnd.nextInt(3) match {
          case 0 => 0
          case 1 => rnd.nextInt(500)
          case _ => 100000 + rnd.nextInt(100000)
        }
        val body = new Array[Byte](bodyLen)
        rnd.nextBytes(body)
        val status = Seq(200, 301, 404, 500)(rnd.nextInt(4))
        val ct = Seq("text/html", "text/plain", "application/json")(rnd.nextInt(3))
        val head = (s"HTTP/1.1 $status X\r\nContent-Type: $ct\r\n" +
          s"Content-Length: $bodyLen\r\n\r\n").getBytes("UTF-8")
        Plan(rid, "response", Some(s"http://example.org/p$i"), date,
          Some("application/http; msgtype=response"), head ++ body,
          Some(status), Some(ct), body)
      }
    }

  test("fuzz: random archives decode field-for-field in plain and gzip layouts") {
    val rnd = new scala.util.Random(31L)
    val plans = randomPlans(rnd, 40)
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-fuzz")
    val (a, b) = plans.splitAt(23)
    java.nio.file.Files.write(dir.resolve("a.warc"),
      a.map(emit).reduce(_ ++ _))
    val gz = new java.io.ByteArrayOutputStream()
    b.foreach { p =>
      val g = new java.util.zip.GZIPOutputStream(gz)
      g.write(emit(p)); g.finish()
    }
    java.nio.file.Files.write(dir.resolve("b.warc.gz"), gz.toByteArray)

    val got = Warc.read(spark, dir.toString, maxRecordBytes = 1 << 20)
      .collect().map(r => r.getString(1) -> r).toMap
    assert(got.size == plans.size)
    plans.foreach { p =>
      val r = got(p.rid)
      assert(r.getString(0) == p.wtype, s"${p.rid} type")
      assert(Option(r.getString(3)) == p.uri, s"${p.rid} uri")
      assert(r.getTimestamp(2).toInstant == java.time.Instant.parse(p.date))
      assert(r.getLong(5) == p.payload.length, s"${p.rid} len")
      assert(Option(r.get(6)).map(_.asInstanceOf[Int]) == p.httpStatus, s"${p.rid} status")
      assert(Option(r.getString(7)) == p.httpCt, s"${p.rid} httpCt")
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](8), p.body), s"${p.rid} body")
    }
  }

  test("a torn file refuses loudly instead of presenting a shortened archive") {
    val rnd = new scala.util.Random(7L)
    val plans = randomPlans(rnd, 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-torn")
    val whole = plans.map(emit).reduce(_ ++ _)
    java.nio.file.Files.write(dir.resolve("t.warc"),
      whole.take(whole.length - plans.last.payload.length / 2 - 8))
    val e = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, dir.toString, maxRecordBytes = 1 << 20).collect()
    }
    assert(String.valueOf(e.getCause.getMessage).contains("truncated WARC record"),
      String.valueOf(e.getCause))
  }
}
