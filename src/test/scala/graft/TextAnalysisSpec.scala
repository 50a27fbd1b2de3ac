package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def deflateLen(s: String): Long = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.finish()
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    n
  }

  test("compressionRatio matches a direct Deflater fold exactly") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog and keeps on running",
      2L -> ("spam " * 200).trim, // highly repetitive
      3L -> (1 to 120).map(i => (i * 2654435761L % 977).toString).mkString(" "),
      4L -> "")
    val got = texts.toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(got, "doc_id", "text")
      .orderBy("doc_id").collect()
    texts.zip(out).foreach { case ((id, t), row) =>
      val raw = t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
      val comp = deflateLen(t)
      assert(row.getLong(0) == id)
      assert(row.getLong(1) == raw, s"raw bytes for doc $id")
      assert(row.getLong(2) == comp, s"deflate bytes for doc $id")
      val ratio = if (raw == 0) 1.0 else math.rint(comp.toDouble / raw * 1e6) / 1e6
      assert(row.getDouble(3) == ratio, s"ratio for doc $id")
    }
    // the repetitiveness signal orders as expected
    val byId = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byId(2L) < byId(1L) && byId(1L) < 1.0)
  }
}
