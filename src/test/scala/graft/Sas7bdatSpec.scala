package graft

import graft.sources.Sas7bdat
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native sas7bdat reader against fixtures that pandas.read_sas
  * (an independent public implementation of the format) validates at
  * generation time — see tools/make_sas7bdat_fixtures.py. Every fixture's
  * expected values are re-derived here from the same closed forms the
  * generator used, so the reader is checked value-for-value, not
  * smoke-tested. */
class Sas7bdatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = new java.io.File("src/test/resources/sas7bdat").getAbsolutePath

  private def expected(n: Int): Seq[(Double, Option[Double], String, String)] =
    (0 until n).map { i =>
      (i + 1.0,
        if (i % 7 == 3) None else Some(i * 0.5 - 3.25),
        f"row_$i%03d",
        if (i % 2 == 0) "Y" else "N")
    }

  private def checkStandard(file: String, n: Int): Unit = {
    val df = Sas7bdat.read(spark, s"$dir/$file")
    assert(df.schema == StructType(Seq(
      StructField("id", DoubleType), StructField("ratio", DoubleType),
      StructField("name", StringType), StructField("flag", StringType))))
    val got = df.orderBy("id").collect().map { r =>
      (r.getDouble(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getString(2), r.getString(3))
    }.toSeq
    assert(got == expected(n), file)
  }

  test("u64 little-endian, meta page + multiple data pages") {
    checkStandard("u64_pages.sas7bdat", 200)
  }

  test("u64 little-endian mix page (rows 8-aligned after subheader pointers)") {
    checkStandard("u64_mix.sas7bdat", 25)
  }

  test("32-bit little-endian mix page (4-byte ints, 12-byte pointers)") {
    checkStandard("x86_mix.sas7bdat", 25)
  }

  test("u64 big-endian (byte-swapped header, pointers, doubles)") {
    checkStandard("u64_bigend.sas7bdat", 25)
  }

  test("RLE-compressed (SASYZCRL) rows decode across spilled meta pages") {
    // fixture: 40 rows as compressed subheaders over 2048-byte pages; the
    // generator's greedy encoder exercises literal copies (short + long),
    // blank/zero fills (short + long) and byte repeats, all of which
    // pandas.read_sas accepted at generation time
    checkStandard("u64_rle.sas7bdat", 40)
  }

  test("RDC-compressed (SASYZCR2) rows decode: literals, RLE fills, overlapped copies") {
    // fixture: the standard 4 columns plus a `blurb` crafted so the
    // generator's greedy RDC encoder emits every command family — literal
    // bits, short RLE (pad runs <= 18), long RLE (>= 19), short copies
    // (6-byte echo at offset 9) and long self-overlapping copies (the
    // period-5 "PATnn" repetition) — all accepted by pandas.read_sas at
    // generation time
    val df = Sas7bdat.read(spark, s"$dir/u64_rdc.sas7bdat")
    assert(df.schema == StructType(Seq(
      StructField("id", DoubleType), StructField("ratio", DoubleType),
      StructField("name", StringType), StructField("flag", StringType),
      StructField("blurb", StringType))))
    val got = df.orderBy("id").collect().map { r =>
      (r.getDouble(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getString(2), r.getString(3), r.getString(4))
    }.toSeq
    val exp = (0 until 40).map { i =>
      (i + 1.0,
        if (i % 7 == 3) None else Some(i * 0.5 - 3.25),
        f"row_$i%03d",
        if (i % 2 == 0) "Y" else "N",
        f"u$i%02dvkz-!#u$i%02dvkz" + (f"PAT$i%02d" * 5))
    }
    assert(got == exp)
  }

  test("DATE/DATETIME formats become DateType/TimestampType at the SAS epoch") {
    val df = Sas7bdat.read(spark, s"$dir/u64_dates.sas7bdat")
    assert(df.schema == StructType(Seq(
      StructField("id", DoubleType), StructField("d1", DateType),
      StructField("ts1", TimestampType), StructField("plain", DoubleType))))
    val got = df.orderBy("id").collect()
    val epoch = java.time.LocalDate.of(1960, 1, 1)
    (0 until 25).foreach { i =>
      val r = got(i)
      assert(r.getDouble(0) == i + 1.0)
      if (i == 5) assert(r.isNullAt(1))
      else assert(r.getDate(1).toLocalDate == epoch.plusDays(20000 + 31L * i), s"row $i")
      if (i == 9) assert(r.isNullAt(2))
      else {
        val expMillis = math.round((1.9e9 + 3600.0 * i) * 1000) - 315619200L * 1000
        assert(r.getTimestamp(2).getTime == expMillis, s"row $i")
      }
      assert(r.getDouble(3) == i * 1.25)
    }
  }

  test("library directory read: one task per file, schemas enforced") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-saslib")
    for (f <- Seq("u64_pages.sas7bdat", "u64_mix.sas7bdat"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(dir, f), tmp.resolve(f))
    val df = Graft.readSas7bdat(spark, tmp.toString)
    assert(df.rdd.getNumPartitions == 2, "expected one task per file")
    assert(df.count() == 225)
    // per-fingerprint: 200-row file contributes ids 1..200, mix file 1..25
    assert(df.where(org.apache.spark.sql.functions.col("id") === 7.0).count() == 2)
    // a schema-mismatched file in the library fails loudly
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, "u64_dates.sas7bdat"),
      tmp.resolve("u64_dates.sas7bdat"))
    val e = intercept[IllegalArgumentException] {
      Graft.readSas7bdat(spark, tmp.toString)
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("header encoding byte drives string decoding: windows-1251 and shift_jis") {
    // both fixtures are pandas-validated with encoding="infer", so the
    // header code -> codec mapping itself is cross-checked by an
    // independent reader at generation time
    val cyr = Sas7bdat.read(spark, s"$dir/u64_cp1251.sas7bdat")
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(cyr == Seq("Москва", "Привет мир", "данные", "Санкт-Петербург", "тест"))
    val sjis = Sas7bdat.read(spark, s"$dir/u64_sjis.sas7bdat")
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(sjis == Seq("東京", "こんにちは", "データ", "大阪市", "テスト"))
  }

  test("non-SAS input fails with a clear error") {
    val junk = java.nio.file.Files.createTempFile("not-sas", ".sas7bdat")
    java.nio.file.Files.write(junk, Array.fill(4096)(0x41.toByte))
    val e = intercept[IllegalArgumentException] {
      Sas7bdat.read(spark, junk.toString)
    }
    assert(e.getMessage.contains("magic"))
  }
}
