package graft

import graft.multimodal.Images
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The REAL image path: JDK ImageIO decode, integer feature math, actual
  * pixel resizes — driver-model differential everywhere (the pattern is
  * re-derived arithmetically, never through the codec under test). */
class ImagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def px(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((7L * x + 3L * y + id) % 256).toInt,
    ((5L * x + 11L * y + 2 * id) % 256).toInt,
    ((13L * x + y + 3 * id) % 256).toInt)

  test("PNG round-trip is lossless: features equal the arithmetic model") {
    val s = spark
    import s.implicits._
    val ids = Seq(1L, 2L, 97L)
    val feats = Images.imageFeatures(
      Images.withPatternPayload(ids.toDF("doc_id"), "doc_id", 32, 24),
      "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    ids.foreach { id =>
      var sr = 0L; var sg = 0L; var sb = 0L
      val blocks = new Array[Long](64)
      for (y <- 0 until 24; x <- 0 until 32) {
        val (r, g, b) = px(id, x, y)
        sr += r; sg += g; sb += b
        blocks((y / 3) * 8 + (x / 4)) += 299L * r + 587L * g + 114L * b
      }
      val total = blocks.sum
      var hash = 0L
      for (j <- 0 until 64) if (blocks(j) * 64L > total) hash |= (1L << j)
      val row = feats(id)
      assert(row.getInt(1) == 32 && row.getInt(2) == 24)
      assert((row.getLong(3), row.getLong(4), row.getLong(5)) == ((sr, sg, sb)), s"id=$id sums")
      assert(row.getLong(9) == hash, s"id=$id ahash")
      assert(row.getDouble(6) == math.rint(sr.toDouble / 768 * 1e6) / 1e6)
    }
  }

  test("resize samples exact nearest-neighbor source pixels and re-encodes losslessly") {
    val s = spark
    import s.implicits._
    val resized = Images.resize(
      Images.withPatternPayload(Seq(5L).toDF("doc_id"), "doc_id", 32, 24),
      "doc_id", "payload", targetW = 8, targetH = 8)
    val row = resized.head()
    assert(row.getInt(2) == 8 && row.getInt(3) == 8)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](1)))
    assert(img.getWidth == 8 && img.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val (r, g, b) = px(5L, x * 32 / 8, y * 24 / 8)
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF) == ((r, g, b)),
        s"pixel ($x,$y)")
    }
  }

  test("JPEG decodes through the same path (lossy: features near the pattern, not exact)") {
    val s = spark
    import s.implicits._
    // re-encode the pattern as JPEG driver-side, then run the SAME
    // feature pass over the lossy payload
    val png = Images.withPatternPayload(Seq(9L).toDF("doc_id"), "doc_id", 32, 24)
      .head().getAs[Array[Byte]](1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val jout = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", jout), "JDK JPEG writer unavailable")
    val feats = Images.imageFeatures(
      Seq((9L, jout.toByteArray)).toDF("doc_id", "payload"), "doc_id", "payload")
      .head()
    assert(feats.getInt(1) == 32 && feats.getInt(2) == 24)
    // lossy but close: channel means within a few intensity levels
    val exact = Images.imageFeatures(
      Seq((9L, png)).toDF("doc_id", "payload"), "doc_id", "payload").head()
    Seq(6, 7, 8).foreach { c =>
      assert(math.abs(feats.getDouble(c) - exact.getDouble(c)) < 8.0,
        s"jpeg mean drifted too far at col $c: ${feats.getDouble(c)} vs ${exact.getDouble(c)}")
    }
  }

  test("pHash matches an independent driver model and survives JPEG recompression") {
    val s = spark
    import s.implicits._
    // independent model: same published algorithm re-derived here from
    // the pattern ARITHMETIC (never through the operator's code path)
    def modelPhash(id: Long): Long = {
      val n = 32
      val luma = Array.tabulate(n, n) { (y, x) =>
        val (r, g, b) = px(id, x * 32 / n, y * 24 / n)
        299L * r + 587L * g + 114L * b
      }
      // the published fixed-point basis: cos quantized to x2^14 integers
      val c = Array.tabulate(8, n)((k, i) =>
        math.round(math.cos((2 * i + 1) * k * math.Pi / (2 * n)) * 16384.0))
      val t = Array.tabulate(n, 8)((y, k) => (0 until n).map(i => luma(y)(i) * c(k)(i)).sum)
      val d = Array.tabulate(8, 8)((k, x) => (0 until n).map(i => t(i)(x) * c(k)(i)).sum)
      val block = (for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0) yield d(u)(v)).toArray
      val sorted = block.sorted
      val med2 = sorted(30) + sorted(31)
      var h = 0L; var j = 0
      for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0) {
        if (2L * d(u)(v) > med2) h |= (1L << j); j += 1
      }
      h
    }
    val ids = Seq(2L, 7L, 31L)
    val got = Images.pHash64(
      Images.withPatternPayload(ids.toDF("doc_id"), "doc_id", 32, 24),
      "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach(id => assert(got(id) == modelPhash(id), s"id=$id"))

    // robustness: JPEG-recompress one image; pHash stays within a few
    // bits of the PNG original (the reason pHash exists over aHash)
    val png = Images.withPatternPayload(Seq(7L).toDF("doc_id"), "doc_id", 32, 24)
      .head().getAs[Array[Byte]](1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val jout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jout)
    val jHash = Images.pHash64(
      Seq((7L, jout.toByteArray)).toDF("doc_id", "payload"), "doc_id", "payload")
      .head().getLong(1)
    val ham = java.lang.Long.bitCount(got(7L) ^ jHash)
    assert(ham <= 6, s"pHash drifted $ham bits under JPEG recompression")
    // and distinct patterns stay far apart
    assert(java.lang.Long.bitCount(got(2L) ^ got(31L)) > 10)
  }

  test("animated GIF round-trips bit-exactly: frame features equal the pattern arithmetic") {
    val s = spark
    import s.implicits._
    // independent model from the pattern DEFINITION (never the operator)
    def model(seed: Long, f: Int): (Long, Long) = {
      var sum = 0L; var fp = 0L
      for (y <- 0 until 24; x <- 0 until 32) {
        val v = ((7L * x + 3L * y + 11L * f + seed) % 256)
        val w = (y * 32 + x + 1).toLong
        sum += v; fp += v * w * w
      }
      (sum, fp)
    }
    // frame pattern depends only on c = 11f + seed, so seed 100's family
    // {100, 111, 122} is disjoint from seed 9's {9, 20, 31, 42, 53, 64}
    val df = Seq((1L, 9L, 4), (2L, 9L, 6), (3L, 100L, 3)).toDF("doc_id", "seed", "nf")
    val gifs = Images.withAnimatedGifPayload(df, "doc_id", "seed", "nf", 32, 24)
    val rows = Images.gifFrames(gifs, "doc_id", "payload")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5), r.getLong(6))).toMap
    assert(rows.size == 4 + 6 + 3, "one row per frame per payload")
    for ((id, seed, nf) <- Seq((1L, 9L, 4), (2L, 9L, 6), (3L, 100L, 3)); f <- 0 until nf) {
      val (esum, efp) = model(seed, f)
      assert(rows((id, f)) == ((nf, 32, 24, esum, efp)),
        s"id=$id f=$f: ${rows((id, f))} vs ($nf,32,24,$esum,$efp)")
    }
    // same-seed payloads share their common frame prefix bit-identically
    // (the duplicate structure the overlap join keys on)
    (0 until 4).foreach { f =>
      assert(rows((1L, f))._5 == rows((2L, f))._5, s"frame $f fp must match across same-seed docs")
    }
    // and a different seed shares none
    val fps3 = (0 until 3).map(f => rows((3L, f))._5).toSet
    val fps1 = (0 until 4).map(f => rows((1L, f))._5).toSet
    assert((fps3 & fps1).isEmpty, "different seeds must not collide here")
  }

  test("gifFrames refuses undecodable payloads loudly") {
    val s = spark
    import s.implicits._
    val junk = Seq((1L, "definitely not a gif".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      graft.multimodal.Images.gifFrames(junk, "doc_id", "payload").collect()
    }
    assert(e.getCause != null, "decode failure must surface, not yield zero rows")
  }

  test("non-image payloads and bad geometry refuse loudly") {
    val s = spark
    import s.implicits._
    val junk = Seq((1L, "not a png".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Images.imageFeatures(junk, "doc_id", "payload").collect()
    }
    assert(String.valueOf(e.getCause.getMessage).contains("not a decodable image"))
    val odd = Images.withPatternPayload(Seq(1L).toDF("doc_id"), "doc_id", 30, 24)
    val e2 = intercept[org.apache.spark.SparkException] {
      Images.imageFeatures(odd, "doc_id", "payload").collect()
    }
    assert(String.valueOf(e2.getCause.getMessage).contains("divisible by 8"))
  }

  test("ahash feeds the existing hamming near-dup machinery on real pixels") {
    val s = spark
    import s.implicits._
    // two ids whose patterns differ only by a tiny id offset share most
    // blocks; a distant id should differ more. Sanity: hashes exist and
    // close ids are closer in hamming than far ones ON AVERAGE.
    val feats = Images.imageFeatures(
      Images.withPatternPayload((1L to 40L).toDF("doc_id"), "doc_id", 32, 24),
      "doc_id", "payload")
      .select("doc_id", "ahash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val near = (1L to 39L).map(i => ham(feats(i), feats(i + 1))).sum / 39.0
    val far = (1L to 20L).map(i => ham(feats(i), feats(i + 20))).sum / 20.0
    assert(near <= far + 8, s"near=$near far=$far") // weak sanity, pattern-dependent
    assert(feats.values.toSet.size > 1)
  }
}
