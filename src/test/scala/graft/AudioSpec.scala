package graft

import graft.multimodal.Audio
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class AudioSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The pattern DEFINITION both engines share (scaladoc on
    * [[Audio.wavPayload]]) — the spec's independent arithmetic model:
    * 16-bit bijective phase + high-word slope block (round 12; the
    * round-10 form realized only 65536 distinct profiles and merged
    * q153's DIV-5 clusters past ~327k docs). */
  private def pat(seed: Long, i: Long): Long =
    (((31L + 2L * ((seed / 65536) % 256)) * i + (1777L * seed) % 65536) % 65536) - 32768

  test("WAV payload round-trips bit-exactly through the real JDK codec") {
    val s = spark
    import s.implicits._
    val n = 2048
    val df = Seq((5L, 7L, n), (6L, 7L, n), (7L, 40L, n))
      .toDF("doc_id", "seed", "ns")
    val wavs = Audio.withWavPayload(df, "doc_id", "seed", "ns")
    // full-payload features at window == n reduce to whole-signal sums:
    // if ANY sample had been perturbed by the codec, the position-weighted
    // fp would move (weights (j+1)^2 are distinct per position)
    // id -> (rate, sumAbs, energy, fp)
    val rows = Audio.wavFeatures(wavs, "doc_id", "payload", windowSamples = n)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    def model(seed: Long): (Long, Long, Long) = {
      var sa = 0L; var en = 0L; var fp = 0L
      (0 until n).foreach { i =>
        val v = pat(seed, i)
        sa += math.abs(v); en += v * v; fp += v * (i + 1L) * (i + 1L)
      }
      (sa, en, fp)
    }
    val m7 = model(7L)
    assert(rows(5L) == ((8000, m7._1, m7._2, m7._3)),
      "decoded features must equal the arithmetic model (codec is lossless)")
    assert(rows(5L) == rows(6L), "equal seeds must give byte-identical payloads")
    val m40 = model(40L)
    assert(rows(7L) == ((8000, m40._1, m40._2, m40._3)))
    assert(rows(5L) != rows(7L), "distinct seeds must differ")
  }

  test("wavFeatures windows exactly; refuses a non-dividing window") {
    val s = spark
    import s.implicits._
    val wavs = Audio.withWavPayload(
      Seq((1L, 3L, 512)).toDF("doc_id", "seed", "ns"), "doc_id", "seed", "ns")
    val f = Audio.wavFeatures(wavs, "doc_id", "payload", windowSamples = 128)
      .orderBy("window_idx").collect()
    assert(f.length == 4 && f.forall(_.getInt(2) == 4))
    // window 2 recomputed from the model with in-window positions
    var sa = 0L; var en = 0L; var fp = 0L
    (0 until 128).foreach { j =>
      val v = pat(3L, 256 + j)
      sa += math.abs(v); en += v * v; fp += v * (j + 1L) * (j + 1L)
    }
    assert((f(2).getLong(4), f(2).getLong(5), f(2).getLong(6)) == ((sa, en, fp)))
    val err = intercept[org.apache.spark.SparkException] {
      Audio.wavFeatures(wavs, "doc_id", "payload", windowSamples = 100).collect()
    }
    assert(err.getMessage.contains("length % 100"))
  }

  test("audioFingerprint: delta-energy bits match the model; dedup pairs = brute force") {
    val s = spark
    import s.implicits._
    val n = 65 * 64
    def fpModel(seed: Long): Long = {
      val e = Array.tabulate(65) { w =>
        (0 until 64).map { j =>
          val v = pat(seed, w * 64L + j); v * v
        }.sum
      }
      (0 until 64).foldLeft(0L)((h, b) => if (e(b + 1) > e(b)) h | (1L << b) else h)
    }
    val docs = (0L until 60L).map(i => (i, i % 7, n)).toDF("doc_id", "seed", "ns")
    val wavs = Audio.withWavPayload(docs, "doc_id", "seed", "ns")
    val got = Audio.audioFingerprint(wavs, "doc_id", "payload", windowSamples = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 60L).foreach { i =>
      assert(got(i) == fpModel(i % 7), s"fingerprint mismatch for doc $i")
    }
    // banded pairs == brute force over the model fingerprints (banding
    // completeness for hamming <= 3 is the pigeonhole theorem; this pins it)
    val brute = (for {
      a <- 0L until 60L; b <- (a + 1) until 60L
      h = java.lang.Long.bitCount(fpModel(a % 7) ^ fpModel(b % 7))
      if h <= 3
    } yield (a, b, h)).toSet
    val pairs = Audio.nearDupAudio(wavs, "doc_id", "payload", windowSamples = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == brute, "banded pairs must equal brute force")
    assert(pairs.exists(_._3 == 0), "same-seed exact dups must surface")
  }

  test("adjacent-phase seeds are near-dups, distant phases are not") {
    val s = spark
    import s.implicits._
    val n = 65 * 64
    // seeds 0..96 as in q153 — measure the hamming profile of the REAL
    // decoded fingerprints: phase-adjacent seeds must sit within a few
    // bits, phase-opposed seeds far away (the structure the threshold cuts)
    val docs = Seq((0L, 0L, n), (1L, 1L, n), (2L, 48L, n), (3L, 65536L, n))
      .toDF("doc_id", "seed", "ns")
    val wavs = Audio.withWavPayload(docs, "doc_id", "seed", "ns")
    val fp = Audio.audioFingerprint(wavs, "doc_id", "payload", windowSamples = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val near = java.lang.Long.bitCount(fp(0L) ^ fp(1L))
    val far = java.lang.Long.bitCount(fp(0L) ^ fp(2L))
    assert(near <= 6, s"adjacent phase should flip few delta bits, got $near")
    assert(far > near, s"distant phase ($far) must exceed adjacent ($near)")
    // a different slope BLOCK (seed 65536: same phase as seed 0 — the
    // 16-bit phase is bijective in seed mod 65536, round 12 — next slope
    // word) must not read as near: the distinct-profile universe grows
    // with the slope term, so phase proximity alone cannot densify
    // near-dups past 16.7M payloads
    val cross = java.lang.Long.bitCount(fp(0L) ^ fp(3L))
    assert(cross > 6, s"cross-block profiles must be far, got $cross")
  }
}
