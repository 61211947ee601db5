package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import Multimodal._

/** Pins [[Multimodal.audioFingerprint]] — the Goertzel-filterbank /
  * Haitsma–Kalker sign-bit audio fingerprint — and its distributed
  * near-dup path through the SAME banded [[Multimodal.nearDupPairs]]
  * the image dHash uses.
  */
class AudioFingerprintSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  /** Real WAV container via the JDK writer (same builder as
    * MultimodalSpec — 16-bit PCM little-endian mono).
    */
  private def encodeWav(samples: Array[Int]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** A deterministic multi-tone clip: three sinusoids whose relative
    * levels drift across the clip, so band-energy differences change
    * sign between windows and the fingerprint uses its full width.
    */
  private def clip(n: Int, gain: Double = 0.5,
      noise: Int => Double = _ => 0.0): Array[Int] =
    Array.tabulate(n) { i =>
      val t = i.toDouble
      val drift = 0.5 + 0.5 * StrictMath.sin(2 * math.Pi * t / n)
      val v = gain * (
        8000 * drift * StrictMath.sin(2 * math.Pi * 0.04 * t) +
          6000 * (1 - drift) * StrictMath.sin(2 * math.Pi * 0.16 * t) +
          3000 * StrictMath.sin(2 * math.Pi * 0.32 * t)) + noise(i)
      math.max(-32768, math.min(32767, v.round.toInt))
    }

  private def fp(samples: Array[Int]): Long =
    audioFingerprint(SniffingCodec.decode("audio", encodeWav(samples)))

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("fingerprint is deterministic and uses its bit width") {
    val s = clip(2200)
    val f1 = fp(s)
    val f2 = fp(s)
    f1 shouldBe f2
    // a structured multi-tone clip should set a non-trivial bit mix
    java.lang.Long.bitCount(f1) should be > 8
    java.lang.Long.bitCount(f1) should be < 55
  }

  test("gain invariance: a volume change flips zero bits") {
    // energies scale by gain^2, every double-difference keeps its sign
    val loud = fp(clip(2200, gain = 0.9))
    val quiet = fp(clip(2200, gain = 0.3))
    hamming(loud, quiet) shouldBe 0
  }

  test("small additive noise moves few bits; different audio is far") {
    val base = fp(clip(2200))
    val noisy = fp(clip(2200,
      noise = i => 150.0 * StrictMath.sin(2 * math.Pi * 0.23 * i + 1.0)))
    hamming(base, noisy) should be <= 3
    // a clip with the opposite spectral drift is a different recording
    val other = fp(Array.tabulate(2200) { i =>
      val t = i.toDouble
      val v = 9000 * StrictMath.sin(2 * math.Pi * 0.08 * t) *
        (if ((i / 100) % 2 == 0) 1.0 else 0.1)
      math.max(-32768, math.min(32767, v.round.toInt))
    })
    hamming(base, other) should be > 10
  }

  test("audioSignatures + banded nearDupPairs find the near-dup pair only") {
    import spark.implicits._
    val a = clip(2200)
    val aNoisy = clip(2200,
      noise = i => 150.0 * StrictMath.sin(2 * math.Pi * 0.23 * i + 1.0))
    val b = Array.tabulate(2200)(i =>
      (5000 * StrictMath.sin(2 * math.Pi * 0.25 * i)).round.toInt)
    val media = Seq(
      MediaRecord(1L, "audio", 0, 0, encodeWav(a)),
      MediaRecord(2L, "audio", 0, 0, encodeWav(aNoisy)),
      MediaRecord(3L, "audio", 0, 0, encodeWav(b))
    ).toDS().repartition(2)
    val sigs = audioSignatures(media)
    val pairs = nearDupPairs(sigs, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((1L, 2L))
  }
}
