package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.multimodal.ContainerMeta.ProbedMedia
import graft.multimodal.Multimodal.MediaRecord

/** Container-metadata probe over hand-built REAL container bytes: a
  * spec-constructed ISO-BMFF MP4 (ftyp + moov(mvhd + 2 trak(tkhd))), a
  * JDK-written WAV, and a Y4M stream — all through the production
  * mapPartitions path.
  */
class ContainerMetaSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  // ---- minimal ISO-BMFF writer (big-endian boxes) ----
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  /** mvhd v0: version+flags, ctime, mtime, timescale, duration, rest 0. */
  private def mvhd(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ Array.fill[Byte](80)(0))

  /** tkhd v0 (fixed 84-byte payload): width/height 16.16 at the end. */
  private def tkhd(w: Int, h: Int): Array[Byte] =
    box("tkhd", Array.fill[Byte](84 - 8)(0) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))

  private def mp4(timescale: Long, duration: Long,
      dims: Seq[(Int, Int)]): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(512) ++
      "isomiso2".getBytes("US-ASCII"))
    val traks = dims.map { case (w, h) => box("trak", tkhd(w, h)) }
    val moov = box("moov",
      mvhd(timescale, duration) ++ traks.flatten.toArray)
    ftyp ++ moov ++ box("mdat", Array.fill[Byte](32)(7))
  }

  test("MP4: duration, track count, first-track dimensions") {
    // 90000-tick timescale, 3 s duration, video 640x360 + audio 0x0
    val blob = mp4(90000L, 270000L, Seq((640, 360), (0, 0)))
    val info = ContainerMeta.probe(blob).get
    info.container shouldBe "mp4"
    info.duration_ms shouldBe 3000L
    info.n_tracks shouldBe 2
    info.width shouldBe 640
    info.height shouldBe 360
    // truncated mid-moov: probes to None, never throws
    ContainerMeta.probe(blob.take(40)) shouldBe None
    // 64-bit largesize path: rewrite ftyp with size==1 + largesize
    val ftypPayload = "isom".getBytes("US-ASCII") ++ be32(512) ++
      "isomiso2".getBytes("US-ASCII")
    val bigFtyp = be32(1L) ++ "ftyp".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0) ++ be32(16L + ftypPayload.length) ++
      ftypPayload
    val blob2 = bigFtyp ++ blob.drop(8 + ftypPayload.length)
    ContainerMeta.probe(blob2).get.duration_ms shouldBe 3000L
  }

  test("WAV: exact duration from data size / (rate * ch * bytes)") {
    import javax.sound.sampled._
    val samples = new Array[Byte](16000) // 1 s of 8 kHz 16-bit mono
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, 8000)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val info = ContainerMeta.probe(bos.toByteArray).get
    info.container shouldBe "wav"
    info.duration_ms shouldBe 1000L
    info.n_tracks shouldBe 1
  }

  test("Y4M: dimensions and exact frame count by stride walk") {
    // luma 4*2 = 8 bytes + 4:2:0 chroma 2*(2*1) = 4 bytes per frame
    val y4m = ("YUV4MPEG2 W4 H2 C420jpeg\n" +
      "FRAME\n" + "x" * (8 + 4) + "FRAME\n" + "y" * (8 + 4))
      .getBytes("US-ASCII")
    val info = ContainerMeta.probe(y4m).get
    info.container shouldBe "y4m"
    (info.width, info.height, info.n_frames) shouldBe ((4, 2, 2))
    // truncated last frame: the complete prefix still counts
    ContainerMeta.probe(y4m.dropRight(3)).get.n_frames shouldBe 1
  }

  test("unknown bytes probe to None; production mapPartitions path") {
    import spark.implicits._
    ContainerMeta.probe("just some text".getBytes) shouldBe None
    val media = Seq(
      MediaRecord(1L, "video", 0, 0, mp4(1000L, 2500L, Seq((16, 8)))),
      MediaRecord(2L, "text", 0, 0, "not a container".getBytes)).toDS()
    val probed = ContainerMeta.probeTable(media).collect()
    probed.map(_.doc_id).toSeq shouldBe Seq(1L)
    probed.head shouldBe ProbedMedia(1L, "mp4", 2500L, 1, -1, 16, 8)
  }
}
