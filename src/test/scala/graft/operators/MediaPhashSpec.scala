package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class MediaPhashSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def hashOf(payloads: (Long, String)*): Map[Long, Long] =
    Multimodal.perceptualHashes(
      payloads.toSeq.toDF("doc_id", "text")
        .select($"doc_id", encode($"text", "utf-8").as("content")),
      "doc_id", "content")
      .as[(Long, Long)].collect().toMap

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private val base =
    "the quick brown fox jumps over the lazy dog while the engine shuffles " +
      "partitions and prunes columns across a very large corpus of documents"

  it("is locality-sensitive: identical = 0 bits, small edit = few bits, unrelated = many") {
    val h = hashOf(
      1L -> base,
      2L -> base,
      3L -> (base.substring(0, 40) + "zzzz" + base.substring(44)), // in-place edit
      4L -> "completely unrelated text about storage formats and audit tables and nothing else at all in common here")
    hamming(h(1L), h(2L)) shouldBe 0
    hamming(h(1L), h(3L)) should be <= 6
    hamming(h(1L), h(4L)) should be > 3
  }

  it("empty and null payloads hash to zero") {
    val h = hashOf(1L -> "")
    h(1L) shouldBe 0L
    val withNull = Seq((2L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "content")
    Multimodal.perceptualHashes(withNull, "doc_id", "content")
      .as[(Long, Long)].collect().toMap.apply(2L) shouldBe 0L
  }

  it("uses only 60 bits (positive BIGINT range for SQL oracles)") {
    val h = hashOf(1L -> base, 2L -> (base * 3))
    h.values.foreach { v =>
      v should be >= 0L
      (v >>> 60) shouldBe 0L
    }
  }

  it("fingerprintPairs over phash matches brute force at hamming<=3 and never goes all-pairs") {
    val docs = (0L until 30L).map { i =>
      val t = s"document number $i with some shared boilerplate text " + base
      (i, t)
    } ++ Seq((100L, base), (101L, base.substring(0, 40) + "xxxx" + base.substring(44)))
    val media = docs.toDF("doc_id", "text")
      .select($"doc_id", encode($"text", "utf-8").as("content"))
    val hashed = Multimodal.perceptualHashes(media, "doc_id", "content")
      .select($"doc_id", $"phash".as("sh"))
    val pairs = Dedup.fingerprintPairs(hashed, maxHamming = 3)
    // plan shape: blocked equi-join on (quad, qval), never a cartesian
    pairs.queryExecution.executedPlan.toString should not include "Cartesian"

    val got = pairs.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val hs = hashed.as[(Long, Long)].collect()
    val want = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && hamming(ha, hb) <= 3
    } yield (ia, ib)).toSet
    got shouldBe want
    got should contain((100L, 101L))
  }

  // ------------------------------------------------------------------
  // REAL bytes: the ImageIO kernels, not the stubs
  // ------------------------------------------------------------------

  private def gradientPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255 / math.max(w - 1, 1)) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  it("imageKernel decodes real PNG and BMP bytes to true dimensions") {
    val png = gradientPng(48, 32)
    val bmp = Multimodal.blockImageBytes(Array.fill(60)(128), 6, 10, 10, 6)
    val media = Seq((1L, png), (2L, bmp), (3L, "not an image".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "content")
    val got = Multimodal.decodePartitioned(media, "doc_id", "content",
        Multimodal.imageKernel)(
        org.apache.spark.sql.Encoders.product[Multimodal.DecodedImage])
      .collect().map(d => d.id -> ((d.width, d.height, d.channels))).toMap
    got(1L) shouldBe ((48L, 32L, 3))
    got(2L) shouldBe ((60L, 60L, 3))
    got(3L) shouldBe ((0L, 0L, 0)) // undecodable flows, never throws
    got(4L) shouldBe ((0L, 0L, 0))
  }

  it("pHashImageKernel over block images reproduces the cell-value formula exactly") {
    // one light half, one dark half: bits 0..29 dark (below mean), 30..59
    // light (above mean) -> hash = high 30 bits of the 60
    val vals = Array.tabulate(60)(k => if (k < 30) 10 else 200)
    val expected = (30 until 60).foldLeft(0L)((h, k) => h | (1L << k))
    val media = Seq((1L, Multimodal.blockImageBytes(vals, 6, 10, 10, 6)))
      .toDF("doc_id", "content")
    val h = Multimodal.perceptualHashesReal(media, "doc_id", "content")
      .as[(Long, Long)].collect().toMap
    h(1L) shouldBe expected
  }

  it("real pHash is locality-sensitive on real pixels and 60-bit bounded") {
    val a = Array.tabulate(60)(k => (k * 4) % 256)
    val b = a.clone(); b(7) = 255; b(12) = 0 // two cells repainted
    val c = Array.tabulate(60)(k => ((59 - k) * 4) % 256) // reversed ramp
    val media = Seq(
      (1L, Multimodal.blockImageBytes(a, 6, 10, 10, 6)),
      (2L, Multimodal.blockImageBytes(a, 6, 10, 10, 6)),
      (3L, Multimodal.blockImageBytes(b, 6, 10, 10, 6)),
      (4L, Multimodal.blockImageBytes(c, 6, 10, 10, 6)),
      (5L, "garbage bytes".getBytes("UTF-8"))).toDF("doc_id", "content")
    val h = Multimodal.perceptualHashesReal(media, "doc_id", "content")
      .as[(Long, Long)].collect().toMap
    hamming(h(1L), h(2L)) shouldBe 0
    hamming(h(1L), h(3L)) should be <= 4
    hamming(h(1L), h(4L)) should be > 10
    h(5L) shouldBe -1L // undecodable sentinel
    Seq(h(1L), h(3L), h(4L)).foreach { v =>
      v should be >= 0L
      (v >>> 60) shouldBe 0L
    }
  }

  it("pHash is invariant to the container format (PNG vs BMP, same pixels)") {
    val vals = Array.tabulate(60)(k => (k * 7 + 3) % 256)
    val bmp = Multimodal.blockImageBytes(vals, 6, 10, 10, 6)
    val asImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    val pngBuf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(asImg, "png", pngBuf)
    val media = Seq((1L, bmp), (2L, pngBuf.toByteArray)).toDF("doc_id", "content")
    val h = Multimodal.perceptualHashesReal(media, "doc_id", "content")
      .as[(Long, Long)].collect().toMap
    h(1L) shouldBe h(2L)
  }

  it("frameSamplePHashKernel samples evenly-spaced frames from a real animated GIF") {
    val frameVals = (0 until 6).map(f =>
      Array.tabulate(60)(k => ((f * 37 + k * 4) % 256)))
    val gif = Multimodal.gifBytes(frameVals, 6, 10, 10, 6)
    val media = Seq((1L, gif), (2L, "not a gif".getBytes("UTF-8"))).toDF("doc_id", "content")
    val got = Multimodal.frameSampleHashes(media, "doc_id", "content", n = 3)
      .as[(Long, Int, Int, Long)].collect().groupBy(_._1)
    // 6 frames sampled at n=3 -> indices 0, 2, 4; the container total rides along
    got(1L).map(r => (r._2, r._3)).sorted shouldBe Seq((0, 6), (2, 6), (4, 6))
    // each sampled frame's hash equals the single-image hash of those cells
    // (GIF palettization is lossless on <=256 grays)
    val single = Seq((0, 0L), (2, 1L), (4, 2L)).map { case (f, id) =>
      id -> Multimodal.blockImageBytes(frameVals(f), 6, 10, 10, 6)
    }.toDF("doc_id", "content")
    val want = Multimodal.perceptualHashesReal(single, "doc_id", "content")
      .as[(Long, Long)].collect().toMap
    got(1L).sortBy(_._2).map(_._4).toSeq shouldBe Seq(want(0L), want(1L), want(2L))
    got(2L).toSeq shouldBe Seq((2L, -1, 0, -1L)) // undecodable sentinel row
  }

  it("frame sampling takes every frame when the container is shorter than n") {
    val frames = (0 until 2).map(f => Array.fill(60)(f * 100 + 10))
    val gif = Multimodal.gifBytes(frames, 6, 10, 10, 6)
    val media = Seq((1L, gif)).toDF("doc_id", "content")
    val got = Multimodal.frameSampleHashes(media, "doc_id", "content", n = 5)
      .as[(Long, Int, Int, Long)].collect()
    got.map(r => (r._2, r._3)).sorted shouldBe Seq((0, 2), (1, 2))
  }

  it("audioProfileKernel round-trips real WAV bytes to exact integer features") {
    val samples = Array.tabulate(1000)(i =>
      (((i * 2657L) % 65536L) - 32768L).toShort)
    // local ground truth over the raw samples
    var ss = 0L; var zc = 0L; var peak = 0
    samples.indices.foreach { i =>
      val s = samples(i).toInt
      ss += s.toLong * s
      peak = math.max(peak, math.abs(s))
      if (i > 0 && (s < 0) != (samples(i - 1) < 0)) zc += 1
    }
    val media = Seq(
      (1L, graft.operators.Multimodal.pcmWavBytes(samples, 8000)),
      (2L, "not audio at all".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "content")
    val got = Multimodal.audioProfiles(media, "doc_id", "content")
      .as[(Long, Int, Int, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    got(1L) shouldBe ((1L, 8000, 1, 1000L, ss, zc, peak))
    got(2L)._7 shouldBe -1 // undecodable sentinel flows, never throws
    got(3L)._7 shouldBe -1
  }

  it("audio decode handles stereo interleave and big-endian containers (AIFF)") {
    // stereo: two interleaved channels; the profile runs over the decoded
    // interleaved stream exactly as the kernel documents
    val inter = Array.tabulate(400)(i => (if (i % 2 == 0) 1000 else -1000).toShort)
    val wav = graft.operators.Multimodal.pcmWavBytes(inter, 16000, channels = 2)
    // AIFF = 16-bit big-endian PCM through the same JDK stack — exercises
    // the kernel's BE branch with identical expected numbers
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val raw = new Array[Byte](inter.length * 2)
    inter.indices.foreach { i =>
      raw(2 * i) = (inter(i) & 0xff).toByte
      raw(2 * i + 1) = ((inter(i) >> 8) & 0xff).toByte
    }
    val aiffOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, inter.length / 2),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, aiffOut)
    val media = Seq((1L, wav), (2L, aiffOut.toByteArray)).toDF("doc_id", "content")
    val got = Multimodal.audioProfiles(media, "doc_id", "content")
      .as[(Long, Int, Int, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    val expectSs = 400L * 1000L * 1000L
    got(1L) shouldBe ((1L, 16000, 2, 400L, expectSs, 399L, 1000))
    got(2L) shouldBe ((2L, 16000, 2, 400L, expectSs, 399L, 1000))
  }

  it("riffPcm16Profile fast path matches the JDK decoder and rejects non-canonical containers (r13)") {
    // the fast path must agree with AudioSystem on canonical WAVs and must
    // REFUSE (None -> JDK fallback) anything it could misread
    val samples = Array.tabulate(777)(i => (((i * 9973L) % 65536L) - 32768L).toShort)
    val wav = Multimodal.pcmWavBytes(samples, 44100)
    val viaFast = Multimodal.riffPcm16Profile(wav)
    assert(viaFast.isDefined, "canonical JDK-written WAV must take the fast path")
    // JDK ground truth through the full kernel on a deliberately
    // de-canonicalized copy (extra trailing byte -> size mismatch -> fallback)
    val padded = wav :+ 0x00.toByte
    assert(Multimodal.riffPcm16Profile(padded).isEmpty,
      "inconsistent chunk sizing must fall back to the JDK reader")
    val media = Seq((1L, wav), (2L, padded)).toDF("doc_id", "content")
    val got = Multimodal.audioProfiles(media, "doc_id", "content")
      .as[(Long, Int, Int, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    // fast (row 1) and JDK-fallback (row 2) paths profile the same samples
    got(1L).productIterator.drop(1).toSeq shouldBe got(2L).productIterator.drop(1).toSeq
    val f = viaFast.get
    got(1L) shouldBe ((1L, f._1, f._2, f._3, f._4, f._5, f._6))
    // non-canonical format tags refuse the fast path outright
    val floatFmt = wav.clone()
    floatFmt(20) = 3 // fmt tag 3 = IEEE float
    assert(Multimodal.riffPcm16Profile(floatFmt).isEmpty)
    assert(Multimodal.riffPcm16Profile("RIFFxxxx".getBytes("UTF-8")).isEmpty)
  }

  it("riffPcm16Profile survives junk chunks declaring overflow-sized lengths (r14)") {
    // a chunk size >= 0x7FFFFFF8 overflows `8 + sz.toInt`, which used to
    // drive the scan offset negative and throw out of the kernel entirely —
    // every such container must instead demote to the JDK path -> BadAudio
    def fuzzed(size: Long): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("RIFF".getBytes("US-ASCII")); b.write(Array[Byte](36, 0, 0, 0))
      b.write("WAVE".getBytes("US-ASCII"))
      b.write("JUNK".getBytes("US-ASCII"))
      b.write(Array.tabulate(4)(i => ((size >> (8 * i)) & 0xff).toByte))
      b.write(new Array[Byte](24)) // some bytes after the lying header
      b.toByteArray
    }
    for (sz <- Seq(0x80000000L, 0xFFFFFFFFL, 0x7FFFFFF8L, 1000L))
      assert(Multimodal.riffPcm16Profile(fuzzed(sz)).isEmpty,
        s"junk chunk of declared size $sz must refuse the fast path")
    // and through the full kernel: quarantined as BadAudio, not a task failure
    val media = Seq((1L, fuzzed(0xFFFFFFFFL))).toDF("doc_id", "content")
    val got = Multimodal.audioProfiles(media, "doc_id", "content")
      .as[(Long, Int, Int, Long, Long, Long, Int)].collect()
    got.head._7 shouldBe -1
  }

  it("decompressTextKernel sniffs and round-trips gzip, zstd, plain and corrupt payloads") {
    val uni = "mixed codecs: κείμενο, 文本, émojis 🙂 — exact bytes matter"
    val media = Seq(
      (1L, Multimodal.gzipBytes(uni.getBytes("UTF-8"))),
      (2L, Multimodal.zstdBytes(uni.getBytes("UTF-8"))),
      (3L, "already plain".getBytes("UTF-8")),
      // gzip magic followed by garbage: a truncated/corrupt member must
      // quarantine, not kill the job
      (4L, Array[Byte](0x1f.toByte, 0x8b.toByte, 1, 2, 3)),
      (5L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "content")
    val got = Multimodal.decompressTexts(media, "doc_id", "content")
      .as[(Long, String, Long, String)].collect().map(r => r._1 -> r).toMap
    val nBytes = uni.getBytes("UTF-8").length.toLong
    got(1L) shouldBe ((1L, "gzip", nBytes, uni))
    got(2L) shouldBe ((2L, "zstd", nBytes, uni))
    got(3L) shouldBe ((3L, "plain", 13L, "already plain"))
    got(4L)._2 shouldBe "bad"
    got(4L)._4 shouldBe null
    got(5L)._2 shouldBe "bad"
  }

  it("decompression bombs quarantine as 'big' instead of OOMing the executor") {
    // 8 MB of zeros gzips to ~8 KB — the classic bomb shape; cap at 64 KB
    val bomb = Multimodal.gzipBytes(new Array[Byte](8 << 20))
    val media = Seq((1L, bomb)).toDF("doc_id", "content")
    val got = Multimodal.decodePartitioned(media, "doc_id", "content",
        Multimodal.decompressTextKernel(maxBytes = 64 * 1024))(
        org.apache.spark.sql.Encoders.product[Multimodal.DecodedText])
      .collect().head
    got.codec shouldBe "big"
    got.text shouldBe null
    // the true decompressed size is unknown (drain stopped mid-stream):
    // 0, never the cap, so byte accounting doesn't inflate per bomb
    got.nBytes shouldBe 0L
    // and the same payload passes under the default cap
    Multimodal.decompressTexts(media, "doc_id", "content")
      .select($"codec").as[String].collect().head shouldBe "gzip"
  }

  it("image decompression bombs are refused from the header, never decoded") {
    // a syntactically valid PNG header declaring a 400-megapixel canvas in
    // a few dozen bytes — the decode allocation would be ~1.6 GB; the
    // kernel must read the dims from the header and quarantine
    def be(i: Int): Array[Byte] =
      Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte,
        ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    val ihdrBody = "IHDR".getBytes("ISO-8859-1") ++ be(20000) ++ be(20000) ++
      Array[Byte](8, 2, 0, 0, 0)
    val crc = new java.util.zip.CRC32(); crc.update(ihdrBody)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
      be(13) ++ ihdrBody ++ be(crc.getValue.toInt)
    val media = Seq((1L, png)).toDF("doc_id", "content")
    val got = Multimodal.imageProfiles(media, "doc_id", "content")
      .as[(Long, Long, Long, Int, Long)].collect().head
    got shouldBe ((1L, 0L, 0L, 0, -1L)) // quarantined like any bad payload
  }

  it("resizeKernel really rescales: output bytes re-decode to the target dims") {
    val media = Seq((1L, gradientPng(100, 60)),
      (2L, "junk".getBytes("UTF-8"))).toDF("doc_id", "content")
    val out = Multimodal.decodePartitioned(media, "doc_id", "content",
        Multimodal.resizeKernel(25, 15))(
        org.apache.spark.sql.Encoders.product[Multimodal.ResizedImage])
      .collect().map(r => r.id -> r).toMap
    out(1L).width shouldBe 25
    out(1L).height shouldBe 15
    val redecoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).content))
    redecoded.getWidth shouldBe 25
    redecoded.getHeight shouldBe 15
    // bilinear downscale of a horizontal gradient stays monotone left->right
    val left = redecoded.getRGB(0, 7) & 0xff
    val right = redecoded.getRGB(24, 7) & 0xff
    left should be < right
    out(2L).content shouldBe null // undecodable passthrough
    out(2L).width shouldBe 0
  }
}
