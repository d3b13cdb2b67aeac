package graft

import graft.multimodal.Multimodal
import graft.queries.Tables

/** Multimodal plumbing specs: the stub decoder is deterministic and the
  * Spark-side schema/batching/partitioning is real (SURVEY §7.4). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fromDocuments(Tables(spark, sf, "documents"))
    .as[Multimodal.MediaRow]

  test("fromDocuments: payload bytes round-trip and metadata is consistent") {
    val rows = media.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.n_bytes == r.content.length))
    assert(rows.map(_.modality).toSet == Set("image", "audio", "video", "text"))
  }

  test("extractFeatures: deterministic, fixed-dim, in [0,1)") {
    val f1 = Multimodal.extractFeatures(media, dim = 16, batchSize = 64)
      .collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 16, batchSize = 7)
      .collect().sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.forall(_.features.length == 16))
    assert(f1.forall(_.features.forall(x => x >= 0f && x < 1f)))
    // batch size must not change results (pure per-row decode)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }

  /** 8x8 test image, top half pure black, bottom half pure white,
    * encoded in-test (fixtures stay fake) as the given ImageIO format. */
  private def halfAndHalf(format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if (y < 4) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  test("decodeImage: real JDK decode, band means match the drawn image") {
    val png = halfAndHalf("png")
    // luma bands: dim=4 over 8 rows -> 2 rows per band; black rows give
    // 0, white rows give 255*299+255*587+255*114 = 255000 // 1000 = 255
    val feats = Multimodal.decodeImage(png, dim = 4).get
    assert(feats.length == 4)
    assert(feats(0) == 0f && feats(1) == 0f && feats(2) == 1f && feats(3) == 1f,
      feats.toSeq.toString)
    // dispatch: image/png routes to the real decoder, fake types to the
    // stub, corrupt PNG payloads degrade to the stub instead of throwing
    assert(Multimodal.decode(png, "image/png", 4).toSeq == feats.toSeq)
    assert(Multimodal.decode(png, "application/x-fake-png", 4).toSeq ==
      Multimodal.stubDecode(png, 4).toSeq)
    val corrupt = png.take(10).toArray
    assert(Multimodal.decode(corrupt, "image/png", 4).toSeq ==
      Multimodal.stubDecode(corrupt, 4).toSeq)
    // end-to-end through the batched Dataset plumbing
    val ds = Seq(Multimodal.MediaRow(1L, "image", png, "image/png", png.length.toLong)).toDS()
    val out = Multimodal.extractFeatures(ds, dim = 4, batchSize = 2).collect()
    assert(out.length == 1 && out.head.features.toSeq == feats.toSeq)
  }

  test("decodeImage: JPEG, GIF and BMP decode through the same path") {
    // GIF and BMP are lossless for a 2-color image: exact band means
    for (fmt <- Seq("gif" -> "image/gif", "bmp" -> "image/bmp")) {
      val (name, ctype) = fmt
      val bytes = halfAndHalf(name)
      val feats = Multimodal.decodeImage(bytes, dim = 4).get
      assert(feats.toSeq == Seq(0f, 0f, 1f, 1f), s"$name: ${feats.toSeq}")
      assert(Multimodal.decode(bytes, ctype, 4).toSeq == feats.toSeq)
    }
    // JPEG is lossy (DCT ringing at the edge): bands near 0 / near 1
    val jpg = halfAndHalf("jpg")
    val jf = Multimodal.decodeImage(jpg, dim = 4).get
    assert(jf(0) < 0.15f && jf(1) < 0.25f && jf(2) > 0.75f && jf(3) > 0.85f,
      jf.toSeq.toString)
    assert(Multimodal.decode(jpg, "image/jpeg", 4).toSeq == jf.toSeq)
    // a content-type claiming image but holding garbage degrades to stub
    val junk = Array.fill[Byte](24)(0x5a)
    assert(Multimodal.decode(junk, "image/jpeg", 4).toSeq ==
      Multimodal.stubDecode(junk, 4).toSeq)
  }

  /** 16-bit mono PCM at 8 kHz, first half silence, second half a
    * ±16384 square wave (|amplitude| = exactly 0.5 of full scale),
    * encoded in-test as the given javax.sound container type. */
  private def halfSilentAudio(tpe: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    val n = 800
    val pcm = new Array[Byte](n * 2)
    for (i <- n / 2 until n) {
      val v: Short = if (i % 8 < 4) 16384 else -16384
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = (v >> 8).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, tpe, baos)
    baos.toByteArray
  }

  test("decodeAudio: WAV and AIFF decode, band envelopes match the signal") {
    import javax.sound.sampled.AudioFileFormat
    // WAV is little-endian PCM, AIFF big-endian — covers both branches
    for (tpe <- Seq(AudioFileFormat.Type.WAVE, AudioFileFormat.Type.AIFF)) {
      val bytes = halfSilentAudio(tpe)
      val feats = Multimodal.decodeAudio(bytes, dim = 4).get
      // bands 0-1 silence = 0.0; bands 2-3 square wave: |±16384|/32768
      // = 0.5 exactly, every sample, so the band mean is exact
      assert(feats.toSeq == Seq(0f, 0f, 0.5f, 0.5f), s"$tpe: ${feats.toSeq}")
    }
    val wav = halfSilentAudio(AudioFileFormat.Type.WAVE)
    // dispatch: audio/wav routes to the real decoder, fake types and
    // corrupt payloads degrade to the stub instead of throwing
    assert(Multimodal.decode(wav, "audio/wav", 4).toSeq == Seq(0f, 0f, 0.5f, 0.5f))
    assert(Multimodal.decode(wav, "application/x-fake-wav", 4).toSeq ==
      Multimodal.stubDecode(wav, 4).toSeq)
    val corrupt = wav.take(12).toArray
    assert(Multimodal.decode(corrupt, "audio/wav", 4).toSeq ==
      Multimodal.stubDecode(corrupt, 4).toSeq)
    // end-to-end through the batched Dataset plumbing
    val ds = Seq(Multimodal.MediaRow(7L, "audio", wav, "audio/wav", wav.length.toLong)).toDS()
    val out = Multimodal.extractFeatures(ds, dim = 4, batchSize = 2).collect()
    assert(out.length == 1 && out.head.features.toSeq == Seq(0f, 0f, 0.5f, 0.5f))
  }

  test("decodeAudio: stereo channels average; 8-bit unsigned PCM decodes") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def encode(pcm: Array[Byte], fmt: AudioFormat, frames: Int): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
        AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    // stereo 16-bit: L = full-scale-half square, R = silence -> per-frame
    // channel mean is 0.25 everywhere
    val n = 400
    val stereo = new Array[Byte](n * 4)
    for (i <- 0 until n) {
      val v: Short = if (i % 2 == 0) 16384 else -16384
      stereo(4 * i) = (v & 0xff).toByte
      stereo(4 * i + 1) = (v >> 8).toByte
      // right channel stays 0
    }
    val st = Multimodal.decodeAudio(
      encode(stereo, new AudioFormat(8000f, 16, 2, true, false), n), dim = 4).get
    assert(st.toSeq == Seq(0.25f, 0.25f, 0.25f, 0.25f), st.toSeq.toString)
    // 8-bit WAV is UNSIGNED by spec: 128 = silence, 192/64 = ±0.5
    val mono8 = Array.tabulate[Byte](n)(i =>
      if (i < n / 2) 128.toByte else if (i % 2 == 0) 192.toByte else 64.toByte)
    val m8 = Multimodal.decodeAudio(
      encode(mono8, new AudioFormat(8000f, 8, 1, false, false), n), dim = 4).get
    assert(m8.toSeq == Seq(0f, 0f, 0.5f, 0.5f), m8.toSeq.toString)
  }

  test("aHashBits: brightness-invariant, structure-sensitive, corrupt -> None") {
    // non-multiple-of-8 dims (10x12) exercise the uneven-cell
    // cross-multiplication path; +40 brightness must not flip a bit
    // (cell and global means shift together); flipping the structure
    // (left-dark vs top-dark) must
    def grad(wd: Int, ht: Int, shift: Int, vertical: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(wd, ht,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until ht; x <- 0 until wd) {
        val g = (if (vertical) { if (x < wd / 2) 20 else 180 }
                 else { if (y < ht / 2) 20 else 180 }) + shift
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val base = Multimodal.aHashBits(grad(10, 12, 0, vertical = true)).get
    assert(base.length == 64 && base.count(_ == '1') == 32) // half dark/half bright
    assert(Multimodal.aHashBits(grad(10, 12, 40, vertical = true)).get == base)
    val horiz = Multimodal.aHashBits(grad(10, 12, 0, vertical = false)).get
    assert(base != horiz)
    assert(Multimodal.aHashBits(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.aHashBits(grad(4, 4, 0, vertical = true)).isEmpty) // < 8px
  }

  test("audioFingerprint: volume-invariant, material-sensitive, corrupt -> None") {
    def wav(amps: Seq[Int], vol: Int): Array[Byte] = {
      val nFrames = amps.length * 32
      val pcm = new Array[Byte](nFrames * 2)
      for (i <- 0 until nFrames) {
        val a = amps(i * amps.length / nFrames) * 512 * vol
        val v = (if (i % 2 == 0) a else -a).toShort
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rising = Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
    val fp = Multimodal.audioFingerprint(wav(rising, 1)).get
    assert(fp == "1" * 15) // monotone energy -> every delta rises
    assert(Multimodal.audioFingerprint(wav(rising, 3)).get == fp) // volume x3
    val falling = rising.reverse
    assert(Multimodal.audioFingerprint(wav(falling, 1)).get == "0" * 15)
    assert(Multimodal.audioFingerprint(Array[Byte](9, 9, 9)).isEmpty)
  }

  test("subsample keeps every Nth byte") {
    val sub = Multimodal.subsample(media, everyN = 4).collect()
    val orig = media.collect().map(r => r.media_id -> r.content).toMap
    sub.foreach { r =>
      val expected = orig(r.media_id).zipWithIndex.collect { case (b, i) if i % 4 == 0 => b }
      assert(r.content.toSeq == expected.toSeq && r.n_bytes == expected.length)
    }
  }

  test("resize re-buckets payloads to the exact target size, deterministically") {
    val resized = Multimodal.resize(media, targetBytes = 32).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.content.length == 32 && r.n_bytes == 32L, r.media_id.toString)
    }
    // down- then re-resize is deterministic (same values both runs)
    val again = Multimodal.resize(media, targetBytes = 32).collect()
    assert(resized.map(_.content.toSeq).toSeq == again.map(_.content.toSeq).toSeq)
    // constant payloads resize to the same constant (bucket means)
    import spark.implicits._
    val const = Seq(Multimodal.MediaRow(1L, "image",
      Array.fill[Byte](100)(7), "application/x-fake-png", 100L)).toDS()
    val c = Multimodal.resize(const, targetBytes = 10).head()
    assert(c.content.forall(_ == 7.toByte))
  }
}
