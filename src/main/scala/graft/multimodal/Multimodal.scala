package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §7.4): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, processed
  * partition-parallel in fixed-size batches.
  *
  * Decode coverage: image and audio are REAL via the JDK's built-in
  * codecs — [[decodeImage]] reads PNG/JPEG/GIF/BMP through
  * javax.imageio, [[decodeAudio]] reads WAV/AIFF/AU integer PCM through
  * javax.sound.sampled — no external dependency. Video remains an
  * honest STUB ([[stubDecode]], deterministic features from the payload
  * bytes; this container ships no video codec), and the stub also
  * serves as the corrupt-payload fallback for the real branches.
  * The surrounding plumbing — schema, binary column handling, the
  * mapPartitions batch shape, partition-parallel execution — is shared
  * by all branches and tested; the decode round trip itself is
  * driver-visible as q139 (generated PNG/WAV blobs → parquet →
  * [[extractFeatures]] → integer-quantized band stats vs a literal
  * oracle).
  *
  * Scale design: payloads never leave executors; mapPartitions keeps the
  * per-task working set to `batchSize` rows (decoders are memory-hungry);
  * metadata-only projections (inventory, routing) stay columnar and never
  * touch the binary column thanks to parquet column pruning.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      modality: String, // image | audio | video | text
      content: Array[Byte],
      content_type: String,
      n_bytes: Long)

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      dim: Int,
      features: Array[Float])

  /** Derive a media table from `documents`: payload = UTF-8 bytes of the
    * text (a deterministic stand-in for a real blob store read);
    * modality assigned round-robin by doc_id so every branch of the
    * pipeline gets exercised. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video"), lit("text")),
        (pmod(col("doc_id"), lit(4)) + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("content"),
      concat(lit("application/x-fake-"),
        element_at(array(lit("png"), lit("wav"), lit("mp4"), lit("txt")),
          (pmod(col("doc_id"), lit(4)) + 1).cast("int"))).as("content_type"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** ======== STUB ========
    * Stand-in for a real decoder (libjpeg / ffmpeg / soundfile — not in
    * this container). Deterministic: feature j = mean of payload bytes
    * congruent to j mod dim, scaled to [0,1). A real implementation
    * replaces only this function body; signature and batch shape stay.
    *
    * Values are quantized to millionths with exact integer math
    * (q = sums·10⁶ div counts·256, feature = q/10⁶): q < 2²⁴ so the
    * float32 round-trips the integer exactly, which is what makes the
    * fake features cross-engine hashable (the q55 oracle recomputes q in
    * pure integer SQL).
    */
  def stubDecode(content: Array[Byte], dim: Int): Array[Float] = {
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < content.length) {
      val j = i % dim
      sums(j) += content(i) & 0xff
      counts(j) += 1
      i += 1
    }
    Array.tabulate(dim) { j =>
      if (counts(j) == 0) 0f
      else (sums(j) * 1000000L / (counts(j) * 256L)).toFloat / 1e6f
    }
  }

  /** REAL decoder branch for raster-image payloads via the JDK's
    * built-in javax.imageio readers — PNG, JPEG, GIF and BMP all ship in
    * every JVM, so no external dependency (`ImageIO.read` sniffs the
    * container from the byte stream, so one entry point covers all
    * four). Feature j = mean 8-bit luma (BT.601 integer weights
    * 299/587/114) over the j-th horizontal band of the decoded image,
    * scaled to [0,1] — the classic pooled-intensity descriptor, and the
    * same (dim-length float array) contract as [[stubDecode]].
    * Returns None when ImageIO cannot parse the payload: at 100 TB some
    * blobs WILL be corrupt, and a bad row must degrade (caller falls
    * back to the stub) rather than kill the scan task. */
  def decodeImage(content: Array[Byte], dim: Int): Option[Array[Float]] = {
    // NonFatal, not just IOException: ImageIO surfaces crafted/corrupt
    // headers as runtime exceptions too (negative dimensions, CMM
    // errors), and one poisoned blob must not kill a corpus scan task
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0) None
    else {
      val (wd, ht) = (img.getWidth, img.getHeight)
      val sums = new Array[Long](dim)
      val counts = new Array[Long](dim)
      var y = 0
      while (y < ht) {
        val band = math.min((y.toLong * dim / ht).toInt, dim - 1)
        var x = 0
        while (x < wd) {
          val rgb = img.getRGB(x, y)
          val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          sums(band) += luma
          counts(band) += 1
          x += 1
        }
        y += 1
      }
      Some(Array.tabulate(dim) { j =>
        if (counts(j) == 0) 0f
        else (sums(j).toDouble / (counts(j) * 255.0)).toFloat
      })
    }
  }

  /** Perceptual 64-bit average-hash of an image payload, as a 64-char
    * '0'/'1' string (8×8 grid, row-major: char 8·cy+cx+1 is cell
    * (cx, cy)). Bit = cell mean luma above the whole-image mean,
    * decided by exact integer cross-multiplication
    * (cellSum·totalCount > totalSum·cellCount) so the identical
    * comparison is recomputable in oracle SQL with no float division.
    * A bit STRING, not a long, deliberately: cell 63 would land on the
    * long's sign bit and the banding/compare SQL would inherit signed
    * semantics. Brightness-shift invariant by construction (a constant
    * added to every pixel shifts cell and global means equally) — the
    * near-dup class this hash exists to catch (re-encodes, gamma/level
    * tweaks of the same image). None on undecodable payloads (same
    * degrade contract as [[decodeImage]]). At corpus scale, pair
    * generation over these hashes is the q153 prefix-block /
    * q37-banding shape: bucket on a 16-char substring band, compare
    * full hashes only within buckets — never |images|². */
  def aHashBits(content: Array[Byte]): Option[String] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth < 8 || img.getHeight < 8) None
    else {
      val (wd, ht) = (img.getWidth, img.getHeight)
      val cellSum = new Array[Long](64)
      val cellCnt = new Array[Long](64)
      var total = 0L
      var y = 0
      while (y < ht) {
        val cy = math.min((y.toLong * 8 / ht).toInt, 7)
        var x = 0
        while (x < wd) {
          val cx = math.min((x.toLong * 8 / wd).toInt, 7)
          val rgb = img.getRGB(x, y)
          val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          cellSum(8 * cy + cx) += luma
          cellCnt(8 * cy + cx) += 1
          total += luma
          x += 1
        }
        y += 1
      }
      val totalCnt = wd.toLong * ht
      val sb = new StringBuilder(64)
      var i = 0
      while (i < 64) {
        sb.append(if (cellSum(i) * totalCnt > total * cellCnt(i)) '1' else '0')
        i += 1
      }
      Some(sb.toString)
    }
  }

  /** REAL decoder branch for PCM audio containers via the JDK's
    * built-in javax.sound.sampled readers — WAV, AIFF and AU all ship
    * in every JVM (the java.desktop module), no external dependency.
    * Feature j = mean absolute amplitude (full scale = 1.0) over the
    * j-th temporal band, channels averaged per frame — the classic
    * pooled-envelope descriptor, same (dim-length float array) contract
    * as [[stubDecode]]/[[decodeImage]]. Only integer PCM (8/16-bit,
    * signed/unsigned, either endianness) is decoded; compressed
    * encodings and corrupt payloads return None so the caller degrades
    * to the stub instead of killing a 100 TB scan task. */
  def decodeAudio(content: Array[Byte], dim: Int): Option[Array[Float]] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
      val unsigned = fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
      if (!(signed || unsigned) || (bits != 8 && bits != 16) || ch < 1) return None
      val bytes = ais.readAllBytes()
      val bytesPerSample = bits / 8
      val frameBytes = bytesPerSample * ch
      val nFrames = bytes.length / frameBytes
      if (nFrames == 0) return None
      val sums = new Array[Double](dim)
      val counts = new Array[Long](dim)
      var i = 0
      while (i < nFrames) {
        val band = math.min((i.toLong * dim / nFrames).toInt, dim - 1)
        var c = 0
        var acc = 0.0
        while (c < ch) {
          val off = i * frameBytes + c * bytesPerSample
          val s =
            if (bits == 8) {
              if (signed) bytes(off).toDouble / 128.0
              else ((bytes(off) & 0xff) - 128).toDouble / 128.0
            } else {
              val v =
                if (fmt.isBigEndian) ((bytes(off) << 8) | (bytes(off + 1) & 0xff)).toShort
                else ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
              val base = if (unsigned) ((v & 0xffff) - 32768).toShort else v
              base.toDouble / 32768.0
            }
          acc += math.abs(s)
          c += 1
        }
        sums(band) += acc / ch
        counts(band) += 1
        i += 1
      }
      Some(Array.tabulate(dim) { j =>
        if (counts(j) == 0) 0f else (sums(j) / counts(j)).toFloat
      })
    } catch { case scala.util.control.NonFatal(_) => None }
    finally ais.close()
  }

  /** Volume-invariant audio fingerprint: bit i says whether the mean
    * absolute amplitude RISES from temporal band i to band i+1
    * (`bands`−1 chars, '0'/'1') — the classic energy-delta fingerprint
    * (Shazam-family intuition at its smallest): re-encodes and volume
    * changes scale every band's energy by the same factor, so the
    * delta SIGNS — and the fingerprint — survive, while different
    * material orders its energy differently. Decode mirrors
    * [[decodeAudio]] (integer PCM via javax.sound, channels summed),
    * but accumulation stays in exact INTEGER sample units and each
    * comparison is a cross-multiplication
    * (sum(i+1)·cnt(i) > sum(i)·cnt(i+1), in BigInt — corpus-length
    * audio overflows a long product), so the oracle can restate the
    * bits exactly from generated-signal constants. None on
    * non-PCM/corrupt payloads (the [[decodeImage]] degrade contract).
    * Corpus-scale pairing: substring-band buckets, as [[aHashBits]]. */
  def audioFingerprint(content: Array[Byte], bands: Int = 16): Option[String] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    require(bands >= 2, s"need at least 2 bands, got $bands")
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
      val unsigned = fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
      if (!(signed || unsigned) || (bits != 8 && bits != 16) || ch < 1) return None
      val bytes = ais.readAllBytes()
      val bytesPerSample = bits / 8
      val frameBytes = bytesPerSample * ch
      val nFrames = bytes.length / frameBytes
      if (nFrames < bands) return None
      val sums = new Array[Long](bands)
      val counts = new Array[Long](bands)
      var i = 0
      while (i < nFrames) {
        val band = math.min((i.toLong * bands / nFrames).toInt, bands - 1)
        var c = 0
        var acc = 0L
        while (c < ch) {
          val off = i * frameBytes + c * bytesPerSample
          val v =
            if (bits == 8) {
              if (signed) bytes(off).toInt
              else (bytes(off) & 0xff) - 128
            } else {
              val s16 =
                if (fmt.isBigEndian) ((bytes(off) << 8) | (bytes(off + 1) & 0xff)).toShort
                else ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
              if (unsigned) ((s16 & 0xffff) - 32768) else s16.toInt
            }
          acc += math.abs(v.toLong)
          c += 1
        }
        sums(band) += acc
        counts(band) += 1
        i += 1
      }
      val sb = new StringBuilder(bands - 1)
      var j = 0
      while (j < bands - 1) {
        sb.append(
          if (BigInt(sums(j + 1)) * counts(j) > BigInt(sums(j)) * counts(j + 1)) '1'
          else '0')
        j += 1
      }
      Some(sb.toString)
    } catch { case scala.util.control.NonFatal(_) => None }
    finally ais.close()
  }

  /** Content-type dispatch: a real decoder where the JVM has a codec
    * (every image-prefixed type javax.imageio can sniff: PNG, JPEG,
    * GIF, BMP — and every PCM audio container javax.sound reads: WAV,
    * AIFF, AU; video remains an honest stub, this container ships no
    * video codec), deterministic stub everywhere else, including
    * unparseable payloads. */
  def decode(content: Array[Byte], contentType: String, dim: Int): Array[Float] =
    if (contentType.startsWith("image/"))
      decodeImage(content, dim).getOrElse(stubDecode(content, dim))
    else if (contentType.startsWith("audio/"))
      decodeAudio(content, dim).getOrElse(stubDecode(content, dim))
    else stubDecode(content, dim)

  /** Feature extraction over media rows, batched per partition. The
    * batching (grouped iterator) is what a vectorized decoder needs —
    * same shape as an Arrow-batched UDF: bounded memory, no per-row
    * call overhead. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real decoder would decode `batch` as one vectorized call
        batch.iterator.map(r =>
          MediaFeatures(r.media_id, r.modality, dim,
            decode(r.content, r.content_type, dim)))
      }
    }
  }

  /** Resize stub: re-bucket the payload to exactly `targetBytes` bytes,
    * each output byte the mean of its source bucket — the deterministic
    * stand-in for an image/audio resample (a real implementation swaps
    * the bucket mean for the codec's interpolation; the typed-Dataset
    * plumbing and the `n_bytes` metadata update stay). Payloads shorter
    * than the target upsample by bucket repetition; empty stays empty. */
  def resize(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(targetBytes > 0, "targetBytes must be positive")
    media.map { r =>
      val n = r.content.length
      if (n == 0) r
      else {
        val out = Array.tabulate(targetBytes) { j =>
          val lo = (j.toLong * n / targetBytes).toInt
          val hi = math.max(lo + 1, ((j + 1).toLong * n / targetBytes).toInt)
          val end = math.min(hi, n)
          var s = 0L
          var i = lo
          while (i < end) { s += r.content(i) & 0xff; i += 1 }
          (s / (end - lo)).toByte
        }
        r.copy(content = out, n_bytes = targetBytes.toLong)
      }
    }
  }

  /** Frame/sample subsampling stub: keep every `everyN`-th byte of the
    * payload (stands in for video frame sampling / audio resampling). */
  def subsample(media: Dataset[MediaRow], everyN: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val kept = r.content.zipWithIndex.collect { case (b, i) if i % everyN == 0 => b }
      r.copy(content = kept, n_bytes = kept.length.toLong)
    }
  }
}
