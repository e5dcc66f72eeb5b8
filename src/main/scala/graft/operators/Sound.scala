package graft.operators

import org.apache.spark.sql.DataFrame

/** Audio-column operators — the third modality of the corpus ladder
  * (text: [[TextAnalysis]]/[[Dedup]]; images: [[Media]]): treat audio as
  * opaque `binary` with typed metadata, decode executor-side, and hand
  * fixed-width fingerprints to the SAME banded near-dup machinery.
  *
  * Decode scope mirrors [[Media]]'s container policy: WAV/RIFF PCM
  * (integer 8/16/24/32-bit and IEEE-float 32-bit) decodes with a
  * pure-JVM parser — bit-deterministic, zero native deps; RECOGNIZED
  * compressed containers (MP3/FLAC/OGG/M4A) fail loudly with the
  * pre-transcode recipe (`ffmpeg -i in.mp3 out.wav`), and unrecognizable
  * bytes skip (corrupt-record discipline). Per-task memory is one file's
  * samples; bytes never visit the driver.
  */
object Sound {

  /** Decoded PCM: sample rate, channel count, and the MONO mixdown
    * (channels averaged) as floats in [-1, 1]. */
  final case class Pcm(sampleRate: Int, nChannels: Int, mono: Array[Float])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    if (o + 4 > b.length) "" else new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Loud-error gate for RECOGNIZED compressed audio ([[Media]]'s MP4
    * contract): a corpus of MP3s must fail with instructions, never
    * silently decode to zero rows. */
  private[graft] def unsupportedAudio(b: Array[Byte]): Option[String] = {
    if (b.length < 4) None
    else if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') Some("MP3 (ID3 tag)")
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0) Some("MP3 (frame sync)")
    else if (tag(b, 0) == "fLaC") Some("FLAC")
    else if (tag(b, 0) == "OggS") Some("OGG")
    else if (b.length >= 12 && tag(b, 4) == "ftyp" &&
      Seq("M4A ", "mp42", "isom").contains(tag(b, 8))) Some("M4A/MP4 audio")
    else None
  }

  /** Parse a RIFF/WAVE file's PCM samples. Returns None for
    * unrecognizable/corrupt bytes; THROWS (loudly, with the transcode
    * recipe) for recognized compressed formats and non-PCM WAV codecs. */
  def decodeWavPcm(bytes: Array[Byte]): Option[Pcm] = {
    unsupportedAudio(bytes).foreach { fmt =>
      throw new IllegalArgumentException(
        s"$fmt decode needs a codec this zero-dependency build excludes; " +
          "pre-transcode once outside the query path: ffmpeg -i in out.wav")
    }
    if (bytes.length < 44 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      return None
    var pos = 12
    var fmtCode = -1; var nCh = 0; var rate = 0; var bits = 0
    var data: Option[(Int, Int)] = None
    while (pos + 8 <= bytes.length && (fmtCode < 0 || data.isEmpty)) {
      val id = tag(bytes, pos)
      // Bounds check in Long: a hostile/corrupt chunk size near 2^31 would
      // overflow Int arithmetic negative and bypass the check, turning the
      // documented corrupt-record skip into a multi-GB allocation attempt.
      val szL = u32(bytes, pos + 4)
      if (pos.toLong + 8 + szL > bytes.length) return None
      val sz = szL.toInt
      if (id == "fmt " && sz >= 16) {
        fmtCode = u16(bytes, pos + 8)
        nCh = u16(bytes, pos + 10)
        rate = u32(bytes, pos + 12).toInt
        bits = u16(bytes, pos + 22)
      } else if (id == "data") data = Some((pos + 8, sz))
      pos += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    (fmtCode, data) match {
      case (1, Some((off, len))) if nCh >= 1 && rate > 0 &&
        Seq(8, 16, 24, 32).contains(bits) =>
        val bytesPer = bits / 8
        val nFrames = len / (bytesPer * nCh)
        val mono = new Array[Float](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0.0
          var c = 0
          while (c < nCh) {
            val o = off + (f * nCh + c) * bytesPer
            val v = bits match {
              case 8 => ((bytes(o) & 0xff) - 128) / 128.0 // unsigned 8-bit
              case 16 => u16(bytes, o).toShort / 32768.0
              case 24 =>
                val raw = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
                  (bytes(o + 2) << 16)
                raw / 8388608.0
              case 32 => u32(bytes, o).toInt / 2147483648.0
            }
            acc += v; c += 1
          }
          mono(f) = (acc / nCh).toFloat
          f += 1
        }
        Some(Pcm(rate, nCh, mono))
      case (3, Some((off, len))) if nCh >= 1 && rate > 0 && bits == 32 =>
        val nFrames = len / (4 * nCh)
        val mono = new Array[Float](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0.0
          var c = 0
          while (c < nCh) {
            acc += java.lang.Float.intBitsToFloat(
              u32(bytes, off + (f * nCh + c) * 4).toInt)
            c += 1
          }
          mono(f) = (acc / nCh).toFloat
          f += 1
        }
        Some(Pcm(rate, nCh, mono))
      case (code, Some(_)) if code >= 0 && code != 1 && code != 3 =>
        // a well-formed WAV whose fmt chunk names a compressed codec
        // (MP3-in-WAV = 85, ADPCM = 2/17, ...) is RECOGNIZED, not
        // corrupt — same loud contract as the raw compressed formats
        throw new IllegalArgumentException(
          s"WAV with non-PCM format code $code needs a codec this " +
            "zero-dependency build excludes; pre-transcode once outside " +
            "the query path: ffmpeg -i in.wav -c:a pcm_s16le out.wav")
      case _ => None // truncated / missing chunks / headerless
    }
  }

  /** Deterministic synthetic test recording: 65 constant-energy blocks
    * whose levels come from a pattern-keyed integer hash, rendered as
    * 16-bit PCM mono WAV at any sample rate — [[Media.syntheticImage]]'s
    * role for the audio arm of the near-dup ladder (q194). Adjacent
    * blocks ALWAYS differ in level (the hash re-picks on a repeat, and
    * the three levels are >=2x apart in energy), so every bit of the
    * [[energyHash64]] contour is a strong comparison that survives
    * resampling (time-relative blocks, same integer partition as the
    * hash windows) and constant gain (energy ratios) — the two edits a
    * re-encoded copy of the same recording actually has. Distinct
    * patterns draw independent level sequences and land far apart;
    * SoundSpec pins both margins. Samples alternate sign per index
    * (square-ish tone) so the audit's ZCR is non-degenerate; magnitude
    * is sign-symmetric, so the energy contour is unaffected. */
  def syntheticWav(pattern: Int, rate: Int = 8000, gain: Double = 1.0): Array[Byte] = {
    require(rate >= 200, s"syntheticWav needs rate >= 200 (65 blocks), got $rate")
    require(gain > 0 && gain <= 1.0, s"syntheticWav needs gain in (0, 1], got $gain")
    val levels = Array(0.12, 0.38, 0.85)
    val lvlIdx = new Array[Int](65)
    var w = 0
    while (w < 65) {
      val h = math.abs((pattern + 1) * 73856093 ^ w * 19349663) % 3
      lvlIdx(w) = if (w > 0 && h == lvlIdx(w - 1)) (h + 1) % 3 else h
      w += 1
    }
    val n = (rate * 4) / 5 // 0.8 s
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    out.write("RIFF".getBytes); w32(36 + 2 * n); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16); w16(1); w16(1)
    w32(rate); w32(rate * 2); w16(2); w16(16)
    out.write("data".getBytes); w32(2 * n)
    var i = 0
    while (i < n) {
      // block index tracks energyHash64's window partition of [0, n) to
      // within one sample at the boundaries (floor-vs-ceil residue of the
      // integer arithmetic); a single straddling sample shifts a window's
      // mean energy by <= gap/(n/65) ~ 1%, far under the >=2x level gaps,
      // so no contour comparison can flip at any rate
      val blk = math.min(64, (i.toLong * 65 / n).toInt)
      val amp = levels(lvlIdx(blk)) * gain * (if (i % 2 == 0) 1 else -1)
      w16(math.round(amp * 32767).toInt & 0xffff)
      i += 1
    }
    out.toByteArray
  }

  /** Energy-contour hash: split the mono signal into 65 equal windows,
    * bit i = energy(window i+1) > energy(window i) — [[Media.dHash64]]'s
    * construction transplanted to time. Time-relative windows make the
    * hash invariant to sample-rate conversion, and ENERGY RATIOS make it
    * invariant to constant gain — the two edits a re-encoded/normalized
    * copy of the same recording actually has. Feed the result to
    * [[Dedup.hammingNearDupPairs64]] like every other 64-bit
    * fingerprint. Returns None for signals shorter than 65 samples (no
    * meaningful contour). */
  def energyHash64(mono: Array[Float]): Option[Long] = {
    val n = mono.length
    if (n < 65) return None
    val e = new Array[Double](65)
    var w = 0
    while (w < 65) {
      val s0 = (w.toLong * n / 65).toInt
      val s1 = math.max(s0 + 1, ((w + 1).toLong * n / 65).toInt)
      var acc = 0.0
      var i = s0
      while (i < s1) { acc += mono(i) * mono(i); i += 1 }
      e(w) = acc / (s1 - s0)
      w += 1
    }
    var h = 0L
    var i = 0
    while (i < 64) {
      if (e(i + 1) > e(i)) h |= 1L << i
      i += 1
    }
    Some(h)
  }

  /** Per-file audio audit + fingerprint over a (path, content) binary
    * frame ([[graft.sources.Ingest.binaryFiles]]' shape): duration,
    * rate/channel metadata, RMS level, zero-crossing rate (the cheap
    * speech-vs-tone-vs-noise discriminator), clipping fraction, and the
    * [[energyHash64]] contour fingerprint. One flatMap where the bytes
    * live — the [[Media.imageDHashes]] discipline; undecodable rows drop,
    * recognized compressed formats fail the task loudly (pre-transcode).
    * Output: (path, sample_rate, n_channels, n_samples, duration_s, rms,
    * zcr_per_s, clip_frac, ehash). */
  def audioAudit(files: DataFrame, pathCol: String = "path",
                 bytesCol: String = "content"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(pathCol, bytesCol).as[(String, Array[Byte])]
      .flatMap { case (path, raw) =>
        decodeWavPcm(raw).flatMap { pcm =>
          val n = pcm.mono.length
          if (n == 0) None
          else {
            var sum2 = 0.0; var zc = 0; var clip = 0
            var i = 0
            while (i < n) {
              val v = pcm.mono(i)
              sum2 += v * v
              if (math.abs(v) >= 0.999f) clip += 1
              if (i > 0 && ((v >= 0) != (pcm.mono(i - 1) >= 0))) zc += 1
              i += 1
            }
            val durS = n.toDouble / pcm.sampleRate
            Some((path, pcm.sampleRate, pcm.nChannels, n.toLong, durS,
              math.sqrt(sum2 / n), zc / durS, clip.toDouble / n,
              energyHash64(pcm.mono).getOrElse(0L)))
          }
        }
      }
      .toDF("path", "sample_rate", "n_channels", "n_samples", "duration_s",
        "rms", "zcr_per_s", "clip_frac", "ehash")
  }
}
