package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

/** Real audio codec over the JDK's built-in `javax.sound.sampled` (WAV /
  * AIFF / AU containers, PCM payloads — no external dependency), the audio
  * sibling of [[ImageCodecs]]. Same degradation contract: null or
  * undecodable payloads yield zeros, so poison rows at 100 TB degrade
  * instead of killing the partition. Compressed codecs (MP3/AAC/Opus) are
  * not in the JDK and stay behind [[Multimodal.StubCodecs]].
  */
object AudioCodecs {

  /** Decode a PCM16 mono container to normalized samples in [-1, 1).
    * None when the payload is not decodable audio.
    */
  def decodePcm16(payload: Array[Byte]): Option[Array[Double]] =
    if (payload == null || payload.length == 0) None
    else
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
          else {
            val bytes = in.readAllBytes()
            val bigEndian = fmt.isBigEndian
            val n = bytes.length / 2
            val out = new Array[Double](n)
            var i = 0
            while (i < n) {
              val lo = bytes(2 * i) & 0xff
              val hi = bytes(2 * i + 1) & 0xff
              val s = (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort
              out(i) = s / 32768.0
              i += 1
            }
            Some(out)
          }
        } finally in.close()
      } catch { case _: Exception => None }

  /** `bands` mean-absolute-amplitude features in [0, 1): real decode, then
    * the same windowed-energy layout as the stub — band b averages |s| over
    * its contiguous sample window. Undecodable → zeros.
    */
  def audioFeatures(payload: Array[Byte], bands: Int): Array[Float] = {
    val out = new Array[Float](bands)
    decodePcm16(payload).foreach { s =>
      if (s.nonEmpty) {
        var b = 0
        while (b < bands) {
          val from = (b.toLong * s.length / bands).toInt
          val to = math.max(from + 1, ((b + 1).toLong * s.length / bands).toInt)
          var sum = 0.0
          var i = from
          while (i < to && i < s.length) { sum += math.abs(s(i)); i += 1 }
          out(b) = (sum / math.max(1, math.min(to, s.length) - from)).toFloat
          b += 1
        }
      }
    }
    out
  }

  /** Canonical 44-byte-header PCM16 mono little-endian WAV around raw
    * samples — the fixture encoder for tests and the oracled decode query.
    */
  def wavOf(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Two-band alternating-sign square wave: first half ±amp1, second half
    * ±amp2 — every sample's |value| is exactly amp/32768 (a power-of-two
    * division, exact in IEEE doubles), so expected band features have a
    * closed form any engine reproduces bit-for-bit.
    */
  /** Audio fingerprint — the clip-level near-dup key ([[ImageCodecs
    * .aHash64]]'s audio sibling): per-band mean |amplitude| quantized to
    * `levels` buckets, packed base-`levels` into one long. Re-encodes and
    * level-preserving edits collide, so exact-groupBy on the fingerprint
    * dedups clips with an 8-byte shuffle row — PCM never moves.
    * Undecodable payload → all-zero energies → fingerprint 0 (poison-row
    * contract).
    */
  def audioFingerprint(payload: Array[Byte], bands: Int = 4,
      levels: Int = 256): Long = {
    val e = audioFeatures(payload, bands)
    var fp = 0L
    var b = 0
    while (b < bands) {
      val q = math.min(levels - 1, math.floor(e(b).toDouble * levels).toInt)
      fp = fp * levels + math.max(0, q)
      b += 1
    }
    fp
  }

  def twoBandSquareWav(n: Int, amp1: Int, amp2: Int, sampleRate: Int = 8000): Array[Byte] = {
    val s = new Array[Short](n)
    var i = 0
    while (i < n) {
      val a = if (i < n / 2) amp1 else amp2
      s(i) = (if (i % 2 == 0) a else -a).toShort
      i += 1
    }
    wavOf(s, sampleRate)
  }
}
