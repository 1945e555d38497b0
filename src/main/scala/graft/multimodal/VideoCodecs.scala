package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real container demux for a minimal motion-PNG ("MPNG") video format:
  * `"MPNG" | int32 nFrames | nFrames × (int32 len | PNG bytes)`. Standard
  * containers (MP4/MKV) need codec libraries the JDK doesn't ship, so those
  * stay behind [[Multimodal.StubCodecs]] — but DEMUX itself (header parse,
  * frame index, byte-offset extraction) and per-frame decode are real here:
  * frames come out as PNG payloads that [[ImageCodecs]] actually decodes.
  * Same poison-row contract as the other codecs: malformed containers
  * yield empty results, never exceptions.
  */
object VideoCodecs {

  // In-memory stream caching for byte-array sources; rationale and
  // ownership in [[MediaIo]].
  MediaIo.init()

  private val Magic = Array[Byte]('M', 'P', 'N', 'G')

  /** Assemble an MPNG container from encoded frame payloads. */
  def mpngOf(frames: Seq[Array[Byte]]): Array[Byte] = {
    val dataLen = frames.map(_.length + 4).sum
    val buf = ByteBuffer.allocate(8 + dataLen).order(ByteOrder.BIG_ENDIAN)
    buf.put(Magic).putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Demux every frame (byte-offset walk over the index — no decode). */
  def demux(payload: Array[Byte]): IndexedSeq[Array[Byte]] = {
    if (payload == null || payload.length < 8) return IndexedSeq.empty
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
    val magic = new Array[Byte](4)
    buf.get(magic)
    if (!java.util.Arrays.equals(magic, Magic)) return IndexedSeq.empty
    val n = buf.getInt
    if (n < 0 || n > (1 << 20)) return IndexedSeq.empty
    val out = IndexedSeq.newBuilder[Array[Byte]]
    var i = 0
    while (i < n) {
      if (buf.remaining() < 4) return IndexedSeq.empty
      val len = buf.getInt
      if (len < 0 || len > buf.remaining()) return IndexedSeq.empty
      val f = new Array[Byte](len)
      buf.get(f)
      out += f
      i += 1
    }
    out.result()
  }

  /** Animated-GIF container write — the one MULTI-FRAME format the JDK
    * can both encode and decode natively (javax.imageio's GIF plugin), so
    * unlike MP4/MKV this needs no stub: a real sequence write with a real
    * frame-index read ([[gifFrames]]). GIF is palette-based and LOSSLESS
    * for ≤256-color images, so grayscale fixtures round-trip
    * pixel-exactly.
    */
  def animatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Decode every GIF frame. Frames come back RAW per GIF frame — the
    * reader does not composite disposal methods, so callers using delta
    * frames see deltas; full-size replacement frames (the fixture shape)
    * are unaffected. Poison contract as everywhere in this package:
    * malformed payloads yield empty, never exceptions.
    */
  def gifFrames(payload: Array[Byte]): IndexedSeq[java.awt.image.BufferedImage] = {
    if (payload == null || payload.length < 6) return IndexedSeq.empty
    try {
      // the stream must be CLOSED, not just the reader disposed: with
      // ImageIO's default disk cache this is a FileCacheImageInputStream
      // holding an open temp file, and a per-row leak exhausts executor
      // fds on a large corpus
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return IndexedSeq.empty
        val reader = readers.next()
        try {
          reader.setInput(iis, false)
          val n = reader.getNumImages(true)
          (0 until n).map(reader.read)
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => IndexedSeq.empty }
  }

  /** `k` evenly spaced frames (first frame always included; order
    * preserved). Real frame sampling: index walk + slice, no decode of
    * unsampled frames — at scale the savings IS the point of sampling.
    */
  def sampleFrames(payload: Array[Byte], k: Int): IndexedSeq[(Int, Array[Byte])] = {
    val frames = demux(payload)
    if (frames.isEmpty || k <= 0) IndexedSeq.empty
    else {
      val take = math.min(k, frames.length)
      (0 until take).map { j =>
        val idx = (j.toLong * frames.length / take).toInt
        (idx, frames(idx))
      }
    }
  }
}
