package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FastCodec

/** Round-13 optimization: the minimal PNG/WAV codecs that replaced the
  * per-call `ImageIO`/`AudioSystem` entry points on the multimodal hot
  * path must be bit-for-bit interchangeable with the JDK codecs in
  * BOTH directions — encode readable by the JDK pixel/sample-exact,
  * JDK output readable by the fast decoders pixel/sample-exact — and
  * must refuse (null → fallback) any stream shape they do not
  * support. Content spans every fixture raster shape (w 8..12 ×
  * h 8..11) and sample count (32..128) plus the planted-twin edits. */
class FastCodecSpec extends AnyFunSuite {

  private def pixels(id: Long): (Int, Int, Array[Byte]) = {
    val w = (8 + id % 5).toInt
    val h = (8 + id % 4).toInt
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val t = (id * 2654435761L + x * 40503L + y * 30011L +
        x.toLong * y * 12289L) % 1000003L
      px(y * w + x) = ((t * t % 1000003L) % 256L).toByte
    }
    (w, h, px)
  }

  test("fast PNG encode round-trips through ImageIO pixel-exact") {
    javax.imageio.ImageIO.setUseCache(false)
    (0L until 500L).foreach { id =>
      val (w, h, px) = pixels(id)
      val blob = FastCodec.pngEncodeGray8(w, h, px)
      // genuine PNG signature
      assert((blob(0) & 0xff) == 0x89 && blob(1) == 'P' && blob(2) == 'N' &&
        blob(3) == 'G', s"id $id: not a PNG stream")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      assert(img.getWidth == w && img.getHeight == h, s"id $id: dims")
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        assert(raster.getSample(x, y, 0) == (px(y * w + x) & 0xff),
          s"id $id: pixel ($x,$y)")
    }
  }

  test("fast PNG decode reads ImageIO-written blobs pixel-exact") {
    javax.imageio.ImageIO.setUseCache(false)
    (0L until 500L).foreach { id =>
      val (w, h, px) = pixels(id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, px(y * w + x) & 0xff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val g = FastCodec.pngDecodeGray8(bos.toByteArray)
      assert(g != null, s"id $id: fast decode refused a JDK gray8 PNG")
      assert(g.w == w && g.h == h, s"id $id: dims")
      for (y <- 0 until h; x <- 0 until w)
        assert(g.px(y * w + x) == (px(y * w + x) & 0xff), s"id $id: pixel ($x,$y)")
    }
  }

  test("fast PNG decode refuses unsupported shapes; grayDecodeAny falls back") {
    javax.imageio.ImageIO.setUseCache(false)
    // an RGB PNG is outside the supported shape (color type 2)
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 5) img.setRGB(x, y, (x * 50) << 16 | y * 60)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val blob = bos.toByteArray
    assert(FastCodec.pngDecodeGray8(blob) == null,
      "fast path must refuse a color PNG")
    val g = FastCodec.grayDecodeAny(blob)
    // fallback must agree with the direct ImageIO band-0 loop
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(g.w == ref.getWidth && g.h == ref.getHeight)
    for (y <- 0 until g.h; x <- 0 until g.w)
      assert(g.px(y * g.w + x) == ref.getRaster.getSample(x, y, 0))
  }

  test("fast WAV encode is byte-identical to AudioSystem.write") {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    (0L until 300L).foreach { id =>
      val ns = (32 + id % 97).toInt
      val raw = Array.tabulate[Byte](ns) { i =>
        val t = (id * 2654435761L + i * 7919L) % 1000003L
        ((t * t % 1000003L) % 256L).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, ns.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val jdk = bos.toByteArray
      val fast = FastCodec.wavEncodePcmU8(raw, 8000)
      assert(java.util.Arrays.equals(jdk, fast),
        s"id $id: container bytes differ (jdk ${jdk.length}, fast ${fast.length})")
    }
  }

  test("fast WAV decode reads JDK output sample-exact; refuses 16-bit") {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val raw = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, raw.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val u = FastCodec.wavDecodePcmU8(bos.toByteArray)
    assert(u != null && java.util.Arrays.equals(u, raw))
    val signed = FastCodec.wavDecodeSignedAny(bos.toByteArray)
    assert(signed.toSeq == raw.toSeq.map(b => (b & 0xff) - 128))
    // 16-bit stream: outside the supported shape
    val fmt16 = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val raw16 = Array.tabulate[Byte](64)(i => (i * 11).toByte)
    val ais16 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw16), fmt16, 32L)
    val bos16 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais16,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos16)
    assert(FastCodec.wavDecodePcmU8(bos16.toByteArray) == null,
      "fast path must refuse a 16-bit WAV")
  }
}
