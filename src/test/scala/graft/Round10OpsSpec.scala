package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Round-10 operators: the capped pHash class-pair path (the
  * star-reduction guard for many-distinct-hash image corpora) and the
  * 8×8 box-mean resample arm of the perceptual hash. */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sfDir = "/root/testdata/sf0.001"

  test("capped pHash class pairs bound a many-distinct-hash flood; anchors reached") {
    // 37 distinct hash CLASSES (one image each), every one sharing band
    // 0 (bits 0..11 all zero): base 0 plus one bit set among 12..47 —
    // anchor↔member hamming 1, member↔member 2, all within threshold,
    // so the UNCAPPED class join emits the full C(37,2) quadratic set
    // while the capped path star-reduces every over-cap bucket to its
    // min-phash anchor class
    val ph = (Seq(0L) ++ (12 until 48).map(b => 1L << b)).zipWithIndex
      .map { case (hash, i) => (i.toLong, 8L, 6L, hash) }
      .toDF("doc_id", "width", "height", "phash")
    val full = Multimodal.pHashClassPairs(ph, maxHamming = 3)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(full.size == 36 * 37 / 2, s"uncapped flood must be quadratic: ${full.size}")
    val cappedRows = Multimodal.pHashClassPairsCapped(ph, 3,
      DedupKnobs.PHashClassBucketCap).collect()
    val capped = cappedRows.map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(capped.size <= 40, s"class-pair volume not bounded: ${capped.size}")
    // every flooded class reaches the anchor class (phash 0), and every
    // emitted edge passed the exact hamming verify
    (12 until 48).foreach(b => assert(capped.contains((0L, 1L << b)),
      s"star edge (0, 1<<$b) missing"))
    cappedRows.foreach(r => assert(r.getAs[Long]("hamming") <= 3L))
  }

  test("capped pHash class pairs equal the exact ones when no bucket exceeds the cap") {
    val ph = Multimodal.pHashes(spark,
      Multimodal.pngPayloads(spark, graft.engine.Sources.table(spark, sfDir, "documents")))
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
      r.getLong(7), r.getLong(8))
    val exact = Multimodal.pHashClassPairs(ph, 3).collect().map(key).toSet
    val capped = Multimodal.pHashClassPairsCapped(ph, 3, Long.MaxValue)
      .collect().map(key).toSet
    assert(capped === exact)
  }

  test("resampled class pairs: hash-keyed classes, hamming gate, counts and anchors") {
    val rh = Seq(
      (1L, 8L, 8L, 5L, 9L),    // class (hi 5, lo 9): docs 1, 2
      (2L, 16L, 16L, 5L, 9L),  //   …across DIFFERENT dims (the point)
      (3L, 8L, 8L, 5L, 11L),   // hamming((5,9),(5,11)) = 1 -> pairs
      (4L, 8L, 8L, 5L, 57L))   // hamming vs (5,9) = 2, vs (5,11) = 3 -> over
      .toDF("doc_id", "width", "height", "ph_hi", "ph_lo")
      .select(col("doc_id"), col("ph_hi"), col("ph_lo"))
    val got = Multimodal.resampledClassPairsCapped(rh, 1, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    // only the hamming-1 class pair survives; the two-doc class spans
    // two dims because classes key on the hash alone
    assert(got.toSeq == Seq((5L, 9L, 5L, 11L, 2L, 1L, 1L, 3L, 1L)),
      s"got ${got.toSeq}")
  }

  test("capped resampled class pairs bound a flooded band bucket; anchors reached") {
    // 49 classes all sharing band 0 (low 16 bits zero): base (0,0) plus
    // one bit set among lo[16..31] / hi[0..31] — anchor↔member hamming
    // 1, member↔member 2, so an uncapped join would emit C(49,2); the
    // capped path must star-reduce to the 48 anchor edges
    val rh = (Seq((0L, 0L)) ++
        (16 until 32).map(b => (0L, 1L << b)) ++
        (0 until 32).map(b => (1L << b, 0L))).zipWithIndex
      .map { case ((hi, lo), i) => (i.toLong, hi, lo) }
      .toDF("doc_id", "ph_hi", "ph_lo")
    val rows = Multimodal.resampledClassPairsCapped(rh, 3, 8).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet
    assert(pairs.size == 48, s"flood must star-reduce to 48 edges: ${pairs.size}")
    (16 until 32).foreach(b => assert(pairs.contains((0L, 0L, 0L, 1L << b))))
    (0 until 32).foreach(b => assert(pairs.contains((0L, 0L, 1L << b, 0L))))
    rows.foreach(r => assert(r.getAs[Long]("hamming") <= 3L))
  }

  /** Encode one genuine PNG for the resample tests. */
  private def pngOf(id: Long, w: Int, h: Int,
                    px: (Int, Int) => Int): (Long, Array[Byte]) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    for (y <- 0 until h; x <- 0 until w) r.setSample(x, y, 0, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    (id, bos.toByteArray)
  }

  test("resampled aHash is scale-invariant: integer upscales hash identically") {
    // the property the native-raster hash (q198) cannot have: the SAME
    // content at 8×8, 16×16 (2× pixel replication) and 24×24 (3×) must
    // land on ONE fingerprint — each 8×8 cell of the upscale is a
    // constant box whose mean is exactly the source pixel, and the
    // image mean is unchanged by replication
    def pat(x: Int, y: Int): Int = (x * 37 + y * 11) % 256
    val payloads = Seq(
      pngOf(1L, 8, 8, pat),
      pngOf(2L, 16, 16, (x, y) => pat(x / 2, y / 2)),
      pngOf(3L, 24, 24, (x, y) => pat(x / 3, y / 3)))
      .toDF("doc_id", "payload")
    val got = Multimodal.pHashesResampled(spark, payloads, 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) === got(2L), s"2× upscale must hash identically: $got")
    assert(got(1L) === got(3L), s"3× upscale must hash identically: $got")
  }

  test("resampled aHash reproduces the integer box-mean replay bit for bit") {
    val d = (1L to 40L).map(Tuple1(_)).toDF("doc_id")
    val got = Multimodal.pHashesResampled(spark,
        Multimodal.pngPayloads(spark, d), 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // independent JVM replay of pixel model + integer resample
    def expected(id: Long): (Long, Long, Long, Long) = {
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      def p(x: Int, y: Int): Long = (id * 31 + 7 * x + 13 * y) % 256
      val sImg = (for (y <- 0 until h; x <- 0 until w) yield p(x, y)).sum
      val nImg = w.toLong * h
      var hi = 0L
      var lo = 0L
      for (j <- 0 until 8; i <- 0 until 8) {
        val x0 = i * w / 8; val x1 = math.max((i + 1) * w / 8, x0 + 1)
        val y0 = j * h / 8; val y1 = math.max((j + 1) * h / 8, y0 + 1)
        val box = for (y <- y0 until y1; x <- x0 until x1) yield p(x, y)
        if (box.sum * nImg >= sImg * box.size) {
          val k = j * 8 + i
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
      }
      (w.toLong, h.toLong, hi, lo)
    }
    for (id <- 1L to 40L) assert(got(id) == expected(id), s"doc $id")
  }
}
