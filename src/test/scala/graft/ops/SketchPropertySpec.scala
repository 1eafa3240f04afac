package graft.ops

import graft.SparkSpec

/** Property tests for the newest algebra-carrying ops: the CMS
  * one-sided error bound and the multiset set-op laws must hold on
  * ARBITRARY inputs, not just the gate fixture — the
  * [[graft.stream.OrderedPropertySpec]] discipline (fixed-seed
  * generation, plain-Scala models; the scalatestplus bridge isn't in
  * the dependency budget). */
class SketchPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260814L)

  private def md5Bucket(i: Int, width: Int, tok: String): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"cms$i:$tok".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % width).toInt
  }

  test("CMS: est ≥ exact on arbitrary token streams; every row conserves mass") {
    val s = spark
    import s.implicits._
    (1 to 6).foreach { caseNo =>
      val vocab = rnd.nextInt(60) + 1
      val n = rnd.nextInt(3000) + 10
      val toks = Seq.fill(n)(s"w${rnd.nextInt(vocab)}")
      val depth = rnd.nextInt(3) + 1
      val width = Seq(8, 16, 32)(rnd.nextInt(3))
      val cms = TextAnalysis.cmsTable(toks.toDF("tok"), depth, width)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      // each hash row partitions the stream: its buckets sum to n
      (0 until depth).foreach { i =>
        val rowSum = cms.collect { case ((ri, _), c) if ri == i => c }.sum
        assert(rowSum == n.toLong, s"case $caseNo row $i")
      }
      assert(cms.size <= depth * width)
      // the point-estimate bound: min over rows never undercounts
      toks.groupBy(identity).foreach { case (tok, xs) =>
        val est = (0 until depth)
          .map(i => cms.getOrElse((i, md5Bucket(i, width, tok).toLong), 0L)).min
        assert(est >= xs.size.toLong, s"case $caseNo tok $tok")
      }
    }
  }

  test("PNG walk: EVERY single-byte corruption is rejected, none parses silently") {
    // CRC32 detects all single-byte errors, the signature check covers
    // the prefix, and structural misreads (lengths) land on a CRC or
    // bounds failure — so flipping ANY byte of a valid PNG must throw;
    // a silent success would mean some byte is not integrity-covered.
    val blob = Multimodal.imageTable(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("fmt") === "png").head().blob
    val clean = Multimodal.parsePngMeta(0L, blob)
    var rejected = 0
    blob.indices.foreach { pos =>
      val bad = blob.clone()
      bad(pos) = (bad(pos) ^ 0x20).toByte
      val failed =
        try { Multimodal.parsePngMeta(0L, bad); false }
        catch { case _: Throwable => true }
      assert(failed, s"byte $pos: corrupted PNG parsed without error")
      rejected += 1
    }
    assert(rejected == blob.length)
    // and the clean blob still parses after all that
    assert(Multimodal.parsePngMeta(0L, blob) == clean)
  }

  test("every proper prefix of every m13 blob format is rejected, none parses silently") {
    // the truncation property behind the mixed ingest gate: JPEG needs
    // its EOI terminal and in-bounds segments; BMP/WAV/AVI declare
    // their total size up front and the walks check it — so EVERY
    // proper prefix of a valid blob must throw. A prefix that parses
    // silently would let a torn object-store read through the gate.
    import org.apache.spark.sql.functions.col
    def allPrefixesReject(name: String, blob: Array[Byte],
        parse: Array[Byte] => Any): Unit = {
      (1 until blob.length).foreach { n =>
        val failed =
          try { parse(blob.take(n)); false }
          catch { case _: Throwable => true }
        assert(failed, s"$name: prefix of $n/${blob.length} bytes parsed")
      }
      parse(blob) // and the full blob still parses
    }
    val jpg = Multimodal.jpegTable(spark, sf0001).head().blob
    allPrefixesReject("jpg", jpg, b => Multimodal.parseJpegMeta(0L, b))
    val bmp = Multimodal.imageTable(spark, sf0001)
      .filter(col("fmt") === "bmp").head().blob
    allPrefixesReject("bmp", bmp, b => Multimodal.parseBmpMeta(0L, b))
    val wav = Multimodal.audioTable(spark, sf0001).head().blob
    allPrefixesReject("wav", wav, b => Multimodal.parseWavMeta(0L, b))
    val avi = Multimodal.aviTable(spark, sf0001).head().blob
    allPrefixesReject("avi-header", avi, b => Multimodal.parseAviHeader(0L, b))
  }

  test("MJPEG AVI: every proper prefix and every structural tamper rejects") {
    // the m14 gate: RIFF declares total size up front, the walk checks
    // it, and every frame payload must carry SOI/EOI — so truncation at
    // ANY byte and tampering with ANY load-bearing structural field
    // must throw. (Whole-blob single-byte fuzz is NOT the contract
    // here: JPEG entropy bytes carry no checksum, by spec.)
    val blob = Multimodal.muxMjpegAvi(5L) // nf = 5%4+2 = 3 frames
    val clean = Multimodal.demuxMjpegAvi(blob)
    (1 until blob.length).foreach { n =>
      val failed =
        try { Multimodal.demuxMjpegAvi(blob.take(n)); false }
        catch { case _: Throwable => true }
      assert(failed, s"prefix of $n/${blob.length} bytes demuxed")
    }
    def tamper(pos: Int, tag: String): Unit = {
      val bad = blob.clone()
      bad(pos) = (bad(pos) ^ 0x20).toByte
      val failed =
        try { Multimodal.demuxMjpegAvi(bad); false }
        catch { case _: Throwable => true }
      assert(failed, s"$tag tamper at byte $pos demuxed")
    }
    // fixed mux layout self-checks before each flip
    assert(new String(blob.slice(188, 192), "US-ASCII") == "MJPG") // strf biCompression
    tamper(188, "biCompression fourcc")
    tamper(48, "avih dwTotalFrames") // count must cross-check the movi walk
    assert(new String(blob.slice(224, 228), "US-ASCII") == "00dc") // first frame chunk
    assert((blob(232) & 0xff) == 0xFF && (blob(233) & 0xff) == 0xD8)
    tamper(233, "frame SOI marker")
    tamper(232 + clean._3(0).length - 1, "frame EOI terminal")
    val idxPos = blob.length - 8 - 16 * 3
    assert(new String(blob.slice(idxPos, idxPos + 4), "US-ASCII") == "idx1")
    tamper(idxPos + 4, "idx1 size (entry count)")
    // per-ENTRY index tamper: a wrong fourcc, a wrong offset, or a
    // wrong length in any idx1 entry must throw (the index is checked
    // field-by-field against the movi walk, not just by count)
    tamper(idxPos + 8, "idx1 entry 0 fourcc")
    tamper(idxPos + 8 + 8, "idx1 entry 0 offset")
    tamper(idxPos + 8 + 12, "idx1 entry 0 length")
    tamper(idxPos + 8 + 16 + 8, "idx1 entry 1 offset")
    // and the clean blob still demuxes identically after all that
    assert(Multimodal.demuxMjpegAvi(blob)._3.length == clean._3.length)
  }

  test("exceptAll/intersectAll obey the multiset algebra on arbitrary bags") {
    val s = spark
    import s.implicits._
    (1 to 6).foreach { caseNo =>
      val a = List.fill(rnd.nextInt(300))(rnd.nextInt(20))
      val b = List.fill(rnd.nextInt(300))(rnd.nextInt(20))
      val ex = a.toDF("v").exceptAll(b.toDF("v"))
        .collect().map(_.getInt(0)).toList
      val ia = a.toDF("v").intersectAll(b.toDF("v"))
        .collect().map(_.getInt(0)).toList
      val am = a.groupBy(identity).view.mapValues(_.size).toMap
      val bm = b.groupBy(identity).view.mapValues(_.size).toMap
      val exm = ex.groupBy(identity).view.mapValues(_.size).toMap
      val iam = ia.groupBy(identity).view.mapValues(_.size).toMap
      (am.keySet ++ bm.keySet).foreach { k =>
        val (m, nn) = (am.getOrElse(k, 0), bm.getOrElse(k, 0))
        assert(exm.getOrElse(k, 0) == math.max(m - nn, 0), s"case $caseNo except $k")
        assert(iam.getOrElse(k, 0) == math.min(m, nn), s"case $caseNo intersect $k")
      }
      // partition law: EXCEPT ALL ⊎ INTERSECT ALL reassembles the left bag
      assert((ex ++ ia).sorted == a.sorted, s"case $caseNo partition law")
    }
  }
}
