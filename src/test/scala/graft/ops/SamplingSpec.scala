package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class SamplingSpec extends SparkSpec {

  test("rate edge cases: 1.0 keeps every row, 0.0 keeps none") {
    val docs = Relational.t(spark, sf0001, "documents")
    val total = docs.count()
    assert(Sampling.hashSample(docs, col("doc_id"), 1.0).count() == total)
    assert(Sampling.hashSample(docs, col("doc_id"), 0.0).count() == 0)
  }

  test("sample rate lands near the target on uniform keys") {
    val docs = Relational.t(spark, sf0001, "documents")
    val total = docs.count().toDouble
    val got = Sampling.hashSample(docs, col("doc_id"), 0.3).count() / total
    assert(got > 0.2 && got < 0.4, s"rate 0.3 drew $got")
  }

  test("rateThresholdCol matches the literal rateThreshold rendering") {
    import org.apache.spark.sql.functions.lit
    // math.nextDown(1.0) is the regression pin: rate*2^32 rounds UP to
    // exactly 2^32, so the column path must take the "g" branch like
    // the literal path (a 9-char "100000000" breaks the fixed-width
    // compare)
    val rates = Seq(0.0, 0.1, 0.35, 0.6457, 0.999999, math.nextDown(1.0), 1.0)
    val df = spark.range(1).select(
      rates.zipWithIndex.map { case (r, i) =>
        Sampling.rateThresholdCol(lit(r)).as(s"t$i")
      }: _*)
    val row = df.collect()(0)
    rates.zipWithIndex.foreach { case (r, i) =>
      assert(row.getString(i) == Sampling.rateThreshold(r),
        s"rate $r: col ${row.getString(i)} vs literal ${Sampling.rateThreshold(r)}")
    }
  }

  test("temperature mix: head lang anchors at baseRate, tail upsampled, members consistent") {
    val stats = Sampling.temperatureMixStats(spark, sf0001, baseRate = 0.35)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byLang = stats.map(s => s._1 -> s).toMap
    val nMax = stats.map(_._2).max
    val head = stats.find(_._2 == nMax).get
    assert(math.abs(head._3 - 0.35) < 1e-9, s"head rate ${head._3}")
    stats.filter(_._2 < nMax).foreach { case (lang, _, rate, _) =>
      assert(rate > 0.35, s"tail $lang rate $rate not upsampled")
    }
    // membership must equal a literal-threshold hashSample at the
    // published (pre-rounding differences are below the r4 grid only
    // if we recompute the exact rate) per-lang rate
    val docs = Relational.t(spark, sf0001, "documents")
    stats.foreach { case (lang, nDocs, _, nSampled) =>
      val exact = math.min(1.0, 0.35 * math.sqrt(nMax.toDouble / nDocs))
      val expected = Sampling.hashSample(
        docs.filter(col("lang") === lang), col("doc_id"), exact).count()
      assert(nSampled == expected, s"$lang: $nSampled vs $expected")
    }
  }

  test("nested sample property: a 10% sample is a subset of the 50% sample") {
    // thresholds nest, so rate r1 < r2 => sample(r1) ⊆ sample(r2) —
    // the property that makes hash splits stable as rates are tuned
    val docs = Relational.t(spark, sf0001, "documents")
    val s10 = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s50 = Sampling.hashSample(docs, col("doc_id"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s50))
  }

  test("fixed sample: exactly n docs, and they are the n smallest md5 draws") {
    val n = 25
    val got = Sampling.fixedSample(spark, sf0001, n).collect()
    val gotIds = got.flatMap(_.getAs[String]("doc_ids").split(",").map(_.toLong)).toSet
    assert(got.map(_.getAs[Long]("n_docs")).sum == n)
    // model: recompute the draw order driver-side with Java's md5
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long) =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = Relational.t(spark, sf0001, "documents")
      .select("doc_id").collect().map(_.getLong(0))
      .sortBy(hex).take(n).toSet
    assert(gotIds == expected)
    // nesting: the 10-draw is a strict prefix of the 25-draw — growth
    // evolves the set by eviction, never by reshuffle
    val got10 = Sampling.fixedSample(spark, sf0001, 10).collect()
      .flatMap(_.getAs[String]("doc_ids").split(",").map(_.toLong)).toSet
    assert(got10.subsetOf(gotIds))
  }

  test("p09: multiplicities match a plain-Scala systematic-resampling model") {
    val docs = Relational.t(spark, sf0001, "documents")
      .select("lang", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def qi(text: String): Long = {
      val ws = text.trim.split("\\s+")
      val stop = math.floor(ws.count(w => w == "the" || w == "a").toDouble /
        math.max(ws.length, 1) * 10000 + 0.5) / 10000
      val qv = math.floor(math.min(ws.length / 100.0, 1.0) * (1.0 - stop) *
        10000 + 0.5) / 10000
      math.floor(qv * 10000 + 0.5).toLong
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long): Long = java.lang.Long.parseLong(
      md.digest(id.toString.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString, 16)
    val qs = docs.map { case (lang, id, text) => (lang, id, qi(text)) }
    val w = qs.map(_._3).sum; val n = qs.length.toLong
    val mult = qs.map { case (lang, id, q) =>
      val kq = 2L * n * q
      val base = kq / w; val rem = kq % w
      val extra = if (BigInt(draw(id)) * w < BigInt(rem) * 4294967296L) 1L else 0L
      (lang, base + extra)
    }
    val expect = mult.groupBy(_._1).map { case (lang, ms) =>
      lang -> ((ms.length.toLong, ms.map(_._2).sum, ms.map(_._2).max,
        ms.count(_._2 == 0L).toLong))
    }
    val got = Sampling.importanceResample(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == expect)
    // the with-replacement semantics are live (some doc repeats), the
    // zero-weight drop path is live, and the total lands within n of
    // the K = 2n target (each doc's residual adds at most 1)
    assert(got.values.exists(_._3 > 1L))
    val emitted = got.values.map(_._2).sum
    assert(math.abs(emitted - 2L * n) <= n)
  }
}
