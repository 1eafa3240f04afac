package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curation operators against a crafted corpus with hand-computed
  * expectations (the sf0.01 DuckDB oracles cover the synthetic-corpus
  * path; these pin the SEMANTICS on minimal inputs). */
class CurationSpec extends SparkSpec {

  /** Write a tiny documents.parquet under a temp dir and return the
    * dir — the ops read `dir/documents.parquet` like any SF dir. */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curation").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("contamination: full-overlap doc flagged, partial below threshold clean") {
    val dir = docsDir(Seq(
      (0L, "a b c d e f g", "en", "src0"),          // the benchmark doc
      (1L, "a b c d e f g", "en", "src1"),          // verbatim leak: overlap 1.0
      (2L, "p q r s t u v w", "en", "src1"),        // disjoint: no hits
      (3L, "a b c d e x y z w q", "en", "src1")))   // 1 of 6 shingles: 0.167
    val out = Curation.contaminationReport(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 3L, 3L, 1.0)))
  }

  test("contamination: benchmark docs are never in the report") {
    val dir = docsDir(Seq(
      (0L, "a b c d e f g", "en", "src0"),
      (1L, "a b c d e f g", "en", "src0")))  // dup WITHIN the benchmark
    assert(Curation.contaminationReport(spark, dir).count() == 0)
  }

  test("split assignment: deterministic, complete, near the requested fractions") {
    import spark.implicits._
    val ids = (0L until 10000L).toDF("doc_id")
    val split = ids.withColumn("split",
      Curation.splitAssign(col("doc_id"), trainFrac = 0.8, valFrac = 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L)
    // md5 draws are uniform: 3-sigma tolerance at n=10000 is ~1.2%
    assert(math.abs(counts("train") - 8000L) < 150, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 1000L) < 100, s"val=${counts("val")}")
    assert(math.abs(counts("test") - 1000L) < 100, s"test=${counts("test")}")
    // stable under repartitioning — the whole point vs df.sample()
    val again = split.repartition(13).groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("packing: docs land in the pack where they start; straddlers count once") {
    val five = "w w w w w"
    val dir = docsDir(Seq(
      (1L, five, "en", "s"), (2L, five, "en", "s"),
      (3L, five, "en", "s"), (4L, five, "en", "s"),
      (5L, five, "fr", "s")))
    // budget 8: en starts 0,5,10,15 -> packs 0,0,1,1; fr its own stream
    val out = Curation.packingStats(spark, dir, budget = 8L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("en", 0L, 2L, 10L), ("en", 1L, 2L, 10L),
      ("fr", 0L, 1L, 5L)))
  }

  test("packing: an over-budget doc owns its start pack; pack ids may skip") {
    val dir = docsDir(Seq(
      (1L, Seq.fill(20)("w").mkString(" "), "en", "s"),  // starts pack 0, spans past 2
      (2L, "w w w", "en", "s")))                          // starts at 20 -> pack 2
    val out = Curation.packingStats(spark, dir, budget = 8L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("en", 0L, 1L, 20L), ("en", 2L, 1L, 3L)))
  }

  test("packing conserves documents and tokens per stream") {
    val out = Curation.packingStats(spark, sf0001)
    import org.apache.spark.sql.functions.{sum => fsum}
    val packed = out.groupBy("lang")
      .agg(fsum("n_docs").as("d"), fsum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = Relational.t(spark, sf0001, "documents")
      .select(col("lang"), TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .groupBy("lang").agg(count(lit(1)).as("d"), fsum("n").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(packed == direct)
  }

  test("decontamination drops flagged docs, keeps short and clean ones") {
    val dir = docsDir(Seq(
      (0L, "a b c d e f g", "en", "src0"),      // benchmark: never in the corpus
      (1L, "a b c d e f g", "en", "src1"),      // verbatim leak: dropped
      (2L, "p q r s t u v w", "en", "src1"),    // clean: survives
      (3L, "x y", "fr", "src1")))               // too short to shingle: survives
    val out = Curation.decontaminatedStats(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("en", 1L, 15L), ("fr", 1L, 3L)))
  }

  test("quality quota: bounded-heap rank matches window semantics incl ties") {
    val rich = (1 to 50).map(i => s"w$i").mkString(" ")   // 50 tokens, no stopwords
    val poor = "the a the a"                               // stopword-stuffed
    val dir = docsDir(Seq(
      (10L, poor, "en", "s"), (11L, rich, "en", "s"),
      (12L, rich, "en", "s"), (13L, rich, "en", "s"),      // tie on quality
      (14L, rich, "en", "s")))
    val out = Curation.qualityQuota(spark, dir, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // ties break on ascending doc_id: 11, 12, 13 (14 cut, 10 far below)
    assert(out.toSeq == Seq(("en", 1L, 11L), ("en", 2L, 12L), ("en", 3L, 13L)))
  }

  test("packing ≡ sequential fold model on randomized corpora") {
    // fixed-seed generation (the OrderedPropertySpec discipline): the
    // window formulation must agree with the obvious one-stream fold
    val rnd = new scala.util.Random(20260812L)
    (1 to 4).foreach { _ =>
      val budget = 1 + rnd.nextInt(12)
      val docs = (0 until 30).map { i =>
        val nTok = 1 + rnd.nextInt(3 * budget) // includes over-budget docs
        (i.toLong, Seq.fill(nTok)("w").mkString(" "),
          s"l${rnd.nextInt(3)}", "s")
      }
      val dir = docsDir(docs)
      val got = Curation.packingStats(spark, dir, budget.toLong)
        .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
      // model: per lang, docs in doc_id order; pack = floor(start/budget)
      val model = docs.groupBy(_._3).toSeq.flatMap { case (lang, ds) =>
        var start = 0L
        ds.sortBy(_._1).map { case (_, text, _, _) =>
          val n = text.split(" ").length.toLong
          val pack = start / budget
          start += n
          (lang, pack) -> n
        }
      }.groupBy(_._1).map { case (k, vs) =>
        k -> (vs.size.toLong, vs.map(_._2).sum)
      }
      assert(got == model, s"budget=$budget")
    }
  }

  test("token budget ≡ greedy model on randomized corpora with fat strata") {
    // few distinct token counts → many quality ties → the boundary
    // stratum genuinely holds multiple docs and the within-stratum
    // doc_id tie-break is load-bearing (fixed-seed generation, the
    // packing-model discipline above)
    val rnd = new scala.util.Random(20260813L)
    def r4d(x: Double) = math.floor(x * 10000 + 0.5) / 10000.0
    (1 to 4).foreach { _ =>
      val docs = (0 until 40).map { i =>
        val nTok = Seq(5, 9, 14, 20)(rnd.nextInt(4))
        val nStop = rnd.nextInt(3)
        val words = Seq.fill(nStop)("the") ++ Seq.fill(nTok - nStop)("w")
        (i.toLong, words.mkString(" "), s"l${rnd.nextInt(2)}", "s")
      }
      val dir = docsDir(docs)
      val budget = 20L + rnd.nextInt(300)
      val model = docs.map { case (id, text, lang, _) =>
        val toks = text.split("\\s+")
        val n = toks.length
        val stop = toks.count(t => t == "the" || t == "a")
        val q = r4d(math.min(n / 100.0, 1.0) *
          (1.0 - r4d(stop.toDouble / math.max(n, 1))))
        (id, lang, q, n.toLong)
      }.sortBy { case (id, _, q, _) => (-q, id) }
      val prefix = model.scanLeft(0L)(_ + _._4)
      val sel = model.zip(prefix).collect {
        case ((_, lang, q, n), prior) if prior < budget => (lang, q, n)
      }
      val expected = sel.groupBy(_._1).map { case (lang, vs) =>
        lang -> (vs.size.toLong, vs.map(_._3).sum, vs.map(_._2).min)
      }
      val got = Curation.tokenBudgetStats(spark, dir, budget)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      assert(got == expected, s"budget=$budget")
    }
  }

  test("full curation chain: contaminated dropped, near-dup deduped, short survives") {
    val dir = docsDir(Seq(
      (0L, "a b c d e f g", "en", "src0"),        // benchmark
      (1L, "a b c d e f g", "en", "src1"),        // verbatim leak → dropped
      (2L, "p q r s t u v w x", "en", "src1"),    // clean canonical → survives
      (3L, "p q r s t u v w y", "en", "src1"),    // J(2,3)=4/6≥0.6 → deduped away
      (4L, "x y", "fr", "src1")))                 // too short to shingle → survives
    val out = Curation.fullCurationStats(spark, dir)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // aggregate across splits: survivors are exactly docs 2 (en) and 4 (fr)
    val byLang = out.groupBy(_._1).view.mapValues(rs =>
      (rs.map(_._2).sum, rs.map(_._3).sum, rs.map(_._4).sum)).toMap
    assert(byLang == Map("en" -> ((1L, 17L, 9L)), "fr" -> ((1L, 3L, 2L))))
  }

  test("packed ids: pack structure matches packingStats; sequences well-formed") {
    val packed = Curation.packedIdsStats(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getString(4))))
    val plain = Curation.packingStats(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(packed.map(_._1).toSet == plain.keySet)
    packed.foreach { case (key, (nDocs, nTokens, csv)) =>
      assert((nDocs, nTokens) == plain(key), s"pack $key counts diverge")
      val ids = csv.split(",").map(_.toInt)
      // every token got an id, ids are vocab ranks or the OOV code 31
      assert(ids.length.toLong == nTokens, s"pack $key id count")
      assert(ids.forall(i => i >= 1 && i <= 31), s"pack $key id range")
    }
    // OOV code must actually appear (vocab is capped at 30 tokens)
    assert(packed.exists(_._2._3.split(",").contains("31")))
  }

  test("chunking: windows match a plain-Scala slicer incl fingerprints") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Relational.t(spark, sf0001, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).trim.split("\\s+").toSeq))
    // small windows so this corpus' short docs actually produce
    // multiple overlapping chunks (the default 128/64 yields one
    // window per sub-128-token doc — boundary math untested)
    val chunk = 16; val stride = 8
    val expected = docs.groupBy(_._1).map { case (lang, rows) =>
      val chunks = rows.flatMap { case (_, w) =>
        val nWin = math.max(1,
          math.floor((w.length - chunk + stride - 1).toDouble / stride).toInt + 1)
        (0 until nWin).map { k =>
          val cw = w.slice(k * stride, k * stride + chunk)
          (md5hex(cw.mkString(" ")), cw.length.toLong)
        }
      }
      lang -> (rows.length.toLong, chunks.length.toLong,
        chunks.map(_._1).distinct.length.toLong, chunks.map(_._2).sum)
    }
    val got = Curation.chunkStats(spark, sf0001, chunk = chunk,
      stride = stride).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == e,
        s"lang ${r.getString(0)}")
    }
    // overlap must produce more chunk-tokens than corpus tokens
    val corpusTokens = docs.map(_._2.length.toLong).sum
    assert(got.map(_.getLong(4)).sum > corpusTokens)
  }

  test("chunk window-count formula matches the sequential model for random params") {
    // pure JVM property: the closed-form max(1, floor((n-chunk+stride-1)/stride)+1)
    // must equal the sequential definition — windows start at
    // 0, stride, 2*stride, …, and emission stops with the first window
    // that covers the tail (its start + chunk >= n)
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val n = rnd.nextInt(201)
      val chunk = 1 + rnd.nextInt(50)
      val stride = 1 + rnd.nextInt(chunk)
      var count = 0
      var start = 0
      var done = false
      while (!done) {
        count += 1
        done = start + chunk >= n
        start += stride
      }
      val formula = math.max(1,
        math.floor((n - chunk + stride - 1).toDouble / stride).toInt + 1)
      assert(formula == count,
        s"n=$n chunk=$chunk stride=$stride: formula $formula vs model $count")
    }
  }

  test("token budget: histogram-threshold selection equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    // the naive formulation the scale path replaces: one global-sort
    // window cumsum, selected iff prior < budget
    def naive(budget: Long) = {
      val d = Relational.t(spark, sf0001, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.qualityScore(col("text")).as("q"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      val w = Window.orderBy(col("q").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.withColumn("prior", sum("n_tok").over(w) - col("n_tok"))
        .where(col("prior") < budget)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"),
          min("q").as("min_quality"))
        .orderBy("lang")
    }
    for (budget <- Seq(1L, 137L, 1500L, 1000000L)) {
      val got = Curation.tokenBudgetStats(spark, sf0001, budget).collect().toSeq
      val exp = naive(budget).collect().toSeq
      assert(got == exp, s"budget=$budget")
    }
    // budget=1 is first-fit greedy's edge: exactly the single
    // best-quality doc (prior 0 < 1), regardless of its own size
    assert(Curation.tokenBudgetStats(spark, sf0001, 1L)
      .agg(sum("n_docs")).head.getLong(0) == 1L)
    // huge budget selects the whole corpus
    val all = Relational.t(spark, sf0001, "documents").count()
    assert(Curation.tokenBudgetStats(spark, sf0001, 1000000L)
      .agg(sum("n_docs")).head.getLong(0) == all)
  }

  test("token budget: overflow doc is kept, nothing after it is") {
    // 4 docs, quality strictly ordered by construction is fragile on
    // synthetic text — instead derive the contract from whatever order
    // quality induces: walking docs in (q desc, doc_id) order, the
    // selected set must be exactly a prefix, and dropping its last
    // element must bring tokens strictly under budget
    val budget = 120L
    val d = Relational.t(spark, sf0001, "documents")
      .select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, q, _) => (-q, id) }
    val prefix = d.scanLeft(0L) { case (acc, (_, _, n)) => acc + n }
    val expectedIds = d.zip(prefix).collect {
      case ((id, _, _), prior) if prior < budget => id
    }.toSet
    val selTokens = d.filter(t => expectedIds(t._1)).map(_._3).sum
    assert(selTokens >= budget, "selection must reach the budget")
    assert(selTokens - d.filter(t => expectedIds(t._1)).map(_._3).last < budget
      || expectedIds.size == 1)
    val stats = Curation.tokenBudgetStats(spark, sf0001, budget)
      .agg(sum("n_docs"), sum("sum_tokens")).head
    assert(stats.getLong(0) == expectedIds.size)
    assert(stats.getLong(1) == selTokens)
  }

  test("blocklist scrub: exact token removals, untouched docs not counted") {
    val dir = docsDir(Seq(
      (1L, "spark is fast and spark scales", "en", "s"),  // 2 removals
      (2L, "hash the key", "en", "s"),                     // 1 removal
      (3L, "plain words only", "en", "s"),                 // untouched
      (4L, "sparkle hashes stay", "fr", "s")))             // substrings do NOT match
    val out = Curation.blocklistScrubStats(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // en: 6+3+3=12 tokens, 3 removed, 9 kept, 2 docs hit; fr untouched
    assert(out.toSeq == Seq(("en", 2L, 3L, 9L), ("fr", 0L, 0L, 3L)))
  }

  test("bloom filter: no false negatives, FP rate within 5x of the formula") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val members = Seq.fill(2000)(rnd.nextLong()).distinct
    val nonMembers = Seq.fill(20000)(rnd.nextLong()).distinct
      .filterNot(members.toSet)
    val mBits = 1L << 15; val k = 5
    val bloom = Curation.bloomOf(members.toDF("h"), "h", mBits, k)
    def passCount(xs: Seq[Long]): Long = {
      // probe through the same column machinery the operator uses
      val probed = Curation.bloomDecontamProbe(xs.toDF("h"), bloom, mBits, k)
      probed.count()
    }
    // the Bloom contract: EVERY member passes — a false negative would
    // let contaminated docs through silently
    assert(passCount(members) == members.size.toLong)
    // FP rate ~ (1-e^(-kn/m))^k ≈ 2.4e-3 at n=2000, m=32768, k=5;
    // loose 5x bound guards the hashing is actually spreading
    val fp = passCount(nonMembers).toDouble / nonMembers.size
    val expected = math.pow(1 - math.exp(-k.toDouble * members.size / mBits), k)
    assert(fp < expected * 5 + 1e-4, s"fp=$fp expected≈$expected")
  }

  test("bloom decontamination equals the exact broadcast formulation") {
    // same corpus shapes the c04 spec uses, plus extra partial overlaps
    // so the 0.4 threshold actually bites on both sides of the line
    val dir = docsDir(Seq(
      (0L, "a b c d e f g h i j", "en", "src0"),    // benchmark
      (1L, "a b c d e f g h i j", "en", "src1"),    // verbatim leak: 1.0
      (2L, "p q r s t u v w x y", "en", "src1"),    // disjoint
      (3L, "a b c d e f x y z w q r", "fr", "src1"),// 2/8 shingles = 0.25 < 0.4
      (4L, "a b c d e f g h x y z", "fr", "src1"),  // 4/7 ≈ 0.571 ≥ 0.4
      (5L, "short", "de", "src1")))                 // unshingleable: survives
    val exact = Curation.decontaminatedStats(spark, dir, minOverlap = 0.4)
      .collect().toSeq
    val bloomed = Curation.bloomDecontaminatedStats(spark, dir)
      .collect().toSeq
    assert(bloomed == exact,
      s"bloom two-phase diverged from exact: $bloomed vs $exact")
    // and with a DEGENERATE 64-bit bloom (every probe collides — all
    // corpus shingles pass the prune) the verify phase must still
    // restore exactness: the bloom is an optimization, never semantics
    val degenerate = Curation.bloomDecontaminatedStats(spark, dir,
      mBits = 64, k = 1).collect().toSeq
    assert(degenerate == exact)
  }

  test("span scrub: first doc keeps text, later docs lose merged coverage") {
    import spark.implicits._
    // docs 1, 2 and 4 share the 9-token block "q w e r t y u i o"
    // (the d11 golden corpus); doc 3 is disjoint
    val docs = Seq(
      (1L, "a b q w e r t y u i o c"),
      (2L, "q w e r t y u i o z z2 z3"),
      (3L, "m n b v c x l k j h g f"),
      (4L, "pre1 pre2 q w e r t y u i o")).toDF("doc_id", "text")
    val out = Curation.spanScrubOf(docs, w = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1 is first_doc for both shared windows → untouched → absent;
    // docs 2 and 4 lose the block's 9 tokens (two overlapping windows
    // merge into one covered region); doc 3 never repeats → absent
    assert(out.toSeq == Seq(
      (2L, 12L, 9L, "z z2 z3"),
      (4L, 11L, 9L, "pre1 pre2")))
  }

  test("span scrub: within-doc repetition alone scrubs nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1 s2 s3 s4 s5 s6 s7 s8 gap s1 s2 s3 s4 s5 s6 s7 s8"),
      (2L, "completely different tokens here with no overlap at all")).toDF("doc_id", "text")
    assert(Curation.spanScrubOf(docs, w = 8).count() == 0)
  }

  test("span scrub ≡ plain string model on randomized corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def doc(): String = Seq.fill(6 + rnd.nextInt(10))(
      s"t${rnd.nextInt(6)}").mkString(" ")
    val rows = (1L to 40L).map(i => (i, doc()))
    val w = 3
    // model: repeated spans (per-doc distinct, ≥2 docs) with first_doc;
    // excise covered indices in docs other than first_doc
    val spansByDoc = rows.map { case (id, text) =>
      val ts = text.trim.split("\\s+")
      id -> (if (ts.length < w) Array.empty[String]
             else ts.sliding(w).map(_.mkString(" ")).toArray)
    }.toMap
    val firstDoc = spansByDoc.toSeq
      .flatMap { case (id, sps) => sps.distinct.map(sp => (sp, id)) }
      .groupBy(_._1).collect { case (sp, xs) if xs.size >= 2 =>
        sp -> xs.map(_._2).min }
    val model = rows.flatMap { case (id, text) =>
      val ts = text.trim.split("\\s+")
      val covered = spansByDoc(id).zipWithIndex.collect {
        case (sp, pos) if firstDoc.get(sp).exists(_ != id) =>
          pos until (pos + w)
      }.flatten.toSet
      val kept = ts.zipWithIndex.collect { case (tk, i) if !covered(i) => tk }
      if (covered.isEmpty) None
      else Some((id, ts.length.toLong, covered.size.toLong, kept.mkString(" ")))
    }.sortBy(_._1)
    val got = Curation.spanScrubOf(rows.toDF("doc_id", "text"), w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == model)
  }
}
