package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property tests: each order-dependent op must agree with the plain
  * Scala collection model on arbitrary inputs — the distributed
  * reformulation (window functions / two-pass indexing) may not
  * change semantics (SURVEY §5 "property tests vs a local reference
  * model"). Fixed-seed generation: deterministic, offline-friendly
  * (scalatestplus bridge isn't in the dependency budget).
  */
class OrderedPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260812L)
  private def cases(n: Int): Seq[(List[Int], Int)] =
    Seq.fill(n) {
      val len = rnd.nextInt(60)
      (List.fill(len)(rnd.nextInt(101) - 50), rnd.nextInt(70))
    }

  private def df(xs: List[Int]) = {
    val s = spark
    import s.implicits._
    xs.zipWithIndex.map { case (x, i) => (i, x) }.toDF("ord", "v")
  }

  test("skip ≡ List.drop") {
    cases(8).foreach { case (xs, n) =>
      val got = Ordered.skip(df(xs), Seq(col("ord")), n.toLong)
        .orderBy("ord").collect().map(_.getInt(1)).toList
      assert(got == xs.drop(n), s"xs=$xs n=$n")
    }
  }

  test("truncate ≡ List.take") {
    cases(8).foreach { case (xs, n) =>
      val got = Ordered.truncate(df(xs), Seq(col("ord")), n.toLong)
        .orderBy("ord").collect().map(_.getInt(1)).toList
      assert(got == xs.take(n), s"xs=$xs n=$n")
    }
  }

  test("takeWhileNot(p) ≡ List.takeWhile(!p)") {
    cases(8).foreach { case (xs, t0) =>
      val t = t0 - 35 // threshold inside the value range
      val got = Ordered.takeWhileNot(df(xs), Seq(col("ord")), col("v") > t)
        .orderBy("ord").collect().map(_.getInt(1)).toList
      assert(got == xs.takeWhile(_ <= t), s"xs=$xs t=$t")
    }
  }

  test("skipUntil(p) ≡ List.dropWhile(!p)") {
    cases(8).foreach { case (xs, t0) =>
      val t = t0 - 35
      val got = Ordered.skipUntil(df(xs), Seq(col("ord")), col("v") > t)
        .orderBy("ord").collect().map(_.getInt(1)).toList
      assert(got == xs.dropWhile(_ <= t), s"xs=$xs t=$t")
    }
  }

  test("truncate(count, when) ≡ List.take(n) ∩ takeWhile(!p) — first-satisfied wins") {
    cases(8).foreach { case (xs, n) =>
      val t = (n % 70) - 35
      val got = Ordered.truncate(df(xs), Seq(col("ord")),
          Some(n.toLong), Some(col("v") > t))
        .orderBy("ord").collect().map(_.getInt(1)).toList
      // the fused reference semantics: stop at whichever bound first
      assert(got == xs.takeWhile(_ <= t).take(n), s"xs=$xs n=$n t=$t")
    }
  }

  test("distinctConsecutive ≡ run-length head extraction") {
    cases(8).foreach { case (xs0, _) =>
      val xs = xs0.map(_ % 5) // induce runs
      val got = Ordered.distinctConsecutive(df(xs), Seq(col("ord")), col("v"))
        .orderBy("ord").collect().map(_.getInt(1)).toList
      val model = xs.foldLeft(List.empty[Int]) {
        case (acc, x) if acc.headOption.contains(x) => acc
        case (acc, x) => x :: acc
      }.reverse
      assert(got == model, s"xs=$xs")
    }
  }

  test("firstWins ≡ first occurrence per key in order") {
    cases(8).foreach { case (xs0, _) =>
      val xs = xs0.map(_ % 7)
      val got = Ordered.firstWins(df(xs), Seq(col("v")), Seq(col("ord")))
        .orderBy("ord").collect().map(_.getInt(1)).toList
      val model = xs.foldLeft((Set.empty[Int], List.empty[Int])) {
        case ((seen, acc), x) =>
          if (seen(x)) (seen, acc) else (seen + x, x :: acc)
      }._2.reverse
      assert(got == model, s"xs=$xs")
    }
  }

  test("chunkBySize groups are exactly List.grouped") {
    cases(8).foreach { case (xs, n0) =>
      val n = (n0 % 10) + 1
      val got = Ordered.chunkBySize(df(xs), Seq(col("ord")), n, "chunk")
        .orderBy("ord").collect()
        .groupBy(_.getAs[Long]("chunk")).toList.sortBy(_._1)
        .map(_._2.sortBy(_.getAs[Int]("ord")).map(_.getAs[Int]("v")).toList)
      assert(got == xs.grouped(n).toList, s"xs=$xs n=$n")
    }
  }
}
