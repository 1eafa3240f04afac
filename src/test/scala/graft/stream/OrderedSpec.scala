package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Order-dependent ops vs list-slicing oracles (reference
  * tests/test_stream.py:830-845 skip/truncate-vs-slicing,
  * :1268-1299 distinct goldens). The ordering column re-grounds the
  * reference's implicit iterator order (SURVEY §2.5). */
class OrderedSpec extends SparkSpec {

  private def df(n: Int) = {
    val s = spark
    import s.implicits._
    // shuffled input: the ops must order by `v`, not partition luck
    scala.util.Random.shuffle((0 until n).toList).toDF("v")
  }

  test("withRowIndex assigns a dense 0-based index in order") {
    val out = Ordered.withRowIndex(df(100), Seq(col("v")))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.sortBy(_._2).map(_._1).toList == (0 until 100).toList)
  }

  test("skip(n) drops the first n in order (list-slicing oracle)") {
    val got = Ordered.skip(df(50), Seq(col("v")), 10)
      .collect().map(_.getInt(0)).sorted.toList
    assert(got == (0 until 50).drop(10))
  }

  test("truncate(n) keeps the first n in order") {
    val got = Ordered.truncate(df(50), Seq(col("v")), 7)
      .collect().map(_.getInt(0)).sorted.toList
    assert(got == (0 until 50).take(7))
  }

  test("truncate(count, when) both set: first satisfied wins (reference golden)") {
    // mirrors tests/test_stream.py:937-947 on src = range(10)
    val a = Ordered.truncate(df(10), Seq(col("v")), Some(6L), Some(col("v") === 5))
      .collect().map(_.getInt(0)).sorted.toList
    assert(a == (0 until 5).toList, "when fires first")
    val b = Ordered.truncate(df(10), Seq(col("v")), Some(5L), Some(col("v") === 6))
      .collect().map(_.getInt(0)).sorted.toList
    assert(b == (0 until 5).toList, "count fires first")
    // single-bound dispatch still matches the dedicated ops
    val c = Ordered.truncate(df(10), Seq(col("v")), Some(3L), None)
      .collect().map(_.getInt(0)).sorted.toList
    assert(c == List(0, 1, 2))
    val d = Ordered.truncate(df(10), Seq(col("v")), None, Some(col("v") === 3))
      .collect().map(_.getInt(0)).sorted.toList
    assert(d == List(0, 1, 2))
    intercept[IllegalArgumentException] {
      Ordered.truncate(df(10), Seq(col("v")), None, None)
    }
  }

  test("skip(count, until) rejects both bounds like the reference") {
    // validate_skip_args raises ValueError when both are set
    // (util/validationtools.py:70-79)
    intercept[IllegalArgumentException] {
      Ordered.skip(df(10), Seq(col("v")), Some(2L), Some(col("v") === 5))
    }
    val a = Ordered.skip(df(10), Seq(col("v")), Some(4L), None)
      .collect().map(_.getInt(0)).sorted.toList
    assert(a == (4 until 10).toList)
    val b = Ordered.skip(df(10), Seq(col("v")), None, Some(col("v") === 4))
      .collect().map(_.getInt(0)).sorted.toList
    assert(b == (4 until 10).toList)
  }

  test("skipUntil keeps from the first satisfying element (inclusive)") {
    val got = Ordered.skipUntil(df(30), Seq(col("v")), col("v") >= 12)
      .collect().map(_.getInt(0)).sorted.toList
    assert(got == (12 until 30).toList)
  }

  test("takeWhileNot stops exclusive at first trigger") {
    // reference truncate(when=p): triggering element NOT yielded
    // (iterators.py:334-348)
    val got = Ordered.takeWhileNot(df(30), Seq(col("v")), col("v") >= 12)
      .collect().map(_.getInt(0)).sorted.toList
    assert(got == (0 until 12).toList)
  }

  test("takeWhileNot with never-satisfied predicate keeps everything") {
    assert(Ordered.takeWhileNot(df(20), Seq(col("v")), col("v") > 100).count() == 20)
  }

  test("firstWins keeps the first occurrence per key") {
    val s = spark; import s.implicits._
    // golden from the reference distinct test shape
    // (tests/test_stream.py:1280-1288: ["a","foo","bar","z"] by len)
    val in = Seq((0, "a"), (1, "foo"), (2, "bar"), (3, "z"))
      .toDF("ord", "s").withColumn("len", length(col("s")))
    val got = Ordered.firstWins(in, Seq(col("len")), Seq(col("ord")))
      .collect().map(_.getString(1)).sorted.toList
    assert(got == List("a", "foo"))
  }

  test("distinctConsecutive dedups runs only (golden: aabbcccaabbcccc)") {
    val s = spark; import s.implicits._
    // reference golden tests/test_stream.py:1270-1278:
    // "aabbcccaabbcccc" -> "abcabc"
    val chars = "aabbcccaabbcccc".zipWithIndex.map { case (c, i) => (i, c.toString) }
    val in = chars.toDF("ord", "c")
    val got = Ordered.distinctConsecutive(in, Seq(col("ord")), col("c"))
      .orderBy("ord").collect().map(_.getString(1)).mkString
    assert(got == "abcabc")
  }

  test("chunkBySize yields consecutive fixed chunks") {
    val out = Ordered.chunkBySize(df(25), Seq(col("v")), 10, "chunk")
      .groupBy("chunk").count().orderBy("chunk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(out == List((0L, 10L), (1L, 10L), (2L, 5L)))
  }
}
