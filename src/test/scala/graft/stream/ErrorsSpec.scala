package graft.stream

import graft.SparkSpec

/** Error-channel semantics mirroring the reference catch matrix
  * (tests/test_stream.py:1301-1443): swallow / replace / selective
  * re-raise / finally_raise. */
class ErrorsSpec extends SparkSpec {

  private def risky = {
    val s = spark
    import s.implicits._
    // reference fixture: 1/n over a range with a poison value
    Errors.mapSafe(s.createDataset(Seq(1, 2, 0, 4)))(x => 12 / x)
  }

  test("mapSafe turns exceptions into failure rows, not task failures") {
    val rows = risky.collect()
    assert(rows.count(_.isSuccess) == 3)
    val f = rows.find(!_.isSuccess).get
    assert(f.errorClass.get == "java.lang.ArithmeticException")
  }

  test("catchDrop swallows matching errors (element dropped)") {
    val s = spark; import s.implicits._
    assert(Errors.catchDrop(risky).collect().sorted.toList == List(3, 6, 12))
  }

  test("catchDrop re-raises non-matching errors") {
    val s = spark; import s.implicits._
    val ex = intercept[Exception] {
      Errors.catchDrop(risky, kind = _.contains("NullPointer")).collect()
    }
    assert(ex.getMessage.contains("ArithmeticException") ||
      Option(ex.getCause).exists(_.getMessage.contains("ArithmeticException")))
  }

  test("catchReplace substitutes the replacement value") {
    val s = spark; import s.implicits._
    assert(Errors.catchReplace(risky, replacement = -1).collect().sorted.toList ==
      List(-1, 3, 6, 12))
  }

  test("runFinallyRaise completes the pass then raises with count+first") {
    val s = spark; import s.implicits._
    val ex = intercept[StreamErrorsException] { Errors.runFinallyRaise(s, risky) }
    assert(ex.errorCount == 1)
    assert(ex.first.contains("ArithmeticException"))
  }

  test("runFinallyRaise returns success count when clean") {
    val s = spark; import s.implicits._
    val clean = Errors.mapSafe(s.createDataset(Seq(1, 2, 3)))(_ * 2)
    assert(Errors.runFinallyRaise(s, clean) == 3)
  }

  test("a diagnostics-free failure (Attempt(None,None,None)) still counts as an error") {
    val s = spark; import s.implicits._
    // the isSuccess invariant is value.isDefined; errorClass being
    // unset must not let a failed element masquerade as success
    val mixed = s.createDataset(Seq(
      Attempt.success(1), Attempt[Int](None, None, None)))
    val ex = intercept[StreamErrorsException] { Errors.runFinallyRaise(s, mixed) }
    assert(ex.errorCount == 1)
    assert(Errors.catchDrop(mixed).collect().toList == List(1))
    assert(Errors.catchReplace(mixed, replacement = -1).collect().sorted.toList ==
      List(-1, 1))
  }

  test("a null 'success' becomes a channel failure, never a silent masked row") {
    val s = spark; import s.implicits._
    // Some(null) and None encode to the same SQL NULL, so Attempt.of
    // converts null results to failures (documented contract)
    val a = graft.stream.Attempt.of[String](null)
    assert(!a.isSuccess && a.errorClass.get == "java.lang.NullPointerException")
    val ds = s.createDataset(Seq(graft.stream.Attempt.of[String]("ok"),
      graft.stream.Attempt.of[String](null)))
    val ex = intercept[StreamErrorsException] { Errors.runFinallyRaise(s, ds) }
    assert(ex.errorCount == 1)
  }

  test("errors flow through downstream ops (exception flow-through)") {
    val s = spark; import s.implicits._
    // reference: an exception doesn't terminate iteration; downstream
    // ops keep consuming (tests/test_stream.py:555-576)
    val downstream = risky.filter((a: Attempt[Int]) => a.value.forall(_ > 3))
    assert(downstream.collect().count(_.isSuccess) == 2) // 6, 12
    assert(downstream.collect().count(!_.isSuccess) == 1) // poison row flows
  }
}
