package graft.stream

import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.{ExecutionContext, Future}

/** Mirrors the reference's concurrency contracts
  * (tests/test_stream.py:376-435, :455-500, :741-791) at the logic
  * level: results, ordering, laziness, error flow — no wall-clock
  * assertions (SURVEY §7.3).
  */
class ConcurrentIteratorsSpec extends AnyFunSuite {

  test("ordered concurrent map preserves FIFO order") {
    val out = new ConcurrentMapIterator[Int, Int](
      (1 to 100).iterator, x => { Thread.sleep((x % 3)); x * 2 }, 4, ordered = true).toList
    assert(out == (1 to 100).map(_ * 2).toList)
  }

  test("unordered concurrent map yields all results (any order)") {
    val out = new ConcurrentMapIterator[Int, Int](
      (1 to 100).iterator, x => { Thread.sleep(x % 3); x * 2 }, 4, ordered = false).toList
    assert(out.sorted == (1 to 100).map(_ * 2).toList)
  }

  test("laziness: nothing pulled before first next()") {
    // reference contract tests/test_stream.py:741-791
    var pulled = 0
    val src = (1 to 10).iterator.map { x => pulled += 1; x }
    val it = new ConcurrentMapIterator[Int, Int](src, identity, 2, ordered = true)
    assert(pulled == 0)
    it.next()
    assert(pulled >= 1 && pulled <= 3) // concurrency-bounded prefetch
  }

  test("bounded in-flight window: at most concurrency pulled ahead") {
    var pulled = 0
    val src = (1 to 100).iterator.map { x => pulled += 1; x }
    val it = new ConcurrentMapIterator[Int, Int](src, identity, 4, ordered = true)
    it.next(); it.next()
    assert(pulled <= 2 + 4 + 1, s"pulled $pulled, window must stay bounded")
  }

  test("exception propagates but iterator can continue (catch-resume)") {
    // reference: map "must not stop after one exception occured"
    // (tests/test_stream.py:555-576)
    val it = new ConcurrentMapIterator[Int, Int](
      (1 to 5).iterator, x => if (x == 3) throw new IllegalStateException("boom") else x,
      2, ordered = true)
    val got = scala.collection.mutable.ArrayBuffer[Int]()
    var errs = 0
    while (it.hasNext) {
      try got += it.next()
      catch { case _: IllegalStateException => errs += 1 }
    }
    assert(got.toList == List(1, 2, 4, 5) && errs == 1)
  }

  test("async map: ordered results, bounded window, error flow") {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val out = new AsyncMapIterator[Int, Int](
      (1 to 50).iterator,
      x => Future { Thread.sleep(x % 3); x + 1 }, 8, ordered = true).toList
    assert(out == (2 to 51).toList)

    val it = new AsyncMapIterator[Int, Int](
      (1 to 4).iterator,
      x => if (x == 2) Future.failed(new IllegalStateException("async boom"))
      else Future.successful(x), 2, ordered = true)
    val got = scala.collection.mutable.ArrayBuffer[Int]()
    var errs = 0
    while (it.hasNext) {
      try got += it.next()
      catch { case _: Throwable => errs += 1 }
    }
    assert(got.toList == List(1, 3, 4) && errs == 1)
  }

  test("unordered async map returns all results") {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val out = new AsyncMapIterator[Int, Int](
      (1 to 30).iterator, x => Future { Thread.sleep(x % 5); x }, 4,
      ordered = false).toList
    assert(out.sorted == (1 to 30).toList)
  }
}
