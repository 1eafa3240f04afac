package graft.stream

import org.scalatest.funsuite.AnyFunSuite

/** Token-bucket math with an injected clock — deterministic versions
  * of the reference's wall-clock throttle contracts
  * (tests/test_stream.py:1240-1266, tests/test_readme.py:104-123). */
class FlowSpec extends AnyFunSuite {

  private def simulate(perSecond: Double, intervalMs: Long, n: Int): Seq[Long] = {
    var now = 0L
    val rl = new Flow.RateLimiter(perSecond = perSecond,
      intervalMs = intervalMs, nowMs = () => now)
    (1 to n).map { _ =>
      val d = rl.nextDelayMs()
      now += d // caller "sleeps" exactly the requested delay
      now
    }
  }

  test("throttle(per_second=k): N yields take ceil(N/k)-1 seconds") {
    // reference contract: 10 elements at 2/s -> 4 s
    val times = simulate(perSecond = 2, intervalMs = 0, n = 10)
    assert(math.abs(times.last - 4000L) <= 600,
      s"expected ~4000ms, got ${times.last}")
  }

  test("throttle(interval=i): N yields take (N-1)*i") {
    val times = simulate(perSecond = 0, intervalMs = 100, n = 10)
    assert(times.last == 900L)
  }

  test("combined bounds: most restrictive wins") {
    // 5/s with 10ms interval -> per-second dominates: ~ (10-1)/5 s
    val a = simulate(perSecond = 5, intervalMs = 10, n = 10)
    assert(a.last >= 1600 && a.last <= 2000, s"got ${a.last}")
    // 20/s with 200ms interval -> interval dominates: (10-1)*200
    val b = simulate(perSecond = 20, intervalMs = 200, n = 10)
    assert(b.last == 1800L, s"got ${b.last}")
  }

  test("first element passes immediately") {
    assert(simulate(perSecond = 1, intervalMs = 0, n = 1).head == 0L)
  }

  test("exponential log cadence fires at powers of two") {
    val fired = (1L to 64L).filter(Flow.shouldLog)
    assert(fired == Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L))
  }

  test("partitionShare divides by CONCURRENT partitions, not total") {
    // 1000 partitions on 32 cores: only 32 buckets drain at once, so
    // the share must be global/32 — global/1000 would realize ~3% of
    // the requested rate
    assert(Flow.partitionShare(320.0, parts = 1000, maxConcurrent = 32) == 10.0)
    // fewer partitions than cores: every partition runs, divide by all
    assert(Flow.partitionShare(100.0, parts = 4, maxConcurrent = 32) == 25.0)
    assert(Flow.partitionShare(5.0, parts = 0, maxConcurrent = 0) == 5.0)
  }
}
