package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Flow control: the reference's processing-time features
  * (`throttle`, `observe`, streamable/stream.py:413-477) re-grounded
  * for a distributed engine.
  *
  * A batch Spark job has no per-element yield cadence, so `throttle`
  * survives in two places: (a) a token-bucket used inside
  * `foreachPartition` when writing to rate-limited sinks/APIs, and
  * (b) streaming source rate configs + processing-time triggers (see
  * [[graft.streaming.Streams]]). The bucket math is deterministic and
  * unit-tested; wall-clock behavior is not asserted (SURVEY §7.3).
  */
object Flow {

  /** Token bucket: permits `perSecond` acquisitions per sliding second
    * and/or a minimum `intervalMs` between acquisitions — the most
    * restrictive bound wins, matching the reference's composed
    * iterators (streamable/functions.py:194-203,
    * tests/test_stream.py:1248-1266). `nowMs` is injectable for
    * deterministic tests.
    */
  final class RateLimiter(perSecond: Double, intervalMs: Long = 0,
      nowMs: () => Long = () => System.currentTimeMillis()) {
    require(perSecond > 0 || intervalMs > 0)
    private var tokens: Double = if (perSecond > 0) 1.0 else 0.0
    private var lastRefill: Long = -1L
    private var lastYield: Long = -1L

    /** Milliseconds the caller must wait before the next element may
      * pass; 0 if it may pass now. Calling this advances state as if
      * the caller waited exactly that long and then yielded. */
    def nextDelayMs(): Long = {
      val now = nowMs()
      if (lastRefill < 0) lastRefill = now
      var delay = 0L
      if (perSecond > 0) {
        tokens = math.min(1.0 + perSecond, tokens + (now - lastRefill) * perSecond / 1000.0)
        lastRefill = now
        if (tokens < 1.0) delay = math.ceil((1.0 - tokens) * 1000.0 / perSecond).toLong
        tokens = tokens + delay * perSecond / 1000.0 - 1.0
        lastRefill = now + delay
      }
      if (intervalMs > 0 && lastYield >= 0) {
        val gap = now + delay - lastYield
        if (gap < intervalMs) delay += intervalMs - gap
      }
      lastYield = now + delay
      delay
    }

    /** Blocking acquire (used in foreachPartition sinks). */
    def acquire(): Unit = {
      val d = nextDelayMs()
      if (d > 0) Thread.sleep(d)
    }
  }

  /** Rate-limited distributed side-effect: each partition gets its own
    * bucket with a per-partition share of the global rate — total
    * cluster-wide rate ≈ `globalPerSecond` without any coordination
    * (coordination-free = scales to 1000 executors). */
  def throttledForeach[T](ds: Dataset[T], globalPerSecond: Double)(
      effect: T => Unit): Unit = {
    val parts = math.max(1, ds.rdd.getNumPartitions)
    val perPartition = globalPerSecond / parts
    ds.foreachPartition { (it: Iterator[T]) =>
      val rl = new RateLimiter(perPartition)
      it.foreach { t => rl.acquire(); effect(t) }
    }
  }

  /** `observe(what)` analog (reference stream.py:413-430): named
    * metrics attached to the plan, surfaced post-action via
    * `df.collectResult`/QueryExecutionListener — no extra pass over
    * the data, unlike the reference's wrapping iterator. */
  def observed[T](ds: Dataset[T], name: String): Dataset[T] =
    ds.observe(name, count(lit(1)).as("count"))

  /** Exponential log cadence check (reference iterators.py:376-393:
    * log at 1, 2, 4, 8... yields to avoid flooding). Pure function for
    * driver-side progress loops. */
  def shouldLog(n: Long): Boolean = n > 0 && (n & (n - 1)) == 0
}
