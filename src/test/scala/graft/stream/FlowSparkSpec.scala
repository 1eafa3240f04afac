package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Spark-side flow-control pieces: observe metrics and distributed
  * throttling (logic only — wall-clock is covered deterministically in
  * FlowSpec). */
class FlowSparkSpec extends SparkSpec {

  test("observed attaches a named metric visible post-action") {
    val s = spark
    import s.implicits._
    @volatile var seen: Option[Long] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("pipe-progress").foreach { row =>
          seen = Some(row.getAs[Long]("count"))
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    try {
      Flow.observed(s.range(123).as[Long], "pipe-progress").collect()
      // listener fires asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (seen.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(seen.contains(123L))
    } finally s.listenerManager.unregister(listener)
  }

  test("observedAttempts reports ok and error counts from one action") {
    val s = spark
    import s.implicits._
    @volatile var seen: Option[(Long, Long)] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("attempt-progress").foreach { row =>
          seen = Some((row.getAs[Long]("ok"), row.getAs[Long]("errors")))
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    try {
      // 100 elements, every 7th fails: 15 failures among 0..99
      // (0, 7, ..., 98)
      val attempts = Errors.mapSafe(s.range(100).as[Long]) { i =>
        if (i % 7 == 0) throw new IllegalStateException(s"poison $i") else i * 2
      }
      Flow.observedAttempts(attempts, "attempt-progress").collect()
      val deadline = System.currentTimeMillis() + 10000
      while (seen.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(seen.contains((85L, 15L)))
    } finally s.listenerManager.unregister(listener)
  }

  test("throttledForeach delivers every element exactly once") {
    val s = spark
    import s.implicits._
    val acc = s.sparkContext.longAccumulator("delivered")
    // high rate: we assert delivery semantics, not wall-clock
    Flow.throttledForeach(s.range(200).as[Long], globalPerSecond = 1e6)(_ => acc.add(1))
    assert(acc.value == 200L)
  }
}
