package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import scala.reflect.ClassTag
import scala.util.{Failure, Success, Try}

/** The reference's signature feature: a per-element error channel
  * (`catch`, streamable/stream.py:112-131, iterators.py:61-95).
  *
  * In Spark an uncaught exception in a task kills the job, so the
  * channel must be *errors-as-data*: risky lambdas are wrapped in
  * [[Attempt]] columns that flow through downstream operators —
  * exactly the reference's "an exception does not terminate
  * iteration" contract (tests/test_stream.py:555-576). At 100 TB this
  * is also the only sane design: one poison row out of 10^11 must not
  * cost a 4-hour job.
  */
final case class Attempt[T](value: Option[T], errorClass: Option[String],
    errorMsg: Option[String]) {
  def isSuccess: Boolean = value.isDefined
}

object Attempt {
  def success[T](t: T): Attempt[T] = Attempt(Some(t), None, None)
  def failure[T](e: Throwable): Attempt[T] =
    Attempt(None, Some(e.getClass.getName), Some(Option(e.getMessage).getOrElse("")))
  /** A null success is CONVERTED TO A FAILURE: `Some(null)` and `None`
    * encode to the same SQL NULL in the Dataset column, so a null
    * "success" would be indistinguishable from a failed element on the
    * DataFrame side (and would mask real failures in
    * [[Errors.runFinallyRaise]]'s value-is-null split). The channel's
    * contract is therefore: successes are non-null; map null to a
    * sentinel value before mapSafe if it is a legitimate result. */
  def of[T](thunk: => T): Attempt[T] = Try(thunk) match {
    case Success(null) =>
      failure(new NullPointerException(
        "null success is not representable in the Attempt channel"))
    case Success(t) => success(t)
    case Failure(e) => failure(e)
  }
}

object Errors {

  /** Map with the error channel open: failures become `Attempt.failure`
    * rows instead of task failures. */
  def mapSafe[T, U](ds: Dataset[T])(f: T => U)(
      implicit e: Encoder[Attempt[U]]): Dataset[Attempt[U]] =
    ds.map(t => Attempt.of(f(t)))

  /** `catch(kind, when)` with no replacement: drop failing elements
    * whose error matches; re-raise others (reference
    * stream.py:112-131 — non-matching exceptions propagate). */
  def catchDrop[U](ds: Dataset[Attempt[U]],
      kind: String => Boolean = _ => true,
      when: String => Boolean = _ => true)(
      implicit e: Encoder[U]): Dataset[U] =
    ds.flatMap {
      case Attempt(Some(u), _, _) => Some(u)
      case Attempt(_, k, m) if kind(k.getOrElse("unknown")) && when(m.getOrElse("")) => None
      case Attempt(_, k, m) =>
        throw new RuntimeException(s"uncaught stream error ${k.orNull}: ${m.orNull}")
    }

  /** `catch(replacement=r)`: failing elements are replaced. */
  def catchReplace[U](ds: Dataset[Attempt[U]], replacement: U,
      kind: String => Boolean = _ => true)(
      implicit e: Encoder[U]): Dataset[U] =
    ds.map {
      case Attempt(Some(u), _, _) => u
      case Attempt(_, k, _) if kind(k.getOrElse("unknown")) => replacement
      case Attempt(_, k, m) =>
        throw new RuntimeException(s"uncaught stream error ${k.orNull}: ${m.orNull}")
    }

  /** `finally_raise=True` (reference iterators.py:83-91: remember the
    * FIRST caught error, raise at exhaustion): run the pipeline to
    * exhaustion, then raise if any element failed. Returns the
    * successful values' count.
    *
    * Counts come from a single aggregation action, so they are
    * exactly-once even under task retries/speculation (accumulators in
    * transformations are only at-least-once). "First" error is
    * best-effort across partitions, matching the reference's
    * single-threaded notion only up to partition order.
    */
  def runFinallyRaise[U: ClassTag](spark: SparkSession, ds: Dataset[Attempt[U]])(
      implicit e: Encoder[Attempt[U]]): Long = {
    import org.apache.spark.sql.functions._
    // ok/err split on the isSuccess invariant (`value` defined), NOT
    // on errorClass: a hand-built Attempt(None, None, None) is a
    // failed element with no diagnostics and must still count as one.
    val row = ds.toDF().select(
      count(when(col("value").isNotNull, lit(1))).as("ok"),
      count(when(col("value").isNull, lit(1))).as("err"),
      first(when(col("value").isNull,
        concat_ws(": ", coalesce(col("errorClass"), lit("unknown")),
          coalesce(col("errorMsg"), lit("")))),
        ignoreNulls = true).as("firstErr")
    ).head()
    val err = row.getLong(1)
    if (err > 0)
      throw new StreamErrorsException(err, Option(row.getString(2)).getOrElse("?"))
    row.getLong(0)
  }
}

final class StreamErrorsException(val errorCount: Long, val first: String)
  extends RuntimeException(s"$errorCount element(s) failed; first: $first")
