package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Relational.{t, events, r2, r3, r4}

/** Event analytics over the `events` table — the batch/event-time
  * re-grounding of the reference's processing-time features
  * (`group(interval=)`, SURVEY §2.8). Streaming equivalents live in
  * [[graft.streaming.Streams]].
  */
object Events {

  /** Tumbling-window aggregation (event-time): the principled analog
    * of `group(interval=)` — hourly buckets per event_type. */
  def hourlyStats(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("hour", date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm"))
      .groupBy("hour", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour", "event_type")

  /** Gap-based sessionization (30-min inactivity): lag per user →
    * session boundaries → running session ids — key-partitioned
    * windows only, scales with user cardinality. */
  def sessionize(s: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame =
    sessionizeFrame(events(s, dir), gapMinutes)

  /** [[sessionize]] over any events-shaped frame — the seam that lets
    * [[purchasesInSessions]] sessionize the click stream alone. */
  def sessionizeFrame(ev: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // millisecond precision on both sides (the DuckDB oracle uses
    // epoch_ms) — second-truncation would disagree on ~30:00.x gaps
    val gapMs = gapMinutes * 60000L
    ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Interval-containment (range) join, bucketed — the join family
    * Spark has no native operator for, realized scale-correctly:
    * purchases land in the CLICK session interval that contains them.
    * The naive plan is a per-user theta join (BroadcastNestedLoop or
    * a cartesian per key — dead at 100 TB); the scalable shape BINS
    * the time axis: each session interval explodes into the hour
    * buckets it covers (intervals are short, so this is a small
    * constant fan-out), purchases carry their own hour bucket, and
    * the join becomes EQUI on (user_id, bucket) with an exact
    * containment filter after — hash join, no theta probe. Gap-based
    * sessions are disjoint per user, and a purchase has exactly one
    * bucket, so no post-join dedup is needed. The oracle runs the
    * plain BETWEEN containment — same semantics, certifying the
    * binned plan against the declarative definition. */
  def purchasesInSessions(s: SparkSession, dir: String,
      gapMinutes: Int = 30): DataFrame = {
    val ev = events(s, dir)
    // the session interval is OPEN until its inactivity gap expires
    // (that is what gap-based sessionization means), so containment
    // runs against [first click, last click + gap] — without the gap
    // extension only purchases strictly BETWEEN two clicks could ever
    // match, which on sparse purchase streams is ~never
    val sess = sessionizeFrame(ev.filter(col("event_type") === "click"),
        gapMinutes)
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("start_ts"),
        (max("ts") + expr(s"INTERVAL $gapMinutes MINUTES")).as("end_ts"))
    // buckets are EPOCH-hour integers, not date_trunc wall-clock hours:
    // truncation in a session timezone with a fractional-hour DST
    // shift steps out of phase with interval arithmetic and drops
    // in-session purchases at the transition — integer division of
    // epoch millis is timezone-free on both join sides by construction
    def epochHour(ts: Column): Column = floor(unix_millis(ts) / 3600000L)
    val sessB = sess.withColumn("hb",
      explode(sequence(epochHour(col("start_ts")), epochHour(col("end_ts")))))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("hb", epochHour(col("ts")))
    val matched = purch.join(sessB, Seq("user_id", "hb"))
      .filter(col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      .groupBy("user_id").agg(count(lit(1)).as("n_in_session"))
    purch.groupBy("user_id").agg(count(lit(1)).as("n_purchases"))
      .join(matched, Seq("user_id"), "left")
      .select(col("user_id"), col("n_purchases"),
        coalesce(col("n_in_session"), lit(0L)).as("n_in_session"))
      .orderBy("user_id")
  }

  /** Per-user session stats from [[sessionize]]. */
  def sessionStats(s: SparkSession, dir: String): DataFrame =
    sessionize(s, dir)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(max("session_id").as("n_sessions"),
        r2(sum("n_events") / count(lit(1))).as("avg_events_per_session"),
        max("n_events").as("max_session_events"))
      .orderBy("user_id")

  /** Funnel analysis — ordered-sequence conversion (click → purchase):
    * a user converts iff some purchase is at or after their FIRST
    * click. ONE shuffle on user_id, genuinely: an UNORDERED per-user
    * window (whole-partition frame — exchange, no sort) attaches each
    * user's global first-click epoch to every row, purchase rows
    * derive their lag in place, and the per-user then global
    * aggregations reuse the window's partitioning (a user-keyed JOIN
    * of purchases against a per-user aggregate would instead go
    * SortMergeJoin once |users| outgrows broadcast). Lag to convert
    * is epoch-ms arithmetic (timezone-free). */
  def clickPurchaseFunnel(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val ev = events(s, dir)
      .withColumn("first_click",
        min(when(col("event_type") === "click", unix_millis(col("ts"))))
          .over(byUser))
      .withColumn("lag_ms",
        when(col("event_type") === "purchase" && col("first_click").isNotNull &&
          unix_millis(col("ts")) >= col("first_click"),
          unix_millis(col("ts")) - col("first_click")))
    ev.groupBy("user_id")
      .agg(first(col("first_click")).as("first_click"),
        min("lag_ms").as("lag_ms"))
      .agg(count(lit(1)).as("n_users"),
        count(col("first_click")).as("n_clicked"),
        count(col("lag_ms")).as("n_converted"),
        // LONG sum then ONE double division — order-independent where
        // summing per-user double hours would be reduction-order
        // sensitive in the last ulp
        r2(sum("lag_ms") / (count(col("lag_ms")) * lit(3600000.0)))
          .as("avg_hours_to_convert"))
  }

  /** Retention cohorts: users bucketed by first-activity week; each
    * (cohort_week, week_offset) cell counts the cohort's users still
    * active that week — the classic retention matrix. Weeks are
    * epoch-ms/604800000 integer arithmetic (timezone-free, same on
    * both engines). No join: the cohort week attaches via an UNORDERED
    * per-user window (one user_id exchange, no sort — joining a
    * per-user cohort table back would go SortMergeJoin at scale);
    * then the (cohort, offset, user) distinct and the cell counts are
    * two more keyed aggregations, plus the presentation sort. */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    events(s, dir)
      .select(col("user_id"),
        floor(unix_millis(col("ts")) / lit(604800000.0)).cast("long").as("week"))
      .withColumn("cohort_week", min("week").over(byUser))
      .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  /** As-of join realized as the shuffle-parallel "union + carry-forward
    * window" pattern: attribute each purchase to the user's most recent
    * strictly-prior click. One shuffle on user_id, no range/theta join,
    * no per-row probe — the scalable formulation of `ASOF JOIN` (at
    * 100 TB both event streams shuffle once on the key and each
    * partition is a single ordered sweep). Strictly-prior = rows
    * (unboundedPreceding, -1) in (ts, event_id) order, so a click and
    * purchase sharing a timestamp resolve deterministically. */
  def purchaseAttribution(s: SparkSession, dir: String): DataFrame = {
    val byUserPrior = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = events(s, dir)
      .withColumn("click_tms",
        last(when(col("event_type") === "click", unix_millis(col("ts"))),
          ignoreNulls = true).over(byUserPrior))
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(byUserPrior))
    ev.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_purchases"),
        count(col("click_id")).as("n_attributed"),
        r2(sum((unix_millis(col("ts")) - col("click_tms")) / 1000.0) /
          count(col("click_id"))).as("avg_lag_sec"))
      .orderBy("user_id")
  }

  /** Traffic-spike detection (e08): per event_type, flag the hours
    * whose count sits more than 3σ above the TRAILING `w`-hour
    * mean — the ingestion-anomaly monitor a feed pipeline runs before
    * letting a crawl batch into the corpus (a 3σ hour is a stuck
    * crawler, a replay, or an attack, not organic growth). An hour is
    * evaluable once it has a full trailing window (nw = w observed
    * hours strictly before it).
    *
    * Scale design: the ONLY corpus-sized operation is the
    * (event_type, hour) count — one partial-aggregable shuffle; the
    * trailing window then runs over the tiny hourly frame (|types| ×
    * |hours| rows), partitioned by event_type so each series is an
    * independent ordered sweep. At 100 TB the raw stream never meets
    * a window function.
    *
    * Cross-engine determinism: the 3σ rule is evaluated ENTIRELY in
    * integer arithmetic — with dev = c·w − Σc and varw = w·Σc² −
    * (Σc)², spike ⟺ dev > 0 ∧ dev² > 9·varw (the z > 3 inequality
    * cleared of divisions and square roots), so both engines compare
    * identical longs; a zero-variance window with any increase is a
    * spike under the same rule (dev² > 0 = RHS). The reported max_z
    * rounds dev/√varw to r3 per row before the max, identical
    * doubles-from-identical-longs on both sides. Long headroom: dev²
    * holds to per-(type, hour) counts ≈ 5×10⁸ — beyond that regime
    * move the two products to DECIMAL(38,0). */
  def spikeStats(s: SparkSession, dir: String, w: Int = 6): DataFrame = {
    val hourly = events(s, dir)
      .withColumn("hb", floor(unix_millis(col("ts")) / lit(3600000L)).cast("long"))
      .groupBy("event_type", "hb").agg(count(lit(1)).as("c"))
    val tw = Window.partitionBy("event_type").orderBy("hb").rowsBetween(-w, -1)
    hourly
      .withColumn("sw", coalesce(sum("c").over(tw), lit(0L)))
      .withColumn("sq", coalesce(sum(col("c") * col("c")).over(tw), lit(0L)))
      .withColumn("nw", count(lit(1)).over(tw))
      .withColumn("dev", col("c") * w - col("sw"))
      .withColumn("varw", col("sq") * w - col("sw") * col("sw"))
      .withColumn("spike", (col("nw") === w && col("dev") > 0 &&
        col("dev") * col("dev") > lit(9L) * col("varw")).cast("long"))
      .withColumn("z", when(col("nw") === w && col("varw") > 0,
        r3(col("dev").cast("double") / sqrt(col("varw").cast("double")))))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum((col("nw") === w).cast("long")).as("n_eval"),
        sum("spike").as("n_spikes"),
        max("z").as("max_z"))
      .orderBy("event_type")
  }

  /** Per-user event-type transition matrix (e09) — the first-order
    * Markov profile of user behavior: for every (from, to) pair of
    * consecutive events of the SAME user in (ts, event_id) order, the
    * transition count and its row-normalized share P(to | from). The
    * behavioral-analytics staple (what follows a click? where do
    * sessions die?) and the input to next-event prediction baselines.
    * Reference analog: the pairwise chains of streamable's
    * `zip`/`group` composition (streamable/stream.py:263-353).
    *
    * Scale design: ONE shuffle on user_id carries the corpus through
    * the `lead` window (each partition an independent ordered sweep —
    * the e04/e06 discipline); the transition frame aggregates to
    * |types|² rows with map-side partials, and the share window runs
    * over THAT tiny frame, never the raw stream. Share is one
    * double division of two exact longs — identical IEEE on both
    * engines, r4-rounded. */
  def transitionStats(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events(s, dir)
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy("from_type")
    pairs
      .withColumn("share",
        r4(col("n").cast("double") / sum("n").over(byFrom)))
      .orderBy("from_type", "to_type")
  }

  /** Inter-event dwell-time distribution (e10) — per event_type of
    * the EARLIER event, the distribution of time to the same user's
    * next event (any type): count, exact median/p90, max. The
    * dwell-time profile behind session-gap tuning (e02's gap constant
    * should sit past the p90 of intra-session gaps) and engagement
    * analytics. Gaps stay integer MILLISECONDS end to end, so the
    * percentile interpolation reads exact-integer doubles on both
    * engines (the q25 `percentile` ≡ `quantile_cont` contract).
    *
    * Scale design: the same single user_id shuffle as e09 feeds the
    * lead window; the percentile aggregate then groups by event_type
    * — exact `percentile` is a per-group sort, the correctness
    * anchor; at 100 TB swap `approx_percentile` (t-digest, no sort),
    * the q25/q25b pairing. */
  def gapStats(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("nms", lead(col("ms"), 1).over(byUser))
      .where(col("nms").isNotNull)
      .withColumn("gap_ms", col("nms") - col("ms"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        r2(expr("percentile(gap_ms, 0.5)")).as("median_gap_ms"),
        r2(expr("percentile(gap_ms, 0.9)")).as("p90_gap_ms"),
        max("gap_ms").as("max_gap_ms"))
      .orderBy("event_type")
  }

  /** Trailing-window burst profile (e11): for every event, how many
    * events the SAME user produced in the trailing `windowMs`
    * (inclusive of the event itself) — a RANGE window frame over the
    * millisecond epoch, i.e. the time-based sliding count done
    * without self-joining or exploding per-event time buckets.
    * Summarized per event_type: exact Σ and max of the window count
    * plus how many events sit in a burst of ≥ `burstN`. This is the
    * per-event dual of e08's hourly spike gate (there the anomaly
    * unit is the wall-clock hour; here every event carries its own
    * trailing window) and the profile that sizes rate limits /
    * abuse cuts.
    *
    * Scale design: ONE user_id shuffle; the range frame is evaluated
    * in a single ordered sweep per user partition (Spark keeps a
    * sliding two-pointer over the frame bounds — no per-row rescan),
    * and the per-type reduction is a partial agg over integer counts.
    * RANGE on the epoch-ms LONG (never on a float or a timestamp
    * with engine-specific tie rules): peers at the same millisecond
    * are included by both engines by definition of RANGE, so the
    * result is arrival-order-free — a ROWS frame here would be
    * nondeterministic under equal timestamps. */
  def burstStats(s: SparkSession, dir: String,
      windowMs: Long = 600000L, burstN: Int = 3): DataFrame = {
    val trailing = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"))
      .rangeBetween(-windowMs, 0)
    events(s, dir)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("win", count(lit(1)).over(trailing))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("win").as("sum_win"),
        max("win").as("max_win"),
        sum(when(col("win") >= burstN, 1L).otherwise(0L)).as("n_bursty"))
      .orderBy("event_type")
  }

  /** Events validation gate (e12) — [[graft.ops.Curation.validationGate]]'s
    * expectation-check pattern completed for the THIRD corpus table:
    * the pre-ingest checks an event feed needs before any analytics
    * trust it. One scalar aggregate over the table (every check a
    * SUM of a violation flag — map-side partials, one reduce row),
    * stacked into the same (check_name, n_rows, n_violations, pass)
    * report shape so downstream gating reads all three tables'
    * reports uniformly. Checks: event_id uniqueness, ts non-null,
    * known event_type, value present and strictly positive, user_id
    * present and non-negative, props present. */
  def eventsGate(s: SparkSession, dir: String,
      allowedTypes: Seq[String] =
        Seq("click", "error", "purchase", "signup", "view")): DataFrame = {
    val a = events(s, dir).agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - countDistinct(col("event_id"))).as("v_dup"),
      sum(col("ts").isNull.cast("long")).as("v_ts"),
      sum((!col("event_type").isInCollection(allowedTypes)).cast("long"))
        .as("v_type"),
      sum((col("value").isNull || !(col("value") > 0.0)).cast("long"))
        .as("v_value"),
      sum((col("user_id").isNull || col("user_id") < 0L).cast("long"))
        .as("v_user"),
      sum(col("props").isNull.cast("long")).as("v_props"))
    a.selectExpr(
      "stack(6, 'evt_id_unique', n, v_dup, 'evt_ts_present', n, v_ts, " +
        "'evt_type_known', n, v_type, 'evt_value_positive', n, v_value, " +
        "'evt_user_valid', n, v_user, 'evt_props_present', n, v_props) " +
        "AS (check_name, n_rows, n_violations)")
      .withColumn("pass", (col("n_violations") === 0L).cast("long"))
      .orderBy("check_name")
  }

  /** Multi-step ordered funnel (e14) — e06's two-step conversion
    * generalized to the ordered chain view → click → purchase: a user
    * completes step k only with an event at-or-after their step-k−1
    * completion time (ties at the same millisecond count — the
    * deterministic inclusive rule, identical on both engines). The
    * k-step activation-funnel report product analytics is built on.
    *
    * Scale design: ONE user_id shuffle, genuinely — the three
    * first-completion times are STACKED UNORDERED per-user windows
    * (whole-partition frames: each is an exchange-free reuse of the
    * same hash partitioning, no sort — the e06 discipline, and
    * Catalyst plans all three Window ops over one exchange); the
    * oracle formulates the same chain as three joins, certifying the
    * window form against the declarative one. Lags stay epoch-ms
    * LONGs until the single r2 division (e06's order-independent
    * mean rule). Reference analog: the ordered pairwise chains of
    * streamable's zip/group composition (stream.py:263-353). */
  def multiStepFunnel(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val ms = unix_millis(col("ts"))
    val ev = events(s, dir)
      .withColumn("fv",
        min(when(col("event_type") === "view", ms)).over(byUser))
      .withColumn("fc",
        min(when(col("event_type") === "click" && ms >= col("fv"), ms))
          .over(byUser))
      .withColumn("fp",
        min(when(col("event_type") === "purchase" && ms >= col("fc"), ms))
          .over(byUser))
    ev.groupBy("user_id")
      .agg(first("fv").as("fv"), first("fc").as("fc"), first("fp").as("fp"))
      .agg(count(lit(1)).as("n_users"),
        count(col("fv")).as("n_viewed"),
        count(col("fc")).as("n_clicked"),
        count(col("fp")).as("n_purchased"),
        r2(sum(col("fp") - col("fv")) /
          (count(col("fp")) * lit(3600000.0))).as("avg_hours_to_convert"))
  }

  /** RFM user segmentation (e13) — the classic value-segmentation
    * matrix: purchasers scored 1–4 on Recency (last purchase time),
    * Frequency (purchase count) and Monetary (purchase value), then
    * counted per (r, f, m) cell. The audience-targeting staple, and
    * the per-user dual of e07's cohort matrix.
    *
    * Scale design: ONE user_id shuffle builds the per-user (last_ms,
    * freq, cents) frame; quartile CUTPOINTS come from a scalar
    * `percentile` aggregate over that frame, broadcast back as one
    * row — scores are then three in-row comparisons. The textbook
    * `ntile(4)` formulation is an equal-frequency global sort — a
    * single-partition window, dead at 100 TB users — so the cutpoint
    * form is the shipped shape (q37 keeps the ntile anchor; at corpus
    * scale swap the exact percentile for `approx_percentile`, the
    * q25/q25b pairing).
    *
    * Cross-engine determinism: all three metrics are exact integers
    * (epoch-ms, counts, floor-rounded cents), so the 0.25/0.5/0.75
    * interpolations are exact quarter-valued doubles on both engines
    * (`lo + (hi−lo)·2⁻²` of sub-2⁵³ integers) and every `v > cut`
    * score comparison is integer-vs-exact-quarter — no float
    * boundary. Bucket rule: score = 1 + Σ (v > q_i), higher = better
    * on all three axes (recency scored on the raw epoch, so "more
    * recent" is already "larger"). Reference analog: the group/agg
    * chains of streamable/stream.py:230-326. */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val per = events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(max("ms").as("last_ms"), count(lit(1)).as("freq"),
        sum("cents").as("mon_cents"))
      .localCheckpoint(eager = false) // one purchase scan feeds cutpoints AND scoring
    val cuts = per.agg(
      expr("percentile(last_ms, array(0.25, 0.5, 0.75))").as("rq"),
      expr("percentile(freq, array(0.25, 0.5, 0.75))").as("fq"),
      expr("percentile(mon_cents, array(0.25, 0.5, 0.75))").as("mq"))
    def score(v: Column, q: Column): Column =
      (lit(1) + (v > element_at(q, 1)).cast("int") +
        (v > element_at(q, 2)).cast("int") +
        (v > element_at(q, 3)).cast("int")).cast("long")
    per.crossJoin(broadcast(cuts))
      .select(score(col("last_ms"), col("rq")).as("r_score"),
        score(col("freq"), col("fq")).as("f_score"),
        score(col("mon_cents"), col("mq")).as("m_score"),
        col("mon_cents"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"), sum("mon_cents").as("sum_cents"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Top-10 users by total event value (deterministic tiebreak). */
  def topUsers(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("user_id")
      .agg(round(sum("value"), 2).as("total_value"), count(lit(1)).as("n"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(10)

  /** OHLC downsampling (e16): the classic time-series compaction —
    * per (hour, event_type) bucket emit open/high/low/close/count,
    * where open/close are the values of the chronologically FIRST and
    * LAST event under the total (ts, event_id) order. Expressed as
    * ONE pure aggregation: `min(struct(ts, event_id, value))` picks
    * the earliest row (struct ordering is lexicographic and event_id
    * is unique, so the tie-break is total — value never participates)
    * and `.getField("value")` projects its payload; likewise max for
    * close. Scale shape: a single hash aggregate with full map-side
    * partial combine — no window, no second shuffle, no per-bucket
    * sort; the plan that survives a 100 TB event stream because each
    * partial state is four scalars + a count per open bucket. All
    * five outputs are COPIES or exact counts (no float arithmetic),
    * so cross-engine equality is exact. The oracle formulates the
    * same semantics as row_number windows — same unique row picked.
    * Reference analog: `group(interval=...)` time-bucketing
    * (streamable/stream.py:321-353) recast as event-time
    * downsampling with ordered first/last extraction. */
  def ohlcDownsample(s: SparkSession, dir: String): DataFrame = {
    val pick = struct(col("ts"), col("event_id"), col("value"))
    events(s, dir)
      .withColumn("hour", date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm"))
      .groupBy("hour", "event_type")
      .agg(
        min(pick).getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(pick).getField("value").as("close"),
        count(lit(1)).as("n"))
      .orderBy("hour", "event_type")
  }

  /** Last-observation-carried-forward (e15): every event annotated
    * with the user's most recent PURCHASE amount — the gap-filling
    * primitive time-series features are built from (sparse signal →
    * dense per-event feature), expressed as `last(..., ignoreNulls)`
    * over a key-partitioned running frame. NULL until the user's
    * first purchase, by design — the honest "no observation yet".
    * Scale shape: one user_id shuffle, frames never cross users, no
    * global sort anywhere in the executed plan (the terminal ORDER BY
    * is oracle determinism only). */
  def lastPurchaseCarried(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("purchase_val",
        when(col("event_type") === "purchase", col("value")))
      .select(col("event_id"), col("user_id"),
        last(col("purchase_val"), ignoreNulls = true).over(w)
          .as("last_purchase"))
      .orderBy("event_id")
  }

  /** Time-weighted linear interpolation (e20) — [[lastPurchaseCarried]]'s
    * two-sided sibling and the other standard gap-fill: every event
    * annotated with the purchase value INTERPOLATED between the
    * user's previous and next purchase, weighted by event-time
    * distance (pandas `interpolate(method='time')`, the feature-
    * engineering default when a signal is assumed to drift between
    * observations rather than step). Boundary semantics compose the
    * honest halves: NULL before the first purchase (e15's "no
    * observation yet"), LOCF after the last (no future observation
    * to weight against); a purchase event reports its own value
    * (zero distance to itself). Cross-engine float discipline: the
    * interpolation expression has the IDENTICAL association on both
    * engines — v1 + (v2−v1)·(Δms/Δms_total), every input either an
    * integer-millisecond delta or a parquet double, so both engines
    * run the same correctly-rounded IEEE ops on the same bits (the
    * q-family precedent), then r4.
    *
    * Scale shape: two frames over ONE user_id shuffle (backward
    * last + forward first, both ignoreNulls over key-partitioned
    * frames — the e15 plan doubled, no extra exchange); the struct
    * pick carries (ms, value) together so the timestamp and value of
    * the bounding purchases can never come from different rows. The
    * terminal ORDER BY is oracle determinism only. Deliberately
    * batch-only: interpolation reads the FUTURE observation, so a
    * streaming twin must buffer every event until its user's next
    * purchase arrives (state bounded by the inter-observation gap,
    * not O(1)) — [[graft.streaming.Streams.locfStream]] is the
    * streaming-safe backward half. */
  def interpolatedPurchase(s: SparkSession, dir: String): DataFrame = {
    val wB = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pick = when(col("event_type") === "purchase",
      struct(col("ms"), col("value")))
    events(s, dir).withColumn("ms", unix_millis(col("ts")))
      .withColumn("pp", pick)
      .withColumn("prev", last(col("pp"), ignoreNulls = true).over(wB))
      .withColumn("nxt", first(col("pp"), ignoreNulls = true).over(wF))
      .select(col("event_id"), col("user_id"),
        r4(
          when(col("prev").isNull, lit(null))
            .when(col("nxt").isNull || col("nxt.ms") === col("prev.ms"),
              col("prev.value"))
            .otherwise(col("prev.value") +
              (col("nxt.value") - col("prev.value")) *
                ((col("ms") - col("prev.ms")).cast("double") /
                  (col("nxt.ms") - col("prev.ms")).cast("double"))))
          .as("interp_purchase"))
      .orderBy("event_id")
  }

  /** Funnel time-to-convert (e18) — the LATENCY face of the funnel
    * family: e06/e14 count who converts, this measures HOW LONG
    * signup → first-subsequent-purchase takes (the activation-lag
    * distribution growth teams tune against). Two keyed aggregations:
    * each user's first signup timestamp, then the earliest purchase
    * strictly after it (an equi-join on user_id + min — no window,
    * no per-event state), then one exact-percentile rollup over the
    * per-user deltas. Cross-engine float discipline: deltas are
    * integer milliseconds; exact `percentile` ≡ DuckDB
    * `quantile_cont` under r2 (the e10/q25 pairing — at 100 TB swap
    * `approx_percentile`, the certified q25b substitution).
    * Reference analog: the `group(by=)` + per-group reduction idiom
    * (streamable/stream.py:300-353); latency semantics are
    * extension surface. */
  def funnelTiming(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).withColumn("ms", unix_millis(col("ts")))
    val firstSignup = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ms").as("s_ms"))
    val deltas = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ms"))
      .join(firstSignup, "user_id")
      .where(col("ms") > col("s_ms"))
      .groupBy("user_id", "s_ms").agg((min("ms") - col("s_ms")).as("delta_ms"))
    deltas.agg(
      count(lit(1)).as("n_converted"),
      min("delta_ms").as("min_ms"),
      r2(expr("percentile(delta_ms, 0.5)")).as("median_ms"),
      r2(expr("percentile(delta_ms, 0.9)")).as("p90_ms"),
      max("delta_ms").as("max_ms"))
  }

  /** Rolling 7-day active users + stickiness (e19) — the DAU/WAU
    * dashboard pair. The naive formulation re-scans the stream once
    * per window; here each DISTINCT (day, user) activity pair (one
    * dedup shuffle — the stream compresses to its activity matrix)
    * fans out to the ≤7 window-days it supports via an in-row
    * `explode(sequence(...))`, and one count-distinct per window-day
    * finishes it. Stickiness = dau·1000 // wau in exact integers.
    * Emitted for window-days with a FULL 7-day history (the honest
    * dashboard convention — a 3-day-old product does not have 100%
    * stickiness). A window-day whose ENTIRE trailing week has zero
    * activity is OMITTED, not reported as 0/0: the fan-out generates
    * window-days only from observed activity, so a corpus gap longer
    * than 6 days leaves a hole in the series (Spark and the oracle
    * agree — a deliberate semantics choice; densify downstream with a
    * calendar join if a dashboard needs explicit zero rows).
    * Reference analog: `group(interval=)`'s
    * time-bucketed consumption (streamable/stream.py:300-326) —
    * sliding distinct-user windows are extension surface. */
  def rollingActiveUsers(s: SparkSession, dir: String): DataFrame = {
    val act = events(s, dir)
      .select(datediff(col("ts").cast("date"), lit("2024-01-01"))
        .cast("long").as("day"), col("user_id"))
      .distinct()
    val dau = act.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val wau = act
      .select(explode(sequence(col("day"), col("day") + 6)).as("wday"),
        col("user_id"))
      .groupBy("wday").agg(countDistinct("user_id").as("wau"))
    val bounds = act.agg(min("day").as("d_lo"), max("day").as("d_hi"))
    // LEFT from wau: a window-day with activity in its trailing week
    // but none ON the day itself reports dau = 0, it does not vanish
    wau.join(dau.withColumnRenamed("day", "wday"), Seq("wday"), "left")
      .crossJoin(broadcast(bounds))
      .where(col("wday") >= col("d_lo") + 6 && col("wday") <= col("d_hi"))
      .select(col("wday").as("day"),
        coalesce(col("dau"), lit(0L)).as("dau"), col("wau"),
        floor(coalesce(col("dau"), lit(0L)) * lit(1000L) / col("wau"))
          .cast("long").as("stickiness_milli"))
      .orderBy("day")
  }

  /** The e17 behavioral patterns: regex over each user's event-type
    * character sequence (first letters are distinct across the five
    * types). Non-overlapping leftmost-greedy counting — identical in
    * java.util.regex and RE2 for this anchored-free pattern class. */
  private[graft] val seqPatterns = Seq(
    ("click_error", "ce"),        // a click immediately going wrong
    ("signup_then_purchase", "s.*p"), // activation (≤1 match/user: greedy)
    ("view_burst_3plus", "vvv+")) // ≥3 consecutive views, run-counted

  /** Event-sequence pattern mining (e17) — MATCH_RECOGNIZE-lite: each
    * user's history collapses to ONE character string in (ts,
    * event_id) order (the e09 total-order discipline) and behavioral
    * patterns are plain regexes counted per user. The funnel family
    * (e06/e14) asks "did steps happen in order, ever"; this asks for
    * ADJACENCY and REPETITION — 'ce' is a click immediately followed
    * by an error (no events between), which no join-based funnel can
    * express without a window per step.
    *
    * Scale design: ONE user_id shuffle (groupBy + in-row
    * `array_sort(collect_list(struct))` — per-user state is the
    * user's own history, the same bound every sessionize carries;
    * note the bound is PER-USER ACTIVITY, so a pathological bot user
    * with 10⁸ events concentrates its whole history string on one
    * executor — for unbounded per-user histories run
    * [[graft.streaming.Streams.seqPatternStream]], whose closed-form
    * O(1) carry-state never materializes the sequence);
    * all three patterns count in the SAME pass over the tiny
    * per-user string frame (three codegen'd regexp_count columns, no
    * re-scan), and the 3-row report is the e12 stacked-union shape.
    * Counts of longs only — nothing floating crosses engines.
    * Reference analog: the reference's `group(by=)` +
    * per-group inspection idiom (streamable/stream.py:300-353);
    * pattern semantics are extension surface. */
  def seqPatternStats(s: SparkSession, dir: String): DataFrame = {
    val seqs = events(s, dir)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ch")).as("x"))
      .groupBy("user_id")
      .agg(concat_ws("", transform(array_sort(collect_list(col("x"))),
        e => e.getField("ch"))).as("seq"))
    val counted = seqs.select(seqPatterns.zipWithIndex.flatMap {
      case ((_, re), i) => Seq(
        regexp_count(col("seq"), lit(re)).as(s"m$i"))
    }: _*)
    val aggCols = seqPatterns.indices.flatMap { i => Seq(
      sum((col(s"m$i") > 0).cast("long")).as(s"u$i"),
      sum(col(s"m$i")).as(s"t$i")) }
    counted.agg(aggCols.head, aggCols.tail: _*)
      .select(explode(array(seqPatterns.zipWithIndex.map {
        case ((name, _), i) => struct(lit(name).as("pattern"),
          col(s"u$i").as("n_users"), col(s"t$i").as("n_matches"))
      }: _*)).as("r"))
      .select("r.pattern", "r.n_users", "r.n_matches")
      .orderBy("pattern")
  }
}
