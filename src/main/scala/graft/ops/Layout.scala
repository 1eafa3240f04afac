package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Relational.t

/** Z-order (Morton curve) data layout — the multi-dimensional
  * clustering axis (Delta/Iceberg `OPTIMIZE ZORDER BY`, Bayer 1996's
  * UB-tree ordering). A single sort key can make parquet row-group
  * min/max statistics selective for ONE dimension only; interleaving
  * the bits of two range-quantized dimensions yields a key whose
  * contiguous ranges are axis-aligned RECTANGLES, so a layout sorted
  * by it gives file-skipping on EITHER predicate column. At 100 TB
  * this is the difference between "queries filtering on customer
  * prune 99% of files, queries filtering on date read everything"
  * and both pruning — the layout is written once
  * ([[zorderWrite]]: repartitionByRange on z + sortWithinPartitions,
  * one exchange) and every downstream scan collects the benefit via
  * plain static/dynamic file pruning, no new operator needed at read
  * time.
  *
  * Everything is exact integer arithmetic (quantize = floor-div
  * min-max scaling to 16 bits, spread = the binary-magic-numbers bit
  * interleave), built from codegen'd builtins (`shiftleft`,
  * `bitwiseAND/OR`) — no UDF, whole-stage codegen keeps the z
  * computation inside the scan's project. Reference analog: the
  * reference has no layout layer at all (a single-process iterator
  * never re-reads); this extends the engine the way its `map` chains
  * extend per-element transforms (streamable/stream.py:230-326).
  */
object Layout {

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit value (0babcd → 0b0a0b0c0d), the classic magic-number
    * cascade. Input must be in [0, 65535]. */
  def spread16(c: Column): Column = {
    def step(x: Column, shift: Int, mask: Long): Column =
      x.bitwiseOR(shiftleft(x, shift)).bitwiseAND(lit(mask))
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = step(x0, 8, 0x00FF00FFL)
    val x2 = step(x1, 4, 0x0F0F0F0FL)
    val x3 = step(x2, 2, 0x33333333L)
    step(x3, 1, 0x55555555L)
  }

  /** floor of the double quotient in [[quant16]] equals integer
    * floor-div only while (v-lo)*65535 < 2^53, i.e. while the
    * dimension span stays below this bound (~1.37e11 ≈ 2^37). */
  val maxExactSpan: Long = ((1L << 53) - 1) / 65535L

  /** Min-max quantization of `v` to [0, 65535] given the dimension's
    * observed bounds — exact floor-div integer arithmetic (the
    * degenerate all-one-value dimension maps to 0 via the
    * greatest(,1) guard). Total over ALL long inputs: a span beyond
    * [[maxExactSpan]] would silently diverge from floor-div (the
    * double quotient loses ulps past 2^53), so it raises instead —
    * and so does a span whose `hi - lo` itself leaves Long range (lo
    * near Long.MinValue with hi positive): the span is computed with
    * `try_subtract`, whose NULL-on-overflow falls through the guard
    * into the raise branch instead of wrapping negative and
    * quantizing garbage (under ANSI mode a plain subtraction would
    * throw a generic ARITHMETIC_OVERFLOW; this raises the same
    * actionable message on every config). Both guards live inside
    * the consumed column, not a droppable side check, so Catalyst
    * cannot prune them. */
  def quant16(v: Column, lo: Column, hi: Column): Column = {
    val span = try_subtract(hi, lo)
    when(span >= lit(0L) && span <= lit(maxExactSpan),
      floor(((v - lo) * lit(65535L)) / greatest(span, lit(1L)))
        .cast("long"))
      .otherwise(raise_error(format_string(
        "quant16: dimension span %s (negative/overflow means hi - lo " +
          "left Long range) exceeds the exact floor-div range " +
          "(max %d) — pre-bucket or rescale the dimension",
        coalesce(span.cast("string"), lit("overflow")),
        lit(maxExactSpan))).cast("long"))
  }

  /** The 32-bit Morton key of two 16-bit quantized dimensions. */
  def morton(qa: Column, qb: Column): Column =
    spread16(qa).bitwiseOR(shiftleft(spread16(qb), 1))

  /** Spread the low 16 bits of `c` to every THIRD bit position of a
    * 48-bit value — the classic 3-d Morton magic-number cascade (the
    * published 21-bit-capable constants; 16-bit inputs occupy their
    * low subset). Input must be in [0, 65535]. */
  def spread3(c: Column): Column = {
    def step(x: Column, shift: Int, mask: Long): Column =
      x.bitwiseOR(shiftleft(x, shift)).bitwiseAND(lit(mask))
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = step(x0, 32, 0x1f00000000ffffL)
    val x2 = step(x1, 16, 0x1f0000ff0000ffL)
    val x3 = step(x2, 8, 0x100f00f00f00f00fL)
    val x4 = step(x3, 4, 0x10c30c30c30c30c3L)
    step(x4, 2, 0x1249249249249249L)
  }

  /** The 48-bit Morton key of THREE 16-bit quantized dimensions —
    * the layout generalizes past two axes with zero new machinery:
    * quantize each dimension ([[quant16]]), interleave bits every
    * third position, sort. Still pure codegen'd builtins inside the
    * scan's project. */
  def morton3(qa: Column, qb: Column, qc: Column): Column =
    spread3(qa).bitwiseOR(shiftleft(spread3(qb), 1))
      .bitwiseOR(shiftleft(spread3(qc), 2))

  /** Orders quantized onto the 16-bit (o_custkey, order-day) plane —
    * bounds derived in one tiny agg job and broadcast (one-row frame)
    * into the scan. The shared front half of both curve layouts. */
  def ordersQuantized(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      col("o_orderkey"),
      col("o_custkey").cast("long").as("ck"),
      datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("day"))
    val rng = o.agg(
      min("ck").as("ck_min"), max("ck").as("ck_max"),
      min("day").as("day_min"), max("day").as("day_max"))
    o.crossJoin(broadcast(rng))
      .withColumn("qck", quant16(col("ck"), col("ck_min"), col("ck_max")))
      .withColumn("qday", quant16(col("day"), col("day_min"), col("day_max")))
  }

  /** Orders annotated with their z-value over the quantized plane. */
  def ordersWithZ(s: SparkSession, dir: String): DataFrame =
    ordersQuantized(s, dir)
      .withColumn("z", morton(col("qck"), col("qday")))
      .select("o_orderkey", "ck", "day", "z")

  /** Z-order locality report (l01): bucket the curve by its top 8
    * bits (256 contiguous curve segments — the file-grain a
    * z-sorted layout would produce) and report each bucket's bounding
    * rectangle in the ORIGINAL dimensions. The curve's guarantee made
    * measurable: every bucket's (ck, day) ranges are narrow on BOTH
    * axes (the spec asserts the summed rectangle area is a small
    * fraction of naive single-key layouts'), which is exactly the
    * min/max-statistics selectivity a scan planner prunes with.
    * Deterministic integers end-to-end; the oracle replays the
    * quantize/spread/interleave cascade verbatim. */
  def zorderLocality(s: SparkSession, dir: String): DataFrame =
    ordersWithZ(s, dir)
      .withColumn("bucket", floor(col("z") / lit(1L << 24)).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("ck").as("ck_lo"), max("ck").as("ck_hi"),
        min("day").as("day_lo"), max("day").as("day_hi"))
      .orderBy("bucket")

  /** Hilbert-curve locality report (l02): the layout family's
    * stronger member — the Hilbert curve is the space-filling curve
    * with NO quadrant jumps (consecutive indices are always grid
    * neighbors, the property the OpsSpec adjacency test pins on a
    * full sub-lattice). At THIS report's dyadic top-8-bit grain the
    * two curves induce the identical 4096×4096 cell partition (a
    * 2^24-aligned index range is a quadrant-descent prefix for
    * both), so here Hilbert's rectangles are exactly as tight as
    * Morton's — the report certifies the kernel and the shared
    * multi-dim bound. The no-jump property pays at NON-dyadic cuts
    * (files split at arbitrary row counts): a Hilbert segment of
    * length L keeps O(√L) diameter where a straddling Morton segment
    * leaps the plane — measured by [[curvePruning]] (l03) and the
    * physical read-side spec.
    * The index is a native codegen kernel
    * ([[graft.functions.HilbertIndex]]: sixteen register-loop levels,
    * no UDF, no chained projections), the same shape/report as
    * [[zorderLocality]] so the two curves are directly comparable,
    * and the oracle replays the identical staged arithmetic as
    * sixteen generated CTE stages. */
  def hilbertLocality(s: SparkSession, dir: String): DataFrame =
    ordersQuantized(s, dir)
      .withColumn("h",
        graft.functions.HilbertIndex(col("qck"), col("qday")))
      .withColumn("bucket", floor(col("h") / lit(1L << 24)).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("ck").as("ck_lo"), max("ck").as("ck_hi"),
        min("day").as("day_lo"), max("day").as("day_hi"))
      .orderBy("bucket")

  /** Three-dimensional Morton locality report (l04): [[zorderLocality]]
    * generalized to the (customer, order-day, price-cents) CUBE —
    * the "three common predicate columns" case a 100 TB layout
    * actually faces (Delta/Iceberg `ZORDER BY (a, b, c)`). Orders
    * quantize onto the 16-bit cube ([[quant16]] per dimension, price
    * at integer cents via an identically-associated floor(×100) on
    * both engines), interleave through [[morton3]] into a 48-bit
    * key, and bucket by its top 12 bits — 4096 cells, each an
    * axis-aligned BOX spanning 1/16 of EVERY dimension's quantized
    * range: the min/max statistics a scan planner prunes with stay
    * selective on all three predicate columns at once, where a
    * single-key sort bounds one and a 2-d curve two. Exact integer
    * arithmetic end-to-end; the oracle replays the quantize +
    * five-stage spread cascade + interleave verbatim. Write path:
    * pass [[morton3]]'s key through the same range-exchange shape as
    * [[zorderWrite]] (the curve key is a drop-in). Reference analog:
    * the reference has no layout layer (streamable/stream.py is a
    * single-pass iterator); extension surface per the survey
    * discipline. */
  def zorder3Locality(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      col("o_custkey").cast("long").as("ck"),
      datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("day"),
      floor(col("o_totalprice") * lit(100)).cast("long").as("cents"))
    val rng = o.agg(
      min("ck").as("ck_min"), max("ck").as("ck_max"),
      min("day").as("day_min"), max("day").as("day_max"),
      min("cents").as("c_min"), max("cents").as("c_max"))
    o.crossJoin(broadcast(rng))
      .withColumn("z3", morton3(
        quant16(col("ck"), col("ck_min"), col("ck_max")),
        quant16(col("day"), col("day_min"), col("day_max")),
        quant16(col("cents"), col("c_min"), col("c_max"))))
      .withColumn("bucket", floor(col("z3") / lit(1L << 36)).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("ck").as("ck_lo"), max("ck").as("ck_hi"),
        min("day").as("day_lo"), max("day").as("day_hi"),
        min("cents").as("cents_lo"), max("cents").as("cents_hi"))
      .orderBy("bucket")
  }

  /** [[curvePruning]]'s methodology applied to the CUBE (l05): what
    * fraction of file-grain units does a TRIPLE-dim predicate box
    * touch under each of three layouts — the 3-d Morton curve
    * ([[morton3]], l04's key), the 2-d Morton curve over (ck, day)
    * only (l01's key — the "we z-ordered the two obvious columns"
    * status quo a third predicate column defeats), and a single-key
    * ck sort. Buckets are ~257 NON-dyadic curve segments per layout
    * (the l03 grain argument: real files cut at arbitrary row
    * counts); per-bucket min/max statistics of ALL THREE dimensions
    * are what parquet stores, and a bucket is touched iff its stats
    * box intersects the fixed query box ([[rectCkLo]]-family bounds
    * plus an equally unaligned cents slice). Expected shape: the 2-d
    * curve bounds (ck, day) exactly as tightly as l03 measured — but
    * its cents statistics span everything, so it touches every
    * (ck, day)-intersecting segment regardless of the cents
    * predicate; the 3-d curve's boxes are selective on cents too and
    * touch strictly fewer. ONE orders pass — each layout key computed
    * as its OWN projected column (JIT-able per column; inlining them
    * into the explode fuses one method past HotSpot's 8000-byte JIT
    * limit, the measured r17 cliff) and the explode fanning out tiny
    * key structs — then one map-side-combined shuffle onto ≤ 3·258
    * groups; the oracle replays every cascade in integer arithmetic.
    *
    * Measured finding (the l02/l03 honesty discipline): the strict
    * ordering zorder3d < zorder2d < single_ck holds, but at
    * arbitrary-cut grain the 3-d MORTON segment straddles high-bit
    * boundaries in all three dims at once, so most segments' cents
    * boxes are wide and the measured third-dimension pruning is
    * MARGINAL over 2-d (sf0.01: 12 vs 13 of ~257; sf0.001: 4 vs 8)
    * — whereas at dyadic ALIGNED grain ([[zorder3Locality]]'s 4096
    * exact cells) every box is its cell and all three dims prune
    * fully. This is the 3-d face of l03's straddling-Morton argument
    * — and the measurement that MOTIVATED the no-jump 3-d key: see
    * [[cubePruningHilbert]] (l06), where
    * [[graft.functions.HilbertIndex3]] on the identical cuts touches
    * strictly fewer buckets (sf0.01: 5 vs Morton's 12); for
    * Morton-only deployments, [[zorder3Write]] with cell-aligned
    * file counts remains the practical answer. */
  def cubePruning(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      col("o_custkey").cast("long").as("ck"),
      datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("day"),
      floor(col("o_totalprice") * lit(100)).cast("long").as("cents"))
    val rng = o.agg(
      min("ck").as("ck_min"), max("ck").as("ck_max"),
      min("day").as("day_min"), max("day").as("day_max"),
      min("cents").as("c_min"), max("cents").as("c_max"))
    val base = o.crossJoin(broadcast(rng))
      .select(
        quant16(col("ck"), col("ck_min"), col("ck_max")).as("qa"),
        quant16(col("day"), col("day_min"), col("day_max")).as("qb"),
        quant16(col("cents"), col("c_min"), col("c_max")).as("qc"))
      .withColumn("in_box",
        (col("qa").between(rectCkLo, rectCkHi) &&
          col("qb").between(rectDayLo, rectDayHi) &&
          col("qc").between(rectCentsLo, rectCentsHi)).cast("long"))
    // layout keys are PRE-COMPUTED columns, the explode fans out tiny
    // structs of them — inlining the curve kernels into the explode
    // fuses everything into ONE generated method past HotSpot's
    // 8000-byte JIT ceiling, and the whole scan stage silently runs
    // in the bytecode interpreter (~40× slower, measured at ×16; the
    // l07 finding — a Project splits per-column and stays JIT-able)
    val keyed = base
      .withColumn("b3", floor(morton3(col("qa"), col("qb"), col("qc"))
        / lit(pruneGrain3)).cast("long"))
      .withColumn("b2", floor(morton(col("qa"), col("qb")) / lit(pruneGrain))
        .cast("long"))
      .withColumn("b1", floor(col("qa") / lit(256L)).cast("long"))
    val tagged = keyed.select(
      explode(array(
        struct(lit("zorder3d").as("layout"), col("b3").as("bucket")),
        struct(lit("zorder2d_ck_day").as("layout"), col("b2").as("bucket")),
        struct(lit("single_ck").as("layout"), col("b1").as("bucket"))))
        .as("t"),
      col("qa"), col("qb"), col("qc"), col("in_box"))
    val perBucket = tagged
      .groupBy(col("t.layout").as("layout"), col("t.bucket").as("bucket"))
      .agg(
        min("qa").as("a_lo"), max("qa").as("a_hi"),
        min("qb").as("b_lo"), max("qb").as("b_hi"),
        min("qc").as("c_lo"), max("qc").as("c_hi"),
        sum("in_box").as("rows_in"))
    perBucket.groupBy("layout")
      .agg(
        count(lit(1)).as("buckets_total"),
        sum((col("a_hi") >= rectCkLo && col("a_lo") <= rectCkHi &&
          col("b_hi") >= rectDayLo && col("b_lo") <= rectDayHi &&
          col("c_hi") >= rectCentsLo && col("c_lo") <= rectCentsHi)
          .cast("long")).as("buckets_touched"),
        sum("rows_in").as("rows_matched"))
      .orderBy("layout")
  }

  /** The straddle finding's FIX, measured (l06): [[cubePruning]]
    * reported that at arbitrary-cut grain a 3-d MORTON segment
    * straddles high-bit boundaries in all three dimensions at once,
    * leaving only marginal third-dimension pruning; this query runs
    * the identical measurement with the no-jump 3-d HILBERT key
    * ([[graft.functions.HilbertIndex3]], Skilling's transpose
    * construction) next to the Morton key — same 48-bit index space,
    * same ~257 non-dyadic segments, same unaligned query box. A
    * Hilbert segment of length L has O(L^(1/3)) diameter, so its
    * boxes stay tight on EVERY axis at arbitrary cuts — the 3-d
    * analog of the measured l03 hilbert ≤ zorder result. One orders
    * pass (both curve keys are register-loop kernels, each its OWN
    * projected column upstream of the explode — the JIT-ceiling
    * shape), one map-side-combined shuffle onto ≤ 2·258
    * groups; the oracle replays Skilling's plane sweeps as generated
    * CTE stages (the l02 discipline, one engine certifying the
    * other's kernel). */
  def cubePruningHilbert(s: SparkSession, dir: String): DataFrame =
    cube3PerBucket(s, dir).groupBy("layout")
      .agg(
        count(lit(1)).as("buckets_total"),
        sum(cube3Touched.cast("long")).as("buckets_touched"),
        sum("rows_in").as("rows_matched"))
      .orderBy("layout")

  /** Does a segment's statistics box intersect the fixed triple-dim
    * query box — the reader's min/max skip decision, ONE definition
    * for the l06 rollup and the l07 per-segment table. */
  private def cube3Touched: Column =
    col("a_hi") >= rectCkLo && col("a_lo") <= rectCkHi &&
      col("b_hi") >= rectDayLo && col("b_lo") <= rectDayHi &&
      col("c_hi") >= rectCentsLo && col("c_lo") <= rectCentsHi

  /** The shared l06/l07 per-segment frame: orders quantized onto the
    * 16-bit cube, keyed by BOTH 3-d curves (Hilbert via the
    * [[graft.functions.HilbertIndex3]] kernel, Morton via
    * [[morton3]] — each key its own projected column, then a tiny
    * 2-rows-per-input explode of the key structs), cut
    * into the same ~257 non-dyadic segments, and reduced to each
    * segment's min/max statistics box + row counts. ONE map-side-
    * combined shuffle onto ≤ 2·258 groups; everything downstream is
    * segment-sized. */
  private def cube3PerBucket(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      col("o_custkey").cast("long").as("ck"),
      datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("day"),
      floor(col("o_totalprice") * lit(100)).cast("long").as("cents"))
    val rng = o.agg(
      min("ck").as("ck_min"), max("ck").as("ck_max"),
      min("day").as("day_min"), max("day").as("day_max"),
      min("cents").as("c_min"), max("cents").as("c_max"))
    val base = o.crossJoin(broadcast(rng))
      .select(
        quant16(col("ck"), col("ck_min"), col("ck_max")).as("qa"),
        quant16(col("day"), col("day_min"), col("day_max")).as("qb"),
        quant16(col("cents"), col("c_min"), col("c_max")).as("qc"))
      .withColumn("in_box",
        (col("qa").between(rectCkLo, rectCkHi) &&
          col("qb").between(rectDayLo, rectDayHi) &&
          col("qc").between(rectCentsLo, rectCentsHi)).cast("long"))
    // keys pre-computed OUTSIDE the explode (the l05 JIT-ceiling
    // comment): both 48-bit kernels in one fused Generate method
    // exceed HotSpot's 8000-byte JIT limit and the stage runs
    // interpreted — measured 11.6 s vs 0.13 s at ×16 for the
    // identical rows
    val keyed = base
      .withColumn("bh",
        floor(graft.functions.HilbertIndex3(col("qa"), col("qb"), col("qc"))
          / lit(pruneGrain3)).cast("long"))
      .withColumn("bz", floor(morton3(col("qa"), col("qb"), col("qc"))
        / lit(pruneGrain3)).cast("long"))
    val tagged = keyed.select(
      explode(array(
        struct(lit("hilbert3d").as("layout"), col("bh").as("bucket")),
        struct(lit("zorder3d").as("layout"), col("bz").as("bucket"))))
        .as("t"),
      col("qa"), col("qb"), col("qc"), col("in_box"))
    tagged
      .groupBy(col("t.layout").as("layout"), col("t.bucket").as("bucket"))
      .agg(
        min("qa").as("a_lo"), max("qa").as("a_hi"),
        min("qb").as("b_lo"), max("qb").as("b_hi"),
        min("qc").as("c_lo"), max("qc").as("c_hi"),
        count(lit(1)).as("n_rows"),
        sum("in_box").as("rows_in"))
  }

  /** Per-segment box-statistics table (l07) — the DATA behind l06's
    * summary counts, lifted into the registry so the on-disk layout
    * claim sits under the cross-engine gate: for every curve segment
    * of BOTH 3-d layouts (the same ~257 non-dyadic cuts l05/l06
    * measure — the file-grain model of [[pruneGrain3]]), the min/max
    * statistics box a parquet footer would store, its integer volume
    * (the quantity the OpsSpec `hilbert3Write` test measures on real
    * footers: Hilbert's summed boxes are ~half of Morton's at
    * identical cuts), the segment's row count, the rows actually in
    * the query box, and whether a reader's min/max skip decision
    * would open it. The DuckDB oracle replays both curve cascades
    * (the 42-CTE Skilling chain, the l06 discipline) to the
    * identical table. Output is segment-sized (≤ 2·258 rows) at any
    * corpus scale. */
  def cubeFileBoxes(s: SparkSession, dir: String): DataFrame =
    cube3PerBucket(s, dir)
      .select(col("layout"), col("bucket"),
        col("a_lo"), col("a_hi"), col("b_lo"), col("b_hi"),
        col("c_lo"), col("c_hi"), col("n_rows"), col("rows_in"),
        ((col("a_hi") - col("a_lo") + 1L) *
          (col("b_hi") - col("b_lo") + 1L) *
          (col("c_hi") - col("c_lo") + 1L)).as("volume"),
        cube3Touched.cast("long").as("touched"))
      .orderBy("layout", "bucket")

  /** The cents slice of [[cubePruning]]'s query box — the same 1/8
    * unaligned-window construction as the ck/day bounds. */
  val rectCentsLo = 41000L; val rectCentsHi = 49191L

  /** [[cubePruning]]'s 3-d bucket grain: ~1/257 of the 48-bit curve
    * index range, non-dyadic for the same reason as [[pruneGrain]]. */
  val pruneGrain3 = 1095233372416L // ceil(2^48 / 257), non-dyadic

  /** The fixed dual-dim query rectangle of [[curvePruning]], in
    * quantized coordinates: a 1/8 × 1/8 window of the 16-bit plane,
    * deliberately UNALIGNED with any dyadic cell boundary (ck ∈
    * [9000, 17191], day ∈ [25000, 33191]) so partial-cell
    * intersections are genuinely exercised. */
  val rectCkLo = 9000L; val rectCkHi = 17191L
  val rectDayLo = 25000L; val rectDayHi = 33191L

  /** [[curvePruning]]'s bucket grain: ~1/257 of the 32-bit curve
    * index range, deliberately NOT a power of four. At dyadic grain
    * (e.g. 2^24) the top curve bits are a quadrant-descent prefix for
    * BOTH curves, so Morton and Hilbert induce the IDENTICAL
    * 4096×4096 cell partition and the comparison degenerates to a
    * renumbering. Real files cut the curve at arbitrary row-count
    * positions, and there the curves differ: a Hilbert segment of
    * length L has O(√L) diameter (no jumps), while a Morton segment
    * straddling a high-bit boundary leaps across the plane and its
    * bounding rectangle explodes. The non-dyadic grain models those
    * arbitrary cuts declaratively. */
  val pruneGrain = 16712070L // ceil(2^32 / 257)

  /** Read-side pruning simulation (l03): what fraction of a layout's
    * file-grain units would a dual-dim predicate actually touch?
    * Buckets orders into ~257 curve segments ([[pruneGrain]] — see
    * its scaladoc for why the grain must be non-dyadic) under each of
    * the three layouts (Morton curve, Hilbert curve, single-key ck
    * sort), computes each bucket's min/max statistics — exactly what
    * parquet stores per row group — and counts buckets whose
    * statistics intersect the fixed query rectangle. This is the
    * number a scan planner prunes with, derived declaratively: ONE
    * pass over orders (the three layout keys are an in-scan
    * `explode` of codegen'd arithmetic — 3 rows per input row of
    * (layout, bucket, in_rect)), one map-side-combining shuffle onto
    * ≤ 3·258 groups, and a tiny final per-layout rollup. The
    * physical twin (real parquet files, `input_file_name()` under
    * the predicate) lives in the spec; this query is the
    * engine-independent formulation the DuckDB oracle replays
    * bit-for-bit (morton spread cascade + the sixteen Hilbert CTE
    * stages + floor-div bucketing).
    *
    * Expected shape at any SF: single_ck touches ~33 of 256 buckets
    * (the ck slice — its day statistics span everything), zorder
    * ~the rectangle's area share plus straddle cells, hilbert fewest
    * (no-jump segments) — the measured multi-dim win that justifies
    * [[zorderWrite]] / [[hilbertWrite]] at 100 TB. */
  def curvePruning(s: SparkSession, dir: String): DataFrame = {
    val grain = lit(pruneGrain)
    val base = ordersQuantized(s, dir).select(
      col("qck"), col("qday"),
      (col("qck").between(rectCkLo, rectCkHi) &&
        col("qday").between(rectDayLo, rectDayHi))
        .cast("long").as("in_rect"))
    // keys pre-computed OUTSIDE the explode (the l05/l07 JIT-ceiling
    // finding applies to the 2-d trio as well)
    val keyed = base
      .withColumn("bz", floor(morton(col("qck"), col("qday")) / grain)
        .cast("long"))
      .withColumn("bh",
        floor(graft.functions.HilbertIndex(col("qck"), col("qday")) / grain)
          .cast("long"))
      .withColumn("b1", floor(col("qck") / lit(256L)).cast("long"))
    val tagged = keyed.select(
      explode(array(
        struct(lit("zorder").as("layout"), col("bz").as("bucket")),
        struct(lit("hilbert").as("layout"), col("bh").as("bucket")),
        struct(lit("single_ck").as("layout"), col("b1").as("bucket"))))
        .as("t"),
      col("qck"), col("qday"), col("in_rect"))
    val perBucket = tagged
      .groupBy(col("t.layout").as("layout"), col("t.bucket").as("bucket"))
      .agg(
        min("qck").as("a_lo"), max("qck").as("a_hi"),
        min("qday").as("b_lo"), max("qday").as("b_hi"),
        sum("in_rect").as("rows_in"))
    perBucket.groupBy("layout")
      .agg(
        count(lit(1)).as("buckets_total"),
        sum((col("a_hi") >= rectCkLo && col("a_lo") <= rectCkHi &&
          col("b_hi") >= rectDayLo && col("b_lo") <= rectDayHi)
          .cast("long")).as("buckets_touched"),
        sum("rows_in").as("rows_matched"))
      .orderBy("layout")
  }

  /** Write `df` clustered by the z-order of two long columns: ONE
    * range exchange on z (range partitioning keeps curve segments
    * contiguous across files), an in-partition sort (no second
    * shuffle), and the z key itself is dropped from the stored
    * schema — layout is a property of row order, not a column the
    * reader pays for. */
  def zorderWrite(df: DataFrame, dimA: String, dimB: String,
      path: String, files: Int): Unit =
    curveWrite(df, dimA, dimB, path, files, hilbert = false)

  /** [[zorderWrite]]'s twin on the Hilbert curve — identical write
    * shape (one range exchange on the curve key, in-partition sort,
    * key dropped from storage), but the key is the no-jump
    * [[graft.functions.HilbertIndex]] whose file-grain segments
    * bound both dimensions at least as tightly as Morton's (the
    * measured l02-vs-l01 result, which this write path carries to
    * the scan — see the read-side pruning spec). */
  def hilbertWrite(df: DataFrame, dimA: String, dimB: String,
      path: String, files: Int): Unit =
    curveWrite(df, dimA, dimB, path, files, hilbert = true)

  /** [[zorderWrite]] generalized to THREE dimensions — the l04 cube
    * layout's write path: one bounds job over all three columns, one
    * range exchange on the 48-bit [[morton3]] key, in-partition
    * sort, key dropped from storage. Every written file's min/max
    * statistics bound ALL THREE dimensions (the physical twin of
    * [[zorder3Locality]]'s declarative boxes — measured by the
    * OpsSpec file-statistics test against a single-key baseline). */
  def zorder3Write(df: DataFrame, dimA: String, dimB: String,
      dimC: String, path: String, files: Int): Unit =
    curve3Write(df, dimA, dimB, dimC, path, files, hilbert = false)

  /** [[zorder3Write]]'s twin on the 3-d HILBERT curve — the key the
    * l06 measurement showed beats Morton at arbitrary file cuts (a
    * Hilbert segment of length L keeps O(L^(1/3)) diameter, so every
    * written file's min/max statistics stay tight on ALL THREE
    * dimensions even when `files` doesn't align the curve dyadically
    * — sf0.01, identical cuts: 5 buckets touched vs Morton's 12).
    * Identical write shape: one bounds job, one range exchange on the
    * [[graft.functions.HilbertIndex3]] key, in-partition sort, key
    * dropped from storage. Measured on disk (OpsSpec, sf0.001 orders,
    * 17 equal-frequency files, identical cuts both layouts): summed
    * normalized box volume 1.60 vs Morton's 2.89, and 18 vs 39
    * rect-file intersections over six unaligned triple-dim query
    * boxes — the fraction of files a reader's min/max skip decision
    * actually opens. */
  def hilbert3Write(df: DataFrame, dimA: String, dimB: String,
      dimC: String, path: String, files: Int): Unit =
    curve3Write(df, dimA, dimB, dimC, path, files, hilbert = true)

  private def curve3Write(df: DataFrame, dimA: String, dimB: String,
      dimC: String, path: String, files: Int, hilbert: Boolean): Unit = {
    val clash = df.columns.filter(_.startsWith("__z"))
    require(clash.isEmpty,
      s"curve3Write: column name(s) ${clash.mkString(", ")} collide with " +
        "the reserved __z internal prefix — rename before writing")
    val rng = df.agg(
      min(dimA).as("__z_a_min"), max(dimA).as("__z_a_max"),
      min(dimB).as("__z_b_min"), max(dimB).as("__z_b_max"),
      min(dimC).as("__z_c_min"), max(dimC).as("__z_c_max"))
    val qa = quant16(col(dimA), col("__z_a_min"), col("__z_a_max"))
    val qb = quant16(col(dimB), col("__z_b_min"), col("__z_b_max"))
    val qc = quant16(col(dimC), col("__z_c_min"), col("__z_c_max"))
    df.crossJoin(broadcast(rng))
      .withColumn("__z_curve_key",
        if (hilbert) graft.functions.HilbertIndex3(qa, qb, qc)
        else morton3(qa, qb, qc))
      .drop("__z_a_min", "__z_a_max", "__z_b_min", "__z_b_max",
        "__z_c_min", "__z_c_max")
      .repartitionByRange(files, col("__z_curve_key"))
      .sortWithinPartitions("__z_curve_key")
      .drop("__z_curve_key")
      .write.mode("overwrite").parquet(path)
  }

  /** Offline compaction across [[graft.streaming.Streams
    * .zorderedIngest]] increments — the other half of the ingest
    * contract (its scaladoc: "compaction across increments stays an
    * offline zorderWrite over any horizon you choose"), now one
    * call: union every `batch=*` increment under `baseDir` and
    * relayout as a single curve-clustered table. The per-batch
    * quantizers (each increment's curve spans only its own bounds)
    * are replaced by ONE global quantizer over the whole horizon, so
    * file statistics become comparable ACROSS increments again — the
    * reader prunes the compacted table with the same dual-dim
    * selectivity the per-batch files had individually. Cost shape is
    * identical to a fresh [[zorderWrite]]: one bounds job, one range
    * exchange. */
  def compactIncrements(s: SparkSession, baseDir: String,
      dimA: String, dimB: String, outPath: String, files: Int,
      hilbert: Boolean = false): Unit =
    curveWrite(s.read.parquet(s"$baseDir/batch=*"), dimA, dimB,
      outPath, files, hilbert)

  private def curveWrite(df: DataFrame, dimA: String, dimB: String,
      path: String, files: Int, hilbert: Boolean): Unit = {
    // collision-proof internal names (the __z_ reserved prefix): a
    // user column named e.g. "a_min" — or "__z" itself — must survive
    // the bounds crossJoin and the key drop. The prefix is RESERVED:
    // a frame already carrying one would be silently overwritten by
    // withColumn and lost from the written output, so refuse loudly.
    val clash = df.columns.filter(_.startsWith("__z"))
    require(clash.isEmpty,
      s"curveWrite: column name(s) ${clash.mkString(", ")} collide with " +
        "the reserved __z internal prefix — rename before writing")
    val rng = df.agg(
      min(dimA).as("__z_a_min"), max(dimA).as("__z_a_max"),
      min(dimB).as("__z_b_min"), max(dimB).as("__z_b_max"))
    val qa = quant16(col(dimA), col("__z_a_min"), col("__z_a_max"))
    val qb = quant16(col(dimB), col("__z_b_min"), col("__z_b_max"))
    df.crossJoin(broadcast(rng))
      .withColumn("__z_curve_key",
        if (hilbert) graft.functions.HilbertIndex(qa, qb)
        else morton(qa, qb))
      .drop("__z_a_min", "__z_a_max", "__z_b_min", "__z_b_max")
      .repartitionByRange(files, col("__z_curve_key"))
      .sortWithinPartitions("__z_curve_key")
      .drop("__z_curve_key")
      .write.mode("overwrite").parquet(path)
  }
}
