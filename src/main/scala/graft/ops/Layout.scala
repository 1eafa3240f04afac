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

  /** Min-max quantization of `v` to [0, 65535] given the dimension's
    * observed bounds — exact floor-div integer arithmetic (the
    * degenerate all-one-value dimension maps to 0 via the
    * greatest(,1) guard). */
  def quant16(v: Column, lo: Column, hi: Column): Column =
    // floor of a double-precision quotient of exact integers — both
    // operands stay far below 2^53, so this equals pure floor-div
    floor(((v - lo) * lit(65535L)) / greatest(hi - lo, lit(1L)))
      .cast("long")

  /** The 32-bit Morton key of two 16-bit quantized dimensions. */
  def morton(qa: Column, qb: Column): Column =
    spread16(qa).bitwiseOR(shiftleft(spread16(qb), 1))

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
    * full sub-lattice), so its contiguous segments have tighter
    * bounding rectangles than the Morton curve's at the same file
    * grain — the measured Z-vs-Hilbert comparison lives in the spec.
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

  /** Write `df` clustered by the z-order of two long columns: ONE
    * range exchange on z (range partitioning keeps curve segments
    * contiguous across files), an in-partition sort (no second
    * shuffle), and the z key itself is dropped from the stored
    * schema — layout is a property of row order, not a column the
    * reader pays for. */
  def zorderWrite(df: DataFrame, dimA: String, dimB: String,
      path: String, files: Int): Unit = {
    val rng = df.agg(
      min(dimA).as("a_min"), max(dimA).as("a_max"),
      min(dimB).as("b_min"), max(dimB).as("b_max"))
    df.crossJoin(broadcast(rng))
      .withColumn("__z", morton(
        quant16(col(dimA), col("a_min"), col("a_max")),
        quant16(col(dimB), col("b_min"), col("b_max"))))
      .drop("a_min", "a_max", "b_min", "b_max")
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
