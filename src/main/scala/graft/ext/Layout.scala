package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional scan pruning.
  *
  * A 100 TB table is pruned or scanned by its FILE-level min/max
  * statistics; sorting by one column gives perfect pruning on that
  * column and none on any other. Z-ORDER (Morton) interleaving maps
  * two dimensions onto one sort key whose contiguous ranges cover
  * small rectangles of BOTH dimensions, so files written in z-order
  * carry tight min/max on x AND y — the standard lakehouse layout
  * trick for two-filter workloads (multi-dim locality per Morton/
  * Hilbert curves; Hilbert has marginally better locality but no
  * closed-form per-row expression this cheap).
  *
  * Everything here is exact 64-bit integer arithmetic (shifts, masks,
  * adds) evaluated as a fixed-order fold — bit-identical in any SQL
  * engine, so the layout keys are fully DuckDB-oracled, and it's all
  * map-side: computing the key shuffles nothing.
  */
object Layout {

  /** Morton/Z-value of two non-negative integer columns, `bits` bits
    * each (bits ≤ 31; values must fit, caller normalizes): bit i of x
    * lands at bit 2i, bit i of y at bit 2i+1.
    *
    * `bits` is a plan-time literal, so the fold is UNROLLED into a
    * static sum of shift/mask terms instead of an `aggregate` over a
    * `sequence` array — higher-order functions evaluate interpreted
    * (lambda per element, boxed array per row), and the HOF form
    * measured 10.4 s for 15M rows at sf1 where this codegen'd
    * expression does the same integer work inside the scan. Zero
    * shuffle either way; this is purely keeping the hot path inside
    * WholeStageCodegen (the functions-not-UDFs rule applied to HOFs
    * with constant iteration counts). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** `df` + `zvalue` (the interleaved key) + `zbucket`
    * (zvalue >> bucketShift — the file/partition-granularity prefix).
    * Writing sorted by `zvalue` (or range-partitioned by `zbucket`)
    * yields files whose min/max bound BOTH dimensions: a bucket of
    * 2^s consecutive z-values spans at most 2^⌈s/2⌉ distinct x values
    * and 2^⌊s/2⌋ y values (the z-curve rectangle bound, pinned in
    * LayoutSpec). Both columns must be non-negative and fit `bits`
    * bits; violations fail loudly rather than silently aliasing into
    * a wrong bucket. */
  def zOrderBuckets(df: DataFrame, xCol: String, yCol: String, bits: Int,
                    bucketShift: Int): DataFrame = {
    require(bucketShift >= 0 && bucketShift < 2 * bits,
      s"bucketShift must be in [0, ${2 * bits}), got $bucketShift")
    val bound = 1L << bits
    val guard = (c: Column, n: String) =>
      when(c.isNull || (c >= 0 && c < bound), c)
        .otherwise(raise_error(concat(
          lit(s"zOrderBuckets: $n out of [0, $bound): "), c.cast("string"))))
    df.withColumn("zvalue",
        zValue(guard(col(xCol).cast("long"), xCol),
          guard(col(yCol).cast("long"), yCol), bits))
      .withColumn("zbucket", call_function("shiftright",
        col("zvalue"), lit(bucketShift)))
  }
}
