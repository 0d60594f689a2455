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

  /** A 2-D range predicate (inclusive bounds on both dimensions) for
    * [[pruningAudit]]. */
  final case class RangePred(id: Int, xLo: Long, xHi: Long,
                             yLo: Long, yHi: Long)

  /** File-pruning audit: for each workload predicate, how many
    * files/buckets must be READ (file min/max overlaps the box) under
    * three layouts of the SAME table — z-order prefix buckets
    * (`zvalue >> bucketShift`, the q138 keys), linear-by-x
    * (`x >> xShift`, i.e. the table sorted by x and cut into
    * fixed-width files), linear-by-y. This is the number that
    * justifies a layout choice on a 100 TB table: scans are priced in
    * files whose min/max statistics overlap the predicate, and a
    * single-column sort gives perfect pruning on that column and NONE
    * on the other, while z-order bounds both.
    *
    * All bucket keys are power-of-two shifts (exact integer ops,
    * bit-identical in any engine — the [[zValue]] contract extended);
    * widths are the caller's equal-file-count knob and
    * `buckets_total` is reported per layout so denominators are
    * visible. Scale shape: ONE scan — each row explodes to its three
    * (layout, bucket) keys in the map task and partial aggregation
    * collapses to bucket-stat rows before the shuffle, so the
    * exchange carries O(files) rows at any table size; the predicate
    * list is a broadcast literal; `rows_matched` (the
    * layout-independent exact answer) is a second partial-agg scan
    * whose shuffle is |preds| rows per partition.
    *
    * Output, one row per (pred, layout): bucket denominators, buckets
    * and rows read, exact rows matched, and the 6-dp floor-snapped
    * read fraction — integers except the snapped ratio, so the whole
    * report replays verbatim in DuckDB.
    */
  def pruningAudit(df: DataFrame, xCol: String, yCol: String, bits: Int,
                   bucketShift: Int, xShift: Int, yShift: Int,
                   preds: Seq[RangePred]): DataFrame = {
    require(preds.nonEmpty, "preds must be non-empty")
    require(preds.map(_.id).distinct.length == preds.length,
      "pred ids must be distinct")
    require(xShift >= 0 && xShift < bits && yShift >= 0 && yShift < bits,
      s"shifts must be in [0, $bits)")
    val spark = df.sparkSession
    import spark.implicits._
    val predDf = broadcast(preds.toDF())

    val keyed = zOrderBuckets(df, xCol, yCol, bits, bucketShift)
      .select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"), col("zbucket"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val exploded = keyed.select(col("x"), col("y"),
        explode(array(
          struct(lit("zorder").as("layout"), col("zbucket").as("bucket")),
          struct(lit("linear_x").as("layout"),
            call_function("shiftright", col("x"), lit(xShift)).as("bucket")),
          struct(lit("linear_y").as("layout"),
            call_function("shiftright", col("y"), lit(yShift)).as("bucket"))
        )).as("lb"))
      .select(col("lb.layout").as("layout"), col("lb.bucket").as("bucket"),
        col("x"), col("y"))
    val stats = exploded.groupBy("layout", "bucket")
      .agg(count(lit(1)).as("n"),
        min("x").as("xmin"), max("x").as("xmax"),
        min("y").as("ymin"), max("y").as("ymax"))

    val overlap = col("xmin") <= col("xHi") && col("xmax") >= col("xLo") &&
      col("ymin") <= col("yHi") && col("ymax") >= col("yLo")
    val perLayout = stats.crossJoin(predDf)
      .groupBy(col("id").as("pred_id"), col("layout"))
      .agg(count(lit(1)).cast("long").as("buckets_total"),
        sum(when(overlap, 1L).otherwise(0L)).cast("long").as("buckets_read"),
        sum(when(overlap, col("n")).otherwise(0L)).cast("long")
          .as("rows_read"))

    val matched = keyed.crossJoin(predDf)
      .filter(col("x") >= col("xLo") && col("x") <= col("xHi") &&
        col("y") >= col("yLo") && col("y") <= col("yHi"))
      .groupBy(col("id").as("pred_id"))
      .agg(count(lit(1)).cast("long").as("rows_matched"))

    perLayout.join(matched, Seq("pred_id"), "left")
      .na.fill(0L, Seq("rows_matched"))
      .withColumn("read_fraction",
        floor(col("buckets_read").cast("double") /
          col("buckets_total").cast("double") * 1e6) / 1e6)
      .select(col("pred_id"), col("layout"), col("buckets_total"),
        col("buckets_read"), col("rows_read"), col("rows_matched"),
        col("read_fraction"))
  }

  /** Small-file compaction plan — the lakehouse OPTIMIZE planner: pack
    * each partition's sub-target files into merge bins of ~`targetBytes`
    * so a 100 TB table stops paying per-file open/footer/listing cost
    * on millions of crumbs (the small-file problem). Files already at
    * or above target are left alone (`needs_compaction = false`,
    * no bin) — rewriting them would be pure churn.
    *
    * Binning is the deterministic sorted walk: within a partition,
    * files in name order accumulate; a file's bin is
    * `floor(pre_sum / target)` (its cumulative size BEFORE itself /
    * target), so every bin holds ≥ target bytes once closed, overshoot
    * bounded by one file. Name order (not size order) keeps the plan
    * stable under re-runs and replayable as one window cumsum.
    *
    * Scale shape: operates on file METADATA (one row per file — even
    * a 100 TB table is ≤ ~1e7 rows of listing), and the window
    * partitions by the table partition — compaction can't merge across
    * hive partitions anyway, so the cumsum parallelizes per partition
    * instead of one global sort. The frame is pinned to
    * `rowsBetween` (the RANGE-default duplicate-key trap). A null
    * file/size row is an unplannable listing entry — a corrupt
    * catalog, not data — so it FAILS the plan at runtime (the
    * caps-THROW rule: silently dropping it would return a plausible
    * partial plan that quietly skips real files). The check rides the
    * kept `size_bytes` column, not a dropped scratch column, so
    * column pruning cannot elide it.
    */
  def compactionPlan(files: DataFrame, part: String, file: String,
                     size: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val plannable = col(file).isNotNull && col(size).isNotNull
    val f = files.select(col(part).as("part"), col(file).as("file"),
        when(plannable, col(size).cast("long")).otherwise(raise_error(concat(
          lit("compactionPlan: unplannable listing row (null file or size)" +
            " in partition "),
          coalesce(col(part).cast("string"), lit("NULL")))).cast("long"))
          .as("size_bytes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("part").orderBy(col("file").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val small = f.filter(col("size_bytes") < targetBytes)
      .withColumn("presum",
        sum(col("size_bytes")).over(w) - col("size_bytes"))
      .select(col("part"), col("file"), col("size_bytes"),
        floor(col("presum") / lit(targetBytes.toDouble)).as("bin"),
        lit(true).as("needs_compaction"))
    val big = f.filter(col("size_bytes") >= targetBytes)
      .select(col("part"), col("file"), col("size_bytes"),
        lit(null).cast("long").as("bin"), lit(false).as("needs_compaction"))
    small.unionByName(big)
  }

  /** Release manifest per shard: row count, character mass, id range,
    * and an ORDER-INDEPENDENT content checksum — `bit_xor` of the
    * 60-bit md5-prefix digest of each row's content (the repo's
    * hashed-shingle digest convention). XOR is commutative/associative,
    * so the checksum is invariant under task order, partition count and
    * rewrite order — two independently-produced copies of a shard
    * agree iff their content multisets agree (up to the usual 60-bit
    * odds, and up to XOR's blindness to DOUBLED rows — pair it with
    * `n_docs`, which any duplication moves). The integrity record a
    * data release ships next to its shards: the consumer recomputes
    * one map-side pass + one agg and compares.
    *
    * Scale shape: digest + length are map-side on the scan; one
    * partial-aggregated groupBy on the shard key; output is
    * shard-count-sized. Null content digests to NULL and is EXCLUDED
    * from the xor by aggregate-null semantics but still counted in
    * `n_docs` — a manifest must not silently shrink the row count.
    */
  def shardManifest(df: DataFrame, shardCol: String, idCol: String,
                    contentCol: String): DataFrame = {
    val dig = graft.functions.Strings.md5SliceLong(col(contentCol), 1, 15)
    df.select(col(shardCol).as("shard"), col(idCol).as("id"),
        col(contentCol).as("content"), dig.as("__dig"),
        length(col(contentCol)).as("__nc"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nc")).as("n_chars"),
        expr("bit_xor(__dig)").as("content_xor"),
        min(col("id")).as("id_min"),
        max(col("id")).as("id_max"))
  }
}
