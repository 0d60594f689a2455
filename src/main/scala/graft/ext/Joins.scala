package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join strategies for skew and co-location at cluster scale.
  *
  * AQE handles partition-level skew for shuffled joins automatically,
  * but KEY-level skew (one join key carrying a large fraction of rows)
  * still serializes into one task when the skewed side can't be
  * broadcast. Salting is the standard remedy; bucketing removes the
  * shuffle entirely for repeated co-located joins (see
  * `JoinsSpec.bucketed` for the plan-level evidence).
  */
object Joins {

  /** Inner equi-join with the probe side salted `salt` ways.
    *
    * The build side (small enough to replicate `salt`×, too big or too
    * volatile to broadcast) is exploded once per salt value; the big
    * side scatters deterministically by row hash. Each hot key's rows
    * then spread over `salt` reducers instead of one. Result is
    * row-identical to a plain inner join (oracle-checked as q38).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salt)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Range (interval) join: points joined to the intervals containing
    * them (`lo <= point < hi`), made scalable by BINNING — a naive
    * non-equi join is a broadcast nested loop (points × intervals).
    * Both sides map to fixed-width time bins (intervals explode to
    * every bin they overlap), the join becomes an equi-join on the bin,
    * and the exact range predicate refines the candidates. Bin width
    * should be on the order of the typical interval length: shorter
    * explodes intervals into many bins, longer inflates candidates.
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    // Timestamp columns bin through unix_timestamp: a raw long cast is
    // an analysis error for TIMESTAMP_NTZ (the type TZ-less parquet
    // reads as under Spark 4), and unix_timestamp handles both flavors.
    def epochSec(df: DataFrame, c: String) = df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => unix_timestamp(col(c))
      case _ => col(c).cast("long")
    }
    val p = points.withColumn("__bin",
      floor(epochSec(points, pointCol) / binSeconds))
    // The top bin is floor(hi / binSeconds) WITHOUT netting out hi's
    // exclusivity: unix_timestamp floors to whole seconds, so a
    // fractional hi (timestamp[us] parquet) minus 1 under-bins and a
    // point sharing hi's second silently loses its match. Binning the
    // floored hi itself over-emits at most one bin per interval, and
    // the exact range predicate below prunes it.
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(epochSec(intervals, loCol) / binSeconds),
        floor(epochSec(intervals, hiCol) / binSeconds))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /** As-of (point-in-time) LEFT join: each left row is paired with the
    * LATEST right row of the same `key` whose `rightTime` <= the left
    * row's `leftTime` (or nulls if none). The operator Spark lacks
    * natively and a naive range join makes quadratic.
    *
    * Implementation is the union-scan formulation: tag both sides, sort
    * within key by (time, side — right first at equal timestamps, so
    * "at or before" includes ties), and carry the right payload forward
    * with `last(_, ignoreNulls)` over an unbounded-preceding frame.
    * ONE shuffle + sort over |L|+|R| rows, no row-pair blowup — the
    * shape that survives a 100 TB event table. Right payload columns
    * get `suffix`; left and right must not collide after suffixing.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               suffix: String = "_r"): DataFrame = {
    val lPayload = left.columns.filterNot(_ == key).toSeq
    val rPayload = right.columns.filterNot(c => c == key || c == rightTime).toSeq
    val rOut = rPayload.map(_ + suffix) :+ (rightTime + suffix)

    // The right payload travels as ONE nullable struct, not as
    // independent columns: filling columns independently with
    // last(ignoreNulls) would stitch values from DIFFERENT right rows
    // whenever a matched row carries a genuine NULL field.
    val rStructType = org.apache.spark.sql.types.StructType(
      rPayload.map(c => right.schema(c).copy(name = c + suffix)) :+
        org.apache.spark.sql.types.StructField(rightTime + suffix,
          org.apache.spark.sql.types.TimestampType))

    val lSide = left.select(
      Seq(col(key), col(leftTime).cast("timestamp").as("__t"), lit(1).as("__side")) ++
        lPayload.map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val rSide = right.select(
      Seq(col(key), col(rightTime).cast("timestamp").as("__t"), lit(0).as("__side")) ++
        lPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rPayload.map(c => col(c).as(c + suffix)) :+
          col(rightTime).cast("timestamp").as(rightTime + suffix): _*).as("__r"): _*)

    val w = Window.partitionBy(key).orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lSide.unionByName(rSide)
      .withColumn("__r_filled", last(col("__r"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(col(key) +: lPayload.map(col) ++:
        rOut.map(c => col(s"__r_filled.$c").as(c)): _*)
  }

  /** Blocked approximate string join: pairs of (left, right) rows whose
    * key strings are within Levenshtein distance `maxDist` — the entity
    * resolution / catalog reconciliation primitive (matching dirty
    * records against canonical names, reconciling titles across
    * snapshots).
    *
    * The naive formulation is a cartesian product with an edit-distance
    * filter — quadratic in corpus size and unshippable. This is the
    * standard BLOCKED form: candidates must agree on a cheap invariant
    * before any distance is computed —
    *
    *  - `prefixLen`-char lowercased prefix equality (an equi-join key —
    *    hash-partitionable, so both sides can be arbitrarily large);
    *  - length within ±`maxDist` (an edit changes length by ≤ 1), made
    *    EQUI by exploding the right side once per admissible length
    *    (2·maxDist+1 rows, constant) instead of a range predicate that
    *    would force a nested-loop join.
    *
    * Levenshtein then runs only inside blocks. RECALL CONTRACT: an edit
    * inside the first `prefixLen` characters escapes the block and the
    * pair is missed — the documented trade every blocking scheme makes
    * (CCNet-style fingerprint blocking has the same property). Callers
    * needing full recall at maxDist=k run 2 passes with complementary
    * blocking (prefix + suffix), outside this primitive's scope.
    *
    * Skew: blocks are keyed by (prefix, length); a degenerate corpus
    * (every string "aaaa…") collapses into one block and goes quadratic
    * — same failure shape as LSH hot buckets, same remedy upstream
    * (AQE skew-join splits the straggler partition; the pair budget is
    * the caller's via distinct-ing the canonical side).
    *
    * Output: every column of `left`, every column of `right`, plus
    * `edit_dist` (INT ≤ maxDist). Null keys never match (SQL join
    * semantics; a null name has no spelling to be near).
    */
  def fuzzyJoinEditDistance(left: DataFrame, right: DataFrame,
                            leftKey: String, rightKey: String,
                            maxDist: Int, prefixLen: Int = 4): DataFrame = {
    require(maxDist >= 0, s"fuzzyJoinEditDistance: maxDist >= 0, got $maxDist")
    require(prefixLen >= 1,
      s"fuzzyJoinEditDistance: prefixLen >= 1, got $prefixLen")
    val lBlocked = left
      .withColumn("__bp", lower(substring(col(leftKey), 1, prefixLen)))
      .withColumn("__bl", length(col(leftKey)))
    // right side: one row per admissible LEFT length (|len(l)−len(r)|
    // ≤ maxDist), so the block key is a plain equi-join key
    val rBlocked = right
      .withColumn("__bp", lower(substring(col(rightKey), 1, prefixLen)))
      .withColumn("__bl",
        explode(sequence(length(col(rightKey)) - maxDist,
          length(col(rightKey)) + maxDist)))
    // thresholded levenshtein: O(maxDist·len) banded DP with early
    // exit (returns -1 past the bound) instead of the O(len²) full
    // matrix — the distance call is the blocked join's hot loop, and
    // almost all candidates exceed the bound, so the early exit is
    // where the time goes. Exact distance is returned whenever ≤
    // maxDist, so kept rows are identical to the unthresholded form.
    lBlocked.join(rBlocked, Seq("__bp", "__bl"))
      .withColumn("edit_dist",
        levenshtein(col(leftKey), col(rightKey), maxDist))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .drop("__bp", "__bl")
  }
}
