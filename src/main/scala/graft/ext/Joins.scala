package graft.ext

import org.apache.spark.sql.DataFrame
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
}
