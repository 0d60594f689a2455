package graft.io

import org.apache.spark.sql.{DataFrame, Dataset}

/** Result sinks.
  *
  * The reference serializes every query result to a JSON array of row
  * objects for its HTTP response (`/root/reference/src/services/
  * conversation.rs:154-166`, `479-506`) by materializing the whole frame
  * in memory. Here the row→JSON conversion is a distributed projection
  * (`toJSON`): callers stream it, write it, or take a bounded sample —
  * nothing forces a full driver materialization.
  */
object Sinks {

  /** Row-wise JSON strings (distributed; no driver materialization). */
  def jsonRows(df: DataFrame): Dataset[String] = df.toJSON

  /** The reference's HTTP-response shape: a JSON array of row objects,
    * capped at `limit` rows (the reference caps at 100 for viz payloads,
    * `query_translator.rs:459-461`). Driver-sized by construction.
    */
  def jsonArray(df: DataFrame, limit: Int = 100): String =
    df.limit(limit).toJSON.collect().mkString("[", ",", "]")

  /** File sink: newline-delimited JSON, one object per row. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
