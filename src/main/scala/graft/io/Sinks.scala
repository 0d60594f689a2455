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

  /** Range-partitioned, sorted parquet layout: rows are range-split
    * across files by `cols` and sorted within each file, so every file
    * (and row group) carries a TIGHT min/max band for those columns —
    * the layout that lets a 100 TB scan skip everything outside a range
    * predicate from parquet footers alone. This is the write-side half
    * of predicate pushdown; without it min/max stats span the whole
    * domain per file and prune nothing.
    */
  def writeRangeSorted(df: DataFrame, dstDir: String, cols: Seq[String],
                       partitions: Int): Unit = {
    require(cols.nonEmpty, "at least one layout column")
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(partitions, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode("overwrite").parquet(dstDir)
  }

  /** Compact a parquet directory into ~`targetFileBytes` files at
    * `dstDir` — the small-files maintenance pass every streaming or
    * per-batch ingest needs (a 100 TB lake of 1 MB files spends more
    * time opening footers than reading data). File count is sized from
    * the ACTUAL on-disk bytes, not row counts; a fresh `dstDir` keeps
    * the operation atomic-by-rename for the caller (never read and
    * overwrite the same live path). Returns (filesBefore, filesAfter).
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
                     srcDir: String, dstDir: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(srcDir != dstDir, "compact to a fresh directory, then swap")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(srcDir match {
        case s if s.contains("://") => s
        case s => "file://" + s
      }),
      spark.sparkContext.hadoopConfiguration)
    val src = new org.apache.hadoop.fs.Path(srcDir)
    val parts = fs.listStatus(src)
      .filter(f => f.getPath.getName.startsWith("part-"))
    val totalBytes = parts.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(srcDir).repartition(n)
      .write.mode("overwrite").parquet(dstDir)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(dstDir))
      .count(f => f.getPath.getName.startsWith("part-"))
    (parts.length, after)
  }
}
