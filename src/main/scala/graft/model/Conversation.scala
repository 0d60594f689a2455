package graft.model

import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Conversation state for multi-turn querying — the reference's
  * `ConversationContext` family (`/root/reference/src/models/
  * conversation.rs:7-69`): a turn history plus dataset metadata, carried
  * across queries so follow-ups can resolve against what was already
  * asked. The HTTP/store plumbing around it (`services/conversation.rs`)
  * stays driver-side (SURVEY.md §2.1); the engine owns the model and the
  * history-aware translation hook ([[graft.query.NLTranslator]]).
  *
  * Differences from the reference, deliberate: ids and timestamps are
  * CALLER-supplied (the reference mints `Uuid::new_v4` / `Utc::now`
  * internally, `conversation.rs:48-56` — a hidden nondeterminism this
  * engine rejects; every construction is replayable), and the context is
  * immutable (`addTurn` returns a new value, matching the rest of the
  * model layer).
  */
final case class ConversationTurn(
    query: String,
    response: String,
    timestamp: Instant)

/** Reference `DatasetMetadata` (`conversation.rs:17-26`): the schema
  * card a translator consults without touching the data. `dataTypes`
  * values are Spark DDL type strings (`"bigint"`, `"double"`,
  * `"string"`, ...), so the full Spark schema round-trips via
  * [[DatasetMetadata.toStructType]]. */
final case class DatasetMetadata(
    columns: Seq[String],
    rowCount: Long,
    dataTypes: Map[String, String]) {

  def toStructType: StructType =
    if (columns.isEmpty) new StructType()
    else StructType.fromDDL(columns.map { c =>
      // a literal backtick in a column name must double inside the
      // quoted DDL identifier or fromDDL throws
      s"`${c.replace("`", "``")}` ${dataTypes.getOrElse(c, "string")}"
    }.mkString(", "))
}

object DatasetMetadata {

  /** Capture a DataFrame's schema card. `rowCount` runs one count job —
    * the reference records it at ingest (`processor.rs` populates it
    * once per dataset), so capture once and reuse the value. */
  def of(df: DataFrame): DatasetMetadata = DatasetMetadata(
    columns = df.columns.toSeq,
    rowCount = df.count(),
    dataTypes = df.schema.fields.map(f => f.name -> f.dataType.sql.toLowerCase).toMap)
}

final case class ConversationContext(
    id: String,
    jobId: String,
    history: Vector[ConversationTurn],
    datasetMetadata: DatasetMetadata,
    createdAt: Instant,
    updatedAt: Instant) {

  /** Reference `add_turn` (`conversation.rs:60-69`), immutably: appends
    * the turn and advances `updatedAt`. */
  def addTurn(query: String, response: String, at: Instant): ConversationContext =
    copy(history = history :+ ConversationTurn(query, response, at),
      updatedAt = at)
}

object ConversationContext {

  /** Reference `ConversationContext::new` (`conversation.rs:46-57`) with
    * id and clock made explicit. */
  def create(id: String, jobId: String, metadata: DatasetMetadata,
             at: Instant): ConversationContext =
    ConversationContext(id, jobId, Vector.empty, metadata, at, at)
}
