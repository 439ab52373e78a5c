package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The changelog envelope — the engine's one dataflow type.
  *
  * Canonical layout follows the reference's BigQuery raw table
  * (reference: pkg/sinks/bigquery/schema_builders.go:56-81):
  *
  * {{{
  * timestamp TIMESTAMP  not null  -- read/commit time
  * lsn       LONG       nullable  -- log sequence number (null => IMPORT)
  * sequence  LONG       nullable  -- intra-transaction order (§2.5)
  * operation STRING     not null  -- IMPORT|INSERT|UPDATE|DELETE
  * before    STRUCT     nullable  -- prior row image (UPDATE/DELETE)
  * after     STRUCT     nullable  -- new row image (IMPORT/INSERT/UPDATE)
  * }}}
  *
  * Unlike the reference's `map[string]interface{}` rows
  * (pkg/subscription/marshal.go:22-41) the payload is a typed
  * StructType so Spark executes it columnar + codegen.
  */
object Envelope {
  val TimestampCol = "timestamp"
  val LsnCol = "lsn"
  val SequenceCol = "sequence"
  val OperationCol = "operation"
  val BeforeCol = "before"
  val AfterCol = "after"
  /** Optional metadata column: names of payload columns whose after
    * cell arrived as a pgoutput unchanged-TOAST marker — the value is
    * not on the wire, so "NULL" and "unchanged" must stay
    * distinguishable until merge (ChangelogOps.latestRowsMerged). */
  val UnchangedCol = "unchanged_toast"

  /** Envelope StructType for a given payload struct.
    * @param withToastMarker include the [[UnchangedCol]] metadata
    *   column (streamed CDC envelopes; import envelopes never have
    *   unchanged cells).
    */
  def schemaFor(payload: StructType,
      withToastMarker: Boolean = false): StructType = StructType(Seq(
    StructField(TimestampCol, TimestampType, nullable = false),
    StructField(LsnCol, LongType, nullable = true),
    StructField(SequenceCol, LongType, nullable = true),
    StructField(OperationCol, StringType, nullable = false),
    StructField(BeforeCol, payload, nullable = true),
    StructField(AfterCol, payload, nullable = true)) ++
    (if (withToastMarker)
      Seq(StructField(UnchangedCol, ArrayType(StringType), nullable = true))
    else Nil))

  /** Operation derived from null-ness — never stored
    * (reference: pkg/changelog/modification.go:103-123).
    */
  def operationCol(lsn: Column, before: Column, after: Column): Column =
    when(lsn.isNull, Operation.Import)
      .when(before.isNull, Operation.Insert)
      .when(after.isNull, Operation.Delete)
      .otherwise(Operation.Update)

  /** Scala-side operation derivation, same nullness rules as
    * [[operationCol]] (reference: pkg/changelog/modification.go:103-123). */
  def operationOf(lsn: Option[Long], before: Option[Any], after: Option[Any]): String =
    if (lsn.isEmpty) Operation.Import
    else if (before.isEmpty) Operation.Insert
    else if (after.isEmpty) Operation.Delete
    else Operation.Update

  /** The last row image: after, falling back to before for deletes
    * (reference: pkg/changelog/modification.go:127-133).
    */
  def afterOrBefore(df: DataFrame): Column =
    coalesce(col(AfterCol), col(BeforeCol))

  /** Wrap a plain source DataFrame as IMPORT envelopes: lsn null,
    * before null, after = full row (reference semantics:
    * pkg/imports/importer.go:216-225 emits Modification{LSN: nil}).
    *
    * @param asOf import read timestamp; the reference stamps rows with
    *             `NOW()` from the source DB (pkg/imports/import.go:215)
    *             — callers pass a fixed instant for reproducible tests.
    */
  def importEnvelope(df: DataFrame, asOf: java.sql.Timestamp): DataFrame = {
    val payload = struct(df.columns.sorted.map(col).toIndexedSeq: _*)
    val payloadType = StructType(df.schema.fields.toIndexedSeq
      .map(f => f.copy(nullable = true)).sortBy(_.name))
    df.select(
      lit(asOf).cast(TimestampType).as(TimestampCol),
      lit(null).cast(LongType).as(LsnCol),
      lit(null).cast(LongType).as(SequenceCol),
      lit(Operation.Import).as(OperationCol),
      lit(null).cast(payloadType).as(BeforeCol),
      payload.as(AfterCol))
  }

  /** Derive a TableSchema (with OIDs) from a Spark schema, marking the
    * given primary-key columns — the offline analogue of catalog
    * discovery against pg_class/pg_attribute
    * (reference: pkg/imports/import.go:150-201).
    */
  def tableSchemaOf(
      relationId: Long,
      namespace: String,
      name: String,
      schema: StructType,
      primaryKeys: Seq[String]): TableSchema = {
    val pks = primaryKeys.toSet
    TableSchema(relationId, namespace, name,
      schema.fields.toIndexedSeq.map(f =>
        ColumnSpec(f.name, PgTypes.oidFor(f.dataType), key = pks.contains(f.name))))
  }
}
