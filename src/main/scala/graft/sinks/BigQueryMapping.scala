package graft.sinks

import org.apache.spark.sql.types._

import graft.model.{PgTypes, TableSchema}

/** The BigQuery half of the warehouse sink, as PURE functions: source
  * schema → BigQuery table metadata, view SQL, and Standard-SQL DDL
  * text. Everything here is offline-testable (golden files pin the
  * emitted SQL); the network client is isolated behind
  * [[BigQueryTransport]] so this layer never imports a cloud SDK.
  *
  * Mirrors the reference's schema builders and type decoder
  * (reference: pkg/sinks/bigquery/schema_builders.go:28-161,
  * decoder.go:13-54) over the same 32-OID registry
  * ([[graft.model.PgTypes.supported]]). [[WarehouseSink]] remains the
  * executable parquet analogue of the full sink semantics; this layer
  * is the piece a real BigQuery deployment would bolt a client onto.
  */
object BigQueryMapping {

  /** One field of a BigQuery schema. `fieldType` uses the metadata-API
    * type names (BOOLEAN / INTEGER / FLOAT / STRING / TIMESTAMP /
    * RECORD); [[ddl]] maps them to Standard-SQL names. */
  final case class BqField(
      name: String,
      fieldType: String,
      repeated: Boolean = false,
      required: Boolean = false,
      description: Option[String] = None,
      fields: Seq[BqField] = Nil)

  /** Table metadata: what the reference hands to the BigQuery client
    * (reference: pkg/sinks/bigquery/schema_builders.go:88-107) — the
    * transport decides how to apply it (DDL, client API, dry-run). */
  final case class BqTableMeta(
      name: String,
      schema: Seq[BqField],
      labels: Map[String, String] = Map.empty,
      clustering: Seq[String] = Nil,
      timePartitionField: Option[String] = None,
      viewQuery: Option[String] = None)

  /** Postgres-OID column type → (BigQuery field type, repeated).
    *
    * Follows the reference decoder's Go-destination dispatch
    * (reference: pkg/sinks/bigquery/decoder.go:13-54) applied to our
    * registry's Spark types, including its two quirks, reproduced
    * deliberately: `bytea` scans into Go `[]uint8`, which the
    * reference's type switch catches as an integer slice → REPEATED
    * INTEGER; `date`/`time` scan into `time.Time` → TIMESTAMP (no
    * DATE fields are ever emitted). Unknown types fail the build, as
    * the reference errors — never a fallback. */
  def fieldTypeFor(oid: Int): (String, Boolean) =
    fieldTypeFor(PgTypes.dataTypeFor(oid))

  /** Spark-type form of [[fieldTypeFor]] — the path a Spark-native
    * envelope (parquet footer, streaming schema) takes. */
  def fieldTypeFor(dt: DataType): (String, Boolean) = dt match {
    case BooleanType => ("BOOLEAN", false)
    case ShortType | IntegerType | LongType => ("INTEGER", false)
    case FloatType | DoubleType | _: DecimalType => ("FLOAT", false)
    case StringType => ("STRING", false)
    case DateType | _: TimestampType => ("TIMESTAMP", false)
    // Go []byte == []uint8: the reference's slice dispatch makes bytea
    // a repeated integer column (decoder.go:41-44)
    case BinaryType => ("INTEGER", true)
    case ArrayType(el, _) =>
      val (t, nested) = fieldTypeFor(el)
      require(!nested, s"no BigQuery field for nested array of $el")
      (t, true)
    case other =>
      throw new IllegalArgumentException(s"no BigQuery field for type $other")
  }

  /** Raw-table metadata for a changelog table: the append-only table
    * the latest-row view reads (reference:
    * pkg/sinks/bigquery/schema_builders.go:28-110). Envelope columns
    * (timestamp, lsn, operation) plus a `payload` RECORD holding the
    * source columns name-sorted; clustered by primary key, time-
    * partitioned on `timestamp`. Fails when the source has no primary
    * key, exactly as the reference does. */
  def buildRaw(tableName: String, schema: TableSchema): BqTableMeta = {
    val keys = schema.primaryKeys
    require(keys.nonEmpty,
      s"table $tableName has no detected primary key columns")
    val payload = schema.columns.map { c =>
      val (t, repeated) = fieldTypeFor(c.pgOid)
      BqField(c.name, t, repeated = repeated)
    }.sortBy(_.name)
    BqTableMeta(
      name = tableName,
      schema = Seq(
        BqField("timestamp", "TIMESTAMP", required = true, description =
          Some("Timestamp at which the row was read from database")),
        BqField("lsn", "INTEGER", description =
          Some("Database log sequence number at time of read, optional")),
        BqField("operation", "STRING", required = true, description =
          Some("Either IMPORT, INSERT, UPDATE or DELETE")),
        BqField("payload", "RECORD", description =
          Some("Contents of database row"), fields = payload)),
      labels = Map("origin" -> "graft"),
      clustering = keys,
      timePartitionField = Some("timestamp"))
  }

  /** Latest-row view over the raw table (reference:
    * pkg/sinks/bigquery/schema_builders.go:115-161): newest row per
    * primary key, deletes hidden. Composite keys are supported (the
    * reference template carries a TODO for them); the emitted text is
    * pinned by golden files, so dialect drift is a test diff. The
    * `project:dataset.table` form BigQuery prints is normalized to
    * dotted form, as the reference's string-replace does. */
  def buildView(tableName: String, rawTableName: String,
      schema: TableSchema): BqTableMeta = {
    val keys = schema.primaryKeys
    require(keys.nonEmpty,
      s"table $tableName has no detected primary key columns")
    val rawId = "`" + rawTableName.replaceFirst(":", ".") + "`"
    val partition = keys.map(k => s"payload.`$k`").mkString(", ")
    val sql =
      s"""select payload.*
         |from (
         |  select *, row_number() over (
         |    partition by $partition
         |    order by timestamp desc
         |  ) as row_number
         |  from $rawId
         |)
         |where row_number = 1
         |and operation != 'DELETE'
         |""".stripMargin
    BqTableMeta(name = tableName, schema = Nil, viewQuery = Some(sql))
  }

  /** Metadata-API type name → Standard-SQL DDL type name. */
  private def sqlType(f: BqField): String = {
    val base = f.fieldType match {
      case "BOOLEAN" => "BOOL"
      case "INTEGER" => "INT64"
      case "FLOAT" => "FLOAT64"
      case "RECORD" =>
        "STRUCT<" + f.fields.map(c => s"`${c.name}` ${sqlType(c)}").mkString(", ") + ">"
      case other => other // STRING, TIMESTAMP
    }
    if (f.repeated) s"ARRAY<$base>" else base
  }

  /** Standard-SQL DDL for a table or view metadata — the text a
    * DDL-based transport executes, and what the golden files pin.
    * Idempotent either way: CREATE TABLE IF NOT EXISTS for raw
    * tables (partition/clustering clauses mirror the metadata),
    * CREATE OR REPLACE VIEW for metadata carrying a `viewQuery`
    * (matching the reference's blind view update,
    * pkg/sinks/bigquery/schema_handler.go:82-100). */
  def ddl(dataset: String, meta: BqTableMeta): String = meta.viewQuery match {
    case Some(sql) =>
      s"""CREATE OR REPLACE VIEW `$dataset.${meta.name}` AS
         |$sql""".stripMargin
    case None => tableDdl(dataset, meta)
  }

  private def tableDdl(dataset: String, meta: BqTableMeta): String = {
    val cols = meta.schema.map { f =>
      val notNull = if (f.required) " NOT NULL" else ""
      val opts = f.description
        .map(d => s""" OPTIONS(description="$d")""").getOrElse("")
      s"  `${f.name}` ${sqlType(f)}$notNull$opts"
    }.mkString(",\n")
    val partition = meta.timePartitionField
      .map(f => s"\nPARTITION BY DATE(`$f`)").getOrElse("")
    val cluster =
      if (meta.clustering.isEmpty) ""
      else meta.clustering.map(c => s"`$c`").mkString("\nCLUSTER BY ", ", ", "")
    s"""CREATE TABLE IF NOT EXISTS `$dataset.${meta.name}` (
       |$cols
       |)$partition$cluster
       |""".stripMargin
  }
}
