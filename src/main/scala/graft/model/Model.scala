package graft.model

import org.apache.spark.sql.types._

/** Identity of a source table: `schema.name`.
  *
  * Mirrors the reference's `changelog.Table` value type and its set
  * operations (reference: pkg/changelog/table.go:6-36) — control-plane
  * collections, not data-plane.
  */
final case class TableRef(schema: String, name: String) {
  /** Fully-qualified `schema.name` (reference: pkg/changelog/modification.go:20-22). */
  def qualified: String = s"$schema.$name"
}

object TableRef {
  /** Set difference: tables in `these` not in `those` — the reconcile
    * primitive (reference: pkg/changelog/table.go:17-26).
    */
  def diff(these: Seq[TableRef], those: Seq[TableRef]): Seq[TableRef] = {
    val set = those.toSet
    these.filterNot(set)
  }
  /** Membership (reference: pkg/changelog/table.go:28-36). */
  def includes(tables: Seq[TableRef], t: TableRef): Boolean = tables.contains(t)
}

/** One column of a source relation.
  *
  * Mirrors `logical.Column{Key, Name, Type (OID), Modifier}`
  * (reference: pkg/logical/message.go:70-76).
  */
final case class ColumnSpec(
    name: String,
    pgOid: Int,
    key: Boolean = false,
    modifier: Int = -1) {
  def dataType: DataType = PgTypes.dataTypeFor(pgOid)
}

/** A table descriptor discovered at runtime — schemas are *data* in a
  * CDC engine (reference: pkg/logical/message.go:63-69,
  * pkg/changelog/schema.go:17-31).
  */
final case class TableSchema(
    relationId: Long,
    namespace: String,
    name: String,
    columns: Seq[ColumnSpec]) {

  def ref: TableRef = TableRef(namespace, name)

  /** Primary-key column names (reference: pkg/changelog/schema.go:47-55). */
  def primaryKeys: Seq[String] = columns.filter(_.key).map(_.name)

  /** Payload StructType: one nullable field per source column.
    * Name-sorted for deterministic DDL, matching the reference's
    * sink schema builder (reference:
    * pkg/sinks/bigquery/schema_builders.go:52-54).
    */
  def payloadStruct: StructType =
    StructType(columns.map(c => StructField(c.name, c.dataType, nullable = true))
      .sortBy(_.name))

  /** Deterministic fingerprint over (key, name, type, modifier) per
    * column — used to suppress repeated sink DDL and detect schema
    * evolution (reference: pkg/changelog/schema.go:61-67).
    */
  def fingerprint: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    columns.sortBy(_.name).foreach { c =>
      md.update(s"${c.key}|${c.name}|${c.pgOid}|${c.modifier};".getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString
  }
}

/** The four changelog operations, derived — never stored — from the
  * null-ness of (lsn, before, after)
  * (reference: pkg/changelog/modification.go:103-123).
  */
object Operation {
  val Import = "IMPORT"
  val Insert = "INSERT"
  val Update = "UPDATE"
  val Delete = "DELETE"
  /** Whole-table truncation marker (pgoutput 'T'): both images null;
    * latest-state readers drop rows at or before its position. */
  val Truncate = "TRUNCATE"
}

/** Postgres OID → Spark DataType mapping. The reference supports
  * exactly 32 OIDs and rejects the rest with an error, never a
  * fallback (reference: pkg/decode/gen/mappings/mappings.go:19-212,
  * rejections 216-345; decode.go:34-40). We reproduce both the
  * mapping and the hard failure.
  */
object PgTypes {
  // scalar OIDs
  val Bool = 16; val Bytea = 17; val Name = 19; val Int8 = 20
  val Int2 = 21; val Int4 = 23; val Text = 25; val Oid = 26
  val Xid = 28; val Cid = 29; val Json = 114; val Float4 = 700
  val Float8 = 701; val Varchar = 1043; val Date = 1082; val Time = 1083
  val Timestamp = 1114; val Timestamptz = 1184; val Numeric = 1700
  val Jsonb = 3802
  // array OIDs
  val BoolArr = 1000; val Int2Arr = 1005; val Int4Arr = 1007
  val TextArr = 1009; val VarcharArr = 1015; val Int8Arr = 1016
  val Float4Arr = 1021; val Float8Arr = 1022; val TimestampArr = 1115
  val DateArr = 1182; val TimestamptzArr = 1185; val NumericArr = 1231

  /** The 32 supported OIDs (reference: mappings.go:19-212).
    * numeric → DoubleType is deliberately lossy to match reference
    * semantics (mappings.go:200-205); time-of-day coerces to
    * TimestampType as the reference coerces to time.Time.
    */
  val supported: Map[Int, DataType] = Map(
    Bool -> BooleanType,
    Bytea -> BinaryType,
    Name -> StringType,
    Int8 -> LongType,
    Int2 -> ShortType,
    Int4 -> IntegerType,
    Text -> StringType,
    Oid -> LongType, // no unsigned 32-bit in Spark
    Xid -> LongType,
    Cid -> LongType,
    Json -> StringType, // raw JSON text, queried via from_json
    Float4 -> FloatType,
    Float8 -> DoubleType,
    Varchar -> StringType,
    Date -> DateType,
    Time -> TimestampType,
    Timestamp -> TimestampType,
    Timestamptz -> TimestampType,
    Numeric -> DoubleType, // lossy by design, matches reference
    Jsonb -> StringType,
    BoolArr -> ArrayType(BooleanType),
    Int2Arr -> ArrayType(ShortType),
    Int4Arr -> ArrayType(IntegerType),
    TextArr -> ArrayType(StringType),
    VarcharArr -> ArrayType(StringType),
    Int8Arr -> ArrayType(LongType),
    Float4Arr -> ArrayType(FloatType),
    Float8Arr -> ArrayType(DoubleType),
    TimestampArr -> ArrayType(TimestampType),
    DateArr -> ArrayType(DateType),
    TimestamptzArr -> ArrayType(TimestampType),
    NumericArr -> ArrayType(DoubleType),
  )

  final case class UnregisteredTypeException(oid: Int)
      extends RuntimeException(
        s"decoder has no type mapping registered for Postgres OID $oid")

  /** Resolve or fail — an unsupported column type fails the whole
    * table import (reference: pkg/imports/import.go:122-124).
    */
  def dataTypeFor(oid: Int): DataType =
    supported.getOrElse(oid, throw UnregisteredTypeException(oid))

  /** Reverse mapping used when deriving a TableSchema from an existing
    * Spark schema (e.g. a parquet footer) so every import source
    * carries OID metadata like the reference's catalog discovery
    * (reference: pkg/imports/import.go:150-201).
    */
  def oidFor(dt: DataType): Int = dt match {
    case BooleanType => Bool
    case BinaryType => Bytea
    case LongType => Int8
    case ShortType => Int2
    case IntegerType => Int4
    case StringType => Text
    case FloatType => Float4
    case DoubleType => Float8
    case DateType => Date
    case _: TimestampType => Timestamp
    case _: DecimalType => Numeric
    case ArrayType(el, _) => el match {
      case BooleanType => BoolArr
      case ShortType => Int2Arr
      case IntegerType => Int4Arr
      case StringType => TextArr
      case LongType => Int8Arr
      case FloatType => Float4Arr
      case DoubleType => Float8Arr
      case DateType => DateArr
      case _: TimestampType => TimestampArr
      case other => throw new IllegalArgumentException(s"unsupported array element $other")
    }
    case other => throw new IllegalArgumentException(s"unsupported Spark type $other")
  }
}
