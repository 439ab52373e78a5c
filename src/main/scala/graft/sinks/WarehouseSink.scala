package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Envelope, TableSchema}
import graft.ops.ChangelogOps

/** The warehouse sink: append-only raw changelog tables + a
  * query-time "latest row" deduplication view — the reference's
  * BigQuery sink re-expressed as partitioned parquet
  * (reference: pkg/sinks/bigquery/sink.go:40-79,
  * schema_handler.go:56-100, schema_builders.go:88-161).
  *
  * Physical layout, designed for 100 TB:
  * - raw table `root/raw/<ns>.<name>/` partitioned by `_date =
  *   date(timestamp)` — the reference time-partitions its raw table
  *   for retention + time travel (schema_builders.go:103-106); here
  *   it also gives readers partition pruning.
  * - rows sorted within partitions by primary key — the reference
  *   clusters by PK (schema_builders.go:99-102); here it gives
  *   parquet min/max row-group pruning on PK lookups.
  * - writes are append-only; replays are harmless because the view
  *   dedups by (pk, timestamp, lsn, sequence) — at-least-once
  *   delivery + merge-on-read, the reference's exact design.
  */
final class WarehouseSink(spark: SparkSession, root: String) extends Sink {
  private val handler = new SchemaHandler(_ => ())

  def rawPath(table: TableSchema): String =
    s"$root/raw/${table.ref.qualified}"

  override def handleSchema(schema: TableSchema): SchemaOutcome =
    handler.handle(schema)

  override def insert(table: TableSchema, batch: DataFrame): InsertResult = {
    val result = InsertResult.of(batch.cache())
    val pks = table.primaryKeys
    val image = coalesce(col(Envelope.AfterCol), col(Envelope.BeforeCol))
    val sortCols = pks.map(k => col(s"_pk_$k"))
    val withPart = batch
      .withColumn("_date", to_date(col(Envelope.TimestampCol)))
      // materialised pk columns give parquet row-group min/max stats
      .withColumns(pks.map(k => s"_pk_$k" -> image.getField(k)).toMap)
    withPart
      .sortWithinPartitions(col("_date") +: sortCols: _*)
      .write.mode("append")
      .partitionBy("_date")
      .parquet(rawPath(table))
    batch.unpersist()
    result
  }

  /** Read the raw changelog back (schema evolution via mergeSchema —
    * the add-columns-only policy of the reference's blind update,
    * pkg/sinks/bigquery/schema_handler.go:82-100). */
  def raw(table: TableSchema): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(rawPath(table))

  /** The latest-row view over the raw table
    * (reference: pkg/sinks/bigquery/schema_builders.go:146-161). */
  def latestView(table: TableSchema): DataFrame =
    ChangelogOps.latestRows(raw(table), table.primaryKeys)

  /** Register both as SQL-queryable views, like the reference's
    * `CREATE VIEW <name>` DDL. */
  def registerViews(table: TableSchema): Unit = {
    raw(table).createOrReplaceTempView(s"${table.name}_raw")
    latestView(table).createOrReplaceTempView(table.name)
  }
}
