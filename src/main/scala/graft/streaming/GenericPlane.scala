package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Envelope
import graft.ops.ChangelogOps
import graft.sources.ChangelogBuilder

/** The generic fallback plane: ONE plan for any number of tables.
  *
  * The typed plane (plan-per-table, FrameStreamPipeline) gives
  * columnar payloads but needs a streaming query per table — with
  * thousands of small tables that is a scheduler problem (SURVEY §7.4
  * risk). This plane keeps payloads as `map<string,string>` of
  * Postgres text values, so every table shares one schema, one
  * query, one raw output partitioned by table. Typed projection
  * happens at read time for the tables you care about; the rest
  * still get durable, replayable capture.
  */
object GenericPlane {

  val schema: StructType = StructType(Seq(
    StructField("namespace", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField(Envelope.TimestampCol, TimestampType, nullable = false),
    StructField(Envelope.LsnCol, LongType, nullable = true),
    StructField(Envelope.SequenceCol, LongType, nullable = true),
    StructField(Envelope.OperationCol, StringType, nullable = false),
    StructField(Envelope.BeforeCol, MapType(StringType, StringType), nullable = true),
    StructField(Envelope.AfterCol, MapType(StringType, StringType), nullable = true)))

  /** Modification entries (any mix of tables) → one generic
    * DataFrame. Values render as Postgres-style text; nulls stay
    * null map entries removed (map values are non-null text).
    */
  def toGeneric(spark: SparkSession,
      entries: Seq[ChangelogBuilder.ModificationEntry]): DataFrame = {
    def textify(m: Option[Map[String, Any]]): Map[String, String] =
      m.map(_.collect { case (k, v) if v != null => k -> v.toString }).orNull
    val rows = entries.map { m =>
      Row(m.namespace, m.name, m.timestamp, m.lsn.orNull, m.sequence.orNull,
        Envelope.operationOf(m.lsn, m.before, m.after),
        textify(m.before), textify(m.after))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  /** Append a generic batch to one raw table partitioned by
    * (namespace, name, date) — per-table partition pruning without
    * per-table plans. */
  def append(df: DataFrame, root: String): Unit =
    df.withColumn("_date", to_date(col(Envelope.TimestampCol)))
      .write.mode("append")
      .partitionBy("namespace", "name", "_date")
      .parquet(s"$root/generic_raw")

  def raw(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/generic_raw")

  /** Latest-row state of one table out of the generic plane, typed on
    * demand: partition pruning on (namespace, name) happens before
    * the window, then requested columns cast from text.
    */
  def latestRows(spark: SparkSession, root: String,
      namespace: String, name: String,
      primaryKeys: Seq[String],
      typedCols: Map[String, DataType] = Map.empty): DataFrame = {
    val one = raw(spark, root)
      .where(col("namespace") === namespace && col("name") === name)
    // truncates travel IN-BAND as both-images-null TRUNCATE envelopes
    // (see DistributedDecode): drop every row at or before the newest
    // marker's (timestamp, lsn, sequence). The marker aggregate is a
    // single row — a broadcast cross join, not a window, so the plan
    // stays partition-parallel.
    def pos(df: DataFrame) = struct(col(Envelope.TimestampCol),
      coalesce(col(Envelope.LsnCol), lit(Long.MaxValue)),
      coalesce(col(Envelope.SequenceCol), lit(Long.MaxValue)))
    val marker = one
      .where(col(Envelope.OperationCol) === graft.model.Operation.Truncate)
      .agg(max(pos(one)).as("_tpos"))
    val live = one
      .where(col(Envelope.OperationCol) =!= graft.model.Operation.Truncate)
      .crossJoin(broadcast(marker))
      .where(col("_tpos").isNull || pos(one) > col("_tpos"))
      .drop("_tpos")
    val image = coalesce(col(Envelope.AfterCol), col(Envelope.BeforeCol))
    val keyed = live.withColumn("_img", image)
    val latest = ChangelogOps.latestRowView(keyed,
      primaryKeys.map(k => col("_img").getItem(k)))
    typedCols.foldLeft(
      latest.select(col("_img").as("row"), col(Envelope.LsnCol))) {
      case (df, (colName, dt)) =>
        df.withColumn(colName, col("row").getItem(colName).cast(dt))
    }
  }
}
