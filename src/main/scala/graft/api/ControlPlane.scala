package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.TableRef

/** The control plane: tables listing with import-status derivation,
  * publication membership, and the subscription manager's watch-list
  * expansion — the reference's REST API surface re-expressed as
  * DataFrame transforms plus driver-side set logic
  * (reference: api/tables.go, pkg/subscription/manager.go,
  * pkg/subscription/publication.go).
  */
object ControlPlane {

  /** Import status state machine, evaluated in priority order:
    * expired → completed → error → scheduled (cursor null) →
    * in_progress (reference: api/tables.go:76-97). `unknown` when no
    * import job exists.
    */
  def importStatus(expiredAt: Column, completedAt: Column, error: Column,
      cursor: Column, jobId: Column): Column =
    when(jobId.isNull, "unknown")
      .when(expiredAt.isNotNull, "expired")
      .when(completedAt.isNotNull, "complete")
      .when(error.isNotNull, "error")
      .when(cursor.isNull, "scheduled")
      .otherwise("in_progress")

  /** Tables listing: catalog tables ⟕ latest import job, grouped per
    * table with status + rows processed — the
    * `information_schema.tables ⋈ pg_class ⟕ import_jobs` join
    * (reference: api/tables.go:111-176). `tables` is small
    * (catalog-sized): Catalyst broadcasts it.
    *
    * @param tables  (schema, table_name, approximate_row_count)
    * @param jobs    (id, schema, table_name, cursor, completed_at,
    *                expired_at, error, created_at, rows_processed_total)
    * @param published (schema, table_name) rows currently published
    */
  def tablesListing(tables: DataFrame, jobs: DataFrame,
      published: DataFrame): DataFrame = {
    // latest job per table: max_by on (created_at, id) so two jobs
    // sharing a created_at break the tie deterministically by id
    // instead of duplicating the table's listing row (the reference
    // orders by id and takes one row)
    val latest = jobs
      .groupBy(col("schema"), col("table_name"))
      .agg(max_by(
        struct(jobs.columns.filterNot(Set("schema", "table_name")).toIndexedSeq
          .map(col): _*),
        struct(col("created_at"), col("id"))).as("_job"))
      .select(col("schema"), col("table_name"), col("_job.*"))
    val pub = published.select(col("schema"), col("table_name"))
      .withColumn("publication_status", lit("active"))
    tables
      .join(latest, Seq("schema", "table_name"), "left")
      .join(pub, Seq("schema", "table_name"), "left")
      .select(
        col("schema"), col("table_name"), col("approximate_row_count"),
        coalesce(col("publication_status"), lit("inactive")).as("publication_status"),
        importStatus(col("expired_at"), col("completed_at"), col("error"),
          col("cursor"), col("id")).as("import_status"),
        when(col("expired_at").isNull && col("id").isNotNull,
          col("rows_processed_total")).as("import_rows_processed_total"))
  }

  /** Watch-list expansion: all base tables in the watched schemas,
    * minus excludes, restricted to the include list when non-empty
    * (reference: pkg/subscription/manager.go:148-201).
    */
  def watchedTables(
      catalog: Seq[TableRef],
      schemas: Seq[String],
      excludes: Seq[TableRef] = Nil,
      includes: Seq[TableRef] = Nil): Seq[TableRef] = {
    val inSchema = catalog.filter(t => schemas.contains(t.schema))
    val afterExclude = inSchema.filterNot(excludes.toSet)
    if (includes.isEmpty) afterExclude
    else afterExclude.filter(includes.toSet)
  }

  /** Publication reconcile: (to add, to remove) so the published set
    * converges on the watched set
    * (reference: pkg/subscription/manager.go:120-145,
    * publication.go:162-196).
    */
  def reconcilePublication(watched: Seq[TableRef],
      published: Seq[TableRef]): (Seq[TableRef], Seq[TableRef]) =
    (TableRef.diff(watched, published), TableRef.diff(published, watched))
}
