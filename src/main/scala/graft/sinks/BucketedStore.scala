package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered, pre-sorted) table layout — the storage
  * lever that pre-pays a join/aggregation shuffle at WRITE time.
  *
  * A table bucketed by its join key into N buckets and sorted within
  * each bucket gives every later consumer `HashPartitioning(key, N)`
  * plus a per-file sort FOR FREE at the scan: two such tables join by
  * sort-merge with ZERO exchanges and zero sorts, and a `groupBy(key)`
  * aggregation runs exchange-free. At 100 TB this is the difference
  * between re-shuffling the fact table on every consuming query and
  * shuffling it exactly once, at ingest — the same contract the
  * warehouse sink's `_date` clustering gives time-range queries,
  * applied to equality keys. (The reference's per-table ordered apply
  * loop is the degenerate N=1 case of the same idea:
  * lawrencejones/pgsink pkg/sinks/bigquery keeps per-table order so
  * consumers never re-sort.)
  *
  * Bucketing rides the session catalog (`saveAsTable`): bucket
  * metadata lives in the table definition, which is what lets the
  * planner TRUST the on-disk layout — a bare parquet directory can't
  * carry that proof.
  */
object BucketedStore {

  /** Write `df` as a bucketed, in-bucket-sorted catalog table.
    * Overwrites any existing definition — including a MANAGED-TABLE
    * LOCATION left behind by a session whose in-memory catalog died
    * without dropping it (Spark refuses to create over such an
    * orphan; overwrite semantics own it). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    // quote qualified names PER PART: a single-backtick wrap of
    // `db.tbl` would name one table with a dot in it, not db.tbl
    val quoted = (ident.database.toSeq :+ ident.table)
      .map(p => s"`$p`").mkString(".")
    spark.sql(s"DROP TABLE IF EXISTS $quoted")
    // orphan cleanup: derive the candidate path from the CATALOG's
    // default location for this identifier (handles db-qualified
    // names and a relocated warehouse), never string concatenation,
    // and only delete when no surviving catalog table owns that
    // location — a blind recursive delete could destroy data that
    // happens to share the directory name.
    val orphanUri = catalog.defaultTablePath(ident)
    if (orphanUri.getScheme == null || orphanUri.getScheme == "file") {
      val orphan = new java.io.File(orphanUri.getPath)
      val db = ident.database.getOrElse(catalog.getCurrentDatabase)
      val owned = catalog.databaseExists(db) &&
        catalog.listTables(db).exists { t =>
          scala.util.Try(catalog.getTableMetadata(t).location == orphanUri)
            .getOrElse(false)
        }
      if (orphan.exists() && !owned) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(orphan)
      }
    }
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a bucketed table back (the catalog carries the layout). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
