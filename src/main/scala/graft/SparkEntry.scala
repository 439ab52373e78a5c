package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{Envelope, Operation}
import graft.ops.ChangelogOps
import graft.sources.ImportSource

/** Driver contract — one `queries` entry (+ DuckDB oracle SQL) per
  * implemented operator from SURVEY.md §2. All queries are
  * deterministic: decimal-cast aggregations (order-independent sums)
  * and total ORDER BY on unique keys, so the DuckDB hash compare is
  * exact.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    ImportSource.table(s, dir, name)

  /** Fixed import read-time for reproducible envelopes (the reference
    * stamps NOW(); see Envelope.importEnvelope). */
  private val asOf = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")

  /** events.parquet viewed as a changelog: user_id is the primary key,
    * ts the commit timestamp, event_id the LSN, and the operation is
    * derived deterministically from event_type (FIXTURES.md §B). */
  private def eventsChangelog(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("ts").as(Envelope.TimestampCol),
      col("event_id").as(Envelope.LsnCol),
      col("user_id"),
      when(col("event_type") === "error", Operation.Delete)
        .when(col("event_type") === "signup", Operation.Insert)
        .otherwise(Operation.Update).as(Envelope.OperationCol),
      col("value"), col("event_type"))

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_latest_row")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- §2.4 aggregation: the headline pricing-summary aggregate -----
    "q01_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 6))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    // ----- §2.1 scan: keyset page (WHERE pk > cursor ORDER BY pk LIMIT n) -----
    "q02_keyset_page" -> ((s, dir) => {
      ImportSource.keysetPage(t(s, dir, "orders"), "o_orderkey", Some(7500L), 1000)
    }),
    // ----- §1.3 envelope: import scan -> changelog envelope (flattened) -----
    "q03_import_envelope" -> ((s, dir) => {
      ImportSource.importTable(s, dir, "customer", asOf)
        .select(col(Envelope.TimestampCol), col(Envelope.LsnCol),
          col(Envelope.OperationCol), col("after.*"))
        .orderBy(col("c_custkey"))
    }),
    // ----- §2.5 window: THE latest-row dedup view -----
    "q04_latest_row" -> ((s, dir) => {
      val cl = eventsChangelog(s, dir)
        .withColumn(Envelope.SequenceCol, lit(null).cast(LongType))
      ChangelogOps.latestRowView(cl, Seq(col("user_id")))
        .select(col("user_id"), col(Envelope.TimestampCol).as("ts"),
          col(Envelope.LsnCol).as("lsn"), col(Envelope.OperationCol), col("value"))
        .orderBy(col("user_id"))
    }),
    // ----- §2.5 window: per-transaction sequence numbering -----
    "q05_txn_sequence" -> ((s, dir) => {
      ChangelogOps.sequenceWithinTransaction(
          t(s, dir, "events"), col("user_id"), col("event_id"))
        .select(col("event_id"), col("user_id"), col(Envelope.SequenceCol))
        .orderBy(col("event_id"))
    }),
    // ----- §2.4 aggregation: max-LSN ack watermark fold -----
    "q06_insert_result" -> ((s, dir) => {
      ChangelogOps.insertResult(
        t(s, dir, "events").withColumnRenamed("event_id", Envelope.LsnCol))
    }),
    // ----- §2.7 set op: reconcile diff (anti join) -----
    "q07_reconcile_anti" -> ((s, dir) => {
      ChangelogOps.reconcileDiff(
          t(s, dir, "nation").withColumnRenamed("n_nationkey", "nationkey"),
          t(s, dir, "supplier").where(col("s_acctbal") >= 5000)
            .withColumnRenamed("s_nationkey", "nationkey"),
          Seq("nationkey"))
        .select(col("nationkey"), col("n_name"))
        .orderBy(col("nationkey"))
    }),
    // ----- §2.7 set op: membership (semi join) -----
    "q08_reconcile_semi" -> ((s, dir) => {
      ChangelogOps.reconcileIncludes(
          t(s, dir, "customer").withColumnRenamed("c_custkey", "custkey"),
          t(s, dir, "orders").withColumnRenamed("o_custkey", "custkey"),
          Seq("custkey"))
        .select(col("custkey"), col("c_name"))
        .orderBy(col("custkey"))
    }),
    // ----- §2.3 joins: the tables-listing join (dims broadcast) -----
    "q09_tables_listing" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast(DecimalType(18, 2))).as("total_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    }),
    // ----- §2.8 scalar: retry backoff LEAST(max, base*exp^n) -----
    "q10_backoff" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), (col("o_orderkey") % 7).as("error_count"))
        .withColumn("backoff_seconds",
          ChangelogOps.backoffSeconds(col("error_count")))
        .orderBy(col("o_orderkey"))
    }),
    // ----- §2.8 scalar: md5 fingerprint + qualified table ref -----
    "q11_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("fp"),
          concat_ws(".", col("source"), col("lang")).as("table_ref"))
        .orderBy(col("doc_id"))
    }),
    // ----- §1.1 operation derivation from (lsn, before, after) nullness -----
    "q12_operation_derive" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderkey") % 10 === 0, lit(null).cast(LongType))
          .otherwise(col("o_orderkey")).as("lsn"),
        when(col("o_orderstatus") === "O", lit(null).cast(LongType))
          .otherwise(col("o_orderkey")).as("before"),
        when(col("o_orderstatus") === "F", lit(null).cast(LongType))
          .otherwise(col("o_orderkey")).as("after"))
      o.withColumn("operation",
          Envelope.operationCol(col("lsn"), col("before"), col("after")))
        .select(col("o_orderkey"), col("operation"))
        .orderBy(col("o_orderkey"))
    }),
  )

  /** DuckDB-dialect oracle for each query (driver compares hashes at
    * sf0.01; see Verify). Column names/aliases match the Spark side
    * exactly.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
        |  sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_keyset_page" ->
      """SELECT * FROM orders WHERE o_orderkey > 7500
        |ORDER BY o_orderkey LIMIT 1000""".stripMargin,
    "q03_import_envelope" ->
      """SELECT TIMESTAMP '2024-06-01 00:00:00' AS "timestamp",
        |  CAST(NULL AS BIGINT) AS lsn, 'IMPORT' AS operation,
        |  c_acctbal, c_custkey, c_mktsegment, c_name, c_nationkey
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q04_latest_row" ->
      """WITH cl AS (
        |  SELECT ts, event_id AS lsn, user_id, value,
        |    CASE WHEN event_type = 'error' THEN 'DELETE'
        |         WHEN event_type = 'signup' THEN 'INSERT'
        |         ELSE 'UPDATE' END AS operation,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, ts, lsn, operation, value FROM cl
        |WHERE rn = 1 AND operation <> 'DELETE'
        |ORDER BY user_id""".stripMargin,
    "q05_txn_sequence" ->
      """SELECT event_id, user_id,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS sequence
        |FROM events ORDER BY event_id""".stripMargin,
    "q06_insert_result" ->
      """SELECT count(*) AS "count", max(event_id) AS lsn FROM events""",
    "q07_reconcile_anti" ->
      """SELECT n_nationkey AS nationkey, n_name FROM nation
        |WHERE NOT EXISTS (SELECT 1 FROM supplier
        |  WHERE s_nationkey = n_nationkey AND s_acctbal >= 5000)
        |ORDER BY nationkey""".stripMargin,
    "q08_reconcile_semi" ->
      """SELECT c_custkey AS custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY custkey""".stripMargin,
    "q09_tables_listing" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  sum(CAST(c_acctbal AS DECIMAL(18,2))) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q10_backoff" ->
      """SELECT o_orderkey, o_orderkey % 7 AS error_count,
        |  least(3600.0, 5.0 * power(3.0, o_orderkey % 7)) AS backoff_seconds
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q11_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp,
        |  source || '.' || lang AS table_ref
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q12_operation_derive" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderkey END AS lsn,
        |    CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderkey END AS before_img,
        |    CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderkey END AS after_img
        |  FROM orders)
        |SELECT o_orderkey,
        |  CASE WHEN lsn IS NULL THEN 'IMPORT'
        |       WHEN before_img IS NULL THEN 'INSERT'
        |       WHEN after_img IS NULL THEN 'DELETE'
        |       ELSE 'UPDATE' END AS operation
        |FROM o ORDER BY o_orderkey""".stripMargin,
  )
}
