package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.PgTypes
import graft.sources._
import graft.streaming.GenericPlane

class GenericPlaneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import PgOutput._

  val rel1 = Relation(1L, "public", "pets", 'd'.toByte, Seq(
    RelationColumn(key = true, "id", PgTypes.Int8, -1),
    RelationColumn(key = false, "name", PgTypes.Text, -1)))
  val rel2 = Relation(2L, "public", "scores", 'd'.toByte, Seq(
    RelationColumn(key = true, "id", PgTypes.Int8, -1),
    RelationColumn(key = false, "score", PgTypes.Float8, -1)))
  def cell(v: String) = Element('t'.toByte, Some(v.getBytes("UTF-8")))

  test("many tables flow through ONE generic plan and type on demand at read") {
    val root = Files.createTempDirectory("graft-generic").toString
    val wire = Seq(
      encodeBegin(Begin(100L, 0L, 1L)),
      encodeRelation(rel1), encodeRelation(rel2),
      encodeInsert(Insert(1L, TupleData(Seq(cell("1"), cell("rex"))))),
      encodeInsert(Insert(2L, TupleData(Seq(cell("7"), cell("3.5"))))),
      encodeUpdate(Update(1L, None, None, TupleData(Seq(cell("1"), cell("rex II"))))),
      encodeCommit(Commit(0, 100L, 101L, 0L)))
    val entries = ChangelogBuilder.build(wire.iterator.map(decode)).toVector
    val mods = entries.collect { case m: ChangelogBuilder.ModificationEntry => m }

    val df = GenericPlane.toGeneric(spark, mods)
    assert(df.schema == GenericPlane.schema)
    assert(df.count() == 3)
    GenericPlane.append(df, root)

    // typed read-back of one table out of the shared plane
    val pets = GenericPlane.latestRows(spark, root, "public", "pets",
        Seq("id"), Map("id" -> LongType, "name" -> StringType))
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(pets == Map(1L -> "rex II"))
    val scores = GenericPlane.latestRows(spark, root, "public", "scores",
        Seq("id"), Map("id" -> LongType, "score" -> DoubleType))
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(scores == Map(7L -> 3.5))

    // raw plane is partitioned by table: a single-table read prunes
    val pruned = GenericPlane.raw(spark, root)
      .where($"namespace" === "public" && $"name" === "pets")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 2)
    assert(scan.contains("PartitionFilters"), scan)
  }
}
