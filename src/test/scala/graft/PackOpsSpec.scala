package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PackOps

class PackOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("globalPrefixSum equals the single-partition window at any parallelism") {
    val df = (1L to 5000L).map(i => (i, (i % 7) + 1)).toDF("id", "v")
    for (parts <- Seq(1, 4, 32)) {
      val got = PackOps.globalPrefixSum(df.repartition(parts), "id", $"v")
        .select($"id", $"cum").as[(Long, Long)].collect().toMap
      var acc = 0L
      (1L to 5000L).foreach { i =>
        acc += (i % 7) + 1
        assert(got(i) == acc, s"id=$i parts=$parts")
      }
    }
  }

  test("globalPrefixSum never plans a partition-less global window") {
    val df = (1L to 100L).map(i => (i, 1L)).toDF("id", "v")
    val plan = PackOps.globalPrefixSum(df, "id", $"v")
      .queryExecution.executedPlan.toString
    // a global window shows as an empty partition spec before the sort
    assert(!plan.contains("Window [sum") || !plan.contains("windowspecdefinition(id"),
      s"global window detected:\n$plan")
  }

  test("chunkAssignments: straddling, alignment, empty docs") {
    val df = Seq(
      (1L, 300L), // chunk 0, offset 0
      (2L, 300L), // starts chunk 0 at 300, straddles into chunk 1 (ends 599)
      (3L, 424L), // starts chunk 1 at 600, ends 1023 inclusive -> 1 chunk
      (4L, 0L), // empty: spans nothing, starts chunk 2 boundary 1024
      (5L, 1500L) // starts chunk 2 at 1024, ends 2523 -> chunks 2..4 = 3 chunks
    ).toDF("doc_id", "n_tok")
    val got = PackOps.chunkAssignments(df, "doc_id", $"n_tok", 512L)
      .select($"doc_id", $"start_offset", $"chunk_id", $"n_chunks")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got == List(
      (1L, 0L, 0L, 1L),
      (2L, 300L, 0L, 2L),
      (3L, 600L, 1L, 1L),
      (4L, 1024L, 2L, 0L),
      (5L, 1024L, 2L, 3L)))
  }

  test("shardAssign: serpentine deal balances weights and is partition-invariant") {
    // weights 100..1: with 4 shards, serpentine blocks mean every
    // consecutive 8 ranks contribute equal-opportunity pairs — the
    // spread of shard sums stays within the largest single weight
    val df = (1L to 100L).map(i => (i, 101L - i)).toDF("id", "w")
    val got = PackOps.shardAssign(df, "id", "w", nShards = 4)
      .as[(Long, Long, Int)].collect()
    assert(got.length == 100)
    assert(got.map(_._3).toSet == Set(0, 1, 2, 3))
    val sums = got.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    assert(sums.values.max - sums.values.min <= 100,
      s"shard sums too uneven: $sums")
    // serpentine hand-check: ranks 1..8 (weights 100..93) deal
    // 0,1,2,3 then 3,2,1,0 — ids 4 and 5 share shard 3
    val byId = got.map(r => r._1 -> r._3).toMap
    assert(byId(1L) == 0 && byId(4L) == 3 && byId(5L) == 3 && byId(8L) == 0)
    val again = PackOps.shardAssign(df.repartition(7), "id", "w", 4)
      .as[(Long, Long, Int)].collect()
    assert(again.toSet == got.toSet)
  }
}
