package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ClusterOps

class ClusterOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("id", "v")

  test("kmeans separates two obvious clusters and converges on their means") {
    // two tight groups on a line; seeds (ids 1, 2) both start in the
    // left group, the update round must pull one centroid right
    val df = vecs(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(1.0f, 0.0f), 3L -> Seq(0.5f, 0.0f),
      4L -> Seq(10.0f, 0.0f), 5L -> Seq(11.0f, 0.0f), 6L -> Seq(10.5f, 0.0f))
    val got = ClusterOps.kmeans(df, "id", "v", k = 2, rounds = 2)
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    val byCluster = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.values.toSet == Set(Set(1L, 2L, 3L), Set(4L, 5L, 6L)),
      s"expected the two spatial groups, got $byCluster")
    // after convergence the centroid is the group mean: distances are
    // exact squared offsets from x̄=0.5 / x̄=10.5
    val d = got.map(r => r._1 -> r._3).toMap
    assert(math.abs(d(3L)) < 1e-9 && math.abs(d(6L)) < 1e-9)
    assert(math.abs(d(1L) - 0.25) < 1e-6 && math.abs(d(4L) - 0.25) < 1e-6)
  }

  test("kmeans is invariant to partitioning (decimal means, rounded argmin)") {
    val pts = (0L until 120L).map { i =>
      val cx = (i % 3).toFloat * 5f
      i -> Seq(cx + (i % 7).toFloat * 0.01f, cx - (i % 5).toFloat * 0.01f)
    }
    val a = ClusterOps.kmeans(vecs(pts: _*), "id", "v", k = 3, rounds = 2)
      .as[(Long, Int, Double)].collect().toSet
    val b = ClusterOps.kmeans(vecs(pts: _*).repartition(13), "id", "v",
        k = 3, rounds = 2)
      .as[(Long, Int, Double)].collect().toSet
    assert(a == b)
  }

  test("kmeans: k larger than the corpus, zero rounds, empty input") {
    val df = vecs(1L -> Seq(1.0f), 2L -> Seq(2.0f))
    val got = ClusterOps.kmeans(df, "id", "v", k = 5, rounds = 0)
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    // every point is its own seed at distance 0
    assert(got.toSeq == Seq((1L, 0, 0.0), (2L, 1, 0.0)))

    val empty = ClusterOps.kmeans(df.where(lit(false)), "id", "v", k = 3)
    assert(empty.columns.toSeq == Seq("id", "cluster", "d2"))
    assert(empty.count() == 0)
  }

  test("kmeans drops a cluster that loses all members instead of diverging") {
    // seed ids 1,2 are coincident: cluster 1 can never win a point
    // (ties break to the smaller cid), so after one update only
    // cluster 0 and 2 survive
    val df = vecs(
      1L -> Seq(0.0f), 2L -> Seq(0.0f), 3L -> Seq(9.0f), 4L -> Seq(9.5f))
    val got = ClusterOps.kmeans(df, "id", "v", k = 3, rounds = 1)
      .as[(Long, Int, Double)].collect()
    assert(got.map(_._2).toSet == Set(0, 2))
  }

  test("kmeans assignment agrees with a driver-side reference run") {
    // independent re-implementation in plain Scala with the same
    // contract: 6-dp rounded distances, smaller-cid ties, exact means
    val pts = (0L until 60L).map { i =>
      i -> Seq(((i * 37) % 11).toFloat, ((i * 17) % 7).toFloat)
    }
    val k = 4
    var cent: Seq[(Int, Array[Double])] = pts.sortBy(_._1).take(k).zipWithIndex
      .map { case ((_, v), ci) => ci -> v.map(_.toDouble).toArray }
    def d2(v: Seq[Float], c: Array[Double]): Double = {
      var (n2, dot, cn) = (0.0, 0.0, 0.0)
      v.indices.foreach { i =>
        n2 += v(i).toDouble * v(i).toDouble
        dot += v(i).toDouble * c(i)
        cn += c(i) * c(i)
      }
      BigDecimal(n2 - 2.0 * dot + cn)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def assign() = pts.map { case (id, v) =>
      val best = cent.map { case (ci, c) => (d2(v, c), ci) }.min
      (id, best._2, best._1)
    }
    (1 to 2).foreach { _ =>
      val byC = assign().groupBy(_._2)
      cent = byC.toSeq.sortBy(_._1).map { case (ci, members) =>
        val vs = members.map(m => pts(m._1.toInt)._2)
        ci -> Array.tabulate(2) { dim =>
          val s = vs.map(v => BigDecimal(v(dim).toDouble)).sum
          (s / vs.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
    }
    val expect = assign().toSet
    val got = ClusterOps.kmeans(vecs(pts: _*), "id", "v", k = k, rounds = 2)
      .as[(Long, Int, Double)].collect().toSet
    assert(got == expect)
  }
}
