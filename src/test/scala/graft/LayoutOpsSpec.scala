package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LayoutOps

class LayoutOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zValue round-trips through unZValue over the masked domain") {
    val pts = for (x <- 0L to 40L; y <- 0L to 40L) yield (x, y)
    val zs = pts.toDF("x", "y")
      .select($"x", $"y", LayoutOps.zValue($"x", $"y", 16).as("z"))
      .as[(Long, Long, Long)].collect()
    zs.foreach { case (x, y, z) =>
      assert(LayoutOps.unZValue(z, 16) == ((x, y)), s"($x,$y) -> $z")
    }
    // distinct points -> distinct keys (it's a bijection on the domain)
    assert(zs.map(_._3).distinct.length == pts.length)
  }

  test("z-ordering clusters both dimensions better than single-column sort") {
    // points on a grid; measure the y-spread inside consecutive runs of
    // the sorted order. A sort by x alone leaves y uniform in every
    // run; the z-order bounds it.
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    def meanRunSpread(sorted: Seq[(Long, Long)], run: Int): Double = {
      val spreads = sorted.grouped(run).map { g =>
        (g.map(_._2).max - g.map(_._2).min).toDouble
      }.toSeq
      spreads.sum / spreads.size
    }
    val byX = pts.sortBy(identity)
    val byZ = pts.toDF("x", "y")
      .select($"x", $"y", LayoutOps.zValue($"x", $"y", 16).as("z"))
      .as[(Long, Long, Long)].collect().sortBy(_._3).map(t => (t._1, t._2)).toSeq
    val run = 64 // one "row group" worth of points
    assert(meanRunSpread(byZ, run) < meanRunSpread(byX, run) / 3,
      s"z=${meanRunSpread(byZ, run)}, x=${meanRunSpread(byX, run)}")
  }
}
