package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PgOutputFrameLog

/** Model-based property test of the durable frame log: random
  * interleavings of append / torn-tail crash / retain against a
  * trivial in-memory model (a Vector of frames plus a floor). The
  * invariants under test are exactly what the streaming source
  * depends on: `frameCount` equals the model's length, `readRange`
  * returns the model's slice for any window at or past the floor,
  * reads below the floor throw, and the (path, length)-keyed count
  * cache never serves stale data across any operation order. Raw
  * ScalaCheck under ScalaTest (the scalatestplus bridge is not on
  * the offline classpath).
  */
class FrameLogPropertySpec extends AnyFunSuite {

  sealed trait Op
  case class Append(frames: List[Array[Byte]], torn: Boolean) extends Op
  case class Retain(fraction: Double) extends Op

  private val frameGen: Gen[Array[Byte]] =
    Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
  private val opGen: Gen[Op] = Gen.frequency(
    6 -> (for {
      n <- Gen.choose(1, 8)
      fs <- Gen.listOfN(n, frameGen)
      torn <- Gen.prob(0.3)
    } yield Append(fs, torn)),
    3 -> Gen.choose(0.0, 1.0).map(Retain(_)))

  test("frame log equals its model under random append/tear/retain interleavings") {
    val prop = Prop.forAll(Gen.listOfN(20, opGen)) { ops =>
      val dir = Files.createTempDirectory("graft-logprop").toString
      var model = Vector.empty[Seq[Byte]]
      var floor = 0L
      var seg = 0

      ops.foreach {
        case Append(frames, torn) =>
          PgOutputFrameLog.append(dir, f"seg-$seg%05d", frames)
          model ++= frames.map(_.toSeq)
          if (torn) {
            // crash mid-write of one more frame: header + short body.
            // invisible to readers now, truncated by the next append —
            // the model never sees it
            val f = new java.io.File(dir, f"seg-$seg%05d")
            val out = new java.io.DataOutputStream(
              new java.io.FileOutputStream(f, true))
            try { out.writeInt(10); out.write(Array[Byte](1, 2)) }
            finally out.close()
          }
          seg += 1
          // poll mid-sequence: the count cache must track the torn
          // tail and every append immediately
          assert(PgOutputFrameLog.frameCount(dir) == model.length.toLong)
        case Retain(fraction) =>
          val upTo = (model.length * fraction).toLong
          val dropped = PgOutputFrameLog.retain(dir, upTo)
          assert(dropped >= 0 && floor + dropped <= upTo.max(floor))
          floor += dropped
      }

      assert(PgOutputFrameLog.frameCount(dir) == model.length.toLong)
      if (floor < model.length) {
        val read = PgOutputFrameLog.readRange(dir, floor, model.length.toLong)
        assert(read.toSeq.map(_.toSeq) == model.drop(floor.toInt))
      }
      if (floor > 0)
        assertThrows[IllegalArgumentException](
          PgOutputFrameLog.readRange(dir, floor - 1, model.length.toLong))
      true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"frame-log model property: ${res.status}")
  }
}
