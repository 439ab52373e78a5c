package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** The seed-derivation pass of the cell blockers, fused into ONE
  * aggregation (r16): every count-derived blocking operator
  * ([[graft.ops.SimilarityOps.sqrtSeedCentroids]], the two-level
  * family's coarse seeds) needs the FULL corpus count n (it sizes k)
  * and the k smallest-(md5(id), id) seed vectors — previously a
  * count job plus a TakeOrdered collect job, i.e. two full passes
  * and two scheduling floors per caller. This buffer computes both
  * in one partial-aggregated pass: a row always increments n
  * (degenerate rows INCLUDED — the blocking law sizes cells for the
  * whole corpus), and becomes a seed candidate only when its hash
  * and id are non-null and its vector is non-null with no null
  * element (the exact SQL predicate the old collect filtered on).
  * Per-task state is bounded at k entries (k·dims floats, ~1 MB at
  * the 4096/64 defaults) whatever the corpus size.
  *
  * Ordering is (hash ASC, id ASC) — md5 hex is pure ASCII, so JVM
  * string compare, Spark's UTF8String binary compare and the SQL
  * oracle's collation all agree. Boundary note: rows with a NULL id
  * are counted but never seed candidates (the declared corpora have
  * non-null unique ids; the previous orderBy spelling would have
  * sorted a null hash first, a case no dataset exercises and the
  * DuckDB oracle — NULLS LAST — already disagreed on).
  *
  * Output: STRUCT<n: BIGINT, seeds: ARRAY<ARRAY<FLOAT>>> with seeds
  * in (hash, id) order — the caller takes its count-derived
  * k-prefix.
  */
case class CountAndTopVectors(
    first: Expression, second: Expression, third: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountAndTopVectors.Buffer]
  with TernaryLike[Expression] {

  require(k > 0, "countAndTopVectors: k must be positive")

  private def hashExpr = first
  private def idExpr = second
  private def vecExpr = third

  override def prettyName: String = "count_and_top_vectors"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("seeds",
      ArrayType(ArrayType(FloatType, containsNull = false),
        containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = hashExpr.dataType == StringType &&
      idExpr.dataType == LongType &&
      (vecExpr.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, BIGINT, ARRAY<FLOAT>), got " +
        s"(${hashExpr.dataType.sql}, ${idExpr.dataType.sql}, " +
        s"${vecExpr.dataType.sql})")
  }

  override def createAggregationBuffer(): CountAndTopVectors.Buffer =
    new CountAndTopVectors.Buffer(k)

  override def update(b: CountAndTopVectors.Buffer,
      input: InternalRow): CountAndTopVectors.Buffer = {
    b.n += 1L
    val h = hashExpr.eval(input)
    val i = idExpr.eval(input)
    val v = vecExpr.eval(input)
    if (h != null && i != null && v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var ok = true
      var j = 0
      val m = arr.numElements()
      while (ok && j < m) { if (arr.isNullAt(j)) ok = false; j += 1 }
      if (ok) b.offer(h.toString, i.asInstanceOf[Long], arr.toFloatArray())
    }
    b
  }

  override def merge(b: CountAndTopVectors.Buffer,
      other: CountAndTopVectors.Buffer): CountAndTopVectors.Buffer = {
    b.n += other.n
    other.entries.foreach { case ((h, i), v) => b.offer(h, i, v) }
    b
  }

  override def eval(b: CountAndTopVectors.Buffer): Any = {
    val seeds = b.entries.valuesIterator
      .map(v => UnsafeArrayData.fromPrimitiveArray(v): ArrayData).toArray
    InternalRow(b.n, new GenericArrayData(seeds.asInstanceOf[Array[Any]]))
  }

  override def serialize(b: CountAndTopVectors.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeInt(b.entries.size)
    b.entries.foreach { case ((h, i), v) =>
      out.writeUTF(h)
      out.writeLong(i)
      out.writeInt(v.length)
      v.foreach(out.writeFloat)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountAndTopVectors.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new CountAndTopVectors.Buffer(k)
    b.n = in.readLong()
    val m = in.readInt()
    (0 until m).foreach { _ =>
      val h = in.readUTF()
      val i = in.readLong()
      val len = in.readInt()
      val v = new Array[Float](len)
      var j = 0
      while (j < len) { v(j) = in.readFloat(); j += 1 }
      b.offer(h, i, v)
    }
    b
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): CountAndTopVectors =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): CountAndTopVectors =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CountAndTopVectors =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CountAndTopVectors {
  /** n plus a bounded (hash, id)-ascending map of the k smallest
    * candidates. TreeMap keeps the max key at `last` for O(log k)
    * offer; ids are unique in every declared corpus, so a key
    * collision can only be the same row seen twice. */
  final class Buffer(k: Int) {
    var n: Long = 0L
    val entries: mutable.TreeMap[(String, Long), Array[Float]] =
      mutable.TreeMap.empty(Ordering.Tuple2(Ordering.String, Ordering.Long))
    private val ord = Ordering.Tuple2(Ordering.String, Ordering.Long)
    def offer(h: String, i: Long, v: Array[Float]): Unit = {
      val key = (h, i)
      if (entries.contains(key)) return // same row seen twice
      if (entries.size < k) { entries.update(key, v); () }
      else {
        val maxKey = entries.lastKey
        if (ord.lt(key, maxKey)) {
          entries.remove(maxKey)
          entries.update(key, v)
        }
      }
    }
  }
}
