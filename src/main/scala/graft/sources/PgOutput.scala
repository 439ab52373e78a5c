package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Decoder for the pgoutput logical-replication wire format
  * (PostgreSQL docs: "Logical Replication Message Formats",
  * protocol version 1). The reference decodes the same eight message
  * types and errors on anything else
  * (reference: pkg/logical/decoder.go:17-132, message
  * structs pkg/logical/message.go).
  *
  * Plain Scala over ByteBuffer — this is a codec used inside a
  * streaming source, not a Spark operator; big-endian per protocol.
  */
object PgOutput {

  sealed trait Message

  /** Transaction open: every subsequent DML belongs to `xid` until
    * Commit (reference: pkg/logical/message.go:43-48). */
  final case class Begin(finalLsn: Long, timestampMicros: Long, xid: Long) extends Message
  /** Transaction close (reference: pkg/logical/message.go:50-54). */
  final case class Commit(flags: Int, commitLsn: Long, endLsn: Long,
      timestampMicros: Long) extends Message
  final case class Origin(commitLsn: Long, name: String) extends Message
  /** Table descriptor preceding row messages
    * (reference: pkg/logical/message.go:63-76). */
  final case class Relation(id: Long, namespace: String, name: String,
      replicaIdentity: Byte, columns: Seq[RelationColumn]) extends Message
  final case class RelationColumn(key: Boolean, name: String, typeOid: Long,
      modifier: Int)
  final case class PgType(id: Long, namespace: String, name: String) extends Message
  /** Table truncation (wire type 'T'). The reference LISTS this
    * message type (pkg/logical/message.go:21) but leaves it
    * undecoded — its decoder errors on 'T' frames; we decode and
    * apply it (latest views drop rows at or before the truncate
    * point; the raw changelog keeps full history). `options` is the
    * CASCADE (bit 1) / RESTART IDENTITY (bit 2) flag byte. */
  final case class Truncate(options: Int, relationIds: Seq[Long]) extends Message
  final case class Insert(relationId: Long, newTuple: TupleData) extends Message
  final case class Update(relationId: Long, oldTupleKind: Option[Byte],
      oldTuple: Option[TupleData], newTuple: TupleData) extends Message
  final case class Delete(relationId: Long, oldTupleKind: Byte,
      oldTuple: TupleData) extends Message

  /** One row image: per-column cells tagged 'n' (null),
    * 'u' (unchanged TOAST), 't' (text value)
    * (reference: pkg/logical/message.go:105-108,
    * decoder.go:184-198). */
  final case class TupleData(elements: Seq[Element])
  final case class Element(kind: Byte, value: Option[Array[Byte]]) {
    def isNull: Boolean = kind == 'n'
    def isUnchangedToast: Boolean = kind == 'u'
    def text: Option[String] = value.map(new String(_, StandardCharsets.UTF_8))
    // value-based equality despite the Array payload
    override def equals(o: Any): Boolean = o match {
      case e: Element => kind == e.kind && value.map(_.toSeq) == e.value.map(_.toSeq)
      case _ => false
    }
    override def hashCode: Int = (kind, value.map(_.toSeq)).hashCode
  }

  final case class UnknownMessageTypeException(tpe: Byte)
      extends RuntimeException(s"decoding not implemented: ${tpe.toChar}")

  /** Microseconds between the Postgres epoch (2000-01-01) and the
    * Unix epoch (reference converts the same way,
    * pkg/logical/decoder.go:178-182). */
  val PostgresEpochMicros: Long = 946684800000000L

  def toUnixMicros(pgMicros: Long): Long = pgMicros + PostgresEpochMicros

  /** Decode one wire message (the payload of an XLogData frame). */
  def decode(src: Array[Byte]): Message = {
    val buf = ByteBuffer.wrap(src) // big-endian by default
    (buf.get(): @annotation.switch) match {
      case 'B' => Begin(buf.getLong(), buf.getLong(), uint32(buf))
      case 'C' => Commit(buf.get().toInt, buf.getLong(), buf.getLong(), buf.getLong())
      case 'O' => Origin(buf.getLong(), cstring(buf))
      case 'R' =>
        val id = uint32(buf)
        val ns = cstring(buf); val name = cstring(buf)
        val ident = buf.get()
        val n = buf.getShort()
        val cols = (0 until n).map { _ =>
          val flags = buf.get()
          RelationColumn((flags & 1) != 0, cstring(buf), uint32(buf), buf.getInt())
        }
        Relation(id, ns, name, ident, cols)
      case 'Y' => PgType(uint32(buf), cstring(buf), cstring(buf))
      case 'T' =>
        val n = buf.getInt()
        val options = buf.get().toInt
        Truncate(options, (0 until n).map(_ => uint32(buf)))
      case 'I' =>
        val rel = uint32(buf)
        val tag = buf.get()
        require(tag == 'N', s"insert tuple tag must be N, got ${tag.toChar}")
        Insert(rel, tupleData(buf))
      case 'U' =>
        val rel = uint32(buf)
        val tag = buf.get()
        if (tag == 'K' || tag == 'O') {
          val old = tupleData(buf)
          val newTag = buf.get()
          require(newTag == 'N', s"update new-tuple tag must be N, got ${newTag.toChar}")
          Update(rel, Some(tag), Some(old), tupleData(buf))
        } else {
          require(tag == 'N', s"update tuple tag must be K/O/N, got ${tag.toChar}")
          Update(rel, None, None, tupleData(buf))
        }
      case 'D' =>
        val rel = uint32(buf)
        val tag = buf.get()
        require(tag == 'K' || tag == 'O', s"delete tuple tag must be K/O, got ${tag.toChar}")
        Delete(rel, tag, tupleData(buf))
      case other => throw UnknownMessageTypeException(other)
    }
  }

  private def tupleData(buf: ByteBuffer): TupleData = {
    val n = buf.getShort()
    TupleData((0 until n).map { _ =>
      val kind = buf.get()
      kind match {
        case 'n' | 'u' => Element(kind, None)
        case 't' =>
          val len = buf.getInt()
          val bytes = new Array[Byte](len)
          buf.get(bytes)
          Element(kind, Some(bytes))
        case other =>
          throw new IllegalArgumentException(s"unknown cell kind ${other.toChar}")
      }
    })
  }

  private def uint32(buf: ByteBuffer): Long = buf.getInt() & 0xffffffffL

  private def cstring(buf: ByteBuffer): String = {
    val sb = new java.lang.StringBuilder()
    var b = buf.get()
    val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
    while (b != 0) { bytes += b; b = buf.get() }
    new String(bytes.toArray, StandardCharsets.UTF_8)
  }

  // ---- encoder (test + fixture support; the source reads, tests write) ----

  def encodeBegin(m: Begin): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 8 + 8 + 4)
    buf.put('B'.toByte).putLong(m.finalLsn).putLong(m.timestampMicros)
      .putInt(m.xid.toInt)
    buf.array()
  }

  def encodeCommit(m: Commit): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 1 + 8 + 8 + 8)
    buf.put('C'.toByte).put(m.flags.toByte).putLong(m.commitLsn)
      .putLong(m.endLsn).putLong(m.timestampMicros)
    buf.array()
  }

  def encodeRelation(m: Relation): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('R')
    writeInt(out, m.id.toInt); writeCString(out, m.namespace)
    writeCString(out, m.name); out.write(m.replicaIdentity)
    writeShort(out, m.columns.size)
    m.columns.foreach { c =>
      out.write(if (c.key) 1 else 0)
      writeCString(out, c.name); writeInt(out, c.typeOid.toInt)
      writeInt(out, c.modifier)
    }
    out.toByteArray
  }

  def encodeTruncate(m: Truncate): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('T'); writeInt(out, m.relationIds.size); out.write(m.options)
    m.relationIds.foreach(id => writeInt(out, id.toInt))
    out.toByteArray
  }

  def encodeInsert(m: Insert): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); writeInt(out, m.relationId.toInt); out.write('N')
    writeTuple(out, m.newTuple)
    out.toByteArray
  }

  def encodeUpdate(m: Update): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('U'); writeInt(out, m.relationId.toInt)
    (m.oldTupleKind, m.oldTuple) match {
      case (Some(k), Some(t)) => out.write(k); writeTuple(out, t)
      case _ =>
    }
    out.write('N'); writeTuple(out, m.newTuple)
    out.toByteArray
  }

  def encodeDelete(m: Delete): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('D'); writeInt(out, m.relationId.toInt)
    out.write(m.oldTupleKind); writeTuple(out, m.oldTuple)
    out.toByteArray
  }

  private def writeTuple(out: java.io.ByteArrayOutputStream, t: TupleData): Unit = {
    writeShort(out, t.elements.size)
    t.elements.foreach { e =>
      out.write(e.kind)
      if (e.kind == 't') {
        val v = e.value.getOrElse(Array.emptyByteArray)
        writeInt(out, v.length); out.write(v, 0, v.length)
      }
    }
  }

  private def writeInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def writeShort(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def writeCString(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    out.write(b, 0, b.length); out.write(0)
  }
}
