package graft.serializers

import java.io.ByteArrayOutputStream

/** Minimal protobuf wire-format writer/reader (varint, zigzag, fixed64,
  * length-delimited) — enough for the Esri FeatureCollection PBF messages.
  * Hand-rolled because the runtime ships no protobuf-java; the wire format
  * is the public protobuf spec.
  */
final class ProtoWriter {
  private val out = new ByteArrayOutputStream(1024)

  def toBytes: Array[Byte] = out.toByteArray

  def writeVarint(v: Long): Unit = {
    var x = v
    while ((x & ~0x7FL) != 0L) {
      out.write(((x & 0x7F) | 0x80).toInt)
      x >>>= 7
    }
    out.write(x.toInt)
  }

  @inline private def key(field: Int, wire: Int): Unit =
    writeVarint((field.toLong << 3) | wire)

  def int64(field: Int, v: Long): Unit = { key(field, 0); writeVarint(v) }
  def uint32(field: Int, v: Int): Unit = int64(field, v.toLong & 0xFFFFFFFFL)
  def enum(field: Int, v: Int): Unit = if (v != 0) int64(field, v)
  def bool(field: Int, v: Boolean): Unit = if (v) int64(field, 1)
  def sint32(field: Int, v: Int): Unit =
    { key(field, 0); writeVarint(((v << 1) ^ (v >> 31)).toLong & 0xFFFFFFFFL) }
  def sint64(field: Int, v: Long): Unit =
    { key(field, 0); writeVarint((v << 1) ^ (v >> 63)) }
  def double(field: Int, v: Double): Unit = {
    key(field, 1)
    val bits = java.lang.Double.doubleToLongBits(v)
    var i = 0
    while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }
  def float(field: Int, v: Float): Unit = {
    key(field, 5)
    val bits = java.lang.Float.floatToIntBits(v)
    var i = 0
    while (i < 4) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }
  def bytes(field: Int, v: Array[Byte]): Unit = {
    key(field, 2); writeVarint(v.length.toLong); out.write(v, 0, v.length)
  }
  def string(field: Int, v: String): Unit =
    bytes(field, v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  def message(field: Int)(body: ProtoWriter => Unit): Unit = {
    val w = new ProtoWriter; body(w); bytes(field, w.toBytes)
  }
  def packedUint(field: Int, vs: Iterable[Long]): Unit = {
    if (vs.isEmpty) return
    val w = new ProtoWriter; vs.foreach(w.writeVarint); bytes(field, w.toBytes)
  }
  def packedSint64(field: Int, vs: Iterable[Long]): Unit = {
    if (vs.isEmpty) return
    val w = new ProtoWriter
    vs.foreach(v => w.writeVarint((v << 1) ^ (v >> 63)))
    bytes(field, w.toBytes)
  }
}

/** Streaming reader for round-trip tests. */
final class ProtoReader(buf: Array[Byte], from: Int, until: Int) {
  def this(buf: Array[Byte]) = this(buf, 0, buf.length)
  private var pos = from

  def hasNext: Boolean = pos < until

  def readVarint(): Long = {
    var shift = 0; var result = 0L
    while (true) {
      val b = buf(pos) & 0xFF; pos += 1
      result |= (b & 0x7FL) << shift
      if ((b & 0x80) == 0) return result
      shift += 7
    }
    result
  }
  def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** Returns (fieldNumber, wireType); positions at the value. */
  def readKey(): (Int, Int) = {
    val k = readVarint()
    ((k >>> 3).toInt, (k & 7).toInt)
  }
  def readDouble(): Double = {
    var bits = 0L; var i = 0
    while (i < 8) { bits |= (buf(pos + i).toLong & 0xFF) << (8 * i); i += 1 }
    pos += 8
    java.lang.Double.longBitsToDouble(bits)
  }
  def readFloat(): Float = {
    var bits = 0; var i = 0
    while (i < 4) { bits |= (buf(pos + i) & 0xFF) << (8 * i); i += 1 }
    pos += 4
    java.lang.Float.intBitsToFloat(bits)
  }
  def readBytes(): Array[Byte] = {
    val n = readVarint().toInt
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
    pos += n
    out
  }
  def readString(): String =
    new String(readBytes(), java.nio.charset.StandardCharsets.UTF_8)
  /** Sub-reader over an embedded message / packed field. */
  def subReader(): ProtoReader = {
    val n = readVarint().toInt
    val r = new ProtoReader(buf, pos, pos + n)
    pos += n
    r
  }
  def skip(wire: Int): Unit = wire match {
    case 0 => readVarint()
    case 1 => pos += 8
    case 2 => val n = readVarint().toInt; pos += n
    case 5 => pos += 4
  }
}
