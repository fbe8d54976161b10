package graft.onnx

/** Minimal protobuf wire-format reader — just enough of the (public)
  * protobuf encoding spec to walk an ONNX ModelProto: varints, the four
  * wire types, length-delimited submessages, and packed repeated numerics.
  * No generated code, no protobuf-java dependency: the build has zero
  * external deps, and ONNX files are the ONLY protobuf this library reads,
  * so a 100-line cursor beats a codegen toolchain.
  *
  * A reader is a cursor over a byte-array slice `[pos, end)`; submessages
  * are sub-slices (no copying). All multi-byte scalars are little-endian
  * per the protobuf spec.
  */
private[onnx] final class ProtoReader(val buf: Array[Byte], var pos: Int, val end: Int) {

  def hasNext: Boolean = pos < end

  def readVarint(): Long = {
    var shift = 0
    var out   = 0L
    var b     = 0
    do {
      if (pos >= end) throw new IllegalArgumentException("truncated varint")
      b = buf(pos) & 0xff
      pos += 1
      out |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0 && shift < 70)
    out
  }

  /** Returns (fieldNumber, wireType). */
  def readTag(): (Int, Int) = {
    val t = readVarint()
    ((t >>> 3).toInt, (t & 7).toInt)
  }

  def readFixed32(): Int = {
    if (pos + 4 > end) throw new IllegalArgumentException("truncated fixed32")
    val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
      ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
    pos += 4
    v
  }

  def readFixed64(): Long = {
    val lo = readFixed32() & 0xffffffffL
    val hi = readFixed32() & 0xffffffffL
    lo | (hi << 32)
  }

  /** Length-delimited payload as a sub-reader (shares the backing array). */
  def readMessage(): ProtoReader = {
    val len = readVarint().toInt
    if (len < 0 || pos + len > end) throw new IllegalArgumentException("truncated message")
    val r = new ProtoReader(buf, pos, pos + len)
    pos += len
    r
  }

  def readBytes(): Array[Byte] = {
    val len = readVarint().toInt
    if (len < 0 || pos + len > end) throw new IllegalArgumentException("truncated bytes")
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
    pos += len
    out
  }

  def readString(): String = new String(readBytes(), java.nio.charset.StandardCharsets.UTF_8)

  def skip(wireType: Int): Unit = wireType match {
    case 0 => readVarint()
    case 1 => readFixed64()
    case 2 => { val len = readVarint().toInt; pos += len }
    case 5 => readFixed32()
    case w => throw new IllegalArgumentException(s"unsupported wire type $w")
  }

  /** Repeated numeric field body: a wire-type-2 occurrence is PACKED (parse
    * the whole payload), anything else is one scalar occurrence.
    */
  def longsOf(wireType: Int): Seq[Long] =
    if (wireType == 2) {
      val m   = readMessage()
      val out = Vector.newBuilder[Long]
      while (m.hasNext) out += m.readVarint()
      out.result()
    } else Seq(readVarint())

  def floatsOf(wireType: Int): Seq[Float] =
    if (wireType == 2) {
      val m   = readMessage()
      val out = Vector.newBuilder[Float]
      while (m.hasNext) out += java.lang.Float.intBitsToFloat(m.readFixed32())
      out.result()
    } else Seq(java.lang.Float.intBitsToFloat(readFixed32()))
}
