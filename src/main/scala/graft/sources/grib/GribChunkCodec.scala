package graft.sources.grib

import java.nio.{ByteBuffer, ByteOrder}

/** The decode half of GRIB virtualization (`Kerchunk.scanGrib2`): a zarr
  * chunk whose stored bytes are a WHOLE GRIB2 message. The kerchunk grib2
  * convention — messages are self-describing, so the reference carries the
  * message extent and the codec re-parses it in memory (KBs of header
  * work) and selects ONE field by its primitive identity
  * (shortName, level type, level value, statistical process), which is
  * constant per zarr array even though packing parameters (reference
  * value, scales, bits) vary per message. Output is the little-endian f8
  * C-order buffer the numeric chunk path expects; bitmap gaps decode NaN,
  * matching the array's declared fill. */
object GribChunkCodec {
  def decodeField(msg: Array[Byte], shortName: String, levelType: Int,
      level: Double, statProcess: Int): Array[Byte] = {
    val read = (off: Long, len: Int) =>
      java.util.Arrays.copyOfRange(msg, off.toInt, off.toInt + len)
    val (fields, _) = Grib2.parseMessage(read, 0L)
    val matches = fields.filter(f => f.shortName == shortName &&
      f.levelTypeCode == levelType && f.levelValue == level &&
      f.statProcess == statProcess)
    require(matches.size == 1,
      s"grib2 chunk: ${matches.size} fields match ($shortName, " +
        s"levelType=$levelType, level=$level, step=$statProcess) — " +
        "the referenced message does not carry exactly this field")
    val f = matches.head
    val data = read(f.dataOffset, f.dataBytes)
    val bitmap =
      if (f.bitmapOffset >= 0) read(f.bitmapOffset, f.bitmapBytes) else null
    val vals = f.decode(data, bitmap)
    val bb = ByteBuffer.allocate(vals.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putDouble)
    bb.array()
  }
}
