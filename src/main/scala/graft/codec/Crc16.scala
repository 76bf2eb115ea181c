package graft.codec

/** CRC16-XModem (poly 0x1021, init 0x0000), the checksum strkey appends to
  * `version-byte ‖ payload` before base32 encoding. */
object Crc16 {
  private val table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var crc = i << 8
      var j = 0
      while (j < 8) {
        crc = if ((crc & 0x8000) != 0) (crc << 1) ^ 0x1021 else crc << 1
        j += 1
      }
      t(i) = crc & 0xffff
      i += 1
    }
    t
  }

  def checksum(bytes: Array[Byte]): Int = {
    var crc = 0
    var i = 0
    while (i < bytes.length) {
      crc = ((crc << 8) & 0xffff) ^ table(((crc >>> 8) ^ (bytes(i) & 0xff)) & 0xff)
      i += 1
    }
    crc
  }

  /** Checksum appended little-endian, per strkey. */
  def checksumLE(bytes: Array[Byte]): Array[Byte] = {
    val c = checksum(bytes)
    Array((c & 0xff).toByte, ((c >>> 8) & 0xff).toByte)
  }
}
