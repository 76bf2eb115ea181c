package graft.codec

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** WARC/1.0 record splitting (ISO 28500) — the crawl front door upstream
  * of [[graft.operators.Web.htmlExtract]]: one crawl file holds many
  * records, each `WARC/1.0\r\n` + header lines + blank line +
  * Content-Length payload + `\r\n\r\n`.
  *
  * Everything is an EXACT string/offset law so a SQL engine replays the
  * record boundaries, the extracted fields and every error arm:
  *
  *   - a record must start `WARC/1.0\r\n` at the current offset;
  *   - the header block ends at the first `\r\n\r\n`;
  *   - header fields are the FIRST line matching
  *     `(?mi)^<key>:[ \t]*([^\r\n]*)`, value trimmed of spaces/tabs,
  *     empty → absent;
  *   - Content-Length must be 1-18 digits; the payload is exactly that
  *     many CHARACTERS followed by the `\r\n\r\n` record terminator.
  *     (Character grain keeps the law replayable in any engine's string
  *     algebra; a production byte-grain variant runs the identical law
  *     over binary offsets — the planted fixtures are ASCII, where the
  *     two coincide.)
  *
  * ERROR CHANNEL (parse stops at the first bad record — offsets past it
  * are unreliable; earlier good records survive): `record cap exceeded`,
  * `missing WARC/1.0 header`, `missing header terminator`,
  * `missing content-length`, `truncated record` — in that priority
  * order, mirrored by the SQL oracle's CASE arms. */
object WarcCodec {

  private val Sep = "\r\n\r\n"
  private val Magic = "WARC/1.0\r\n"
  private val Digits = java.util.regex.Pattern.compile("[0-9]{1,18}")

  private def field(headers: String, key: String): String = {
    val m = java.util.regex.Pattern
      .compile("(?mi)^" + key + ":[ \\t]*([^\\r\\n]*)").matcher(headers)
    if (!m.find()) null
    else {
      val v = m.group(1)
      var b = 0
      var e = v.length
      while (b < e && (v.charAt(b) == ' ' || v.charAt(b) == '\t')) b += 1
      while (e > b && (v.charAt(e - 1) == ' ' || v.charAt(e - 1) == '\t')) e -= 1
      if (e == b) null else v.substring(b, e)
    }
  }

  private def u8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  /** Split one crawl file into records. Row schema: (rec_idx, warc_type,
    * target_uri, content_length, payload, rec_ok, error). */
  def parse(content: UTF8String, maxRecords: Int): ArrayData = {
    val s = content.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    def err(idx: Int, msg: String): Unit =
      out += new GenericInternalRow(Array[Any](
        idx, null, null, null, null, false, UTF8String.fromString(msg)))
    var off = 0
    var idx = 0
    var stop = false
    while (!stop && off < s.length) {
      if (idx >= maxRecords) { err(idx, "record cap exceeded"); stop = true }
      else if (!s.startsWith(Magic, off)) {
        err(idx, "missing WARC/1.0 header"); stop = true
      } else {
        val h = s.indexOf(Sep, off)
        if (h < 0) { err(idx, "missing header terminator"); stop = true }
        else {
          val hdrs = s.substring(off, h)
          val clv = field(hdrs, "content-length")
          if (clv == null || !Digits.matcher(clv).matches()) {
            err(idx, "missing content-length"); stop = true
          } else {
            val cl = clv.toLong
            if (s.length < h.toLong + 4 + cl + 4 ||
                !s.regionMatches(h + 4 + cl.toInt, Sep, 0, 4)) {
              err(idx, "truncated record"); stop = true
            } else {
              out += new GenericInternalRow(Array[Any](
                idx, u8(field(hdrs, "warc-type")),
                u8(field(hdrs, "warc-target-uri")),
                cl, u8(s.substring(h + 4, h + 4 + cl.toInt)), true, null))
              off = h + 8 + cl.toInt
              idx += 1
            }
          }
        }
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}
