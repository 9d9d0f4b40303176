package graft.api

import java.nio.charset.StandardCharsets

/** Minimal RFC 7578 multipart/form-data parser for the upload route —
  * byte-exact (parquet parts are binary), zero dependencies (the JDK
  * http server has no multipart support). Only file parts (those with a
  * `filename` in Content-Disposition) are returned; plain fields are
  * ignored because the reference carries its upload params in the query
  * string (api/main.py:679-684).
  */
object Multipart {

  /** Parse `body` against the boundary in `contentType`; returns
    * (filename, bytes) per file part, in order. */
  def parse(body: Array[Byte], contentType: String): Seq[(String, Array[Byte])] = {
    val boundary = contentType.split(";").map(_.trim)
      .collectFirst { case s if s.startsWith("boundary=") =>
        s.stripPrefix("boundary=").stripPrefix("\"").stripSuffix("\"")
      }
      .getOrElse(throw new IllegalArgumentException(
        "multipart content-type carries no boundary"))
    val delim = ("--" + boundary).getBytes(StandardCharsets.UTF_8)

    // part starts: every delimiter occurrence; the terminal one is "--xx--"
    val starts = Iterator.iterate(indexOf(body, delim, 0))(i =>
      if (i < 0) -1 else indexOf(body, delim, i + delim.length))
      .takeWhile(_ >= 0).toSeq
    if (starts.size < 2) return Nil

    starts.sliding(2).flatMap { case Seq(a, b) =>
      // part content runs from after the delimiter's CRLF to the CRLF
      // preceding the next delimiter
      val headStart = a + delim.length + 2 // skip \r\n after delimiter
      if (headStart >= b) None
      else {
        val sep = indexOf(body, "\r\n\r\n".getBytes(StandardCharsets.UTF_8),
          headStart)
        if (sep < 0 || sep >= b) None
        else {
          val headers = new String(body, headStart, sep - headStart,
            StandardCharsets.UTF_8)
          val contentStart = sep + 4
          val contentEnd = b - 2 // strip the \r\n before the next delimiter
          filenameOf(headers).map { name =>
            (name, java.util.Arrays.copyOfRange(body, contentStart,
              math.max(contentStart, contentEnd)))
          }
        }
      }
    }.toSeq
  }

  private val FilenameRe = """filename="([^"]*)"""".r

  private def filenameOf(headers: String): Option[String] =
    headers.linesIterator
      .find(_.toLowerCase.startsWith("content-disposition"))
      .flatMap(h => FilenameRe.findFirstMatchIn(h).map(_.group(1)))
      .filter(_.nonEmpty)

  /** First occurrence of `needle` in `haystack` at or after `from`. */
  private def indexOf(haystack: Array[Byte], needle: Array[Byte],
      from: Int): Int = {
    var i = math.max(0, from)
    val last = haystack.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && haystack(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
