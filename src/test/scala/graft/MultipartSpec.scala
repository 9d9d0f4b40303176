package graft

import java.io.ByteArrayInputStream
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Multipart

/** Streaming multipart parser invariants (round-10 verdict #1/#4): strict
  * RFC 2046 delimiter matching, disk spooling, and the byte cap. Pure
  * JVM — no Spark session. */
class MultipartSpec extends AnyFunSuite {
  private val boundary = "XspecBoundaryX"
  private val ct = s"multipart/form-data; boundary=$boundary"

  private def part(filename: String, bytes: Array[Byte]): Array[Byte] =
    (s"--$boundary\r\n" +
      s"""Content-Disposition: form-data; name="files"; filename="$filename"\r\n""" +
      "Content-Type: application/octet-stream\r\n\r\n").getBytes("UTF-8") ++
      bytes ++ "\r\n".getBytes("UTF-8")

  private def body(files: (String, Array[Byte])*): Array[Byte] =
    files.toArray.flatMap((part _).tupled) ++
      s"--$boundary--\r\n".getBytes("UTF-8")

  test("binary payload embedding the bare boundary bytes parses intact") {
    // RFC 2046 §5.1.1: only CRLF + "--" + boundary delimits; a payload
    // containing "--boundary" mid-stream (no preceding CRLF) must NOT
    // split the part. The round-9 parser matched the bare sequence
    // anywhere and corrupted exactly this shape.
    val payload = ("prefix--" + boundary + "-suffix\n" +
      "also a lone CR \r--" + boundary + " and tail").getBytes("UTF-8") ++
      Array[Byte](0, 1, 2, '\r', '\n', '-', '-') ++ // CRLF-- but no boundary
      boundary.getBytes("UTF-8").take(3) ++ Array[Byte]('!', 0x7f)
    val got = Multipart.parse(body("bin.parquet" -> payload), ct)
    assert(got.map(_._1) === Seq("bin.parquet"))
    assert(got.head._2.toSeq === payload.toSeq)
  }

  test("multiple parts, non-file fields skipped, byte-exact spooling") {
    val a = Array.tabulate[Byte](4096)(i => (i * 31).toByte)
    val b = "plain text".getBytes("UTF-8")
    val field = (s"--$boundary\r\n" +
      "Content-Disposition: form-data; name=\"note\"\r\n\r\n" +
      "ignored value\r\n").getBytes("UTF-8")
    val full = part("a.parquet", a) ++ field ++ part("b.geojson", b) ++
      s"--$boundary--\r\n".getBytes("UTF-8")
    val files = Multipart.parseToFiles(new ByteArrayInputStream(full), ct,
      maxBytes = full.length.toLong + 16)
    try {
      assert(files.map(_._1) === Seq("a.parquet", "b.geojson"))
      assert(Files.readAllBytes(files(0)._2).toSeq === a.toSeq)
      assert(Files.readAllBytes(files(1)._2).toSeq === b.toSeq)
    } finally files.foreach(f => Files.deleteIfExists(f._2))
  }

  test("byte cap enforced on the stream, temp files cleaned up on throw") {
    val big = body("big.parquet" -> Array.fill[Byte](8192)(7))
    val e = intercept[Multipart.SizeExceeded] {
      Multipart.parseToFiles(new ByteArrayInputStream(big), ct, maxBytes = 1024)
    }
    assert(e.cap === 1024)
  }

  test("a body of exactly maxBytes parses (virtual CRLF not metered)") {
    // the parser prepends two virtual CRLF bytes so the first delimiter
    // matches the strict pattern; those are bookkeeping, not body bytes —
    // a body the Content-Length check just admitted at the cap must not
    // 413 inside the parser (off-by-two at the boundary)
    val payload = Array.fill[Byte](512)('x')
    val full = body("edge.bin" -> payload)
    val got = Multipart.parseToFiles(new ByteArrayInputStream(full), ct,
      maxBytes = full.length.toLong)
    try assert(Files.readAllBytes(got.head._2).toSeq === payload.toSeq)
    finally got.foreach(p => Files.deleteIfExists(p._2))
  }

  test("malformed framing rejected: unterminated part, missing boundary") {
    val unterminated = part("x.parquet", Array[Byte](1, 2, 3)).dropRight(10)
    intercept[IllegalArgumentException] {
      Multipart.parse(unterminated, ct)
    }
    intercept[IllegalArgumentException] {
      Multipart.parse(body("a.parquet" -> Array[Byte](1)),
        "multipart/form-data")
    }
  }

  test("empty part content and quoted boundary parameter") {
    val got = Multipart.parse(body("empty.parquet" -> Array.empty[Byte]),
      s"""multipart/form-data; boundary="$boundary"""")
    assert(got.map(_._1) === Seq("empty.parquet"))
    assert(got.head._2.isEmpty)
  }
}
