package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (ISO 28500, "Web ARChive") record scan — the Common Crawl
  * delivery format, and therefore the literal FIRST stage of a web-scale
  * LLM data pipeline: everything downstream here (markup strip → lang-ID
  * → quality → dedup ladder → mixture → shards) consumes what this
  * emits. Reads `.warc` and `.warc.gz` (Common Crawl compresses each
  * record as its own gzip member; JDK GZIPInputStream transparently
  * concatenates members, so the same path handles both layouts), splits
  * records executor-side, and peels the HTTP envelope off `response`
  * records. One row per record: (path, record_idx, warc_type,
  * target_uri, content_type, http_status, payload) — `payload` is the
  * HTTP body for response records, the raw block otherwise;
  * `http_status` is 0 for non-HTTP records.
  *
  * Scale shape: [[graft.operators.Media]]'s zip-exploder discipline —
  * bytes never visit the driver; each file's records emit through one
  * flatMap, and per-task memory is bounded by the segment size (Common
  * Crawl ships ~1 GB segments by construction). Corrupt-record
  * discipline: a malformed record ends THAT file's parse — emit what
  * parsed, never throw mid-scan. */
object Warc {

  final case class WarcRecord(recordIdx: Int, warcType: String,
                              targetUri: String, contentType: String,
                              httpStatus: Int, payload: Array[Byte])

  private val Crlf2 = "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Decompress a (possibly multi-member) gzip stream fully. */
  def gunzipAll(raw: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(raw))
    val out = new ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Parse every well-formed record from the head of `bytes`; stops at
    * the first malformed/truncated record (corrupt-record discipline). */
  def parseAll(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var idx = 0
    var ok = true
    while (ok && pos < bytes.length) {
      // skip inter-record CRLFs
      while (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n')
        pos += 2
      if (pos >= bytes.length) ok = false
      else {
        val headerEnd = indexOf(bytes, Crlf2, pos)
        if (headerEnd < 0) ok = false
        else {
          val headerText = new String(bytes, pos, headerEnd - pos,
            StandardCharsets.UTF_8)
          val lines = headerText.split("\r\n")
          if (lines.isEmpty || !lines.head.startsWith("WARC/")) ok = false
          else {
            val headers = lines.tail.flatMap { l =>
              val c = l.indexOf(':')
              if (c < 0) None else Some(l.take(c).trim.toLowerCase ->
                l.drop(c + 1).trim)
            }.toMap
            headers.get("content-length").flatMap(s =>
              scala.util.Try(s.toInt).toOption) match {
              case Some(len) if headerEnd + Crlf2.length + len <= bytes.length =>
                val blockStart = headerEnd + Crlf2.length
                val block = java.util.Arrays.copyOfRange(
                  bytes, blockStart, blockStart + len)
                val warcType = headers.getOrElse("warc-type", "")
                val (status, cType, payload) =
                  if (warcType == "response" &&
                    block.length >= 5 &&
                    new String(block, 0, 5, StandardCharsets.US_ASCII) == "HTTP/") {
                    val he = indexOf(block, Crlf2, 0)
                    if (he < 0) (0, headers.getOrElse("content-type", ""), block)
                    else {
                      val httpHead = new String(block, 0, he,
                        StandardCharsets.UTF_8).split("\r\n")
                      val st = httpHead.head.split(" ")
                        .lift(1).flatMap(s =>
                          scala.util.Try(s.toInt).toOption).getOrElse(0)
                      val ct = httpHead.tail.collectFirst {
                        case l if l.toLowerCase.startsWith("content-type:") =>
                          l.drop("content-type:".length).trim
                      }.getOrElse("")
                      (st, ct,
                        java.util.Arrays.copyOfRange(block,
                          he + Crlf2.length, block.length))
                    }
                  } else (0, headers.getOrElse("content-type", ""), block)
                out += WarcRecord(idx, warcType,
                  headers.getOrElse("warc-target-uri", ""), cType, status,
                  payload)
                idx += 1
                pos = blockStart + len
              case _ => ok = false
            }
          }
        }
      }
    }
    out.result()
  }

  /** The DataFrame scan: see object scaladoc. */
  def readWarc(spark: SparkSession, dir: String,
               glob: String = "*.warc*"): DataFrame = {
    import spark.implicits._
    Ingest.binaryFiles(spark, dir, glob)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, raw) =>
        val bytes =
          if (path.endsWith(".gz"))
            scala.util.Try(gunzipAll(raw)).getOrElse(Array.empty[Byte])
          else raw
        parseAll(bytes).map(r => (path, r.recordIdx, r.warcType,
          r.targetUri, r.contentType, r.httpStatus, r.payload))
      }
      .toDF("path", "record_idx", "warc_type", "target_uri",
        "content_type", "http_status", "payload")
  }
}
