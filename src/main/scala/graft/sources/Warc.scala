package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, InputStream}
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

  /** One WARC header block may not exceed this (real headers are <2 KB;
    * a "header" that runs past 1 MiB without a blank line is corrupt). */
  private val MaxHeaderBytes = 1 << 20
  /** One record block must fit a JVM byte array; a Content-Length beyond
    * this is treated as corrupt, never attempted. Keeps per-record memory
    * bounded even though a SEGMENT may decompress to many GB. */
  private val MaxRecordBytes: Long = (Int.MaxValue - 16).toLong

  /** Read bytes up to and including the first CRLFCRLF; skips leading
    * CRLFs (inter-record padding). Returns None at EOF before any header
    * byte, or on a malformed/oversized header (corrupt-record discipline:
    * the caller stops this file's parse). */
  private def readHeaderBlock(in: InputStream): Option[Array[Byte]] = {
    val buf = new java.io.ByteArrayOutputStream(512)
    // state = count of consecutive bytes matching \r\n\r\n seen so far
    var state = 0
    var started = false
    var b = in.read()
    while (b >= 0) {
      if (!started) {
        // consume inter-record CRLF padding before the header starts
        if (b == '\r' || b == '\n') { b = in.read() }
        else started = true
      } else {
        buf.write(b)
        if (buf.size > MaxHeaderBytes) return None
        state = (state, b) match {
          case (0, '\r') => 1
          case (1, '\n') => 2
          case (2, '\r') => 3
          case (3, '\n') => 4
          case (_, '\r') => 1
          case _         => 0
        }
        if (state == 4) return Some(buf.toByteArray)
        b = in.read()
      }
    }
    None
  }

  /** Read exactly `len` bytes or return None on early EOF (truncated).
    * The buffer grows with the bytes actually read (doubling, capped at
    * `len`) rather than allocating the full declared Content-Length up
    * front — a corrupt header declaring ~2 GB must not trigger a ~2 GB
    * allocation before a single byte is verified to exist. */
  private def readFully(in: InputStream, len: Int): Option[Array[Byte]] = {
    var out = new Array[Byte](math.min(len, 1 << 16))
    var off = 0
    while (off < len) {
      if (off == out.length)
        out = java.util.Arrays.copyOf(out,
          math.min(len.toLong, out.length * 2L).toInt)
      val n = in.read(out, off, out.length - off)
      if (n < 0) return None
      off += n
    }
    Some(out)
  }

  /** Streaming record parser: pulls records one at a time off `in`, so a
    * multi-GB decompressed segment never materializes — per-record memory
    * is bounded by that record's Content-Length (itself capped at
    * [[MaxRecordBytes]]). Stops at the first malformed/truncated record
    * (corrupt-record discipline): emits what parsed, never throws. */
  def parseStream(in: InputStream): Iterator[WarcRecord] = {
    val buffered = new BufferedInputStream(in, 64 * 1024)
    var idx = 0
    Iterator.continually {
      val rec: Option[WarcRecord] =
        try {
          readHeaderBlock(buffered).flatMap { hb =>
            val headerText = new String(hb, 0, hb.length - Crlf2.length,
              StandardCharsets.UTF_8)
            val lines = headerText.split("\r\n")
            if (lines.isEmpty || !lines.head.startsWith("WARC/")) None
            else {
              val headers = lines.tail.flatMap { l =>
                val c = l.indexOf(':')
                if (c < 0) None else Some(l.take(c).trim.toLowerCase ->
                  l.drop(c + 1).trim)
              }.toMap
              headers.get("content-length")
                .flatMap(s => scala.util.Try(s.toLong).toOption)
                .filter(len => len >= 0L && len <= MaxRecordBytes)
                .flatMap(len => readFully(buffered, len.toInt))
                .map { block =>
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
                  val r = WarcRecord(idx, warcType,
                    headers.getOrElse("warc-target-uri", ""), cType, status,
                    payload)
                  idx += 1
                  r
                }
            }
          }
        } catch {
          // a corrupt gzip member / IO fault mid-stream ends THIS file's
          // parse with what already parsed — never throws mid-scan
          case _: java.io.IOException => None
        }
      rec
    }.takeWhile(_.isDefined).map(_.get)
  }

  /** Parse every well-formed record from the head of `bytes`; stops at
    * the first malformed/truncated record (corrupt-record discipline). */
  def parseAll(bytes: Array[Byte]): Seq[WarcRecord] =
    parseStream(new ByteArrayInputStream(bytes)).toSeq

  /** The DataFrame scan: see object scaladoc. */
  def readWarc(spark: SparkSession, dir: String,
               glob: String = "*.warc*"): DataFrame = {
    import spark.implicits._
    Ingest.binaryFiles(spark, dir, glob)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, raw) =>
        // Stream-decompress: a ~1 GB Common Crawl segment decompresses to
        // 3-4 GB, which must never materialize as one array — parseStream
        // pulls records off the (gzip) stream one bounded block at a time.
        // A corrupt gzip header ends this file's parse with zero records.
        val in: InputStream =
          if (path.endsWith(".gz"))
            scala.util.Try(new GZIPInputStream(new ByteArrayInputStream(raw))
              : InputStream).getOrElse(new ByteArrayInputStream(Array.empty[Byte]))
          else new ByteArrayInputStream(raw)
        // Return the iterator itself (flatMap takes IterableOnce): a .toSeq
        // here would strictly materialize every record of the decompressed
        // segment — exactly the multi-GB buffer the streaming parse avoids.
        parseStream(in).map(r => (path, r.recordIdx, r.warcType,
          r.targetUri, r.contentType, r.httpStatus, r.payload))
      }
      .toDF("path", "record_idx", "warc_type", "target_uri",
        "content_type", "http_status", "payload")
  }
}
