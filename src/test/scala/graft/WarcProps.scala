package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.sources.Warc

/** ScalaCheck properties for the WARC codec: mux→parse round-trips
  * hold for ARBITRARY bodies (including bodies that contain CRLF
  * runs, the record magic, or fake headers — the payload is
  * length-framed, so content can never desynchronize the stream) and
  * hostile header values (CR/LF injection is sanitized, not
  * propagated). */
object WarcProps extends Properties("Warc") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(40)

  private val body: Gen[Array[Byte]] = Gen.frequency(
    3 -> Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
        .map(_.map(_.toByte).toArray)),
    1 -> Gen.oneOf(
      "\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n",
      "Content-Length: 999\r\n\r\n",
      "\r\n\r\n\r\n\r\n", "").map(_.getBytes("ISO-8859-1")))

  private val uri: Gen[String] = for {
    base <- Gen.identifier
    evil <- Gen.oneOf("", "\r\nX-Injected: 1", "\nWARC-Type: warcinfo",
      " spaced path", "\r")
  } yield s"http://example.org/$base$evil"

  private val record: Gen[(String, Array[Byte])] = Gen.zip(uri, body)

  property("arbitrary bodies and hostile uris round-trip, length-framed") =
    Prop.forAll(Gen.chooseNum(1, 6).flatMap(Gen.listOfN(_, record))) {
      recs =>
        val bytes = recs.zipWithIndex.map { case ((u, b), i) =>
          Warc.encodeRecord("response", u,
            "application/http;msgtype=response",
            Warc.encodeHttpResponse(200, "OK", "text/plain", b), s"p-$i")
        }.reduce(_ ++ _)
        val parsed = Warc.parse(bytes)
        parsed.length == recs.length &&
          parsed.zip(recs).forall { case (p, (u, b)) =>
            p.warcType == "response" && p.httpStatus == 200 &&
              // header values survive minus the injected line breaks
              p.targetUri == u.replace("\r", "").replace("\n", "") &&
              java.util.Arrays.equals(p.payload, b)
          }
    }

  property("gzip-member concatenation round-trips through one stream") =
    Prop.forAll(Gen.chooseNum(1, 5).flatMap(Gen.listOfN(_, body))) { bs =>
      val stream = bs.zipWithIndex.map { case (b, i) =>
        Warc.gzipMember(Warc.encodeRecord("resource",
          s"http://example.org/r/$i", "application/octet-stream", b,
          s"g-$i"))
      }.reduce(_ ++ _)
      // decompress via the scan's member-transparent path
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(stream))
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
        .foreach(n => buf.write(chunk, 0, n))
      val parsed = Warc.parse(buf.toByteArray)
      parsed.length == bs.length &&
        parsed.zip(bs).forall { case (p, b) =>
          java.util.Arrays.equals(p.payload, b) }
    }
}
