package graft

import graft.functions.{HaversineKm, RollingHash, TextSketches}
import graft.operators.Media
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based checks (SURVEY §5.2.3) over the pure JVM kernels —
  * metric axioms, hash-fold equivalence, involution/inverse laws. */
object KernelProperties extends Properties("graft.kernels") {
  import Prop.forAll

  private val lat = Gen.choose(-90.0, 90.0)
  private val lon = Gen.choose(-180.0, 180.0)

  property("haversine.nonNegative") = forAll(lat, lon, lat, lon) { (a, b, c, d) =>
    HaversineKm.kernel(a, b, c, d) >= 0.0
  }

  property("haversine.symmetric") = forAll(lat, lon, lat, lon) { (a, b, c, d) =>
    HaversineKm.kernel(a, b, c, d) == HaversineKm.kernel(c, d, a, b)
  }

  property("haversine.identityIsZero") = forAll(lat, lon) { (a, b) =>
    HaversineKm.kernel(a, b, a, b) == 0.0
  }

  property("haversine.boundedByHalfCircumference") = forAll(lat, lon, lat, lon) {
    (a, b, c, d) =>
      HaversineKm.kernel(a, b, c, d) <= math.Pi * HaversineKm.EarthRadiusKm + 1e-6
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '))).map(_.mkString)

  property("rollingHash.matchesReferenceFold") = forAll(asciiText) { s =>
    val expected = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % RollingHash.Mod)
    RollingHash.kernel(UTF8String.fromString(s)) == expected
  }

  property("rollingHash.inRange") = forAll(asciiText) { s =>
    val h = RollingHash.kernel(UTF8String.fromString(s))
    h >= 0 && h < RollingHash.Mod
  }

  property("minhashSig.lengthAndRange") = forAll(asciiText) { s =>
    val sig = TextSketches.minhashSig(UTF8String.fromString(s), 16).toLongArray()
    sig.length == 16 && sig.forall(v => v >= 0 && v < TextSketches.Mod)
  }

  property("minhashSig.identicalTextsShareSig") = forAll(asciiText) { s =>
    TextSketches.minhashSig(UTF8String.fromString(s), 16).toLongArray().toSeq ==
      TextSketches.minhashSig(UTF8String.fromString(s), 16).toLongArray().toSeq
  }

  property("simhash.withinKBits") = forAll(asciiText, Gen.choose(1, 32)) { (s, k) =>
    val h = TextSketches.simhash(UTF8String.fromString(s), k)
    h >= 0 && h < (1L << k)
  }

  // SimHash votes sum over the token multiset — a commutative reduction —
  // so token ORDER must never change the fingerprint (the law that makes
  // the fingerprint robust to sentence reordering, its design point).
  private val tokensGen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))

  property("simhash64.tokenOrderInvariant") = forAll(tokensGen) { toks =>
    val a = TextSketches.simhash64(UTF8String.fromString(toks.mkString(" ")))
    val b = TextSketches.simhash64(UTF8String.fromString(toks.reverse.mkString(" ")))
    a == b
  }

  property("simhash.tokenOrderInvariant16") = forAll(tokensGen) { toks =>
    TextSketches.simhash(UTF8String.fromString(toks.mkString(" ")), 16) ==
      TextSketches.simhash(UTF8String.fromString(toks.sorted.mkString(" ")), 16)
  }

  private val tensorGen: Gen[(Array[Float], Array[Int])] = for {
    h <- Gen.choose(1, 8)
    w <- Gen.choose(1, 8)
    data <- Gen.listOfN(3 * h * w, Gen.choose(0f, 1f))
  } yield (data.toArray, Array(3, h, w))

  property("flipHorizontal.involutive") = forAll(tensorGen) { case (data, shape) =>
    Media.flipHorizontal(Media.flipHorizontal(data, shape), shape).toSeq == data.toSeq
  }

  property("normalize.inverse") = forAll(tensorGen) { case (data, shape) =>
    val mean = Array(0.4f, 0.5f, 0.6f)
    val std = Array(0.2f, 0.25f, 0.3f)
    val n = Media.normalize(data, shape, mean, std)
    // invert: x = n*std + mean per channel
    val Array(_, h, w) = shape
    (0 until data.length).forall { i =>
      val ch = i / (h * w)
      math.abs(n(i) * std(ch) + mean(ch) - data(i)) < 1e-5
    }
  }

  // ---- TopKByScore buffer laws --------------------------------------------

  private val pairsGen: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(
      Gen.oneOf(Gen.choose(-100.0, 100.0), Gen.const(Double.NaN),
        Gen.const(0.0), Gen.const(-0.0)),
      Gen.choose(0L, 50L)))
  private val kGen: Gen[Int] = Gen.choose(1, 6)

  /** Reference: Spark SQL's double ordering desc (NaN greatest,
    * -0.0 == 0.0 per SQLOrderingUtil), id asc. */
  private def refTopK(xs: List[(Double, Long)], k: Int): List[(Double, Long)] =
    xs.sortWith { case ((v1, i1), (v2, i2)) =>
      val c = if (v1 == v2) 0 else java.lang.Double.compare(v1, v2)
      c > 0 || (c == 0 && i1 < i2)
    }.take(k)

  private def runBuffer(xs: List[(Double, Long)], k: Int): List[(Double, Long)] = {
    val b = new graft.functions.TopKByScore.Buffer(
      new Array[Double](k), new Array[Long](k), 0)
    xs.foreach { case (v, i) => b.insert(v, i) }
    List.tabulate(b.size)(i => (b.vs(i), b.ids(i)))
  }

  private def eqPairs(a: List[(Double, Long)], b: List[(Double, Long)]): Boolean =
    a.length == b.length && a.zip(b).forall { case ((v1, i1), (v2, i2)) =>
      i1 == i2 && (v1 == v2 || (v1.isNaN && v2.isNaN))
    }

  property("topk.buffer.matchesSortTake") = forAll(pairsGen, kGen) { (xs, k) =>
    eqPairs(runBuffer(xs, k), refTopK(xs, k))
  }

  property("topk.buffer.mergeEqualsConcat") = forAll(pairsGen, pairsGen, kGen) {
    (xs, ys, k) =>
      val a = new graft.functions.TopKByScore.Buffer(
        new Array[Double](k), new Array[Long](k), 0)
      xs.foreach { case (v, i) => a.insert(v, i) }
      val bs = runBuffer(ys, k)
      bs.foreach { case (v, i) => a.insert(v, i) } // merge = re-insert b's slots
      eqPairs(List.tabulate(a.size)(i => (a.vs(i), a.ids(i))), refTopK(xs ++ ys, k))
  }


  // --- product quantization: ADC is EXACT for the reconstruction ---

  private val pqCase: Gen[(Array[Double], Seq[Seq[Seq[Double]]])] = for {
    m <- Gen.choose(1, 4)
    dsub <- Gen.choose(1, 4)
    ksub <- Gen.choose(1, 5)
    v <- Gen.listOfN(m * dsub, Gen.choose(-3.0, 3.0))
    books <- Gen.listOfN(m,
      Gen.listOfN(ksub, Gen.listOfN(dsub, Gen.choose(-3.0, 3.0))))
  } yield (v.toArray, books.map(_.map(_.map(identity))))

  property("pq.adcEqualsCosineOfReconstruction") = forAll(pqCase) {
    case (q, books) =>
      import graft.functions.{PqCosine, PqEncode}
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      val enc = PqEncode(Literal.create(q.toSeq, ArrayType(DoubleType)), books)
      val codes = enc.kernel(new GenericArrayData(q))
      val m = books.length
      val kMax = books.map(_.length).max
      // reconstruction from the chosen codes
      val recon = (0 until m).flatMap(j => books(j)(codes.getInt(j))).toArray
      // LUT exactly as pqTopK builds it (incl. the book-size tail)
      val lut = new Array[Double](2 * m * kMax + 1 + m)
      var off = 0
      for (j <- 0 until m) {
        val dsub = books(j).head.length
        for (c <- books(j).indices) {
          val cent = books(j)(c)
          lut(j * kMax + c) = (0 until dsub).map(i => q(off + i) * cent(i)).sum
          lut(m * kMax + j * kMax + c) = cent.map(x => x * x).sum
        }
        off += dsub
      }
      lut(2 * m * kMax) = math.sqrt(q.map(x => x * x).sum)
      for (j <- 0 until m) lut(2 * m * kMax + 1 + j) = books(j).length.toDouble
      val adc = PqCosine(Literal.create(null, ArrayType(DoubleType)),
        Literal.create(null, ArrayType(DoubleType)))
        .kernel(codes, new GenericArrayData(lut))
      val qn = math.sqrt(q.map(x => x * x).sum)
      val rn = math.sqrt(recon.map(x => x * x).sum)
      val dot = q.zip(recon).map { case (a, b) => a * b }.sum
      val expected = if (qn == 0.0 || rn == 0.0) 0.0 else dot / (qn * rn)
      math.abs(adc - expected) < 1e-9
  }

  property("pq.encodePicksNearestCentroidPerSubspace") = forAll(pqCase) {
    case (q, books) =>
      import graft.functions.PqEncode
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      val enc = PqEncode(Literal.create(q.toSeq, ArrayType(DoubleType)), books)
      val codes = enc.kernel(new GenericArrayData(q))
      var off = 0
      books.zipWithIndex.forall { case (book, j) =>
        val dsub = book.head.length
        val sub = q.slice(off, off + dsub)
        off += dsub
        val d2 = book.map(c => c.zip(sub).map { case (a, b) =>
          (a - b) * (a - b) }.sum)
        val best = d2.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        codes.getInt(j) == best
      }
  }

  // strings mixing ascii, combining marks, and precomposed characters —
  // the inputs where NFC composition actually does work
  private val unicodeText: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      1 -> Gen.const("é"), 1 -> Gen.const("ü"),
      1 -> Gen.const("é"), 1 -> Gen.const("ü"),
      1 -> Gen.const("́"))).map(_.mkString)

  property("nfc.matchesJavaNormalizer") = forAll(unicodeText) { s =>
    graft.functions.NfcNormalize.kernel(UTF8String.fromString(s)).toString ==
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  property("nfc.idempotent") = forAll(unicodeText) { s =>
    val once = graft.functions.NfcNormalize.kernel(UTF8String.fromString(s))
    graft.functions.NfcNormalize.kernel(once) == once
  }

  property("deflateRatio.positiveAndDeterministic") = forAll(unicodeText) { s =>
    val u = UTF8String.fromString(s)
    val r = graft.functions.DeflateRatio.kernel(u)
    r > 0.0 && r == graft.functions.DeflateRatio.kernel(u)
  }

  property("deflateRatio.repetitionNeverBeatsItsUnit") = forAll(
    Gen.alphaNumStr.suchThat(_.length >= 8), Gen.choose(8, 64)) { (unit, n) =>
      // repeating a unit n times can only ADD LZ-matchable structure:
      // the repeated text's ratio never exceeds the unit's own + slack
      // for the one-block framing on tiny inputs
      val one = graft.functions.DeflateRatio.kernel(UTF8String.fromString(unit))
      val rep = graft.functions.DeflateRatio.kernel(
        UTF8String.fromString(unit * n))
      rep <= one + 0.05
  }

  property("deflateRatio.emptyIsOne") = Prop(
    graft.functions.DeflateRatio.kernel(UTF8String.fromString("")) == 1.0)

  property("bloom.noFalseNegatives") = forAll(
    Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))) { keys =>
    import graft.functions.BloomHash
    val numBits = 1 << 12
    val words = new Array[Long](numBits / 64)
    val k = 6
    keys.foreach { key =>
      val h1 = BloomHash.mix64(key); val h2 = BloomHash.mix64b(key)
      (0 until k).foreach(i =>
        BloomHash.setBit(words, (h1 + i * h2) & (numBits - 1)))
    }
    keys.forall { key =>
      val h1 = BloomHash.mix64(key); val h2 = BloomHash.mix64b(key)
      (0 until k).forall(i =>
        BloomHash.getBit(words, (h1 + i * h2) & (numBits - 1)))
    }
  }
}

/** MJPEG segment-walk invariants on RANDOM concatenations of real JDK-encoded
  * JPEGs: the recovered slices are exactly the frame boundaries (every frame,
  * in order, gap-free), and truncating the stream mid-last-frame drops
  * exactly that frame. Pure JVM kernel — no Spark session. */
object MjpegProperties extends Properties("graft.mjpeg") {
  import Prop.forAll
  import java.awt.image.BufferedImage
  import java.io.ByteArrayOutputStream
  import javax.imageio.ImageIO

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20) // each case encodes several real JPEGs

  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) { var y = 0; while (y < h) { img.setRGB(x, y, rgb); y += 1 }; x += 1 }
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  private val frameGen: Gen[Array[Byte]] = for {
    w <- Gen.choose(8, 32)
    h <- Gen.choose(8, 32)
    c <- Gen.choose(0, 0xffffff)
  } yield jpeg(w, h, c)

  private val streamGen: Gen[List[Array[Byte]]] =
    Gen.choose(1, 6).flatMap(k => Gen.listOfN(k, frameGen))

  property("slices.recoverExactFrameBoundaries") = forAll(streamGen) { frames =>
    val stream = frames.reduce(_ ++ _)
    val bounds = frames.scanLeft(0)(_ + _.length)
    val expected = bounds.zip(bounds.tail)
    graft.operators.Media.mjpegSlices(stream).toList == expected
  }

  property("slices.truncationDropsOnlyTheLastFrame") =
    forAll(streamGen, Gen.choose(1, 10)) { (frames, cut) =>
      val stream = frames.reduce(_ ++ _)
      val r = math.min(cut, frames.last.length - 2) // keep last frame's SOI
      graft.operators.Media.mjpegSlices(stream.dropRight(r)).length == frames.length - 1
    }
}

/** Funnel invariants on RANDOM event streams (Behavior.scala contract):
  * the non-null stage anchors of every output row form a PREFIX, strictly
  * ordered with each step inside its deadline; `stage_reached` counts that
  * prefix; per-stage user counts are monotone non-increasing down the
  * funnel; and exactly the users with a stage-1 event enter. Separate
  * object: each case runs a full (local) Spark job, so this one trades
  * case count for the kernel properties' 100-case default.
  */
object FunnelProperties extends Properties("graft.funnel") {
  import Prop.forAll

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val stages = List("view", "click", "purchase")
  private val WindowSec = 600L

  // Few users x many colliding timestamps: ties, out-of-order stages, and
  // missed deadlines all occur with high probability per stream.
  private val event: Gen[(Long, Long, String)] = for {
    u <- Gen.choose(1L, 6L)
    t <- Gen.choose(0L, 3000L)
    e <- Gen.oneOf("view", "click", "purchase", "noise")
  } yield (u, t, e)

  property("funnel.prefixOrderedWithinDeadline") =
    forAll(Gen.nonEmptyListOf(event)) { evs =>
      val spark = TestSpark.spark
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val df = evs.toDF("user_id", "sec", "event_type")
        .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
          col("event_type"))
      val rows = graft.operators.Behavior
        .funnel(df, "user_id", "ts", "event_type", stages, WindowSec)
        .collect()
      val anchors = rows.map { r =>
        (r.getLong(0),
          stages.map(s => Option(r.getAs[java.sql.Timestamp](s"t_$s"))
            .map(_.getTime / 1000L)),
          r.getAs[Long]("stage_reached"))
      }
      val entered = evs.filter(_._3 == stages.head).map(_._1).toSet
      val usersOk = anchors.map(_._1).toSet == entered
      val perRow = anchors.forall { case (_, ts, reached) =>
        val n = ts.takeWhile(_.isDefined).size
        val prefix = ts.drop(n).forall(_.isEmpty)
        val ordered = ts.sliding(2).forall {
          case List(Some(a), Some(b)) => a < b && b <= a + WindowSec
          case _ => true
        }
        prefix && reached == n.toLong && ordered
      }
      val counts = stages.indices.map(i => anchors.count(_._2(i).isDefined))
      val monotone = counts.sliding(2).forall {
        case Seq(a, b) => a >= b
        case _ => true
      }
      usersOk && perRow && monotone
    }

  // ---- image header sniffer: totality on adversarial bytes ----
  // imageDims is a corpus gate — at scale it WILL see truncated,
  // corrupt, and adversarial blobs, and a throw anywhere kills the
  // stage. It must be total: Some or None, never an exception, and any
  // Some must carry the sniffed format tag.

  private val arbBytes: Gen[Array[Byte]] =
    Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)).map(_.toArray))

  private def totalAndTagged(b: Array[Byte]): Boolean =
    Media.imageDims(b) match {
      case Some((fmt, _, _)) => Set("png", "jpeg", "gif", "bmp")(fmt)
      case None => true
    }

  property("imageDims.totalOnArbitraryBytes") = forAll(arbBytes)(totalAndTagged)

  property("imageDims.totalOnMagicPrefixedGarbage") = {
    val magics = Gen.oneOf(
      Array(0xFF, 0xD8).map(_.toByte), // JPEG SOI, random segment soup
      Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte), // PNG sig, no IHDR
      "GIF89a".getBytes("US-ASCII"),
      "BM".getBytes("US-ASCII"))
    forAll(magics, arbBytes) { (magic, tail) =>
      totalAndTagged(magic ++ tail)
    }
  }

  property("imageDims.truncationIsTotal") = {
    // every prefix of a real encoded image parses to Some or None,
    // never a throw — the mid-upload/corrupt-object case
    val full = Media.syntheticImage(5, "jpg", 48, 32)
    forAll(Gen.choose(0, full.length)) { n =>
      totalAndTagged(full.take(n))
    }
  }
}
