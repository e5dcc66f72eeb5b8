package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.ZipInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal (image) operators (SURVEY §2.1 S4-S5, §2.7 F10-F11, §2.2 K3).
  *
  * The reference streams zip archives of JPEG/PNG from S3, decodes, resizes
  * with centered padding to 224x224, tensorizes to float32[3,224,224], and
  * flushes 200-image batches
  * (reference: Image_Train_Model/process_test_train_Images.py:13-64).
  *
  * Spark-native shape: images are opaque `binary` columns with typed
  * metadata; the zip exploder is the one genuine Generator (UDTF) in the
  * reference (§2.12) and is a `flatMap` over a typed Dataset; decode /
  * resize / tensorize are per-row JVM kernels (java.imageio + AWT, both in
  * the JDK — no external deps). Corrupt entries yield null and are filtered,
  * mirroring the reference's per-record try/except skip (:57-58).
  *
  * Scale posture: one task per archive (binaryFile splits), no driver
  * involvement; tensor batches land via `maxRecordsPerFile` (K3) so file
  * count tracks data volume, not partition count.
  */
object Media {

  case class ZipEntryRow(archive: String, entry: String, content: Array[Byte])
  case class ImageTensor(archive: String, entry: String, shape: Array[Int],
                         data: Array[Float])

  val ImageExtensions: Seq[String] = Seq(".jpg", ".jpeg", ".png")

  /** S4/§2.12 — explode zip archives (path, bytes) into per-entry rows.
    * Generator-shaped: 1 archive -> N entries, executor-side, streaming
    * decompression (no whole-archive re-buffering beyond the input bytes).
    */
  def explodeZips(spark: SparkSession, archives: DataFrame,
                  pathCol: String = "path", contentCol: String = "content"): Dataset[ZipEntryRow] = {
    import spark.implicits._
    archives.select(col(pathCol).as("path"), col(contentCol).as("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => unzip(path, bytes) }
  }

  /** JVM kernel: enumerate zip entries LAZILY — one decompressed entry in
    * memory at a time, so a task's peak is compressed-archive + one entry,
    * not compressed + whole decompressed archive (a multi-GB image zip
    * would otherwise OOM the executor). Package-visible for tests. */
  private[graft] def unzip(path: String, bytes: Array[Byte]): Iterator[ZipEntryRow] =
    new Iterator[ZipEntryRow] {
      private val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      // The stream owns a native Inflater; guarantee release even if the
      // consumer abandons the iterator (limit/take) or an entry is corrupt.
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => zin.close()))

      private var nextRow: ZipEntryRow = advance()

      private def advance(): ZipEntryRow =
        try {
          var e = zin.getNextEntry
          while (e != null && e.isDirectory) e = zin.getNextEntry
          if (e == null) { zin.close(); null }
          else {
            val buf = new ByteArrayOutputStream()
            val chunk = new Array[Byte](64 * 1024)
            var n = zin.read(chunk)
            while (n >= 0) { buf.write(chunk, 0, n); n = zin.read(chunk) }
            ZipEntryRow(path, e.getName, buf.toByteArray)
          }
        } catch { case t: Throwable => zin.close(); throw t }

      override def hasNext: Boolean = nextRow != null
      override def next(): ZipEntryRow = {
        val r = nextRow
        if (r == null) throw new NoSuchElementException("exhausted zip")
        nextRow = advance()
        r
      }
    }

  /** P3 — the reference's image-extension filter (:42). */
  def filterImages(entries: Dataset[ZipEntryRow]): Dataset[ZipEntryRow] =
    entries.filter(r => ImageExtensions.exists(r.entry.toLowerCase.endsWith))

  /** S5 + F10 + F11 fused — decode bytes -> force RGB -> resize with
    * centered padding on a black canvas -> CHW float tensor scaled to [0,1]
    * (process_test_train_Images.py:13-28: thumbnail + paste + ToTensor).
    * Corrupt/undecodable images return None (bad-record skip, :57-58). */
  def decodeResizeTensor(bytes: Array[Byte], target: Int = 224): Option[(Array[Int], Array[Float])] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        // thumbnail semantics: scale to fit within target x target, keep ratio
        val scale = math.min(target.toDouble / w, target.toDouble / h)
        val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
        val canvas = new BufferedImage(target, target, BufferedImage.TYPE_INT_RGB)
        val g = canvas.createGraphics()
        try {
          g.setColor(java.awt.Color.BLACK)
          g.fillRect(0, 0, target, target)
          val (ox, oy) = ((target - nw) / 2, (target - nh) / 2)
          g.drawImage(img.getScaledInstance(nw, nh, java.awt.Image.SCALE_SMOOTH),
            ox, oy, nw, nh, null)
        } finally g.dispose()
        val data = new Array[Float](3 * target * target)
        var y = 0
        while (y < target) {
          var x = 0
          while (x < target) {
            val rgb = canvas.getRGB(x, y)
            val idx = y * target + x
            data(idx) = ((rgb >> 16) & 0xff) / 255f                     // R plane
            data(target * target + idx) = ((rgb >> 8) & 0xff) / 255f    // G plane
            data(2 * target * target + idx) = (rgb & 0xff) / 255f       // B plane
            x += 1
          }
          y += 1
        }
        Some((Array(3, target, target), data))
      }
    } catch { case _: Exception => None }

  /** Full image ETL: archives frame -> per-image CHW tensors with shape
    * metadata, corrupt entries dropped. */
  def imageEtl(spark: SparkSession, archives: DataFrame, target: Int = 224): Dataset[ImageTensor] = {
    import spark.implicits._
    filterImages(explodeZips(spark, archives)).flatMap { r =>
      decodeResizeTensor(r.content, target).map { case (shape, data) =>
        ImageTensor(r.archive, r.entry, shape, data)
      }
    }
  }

  /** K3 — tensor micro-batch sink: parquet files bounded at `batchSize`
    * records, the reference's 200-image `.pt` flush
    * (process_test_train_Images.py:49,74-81). */
  def writeTensorBatches(tensors: Dataset[ImageTensor], path: String,
                         batchSize: Int = 200): Unit =
    tensors.write.mode("overwrite")
      .option("maxRecordsPerFile", batchSize.toLong)
      .parquet(path)

  /** F12 — stochastic augmentations (model_architecture.py:55-63), made
    * reproducible: torch's RandomHorizontalFlip(p=0.5) draws from global RNG
    * state; at 100 TB that breaks retry-idempotence (a re-executed task
    * would emit different data), so the coin flip is a hash of
    * (entry, seed) — same augmentation on every replay. Normalize is the
    * one deterministic (affine) member of the reference's transform stack
    * and is applied per channel. */
  def augment(tensors: Dataset[ImageTensor], seed: Long,
              mean: Array[Float] = Array(0.485f, 0.456f, 0.406f),
              std: Array[Float] = Array(0.229f, 0.224f, 0.225f)): Dataset[ImageTensor] = {
    import tensors.sparkSession.implicits._
    tensors.map { t =>
      // MurmurHash3 with the seed as the hash seed — a well-mixed bit per
      // (entry, seed); a linear `hashCode*31+seed` reduces to XOR of two
      // parity bits and gives only two effective seeds.
      val coin = scala.util.hashing.MurmurHash3.stringHash(
        t.entry, (seed ^ (seed >>> 32)).toInt) // fold in the high seed bits
      val flipped =
        if ((coin & 1) == 0) t.copy(data = flipHorizontal(t.data, t.shape))
        else t
      flipped.copy(data = normalize(flipped.data, flipped.shape, mean, std))
    }
  }

  /** JVM kernel: mirror a CHW tensor along the width axis. Involutive. */
  private[graft] def flipHorizontal(data: Array[Float], shape: Array[Int]): Array[Float] = {
    val Array(c, h, w) = shape
    val out = new Array[Float](data.length)
    var ch = 0
    while (ch < c) {
      var y = 0
      while (y < h) {
        val base = ch * h * w + y * w
        var x = 0
        while (x < w) { out(base + x) = data(base + (w - 1 - x)); x += 1 }
        y += 1
      }
      ch += 1
    }
    out
  }

  /** JVM kernel: per-channel (x - mean) / std. */
  private[graft] def normalize(data: Array[Float], shape: Array[Int],
                               mean: Array[Float], std: Array[Float]): Array[Float] = {
    val Array(c, h, w) = shape
    val out = new Array[Float](data.length)
    var ch = 0
    while (ch < c) {
      val (m, s) = (mean(ch), std(ch))
      var i = ch * h * w
      val end = (ch + 1) * h * w
      while (i < end) { out(i) = (data(i) - m) / s; i += 1 }
      ch += 1
    }
    out
  }

  /** K5 — delete consumed source archives after a successful ingest (the
    * reference deletes each zip once processed, :68-71). Batch analogue of
    * Structured Streaming's `cleanSource=delete`; call only after the sink
    * commit succeeds. */
  def deleteConsumed(spark: SparkSession, paths: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    paths.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).delete(hp, false)
    }
  }
}
