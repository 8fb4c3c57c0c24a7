package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.4 #40).
  *
  * Media payloads travel as opaque `binary` columns next to typed
  * metadata; decode / feature-extraction runs batched per partition so
  * a real decoder (image/audio libs are not in this container) would
  * amortize model/codec setup per batch. The decode itself is STUBBED
  * with a deterministic fake — the Spark-side schema, partitioning and
  * batch shape are real and tested.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, blob: Array[Byte])
  case class MediaFeature(doc_id: Long, n_bytes: Int, feature: Array[Double])

  /** Attach a binary payload column (here: utf-8 bytes of the text —
    * the testdata has no real media; schema/partition behavior is what
    * matters).
    */
  def withBlob(docs: DataFrame, text: String = "text"): DataFrame =
    docs.withColumn("blob", encode(col(text), "utf-8"))

  /** Typed metadata from the binary column alone (SQL-expressible). */
  def meta(docs: DataFrame, id: String = "doc_id"): DataFrame =
    withBlob(docs).select(
      col(id),
      octet_length(col("blob")).as("n_bytes"),
      (octet_length(col("blob")) % 640).as("width"),
      (octet_length(col("blob")) % 480).as("height"),
      (expr("octet_length(blob) div 1000") + 1).as("n_frames"))

  case class Frame(doc_id: Long, frame_idx: Int, frame_off: Long, frame_bytes: Int)
  case class Resized(doc_id: Long, width: Int, height: Int,
                     out_w: Int, out_h: Int, out_bytes: Long)

  /** Frame sampling: one row per sampled frame of a "video" payload —
    * frame boundaries every `frameSize` bytes (the stub's stand-in for
    * codec keyframes). Pure per-row explode, no shuffle; a real decoder
    * would seek per offset inside the same mapPartitions batch.
    * Output: (doc_id, frame_idx, frame_off, frame_bytes).
    */
  def frameSample(spark: SparkSession, docs: DataFrame, frameSize: Int = 1000,
                  id: String = "doc_id"): Dataset[Frame] = {
    import spark.implicits._
    withBlob(docs).select(col(id).as("doc_id"), col("blob")).as[MediaRow]
      .flatMap { r =>
        val n = r.blob.length
        val frames = n / frameSize + 1
        (0 until frames).iterator.map { i =>
          val off = i.toLong * frameSize
          Frame(r.doc_id, i, off, math.min(frameSize.toLong, n - off).toInt)
        }
      }
  }

  /** Resize-shaped transform: per-partition batch "resize" of each
    * payload to a fixed raster. STUB: emits the metadata contract
    * (fake source dims from [[meta]], fixed 224×224×3 output size); a
    * real implementation decodes and scales inside the same batch loop.
    * Output: (doc_id, width, height, out_w, out_h, out_bytes).
    */
  def resizeStub(spark: SparkSession, docs: DataFrame, outW: Int = 224, outH: Int = 224,
                 id: String = "doc_id"): Dataset[Resized] = {
    import spark.implicits._
    withBlob(docs).select(col(id).as("doc_id"), col("blob")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition scaler/codec setup would go here
        rows.map { r =>
          val n = r.blob.length
          Resized(r.doc_id, n % 640, n % 480, outW, outH, outW.toLong * outH * 3)
        }
      }
  }

  case class ImageFeature(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                          mean_r: Double, mean_g: Double, mean_b: Double,
                          decode_ok: Boolean)

  /** REAL image decode behind the same batch contract: javax.imageio
    * (JDK-bundled PNG/JPEG/BMP/GIF codecs) decodes each blob inside the
    * per-partition loop and emits width/height/per-channel means.
    * Non-decodable payloads yield `decode_ok = false` zeros rather than
    * failing the job (the folder-ingestion error discipline). The
    * deterministic stub ([[decodeFeatures]]) remains the test path for
    * text-backed testdata; this is the production path for a lake whose
    * binary column holds actual images.
    */
  def decodeImages(spark: SparkSession, docs: DataFrame, id: String = "doc_id",
                   blobCol: String = "blob"): Dataset[ImageFeature] = {
    import spark.implicits._
    docs.select(col(id).cast("long").as("doc_id"), col(blobCol).as("blob")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition codec setup: no temp-file cache, stream decode
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.blob))
            if (img == null)
              ImageFeature(r.doc_id, r.blob.length, 0, 0, 0.0, 0.0, 0.0, decode_ok = false)
            else {
              val w = img.getWidth
              val h = img.getHeight
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              val n = w.toLong * h
              ImageFeature(r.doc_id, r.blob.length, w, h,
                sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, decode_ok = true)
            }
          } catch { case scala.util.control.NonFatal(_) =>
            ImageFeature(r.doc_id, r.blob.length, 0, 0, 0.0, 0.0, 0.0, decode_ok = false)
          }
        }
      }
  }

  case class AudioFeature(doc_id: Long, n_bytes: Int, sample_rate: Double,
                          channels: Int, frames: Long, duration_sec: Double,
                          rms: Double, decode_ok: Boolean)

  /** REAL audio decode: javax.sound.sampled (JDK-bundled WAV/AIFF/AU
    * PCM codecs) parses each blob inside the per-partition loop and
    * emits sample rate / channels / frame count / duration plus the
    * RMS amplitude of the 16-bit PCM payload — the loudness feature an
    * audio-corpus quality filter keys on. Non-decodable payloads yield
    * `decode_ok = false` zeros, same error discipline as
    * [[decodeImages]].
    */
  def decodeAudio(spark: SparkSession, docs: DataFrame, id: String = "doc_id",
                  blobCol: String = "blob"): Dataset[AudioFeature] = {
    import spark.implicits._
    docs.select(col(id).cast("long").as("doc_id"), col(blobCol).as("blob")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.blob))
            val fmt = in.getFormat
            // AudioSystem.NOT_SPECIFIED (-1) for unknown-length streams
            val frames = math.max(in.getFrameLength, 0L)
            val dur = if (fmt.getFrameRate > 0) frames / fmt.getFrameRate.toDouble else 0.0
            // RMS over 16-bit little-endian PCM samples (the WAV default)
            var sumSq = 0.0; var n = 0L
            if (fmt.getSampleSizeInBits == 16) {
              val buf = new Array[Byte](8192)
              var read = in.read(buf)
              while (read > 0) {
                var i = 0
                while (i + 1 < read) {
                  val s = if (fmt.isBigEndian)
                    ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
                  else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
                  sumSq += s.toDouble * s.toDouble; n += 1
                  i += 2
                }
                read = in.read(buf)
              }
            }
            in.close()
            val rms = if (n > 0) math.sqrt(sumSq / n) / 32768.0 else 0.0
            AudioFeature(r.doc_id, r.blob.length, fmt.getSampleRate.toDouble,
              fmt.getChannels, frames, dur, rms, decode_ok = true)
          } catch { case scala.util.control.NonFatal(_) =>
            AudioFeature(r.doc_id, r.blob.length, 0.0, 0, 0L, 0.0, 0.0, decode_ok = false)
          }
        }
      }
  }

  /** Batched per-partition decode → fixed-size feature vector.
    * STUB: a real implementation would initialize a decoder per
    * partition and decode each blob; the fake derives a deterministic
    * 4-dim "feature" from the bytes so tests can pin the plumbing.
    */
  def decodeFeatures(spark: SparkSession, docs: DataFrame, id: String = "doc_id"): Dataset[MediaFeature] = {
    import spark.implicits._
    withBlob(docs).select(col(id).as("doc_id"), col("blob")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (e.g. codec init)
        rows.map { r =>
          val b = r.blob
          val feature = Array(
            b.length.toDouble,
            if (b.isEmpty) 0.0 else b.iterator.map(_ & 0xff).sum.toDouble / b.length,
            b.count(_ == ' '.toByte).toDouble,
            if (b.isEmpty) 0.0 else (b.head & 0xff).toDouble)
          MediaFeature(r.doc_id, b.length, feature)
        }
      }
  }
}
