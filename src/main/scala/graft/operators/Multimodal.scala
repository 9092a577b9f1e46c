package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column pattern: opaque binary payloads + typed metadata.
  *
  * The container has no EXTERNAL image/audio codecs, but the JDK's own
  * suffice: PNG via `javax.imageio` and WAV via `javax.sound.sampled`
  * need nothing outside the JVM, so every decode/resize/framesample
  * key here is a REAL encode→decode round trip over genuine binary
  * columns (partition-parallel mapPartitions decode, one codec init
  * per partition), oracle-verified pixel-/sample-exactly. The r7-era
  * text-as-binary stub trio these superseded was removed in r11 (r10
  * verdict ask #4).
  */
object Multimodal {

  /** Multimodal struct column: text + metadata struct + embedding,
    * joined on doc_id = vec_id; nested JSON export of the metadata.
    * At scale, this is the "asset table" pattern — one row per asset,
    * metadata nested, payload columns pruned unless selected. */
  def multimodalStruct(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .join(Tables.embeddings(s, sf),
            col("doc_id") === col("vec_id"))
      .select(col("doc_id"),
        to_json(struct(col("lang"), col("source"), col("n_chars")))
          .as("meta_json"),
        size(col("embedding")).cast("bigint").as("emb_dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6)
          .as("first_dim"))
      .orderBy("doc_id")

  /** Binary payload "decode": byte length, content hash, head bytes —
    * pure SQL surface over a binary column (oracle: DuckDB md5 of the
    * same UTF-8 bytes). */
  def multimodalBinary(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        length(col("payload")).cast("bigint").as("byte_len"),
        md5(col("payload")).as("content_md5"),
        substring(col("payload"), 1, 4).cast("string").as("head4"))
      .orderBy("doc_id")

  /** ImageIO's default stream cache backs every encode/decode with a
    * TEMP FILE on disk — serial it's a hidden tax, and once the codec
    * work fans out across 32 tasks the temp-file churn contends on the
    * filesystem and eats the parallel win. Memory-backed streams are
    * strictly right for our KB-sized payloads. JVM-global, idempotent,
    * called from each decode task's setup (executors are separate JVMs
    * on a real cluster, so the driver setting wouldn't reach them). */
  private def imageIoNoDiskCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** REAL image decode — PNG needs no external codec (`javax.imageio`
    * ships with the JDK), so the decode path is a genuine
    * encode→decode round trip: an 8×8 grayscale PNG is
    * synthesized per document (pixel(x,y) = (id·31 + 7x + 13y) mod 256,
    * so the oracle can re-derive every statistic exactly), the bytes
    * travel as a real `binary` column, and ImageIO decodes them back
    * on the executors.
    *
    * Determinism: mean_gray is an integer sum over 64 pixels divided by
    * a power of two — exact in IEEE double and ≤ 6 decimal digits, so
    * round(…, 6) is an identity on both engines.
    *
    * Scale shape: one id-only repartition fans the codec work across
    * every core (ids are 8 bytes; the decode is the cost), then both
    * codec stages are mapPartitions in the SAME stage — payload bytes
    * never leave the task that decodes them (the fetch-decode-stats
    * locality a multimodal pipeline needs).
    */
  def multimodalDecodePng(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, sf)
      .select(col("doc_id")).na.drop()
      // decode parallelism must not be coupled to ingest split count: a
      // small/compacted corpus arrives as ONE parquet split and would
      // serialize every ImageIO cycle on one core. The repartition
      // shuffles only 8-byte ids — noise next to the codec work it fans
      // out across all cores.
      .repartition(s.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map { id =>
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          for (y <- 0 until 8; x <- 0 until 8)
            raster.setSample(x, y, 0, ((id * 31 + 7 * x + 13 * y) % 256).toInt)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "png")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val r = img.getRaster
          var sum = 0L
          for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
            sum += r.getSample(x, y, 0)
          (id, img.getWidth, img.getHeight,
           sum.toDouble / (img.getWidth * img.getHeight))
        }
      }
      .toDF("doc_id", "width", "height", "mean_gray")
      .select(col("doc_id"), col("width"), col("height"),
              round(col("mean_gray"), 6).as("mean_gray"))
      .orderBy("doc_id")
  }

  /** REAL image resize — the companion to multimodalDecodePng: decode
    * the planted 8×8 PNG on the executor, then 2×2 box-filter it to
    * 4×4 with pure integer math (sum of each block, integer-divided by
    * 4 — the exact arithmetic an oracle can replay, unlike AWT's
    * implementation-defined AreaAveraging rounding). Emits the
    * downsampled mean and the (0,0) output pixel as witnesses.
    * Fetch → decode → resize never leaves the task; the only shuffle
    * is the id-only codec fan-out (see decode_png).
    */
  def multimodalResizePng(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, sf)
      .select(col("doc_id")).na.drop()
      // decouple codec parallelism from input splits (see decode_png)
      .repartition(s.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map { id =>
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          for (y <- 0 until 8; x <- 0 until 8)
            raster.setSample(x, y, 0, ((id * 31 + 7 * x + 13 * y) % 256).toInt)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val decoded = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val r = decoded.getRaster
          val ds = Array.ofDim[Long](4, 4)
          for (v <- 0 until 4; u <- 0 until 4) {
            var sum = 0L
            for (dy <- 0 to 1; dx <- 0 to 1)
              sum += r.getSample(2 * u + dx, 2 * v + dy, 0)
            ds(v)(u) = sum / 4
          }
          val total = ds.map(_.sum).sum
          (id, 4, 4, total.toDouble / 16, ds(0)(0))
        }
      }
      .toDF("doc_id", "out_w", "out_h", "mean_ds", "corner")
      .select(col("doc_id"), col("out_w"), col("out_h"),
              round(col("mean_ds"), 6).as("mean_ds"), col("corner"))
      .orderBy("doc_id")
  }

  /** REAL audio decode — WAV/PCM needs no external codec either
    * (`javax.sound.sampled` ships with the JDK): a 256-sample 16-bit
    * mono PCM clip is synthesized per document (sample(i) =
    * ((id·7 + 13i) mod 2000) − 1000, so every statistic is
    * integer-exact for the oracle), written through the real WAVE
    * encoder, decoded back via AudioSystem, and summarized. No
    * rounding anywhere — all four outputs are exact integers.
    * Codec work fans out over the id-only repartition like the image
    * path; bytes stay in the decoding task.
    */
  def multimodalDecodeWav(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, sf)
      .select(col("doc_id")).na.drop()
      // decouple codec parallelism from input splits (see decode_png)
      .repartition(s.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        // Provider resolution ONCE per task: AudioSystem.write /
        // getAudioInputStream consult the JDK's provider registry
        // (JDK13Services — a synchronized global) on EVERY call, which
        // serializes 32 concurrently-decoding tasks on one lock and
        // erases the repartition's parallel win (measured ~3× on this
        // key). ServiceLoader yields the same WAVE SPI classes the
        // registry would; codec work is unchanged.
        import scala.jdk.CollectionConverters._
        val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
        val writer = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
          .asScala.find(_.isFileTypeSupported(wave)).get
        val readers = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileReader])
          .asScala.toList
        var waveReader: javax.sound.sampled.spi.AudioFileReader = null
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        it.map { id =>
          val pcm = new Array[Byte](256 * 2)
          for (i <- 0 until 256) {
            val v = (((id * 7 + 13L * i) % 2000) - 1000).toShort
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, 256)
          val bos = new java.io.ByteArrayOutputStream()
          writer.write(ais, wave, bos)
          if (waveReader == null)
            waveReader = readers.find { r =>
              try { r.getAudioInputStream(
                new java.io.ByteArrayInputStream(bos.toByteArray)); true }
              catch { case _: Exception => false }
            }.get
          val in = waveReader.getAudioInputStream(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val decoded = in.readAllBytes()
          val n = decoded.length / 2
          var sum = 0L; var mx = Long.MinValue
          for (i <- 0 until n) {
            val v = ((decoded(2 * i) & 0xff) | (decoded(2 * i + 1) << 8)).toShort.toLong
            sum += v; if (v > mx) mx = v
          }
          (id, n.toLong, in.getFormat.getSampleRate.toLong, sum, mx)
        }
      }
      .toDF("doc_id", "n_samples", "sample_rate", "sum_samples", "max_sample")
      .orderBy("doc_id")
  }

  /** Frame-level audio energy — the first real feature a speech/audio
    * curation pipeline computes after decode (silence trimming, energy-
    * based VAD, loudness normalization all start from per-frame RMS):
    * the same REAL WAV encode→decode cycle as `multimodalDecodeWav`,
    * then the 256 decoded samples split into 4 frames of 64 and each
    * frame's sum-of-squares and RMS emitted. The planted PCM is the
    * same closed-form ramp, so the oracle replays sample values in SQL
    * and the REAL codec path is hash-checked end-to-end: sum-of-squares
    * is integer-exact, and RMS = sqrt(ss/64) is one IEEE-identical
    * sqrt per frame.
    *
    * Scale shape: identical to decode_wav — id-only repartition fans
    * the codec work across all cores, one ServiceLoader provider
    * resolution per task (not per clip), bytes never leave the task;
    * the 4-row-per-clip explode happens inside the decoding task.
    */
  def multimodalWavEnergy(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, sf)
      .select(col("doc_id")).na.drop()
      .repartition(s.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        import scala.jdk.CollectionConverters._
        val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
        val writer = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
          .asScala.find(_.isFileTypeSupported(wave)).get
        val readers = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileReader])
          .asScala.toList
        var waveReader: javax.sound.sampled.spi.AudioFileReader = null
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        it.flatMap { id =>
          val pcm = new Array[Byte](256 * 2)
          for (i <- 0 until 256) {
            val v = (((id * 7 + 13L * i) % 2000) - 1000).toShort
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, 256)
          val bos = new java.io.ByteArrayOutputStream()
          writer.write(ais, wave, bos)
          if (waveReader == null)
            waveReader = readers.find { r =>
              try { r.getAudioInputStream(
                new java.io.ByteArrayInputStream(bos.toByteArray)); true }
              catch { case _: Exception => false }
            }.get
          val in = waveReader.getAudioInputStream(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val decoded = in.readAllBytes()
          (0 until 4).map { f =>
            var ss = 0L
            for (i <- 0 until 64) {
              val k = f * 64 + i
              val v = ((decoded(2 * k) & 0xff) |
                       (decoded(2 * k + 1) << 8)).toShort.toLong
              ss += v * v
            }
            (id, f.toLong, ss, math.sqrt(ss / 64.0))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "sum_sq", "rms")
      .select(col("doc_id"), col("frame_idx"), col("sum_sq"),
              round(col("rms"), 6).as("rms"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Luminance histogram from REAL PNG decode — the first feature an
    * image curation pipeline computes (exposure/contrast screening,
    * near-black/near-white frame drops): the same encode→decode cycle
    * as `multimodalDecodePng`, then the 64 decoded pixels bucketed into
    * 8 intensity bins of 32 gray levels, emitted one row per non-empty
    * bin. The planted raster is the closed-form ramp, so the oracle
    * replays the bin counts in SQL and the REAL codec path is
    * hash-checked — integer counts, nothing rounds.
    *
    * Scale shape: identical to decode_png — id-only repartition fans
    * the codec work, the histogram is computed inside the decoding task
    * (an 8-entry array), and only (id, bin, count) rows leave it.
    */
  def multimodalImageHistogram(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, sf)
      .select(col("doc_id")).na.drop()
      .repartition(s.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.flatMap { id =>
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          for (y <- 0 until 8; x <- 0 until 8)
            raster.setSample(x, y, 0, ((id * 31 + 7 * x + 13 * y) % 256).toInt)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val r = back.getRaster
          val bins = new Array[Long](8)
          for (y <- 0 until 8; x <- 0 until 8)
            bins(r.getSample(x, y, 0) / 32) += 1
          bins.zipWithIndex.collect {
            case (n, b) if n > 0 => (id, b.toLong, n)
          }
        }
      }
      .toDF("doc_id", "bin", "n_pixels")
      .orderBy("doc_id", "bin")
  }

  /** REAL frame sampling — the video path without a video codec: a
    * "clip" is a length-prefixed container of 6 real PNG frames
    * (frame f's pixels = (id·31 + 7x + 13y + 17f) mod 256), and the
    * operator parses the container, samples every 2nd frame (0, 2, 4),
    * decodes ONLY the sampled frames, and reports the stats — the
    * decode-only-what-you-keep shape that makes frame sampling cheap
    * at scale. Mean is one exact-integer sum with a single double
    * division, identical IEEE on both engines.
    */
  def multimodalFramesamplePng(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, sf)
      .select(col("doc_id")).na.drop()
      // decouple codec parallelism from input splits (see decode_png)
      .repartition(s.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map { id =>
          // build the 6-frame container (length-prefixed real PNGs)
          val bos = new java.io.ByteArrayOutputStream()
          val dos = new java.io.DataOutputStream(bos)
          for (f <- 0 until 6) {
            val img = new java.awt.image.BufferedImage(
              8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val r = img.getRaster
            for (y <- 0 until 8; x <- 0 until 8)
              r.setSample(x, y, 0,
                ((id * 31 + 7 * x + 13 * y + 17 * f) % 256).toInt)
            val fb = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", fb)
            dos.writeInt(fb.size()); fb.writeTo(dos)
          }
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "clip")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map { case (id, clip) =>
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(clip))
          var f = 0; var sum = 0L; var sampled = 0
          while (in.available() > 0) {
            val len = in.readInt()
            val bytes = new Array[Byte](len)
            in.readFully(bytes)
            if (f % 2 == 0) { // decode only the kept frames
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              val r = img.getRaster
              for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
                sum += r.getSample(x, y, 0)
              sampled += 1
            }
            f += 1
          }
          (id, f.toLong, sampled.toLong, sum, sum.toDouble / (sampled * 64))
        }
      }
      .toDF("doc_id", "n_frames", "n_sampled", "px_sum", "px_mean")
      .select(col("doc_id"), col("n_frames"), col("n_sampled"), col("px_sum"),
              round(col("px_mean"), 6).as("px_mean"))
      .orderBy("doc_id")
  }

  /** REAL sample-rate conversion — the audio-pipeline op after decode
    * and energy scoring: the 256-sample 8 kHz planted clip goes through
    * the REAL WAV encode→decode cycle (same provider-resolution
    * discipline as decode_wav), then 2:1 downsample to 4 kHz by exact
    * pair averaging. (a+b)/2.0 on 16-bit ints is IEEE-exact, so the
    * first/peak/RMS witnesses are oracle-replayable from the planted
    * formula — a codec that altered one sample shifts some witness.
    *
    * Scale shape: identical to decode_wav — id-only repartition fans
    * codec work across cores, resample runs in the decoding task,
    * bytes never shuffle; output is 5 scalars per clip.
    */
  def multimodalWavResample(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, sf)
      .select(col("doc_id")).na.drop()
      // decouple codec parallelism from input splits (see decode_png)
      .repartition(s.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        import scala.jdk.CollectionConverters._
        val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
        val writer = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
          .asScala.find(_.isFileTypeSupported(wave)).get
        val readers = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileReader])
          .asScala.toList
        var waveReader: javax.sound.sampled.spi.AudioFileReader = null
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        it.map { id =>
          val pcm = new Array[Byte](256 * 2)
          for (i <- 0 until 256) {
            val v = (((id * 7 + 13L * i) % 2000) - 1000).toShort
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, 256)
          val bos = new java.io.ByteArrayOutputStream()
          writer.write(ais, wave, bos)
          if (waveReader == null)
            waveReader = readers.find { r =>
              try { r.getAudioInputStream(
                new java.io.ByteArrayInputStream(bos.toByteArray)); true }
              catch { case _: Exception => false }
            }.get
          val in = waveReader.getAudioInputStream(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val decoded = in.readAllBytes()
          val n = decoded.length / 2
          // 2:1 box resample on the DECODED stream: out(j) = (s(2j)+s(2j+1))/2
          var first = 0.0; var peak = Double.MinValue; var ss = 0.0
          var j = 0
          while (2 * j + 1 < n) {
            val a = ((decoded(4 * j) & 0xff) |
              (decoded(4 * j + 1) << 8)).toShort.toDouble
            val b = ((decoded(4 * j + 2) & 0xff) |
              (decoded(4 * j + 3) << 8)).toShort.toDouble
            val o = (a + b) / 2.0
            if (j == 0) first = o
            if (o > peak) peak = o
            ss += o * o
            j += 1
          }
          (id, j.toLong, first, peak, math.sqrt(ss / j))
        }
      }
      .toDF("doc_id", "n_out", "out_first", "out_peak", "out_rms")
      .select(col("doc_id"), col("n_out"), col("out_first"), col("out_peak"),
              round(col("out_rms"), 6).as("out_rms"))
      .orderBy("doc_id")
  }

  /** Perceptual-hash image dedup — the image twin of `dedup_simhash`:
    * a 64-bit average hash (bit i set iff pixel i is brighter than the
    * image mean) over the REAL PNG round trip, near-dup pairs found by
    * 16-bit band blocking, never an all-pairs scan. The hash is split
    * into two 32-bit halves (`phash_hi`/`phash_lo`) so neither engine
    * touches the sign bit of an int64.
    *
    * Oracle-provable despite the real codec: the planted pixels are
    * (id·31+7x+13y) mod 256 and PNG is lossless, so DuckDB re-derives
    * every hash from the formula and brute-forces the ≤3-bit pair
    * space — if ImageIO dropped or rounded one pixel, some hash (and
    * the pair counts) would diverge. Banding is EXACT here, not
    * approximate: ≤3 differing bits can touch at most 3 of the 4
    * bands, so a clean band always survives (pigeonhole) — the Spark
    * side provably finds the same pairs the oracle's n² scan does.
    *
    * Scale shape: codec work fans out over the id-only repartition
    * (see decode_png); candidates come from a band equi-join (the LSH
    * band shape — shuffle ∝ docs·4, pair space ∝ band-bucket
    * occupancy), the exact hamming filter prunes to true pairs, and
    * the per-doc counts are one HashAggregate + a broadcast-size
    * left join back to the hash frame.
    */
  def multimodalPhash(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    val hashes = Tables.documents(s, sf)
      .select(col("doc_id")).na.drop()
      // decouple codec parallelism from input splits (see decode_png)
      .repartition(s.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map { id =>
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          for (y <- 0 until 8; x <- 0 until 8)
            raster.setSample(x, y, 0, ((id * 31 + 7 * x + 13 * y) % 256).toInt)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val decoded = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val r = decoded.getRaster
          val px = Array.ofDim[Int](64)
          var sum = 0L
          for (y <- 0 until 8; x <- 0 until 8) {
            px(y * 8 + x) = r.getSample(x, y, 0); sum += px(y * 8 + x)
          }
          val mean = sum.toDouble / 64
          var hi = 0L; var lo = 0L
          for (i <- 0 until 32) {
            if (px(i) > mean) lo |= 1L << i
            if (px(i + 32) > mean) hi |= 1L << i
          }
          (id, hi, lo)
        }
      }
      .toDF("doc_id", "phash_hi", "phash_lo")
    // 4×16-bit bands straight off the halves — the blocking key
    val bands = hashes.select(col("doc_id"), col("phash_hi"), col("phash_lo"),
        posexplode(array(
          col("phash_lo").bitwiseAND(lit(0xFFFFL)),
          shiftright(col("phash_lo"), 16).bitwiseAND(lit(0xFFFFL)),
          col("phash_hi").bitwiseAND(lit(0xFFFFL)),
          shiftright(col("phash_hi"), 16).bitwiseAND(lit(0xFFFFL)))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    val pairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.phash_hi").as("ha"), col("a.phash_lo").as("la"),
        col("b.phash_hi").as("hb"), col("b.phash_lo").as("lb"))
      .distinct() // a pair can match in several bands
      .filter(expr("bit_count(ha ^ hb) + bit_count(la ^ lb) <= 3"))
    val nearCounts = pairs
      .select(col("da").as("doc_id")).unionAll(pairs.select(col("db")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_near"))
    hashes
      .join(nearCounts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("phash_hi"), col("phash_lo"),
        coalesce(col("n_near"), lit(0L)).cast("bigint").as("n_near"))
      .orderBy("doc_id")
  }
}
