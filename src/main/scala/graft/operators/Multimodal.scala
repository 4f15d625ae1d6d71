package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns plus typed metadata — the schema,
  * partition behavior, and batch shape are real and tested; only the codec call
  * itself is stubbed (this container ships no image/audio libraries). The stub is
  * deterministic (derived from payload bytes) so tests are stable; swapping in a
  * real decoder means replacing ONE function body and nothing else.
  *
  * Scale notes: payloads never pass through a shuffle here — decode/feature
  * extraction runs `mapPartitions`-style next to the scan (narrow), and anything
  * aggregated downstream should project metadata/features first and drop the
  * bytes. Batch sizing comes from parquet row groups via
  * `spark.sql.files.maxPartitionBytes`, the same lever a real media pipeline uses.
  */
object Multimodal {

  /** Typed media metadata carried beside the opaque payload. */
  final case class MediaMeta(kind: String, width: Int, height: Int, nBytes: Long)

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class DecodedRow(media_id: Long, kind: String, width: Int,
      height: Int, n_bytes: Long, feature: Array[Float])

  /** STUB — deterministic fake decode standing in for a real codec
    * (e.g. JPEG decode / audio resample). Dimensions and the "feature vector"
    * are pure functions of the payload bytes. Replace this body (and only
    * this body) with the real library call in a full deployment. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(kind = "fake", width = 64 + (n % 577), height = 64 + (n % 433), nBytes = n.toLong)
  }

  /** Pluggable codec: the one seam between the Spark plumbing (schema,
    * batching, partition shape — all real) and the media library. Must be
    * Serializable (it ships inside task closures) and row-wise
    * deterministic, or downstream hashes stop being reproducible. */
  trait Codec extends Serializable {
    def meta(payload: Array[Byte]): MediaMeta
    def feature(payload: Array[Byte], dims: Int = 8): Array[Float]
    /** 8×8 spatial luminance grid (row-major, 64 cells) — the downscale
      * behind the perceptual average-hash. Real codecs average pixel blocks;
      * the stub derives cells from payload byte positions. */
    def grid8(payload: Array[Byte]): Array[Float]
    /** Resample the payload to `targetW`×`targetH`, returning a re-encoded
      * payload of the same media kind. */
    def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte]
  }

  /** The deterministic fake (default; what the q27 oracle replays). */
  object StubCodec extends Codec {
    def meta(payload: Array[Byte]): MediaMeta = decodeStub(payload)
    def feature(payload: Array[Byte], dims: Int): Array[Float] =
      featureStub(payload, dims)
    // position-based cell averaging: byte i lands in cell i mod 64, so a
    // small payload edit perturbs few cells — the locality a real
    // perceptual hash has, reproduced deterministically on fake bytes
    def grid8(payload: Array[Byte]): Array[Float] = {
      val sums = new Array[Float](64); val counts = new Array[Float](64)
      var i = 0
      while (i < payload.length) {
        sums(i % 64) += (payload(i) & 0xff); counts(i % 64) += 1f; i += 1
      }
      Array.tabulate(64)(c => if (counts(c) == 0) 0f else sums(c) / counts(c))
    }
    def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] =
      resizeStub(payload, targetW, targetH)
  }

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP — no extra
    * dependency): actual pixel dimensions, and the feature is an
    * L1-normalized `dims`-bucket luminance histogram over the decoded
    * pixels — the stub's shape computed from real image content. Proves the
    * plumbing end-to-end on genuine bytes; a malformed payload throws
    * (fail the row loudly rather than emit fake metadata for real media). */
  object ImageIoCodec extends Codec {
    private def read(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null)
        throw new IllegalArgumentException(
          s"payload (${payload.length} bytes) is not a decodable image")
      img
    }
    def meta(payload: Array[Byte]): MediaMeta = {
      val img = read(payload)
      MediaMeta("image", img.getWidth, img.getHeight, payload.length.toLong)
    }
    def feature(payload: Array[Byte], dims: Int): Array[Float] = {
      val img = read(payload)
      val counts = new Array[Float](dims)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000 // integer Rec.601 luma, 0..255
          counts(lum * dims / 256) += 1f
          x += 1
        }
        y += 1
      }
      val total = math.max(counts.sum, 1f)
      counts.map(_ / total)
    }
    // block-average luma over the 8×8 partition of the real image — the
    // classic aHash downscale (each cell = mean luminance of its block;
    // images smaller than 8×8 map pixels onto cells directly)
    def grid8(payload: Array[Byte]): Array[Float] = grid8Of(read(payload))

    /** The same 8×8 luma grid on an ALREADY-decoded frame — shared by the
      * single-image path and the multi-frame video path, so a frame and
      * the identical still image hash identically. */
    private[operators] def grid8Of(
        img: java.awt.image.BufferedImage): Array[Float] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val sums = new Array[Float](64); val counts = new Array[Float](64)
      var y = 0
      while (y < h) {
        val cy = math.min(y * 8 / h, 7)
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          val c = cy * 8 + math.min(x * 8 / w, 7)
          sums(c) += lum; counts(c) += 1f
          x += 1
        }
        y += 1
      }
      Array.tabulate(64)(c => if (counts(c) == 0) 0f else sums(c) / counts(c))
    }

    /** REAL multi-frame decode: every stored frame of an animated GIF (or
      * any multi-image container ImageIO can read), in order. Frames come
      * back AS STORED — GIF delta frames are not composited over their
      * predecessors (the JDK reader exposes no disposal pipeline); encode
      * fixtures/corpora with full frames, the norm for training-data
      * stills. A single-frame image yields a 1-element sequence, so the
      * video path degrades to the image path on still payloads. */
    def readFrames(payload: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new IllegalArgumentException(
          s"payload (${payload.length} bytes) is not a decodable image")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n).map(reader.read)
      } finally { reader.dispose(); iis.close() }
    }
    /** REAL resample: decode → `Graphics2D` bilinear scale → PNG re-encode.
      * PNG (lossless) keeps the round-trip deterministic — the same payload
      * and target always produce identical bytes, which downstream
      * content-hash dedup depends on. */
    def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      require(targetW >= 1 && targetH >= 1, "target dims >= 1")
      val img = read(payload)
      val scaled = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = scaled.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(scaled, "png", bos)
      bos.toByteArray
    }
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV / PCM — no
    * extra dependency), the audio sibling of [[ImageIoCodec]]. Conventions
    * for the shared [[MediaMeta]] shape: `kind = "audio"`, `width` carries
    * the sample rate (Hz), `height` the channel count. Features are the
    * `dims`-window RMS energy envelope (L1-normalized) over the decoded
    * samples — the crudest real audio fingerprint; [[Codec.grid8]] is the
    * 64-window envelope, so the SAME banded-aHash dedup pipeline that
    * catches re-encoded images ([[perceptualDedup]]) catches re-encoded
    * audio. `resize(w, h)` linearly resamples to w·h samples and re-encodes
    * 16-bit mono WAV (deterministic bytes). Supports 8/16-bit signed PCM,
    * any channel count (averaged to mono); anything else throws — fail the
    * row loudly rather than emit fake metadata for real media. */
  object WavCodec extends Codec {
    private def decode(payload: Array[Byte]): (Array[Double], Float, Int) = {
      val in = try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"payload (${payload.length} bytes) is not a decodable audio stream", e)
      }
      val fmt = in.getFormat
      val enc = fmt.getEncoding
      require(enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        (fmt.getSampleSizeInBits == 16 || fmt.getSampleSizeInBits == 8),
        s"WavCodec handles 8/16-bit signed PCM; got $enc ${fmt.getSampleSizeInBits}-bit")
      val bytes = in.readAllBytes()
      val ch = fmt.getChannels
      val bytesPerSample = fmt.getSampleSizeInBits / 8
      val n = bytes.length / (bytesPerSample * ch)
      val mono = new Array[Double](n)
      var i = 0
      while (i < n) {
        var acc = 0.0
        var c = 0
        while (c < ch) {
          val off = (i * ch + c) * bytesPerSample
          val s =
            if (bytesPerSample == 1) bytes(off).toDouble / 128.0
            else {
              val (b0, b1) =
                if (fmt.isBigEndian) (bytes(off + 1), bytes(off))
                else (bytes(off), bytes(off + 1))
              (((b1 << 8) | (b0 & 0xff)).toShort).toDouble / 32768.0
            }
          acc += s; c += 1
        }
        mono(i) = acc / ch; i += 1
      }
      (mono, fmt.getSampleRate, ch)
    }

    /** RMS energy per window, `cells` windows, L1-normalized. */
    private def envelope(s: Array[Double], cells: Int): Array[Float] = {
      val out = new Array[Float](cells)
      if (s.isEmpty) return out
      var c = 0
      while (c < cells) {
        val lo = (c.toLong * s.length / cells).toInt
        val hi = math.max(((c + 1).toLong * s.length / cells).toInt, lo + 1)
        var acc = 0.0; var i = lo
        while (i < hi && i < s.length) { acc += s(i) * s(i); i += 1 }
        out(c) = math.sqrt(acc / math.max(hi - lo, 1)).toFloat
        c += 1
      }
      val total = math.max(out.sum, 1e-12f)
      out.map(_ / total)
    }

    def meta(payload: Array[Byte]): MediaMeta = {
      val (_, rate, ch) = decode(payload)
      MediaMeta("audio", rate.toInt, ch, payload.length.toLong)
    }
    def feature(payload: Array[Byte], dims: Int): Array[Float] =
      envelope(decode(payload)._1, dims)
    def grid8(payload: Array[Byte]): Array[Float] =
      envelope(decode(payload)._1, 64)
    /** Silence-split segmentation — the audio analog of text chunking:
      * contiguous ACTIVE sample spans, where a span is a maximal run of
      * RMS windows at or above `thresholdFrac` of the loudest window
      * (scale-free: a quiet recording segments like a loud one). Returns
      * [start, end) sample offsets. An all-silent (or empty) payload
      * yields no spans. */
    def activeSegments(payload: Array[Byte], windows: Int = 64,
        thresholdFrac: Double = 0.1): Seq[(Long, Long)] = {
      require(windows >= 1 && thresholdFrac > 0 && thresholdFrac <= 1,
        "windows >= 1, thresholdFrac in (0, 1]")
      val (s, _, _) = decode(payload)
      if (s.isEmpty) return Nil
      // Cap windows at the sample count (a window narrower than one sample
      // has no RMS), and compute each window's [lo, hi) ONCE — the span
      // loop reuses the same bounds, so spans are always non-empty and
      // tile the sample range exactly.
      val w = math.min(windows, s.length)
      val los = new Array[Int](w)
      val his = new Array[Int](w)
      val rms = new Array[Double](w)
      var c = 0
      while (c < w) {
        los(c) = (c.toLong * s.length / w).toInt
        his(c) = ((c + 1).toLong * s.length / w).toInt
        var acc = 0.0; var i = los(c)
        while (i < his(c)) { acc += s(i) * s(i); i += 1 }
        rms(c) = math.sqrt(acc / math.max(his(c) - los(c), 1))
        c += 1
      }
      val thr = rms.max * thresholdFrac
      if (thr == 0) return Nil
      val spans = Seq.newBuilder[(Long, Long)]
      var start = -1L
      c = 0
      while (c < w) {
        val active = rms(c) >= thr
        if (active && start < 0) start = los(c).toLong
        if (!active && start >= 0) { spans += ((start, los(c).toLong)); start = -1 }
        if (active && c == w - 1) spans += ((start, his(c).toLong))
        c += 1
      }
      spans.result()
    }

    def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      require(targetW >= 1 && targetH >= 1, "target dims >= 1")
      val (s, rate, _) = decode(payload)
      val n = targetW * targetH
      val out = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        // linear interpolation at fractional source position
        val pos = if (n == 1) 0.0 else i.toDouble * (s.length - 1) / (n - 1)
        val lo = math.min(pos.toInt, math.max(s.length - 1, 0))
        val frac = pos - lo
        val v =
          if (s.isEmpty) 0.0
          else if (lo + 1 < s.length) s(lo) * (1 - frac) + s(lo + 1) * frac
          else s(lo)
        val q = math.max(-32768, math.min(32767, math.round(v * 32767).toInt))
        out(2 * i) = (q & 0xff).toByte
        out(2 * i + 1) = ((q >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(out), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** Deterministic fake feature extraction: a tiny byte histogram (8 buckets),
    * L1-normalized — the shape a real embedding/feature UDF would produce. */
  def featureStub(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val counts = new Array[Float](dims)
    payload.foreach(b => counts((b & 0xff) % dims) += 1f)
    val total = math.max(counts.sum, 1f)
    counts.map(_ / total)
  }

  /** Batch decode: the Scala analogue of `mapInPandas` — per-partition iterator
    * transform, zero driver involvement, preserves partitioning. Pass
    * [[ImageIoCodec]] for real PNG/JPEG payloads; the default stub keeps
    * the oracle fixtures (text-as-bytes) decodable. */
  def decode(media: Dataset[MediaRow], codec: Codec = StubCodec): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = codec.meta(r.payload)
        DecodedRow(r.media_id, r.kind, m.width, m.height, m.nBytes,
          codec.feature(r.payload))
      }
    }
  }

  /** STUB resize — stands in for a real image resample. Deterministic:
    * nearest-neighbor byte subsampling of the payload to `targetW*targetH`
    * bytes; metadata updated to the target dims. Replace the byte math with a
    * real scaler without touching the Spark plumbing. */
  def resizeStub(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val n = targetW * targetH
    if (payload.isEmpty) new Array[Byte](0)
    else Array.tabulate(n)(i => payload((i.toLong * payload.length / n).toInt))
  }

  /** Batch resize: same per-partition narrow shape as [[decode]]. Pass
    * [[ImageIoCodec]] for a real bilinear resample of PNG/JPEG payloads;
    * the default stub keeps the oracle fixtures (text-as-bytes) resizable. */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int,
      codec: Codec = StubCodec): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      r.copy(payload = codec.resize(r.payload, targetW, targetH))))
  }

  /** Distributed silence-split segmentation
    * ([[WavCodec.activeSegments]] per row): one audio row in → one row per
    * active span out (media_id, seg_idx, start_sample, end_sample) — the
    * same narrow explode shape as [[sampleFrames]]; payloads never
    * shuffle. */
  def audioSegments(media: Dataset[MediaRow], windows: Int = 64,
      thresholdFrac: Double = 0.1): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      WavCodec.activeSegments(r.payload, windows, thresholdFrac)
        .zipWithIndex.map { case ((lo, hi), i) => (r.media_id, i, lo, hi) }
    }.toDF("media_id", "seg_idx", "start_sample", "end_sample")
  }

  /** Frame sampling for video-like payloads: split the byte stream into
    * `frameSize` chunks, keep every `stride`-th — the row-explosion pattern a
    * real frame sampler produces (one row in → many rows out, still narrow). */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int, stride: Int):
      DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameSize).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (chunk, i) => (r.media_id, i, chunk.length, featureStub(chunk)) }
    }.toDF("media_id", "frame_idx", "frame_bytes", "feature")
  }

  /** REAL video-frame sampling: decode every stored frame of each payload
    * (animated GIF via [[ImageIoCodec.readFrames]]), keep every `stride`-th,
    * and emit one narrow row per kept frame — (media_id, frame_idx, width,
    * height, ahash64). The heavy pixels die inside the task: only the
    * 8-byte perceptual hash and the frame geometry ever leave, so the
    * row-explosion stays shuffle-cheap no matter how large the frames are.
    * Feeding `ahash64` into [[Dedup.bandedHammingPairs]] (keyed on a
    * media/frame composite) is cross-video frame dedup — the standard
    * near-duplicate-still cut over video corpora; a frame and the same
    * image ingested as a still hash IDENTICALLY (shared grid), so mixed
    * image+video corpora dedup in one pass. */
  def sampleDecodedFrames(media: Dataset[MediaRow], stride: Int = 1): DataFrame = {
    require(stride >= 1, "stride >= 1")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      ImageIoCodec.readFrames(r.payload).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (img, i) =>
          (r.media_id, i, img.getWidth, img.getHeight,
            averageHash64(ImageIoCodec.grid8Of(img)))
        }
    }.toDF("media_id", "frame_idx", "width", "height", "ahash64")
  }

  /** STUB batch encoder — stands in for a model-server / GPU call that
    * consumes a whole batch at once. Deterministic and batch-size-invariant
    * by construction (pure per-row math); a real encoder must also be
    * row-wise deterministic or downstream hashes stop being reproducible. */
  def batchEncodeStub(batch: Seq[MediaRow], dims: Int): Seq[(Long, Array[Float])] =
    batch.map(r => r.media_id -> featureStub(r.payload, dims))

  /** REAL batch encoder: deterministic random-projection embedding over the
    * codec's perceptual 8×8 luminance grid — grid (64 dims) × a
    * `dims`-row projection matrix whose weights come from the same
    * md5-derived family as the LSH hyperplanes
    * ([[graft.functions.Vectors.planeWeight]], offset 10_000 so encoder and
    * index planes never alias). Random projection is a real embedding
    * (Johnson–Lindenstrauss: pairwise distances preserved in expectation),
    * not a fake: visually close images (close grids) land close in the
    * embedding, distinct scenes don't — with zero external model artifact
    * and exact cross-run determinism. The matrix multiply runs once per
    * BATCH (the weights stay hot in cache across the batch's rows) — the
    * compute shape a GPU/model-server call has, on real math. */
  final class ProjectionEncoder(codec: Codec = StubCodec, dims: Int = 16)
      extends Serializable {
    // built lazily PER EXECUTOR (not serialized with the closure): 64·dims
    // doubles derived from md5, identical on every executor by construction
    @transient private lazy val w: Array[Array[Float]] =
      Array.tabulate(dims, 64)((o, i) =>
        graft.functions.Vectors.planeWeight(10000 + o, i).toFloat)
    def encode(batch: Seq[MediaRow]): Seq[(Long, Array[Float])] = {
      val m = w
      batch.map { r =>
        val g = codec.grid8(r.payload)
        val out = new Array[Float](dims)
        var o = 0
        while (o < dims) {
          val row = m(o); var i = 0; var acc = 0f
          while (i < 64) { acc += row(i) * g(i); i += 1 }
          out(o) = acc; o += 1
        }
        r.media_id -> out
      }
    }
  }

  /** Batched embedding: the model-inference shape — the partition iterator is
    * regrouped into fixed-size batches (what a GPU / inference server wants:
    * enough rows to fill the device, few enough to bound memory), the batch
    * call runs once per group, results flatten back to rows. `grouped` keeps
    * the iterator lazy: only `batchSize` payloads are resident per task at a
    * time, so batch size bounds task memory independently of partition size.
    * Same contract as `mapInPandas` with a batched model call in the lambda.
    * The default encoder is the deterministic stub (what the oracle
    * fixtures replay); for a real random-projection embedding of real
    * images pass `{ val e = new ProjectionEncoder(ImageIoCodec, k)
    * ; (b, _) => e.encode(b) }` (the encoder's width is fixed at
    * construction, so the per-call dims is ignored). */
  def embedBatched(media: Dataset[MediaRow], batchSize: Int = 64,
      dims: Int = 8,
      encoder: (Seq[MediaRow], Int) => Seq[(Long, Array[Float])] = batchEncodeStub)
      : DataFrame = {
    require(batchSize >= 1, "batchSize >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(batch => encoder(batch, dims))
    }.toDF("media_id", "embedding")
  }

  /** 64-bit perceptual average-hash from an 8×8 grid: bit i set iff cell i
    * exceeds the grid mean. Hamming distance between hashes ≈ how many
    * regions of the two images differ in relative brightness — robust to
    * re-encoding/scaling, exactly what exact byte-hash dedup misses. */
  def averageHash64(grid: Array[Float]): Long = {
    require(grid.length == 64, s"need 64 cells, got ${grid.length}")
    var mean = 0f
    var i = 0
    while (i < 64) { mean += grid(i); i += 1 }
    mean /= 64
    var sig = 0L
    i = 0
    while (i < 64) { if (grid(i) > mean) sig |= (1L << i); i += 1 }
    sig
  }

  /** Perceptual image near-dup pairs: per-row aHash (narrow, payloads never
    * shuffle) + the same pigeonhole-exact band join text simhash uses
    * ([[Dedup.bandedHammingPairs]] — only (id, long) signatures move).
    * The image twin of text near-dup removal: re-encoded, resized, or
    * lightly edited copies land within `maxHamming` bits. */
  def perceptualDedup(media: Dataset[MediaRow], codec: Codec = StubCodec,
      maxHamming: Int = 4, bands: Int = 8,
      joinHint: Option[String] = Some("shuffle_hash")): DataFrame = {
    import media.sparkSession.implicits._
    val sigs = media.mapPartitions(_.map(r =>
        (r.media_id, averageHash64(codec.grid8(r.payload)))))
      .toDF("media_id", "sig")
    Dedup.bandedHammingPairs(sigs, "media_id", "sig", maxHamming, bands,
      joinHint, bits = 64)
  }

  /** Build a media table from the `documents` fixture (text bytes as payload) —
    * exercises the binary-column path end-to-end on shipped testdata. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"), lit("image").as("kind"),
      col("text").cast("binary").as("payload")).as[MediaRow]
  }
}
