package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata. The Spark-side contract — schema,
  * partitioning, batch shape — is real and tested, and so are the
  * codec paths: PNG/JPEG/BMP/GIF decode + rescale via `javax.imageio`,
  * WAV/AIFF/AU decode via `javax.sound.sampled` (both ship with the
  * JDK — zero added dependencies, work headless). Payloads neither
  * stack can decode (video/unknown) take the byte-statistics feature
  * path — honest per-byte measurements, the standard curation signal
  * for opaque blobs (truncation/corruption detection via entropy +
  * printable fraction).
  */
object Multimodal {

  /** Typed metadata carried alongside every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("content_hash", StringType, nullable = false),
    StructField("modality", StringType, nullable = false)))

  /** Read a directory of media files as (path, length, payload, meta)
    * via Spark's distributed `binaryFile` source — the production entry
    * point for [[extractFeatures]]/[[sampleFrames]]/[[resizeImages]].
    * `pathGlob` filters by extension (e.g. "*.jpg"); `maxBytes` guards
    * against single-file driver/executor blowups (binaryFile loads each
    * file as ONE row — cap it and route oversized media to a chunked
    * reader instead).
    */
  def loadBinaryDir(spark: org.apache.spark.sql.SparkSession, dir: String,
                    modality: String, pathGlob: String = "*",
                    maxBytes: Long = 256L * 1024 * 1024): DataFrame = {
    require(maxBytes > 0, s"maxBytes must be positive, got $maxBytes")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(dir)
      .filter(col("length") <= maxBytes)
      .select(col("path"), col("length"), col("content").as("payload"))
      .withColumn("meta", struct(
        col("length").as("byte_len"),
        md5(col("payload")).as("content_hash"),
        lit(modality).as("modality")))
  }

  /** Attach a binary payload column + metadata struct. For the synthetic
    * fixtures the payload is the UTF-8 encoding of a text column; in
    * production it is the raw media bytes read via [[loadBinaryDir]].
    */
  def withBinaryPayload(df: DataFrame, srcCol: String, modality: String): DataFrame =
    df.withColumn("payload", encode(col(srcCol), "UTF-8"))
      .withColumn("meta", struct(
        octet_length(col("payload")).cast("long").as("byte_len"),
        md5(col("payload")).as("content_hash"),
        lit(modality).as("modality")))

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF/WBMP
    * readers are built in). None ⇔ the bytes are not a decodable image —
    * ImageIO.read returns null for unknown containers and throws for
    * truncated ones; both map to None so callers get one signal.
    */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException | _: RuntimeException => None }

  /** 8 deterministic image features: [width, height, aspect, meanR,
    * meanG, meanB, meanLuma, stdLuma] — channel sums accumulate as exact
    * Longs over getRGB (lossless for PNG/BMP/GIF), luma as the exact
    * integer 299r+587g+114b per mille, means/std via double then one
    * float narrowing — bit-reproducible across executors and re-runs.
    */
  def imageFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L; var sl2 = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
        val l = 299L * r + 587L * g + 114L * b // luma per mille, exact
        sr += r; sg += g; sb += b; sl += l; sl2 += l * l
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val meanL = sl.toDouble / n
    val varL = sl2.toDouble / n - meanL * meanL
    Array(w.toFloat, h.toFloat, w.toFloat / h.toFloat,
      (sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat, (sb.toDouble / n).toFloat,
      (meanL / 1000.0).toFloat, (math.sqrt(math.max(0.0, varL)) / 1000.0).toFloat)
  }

  /** Real audio decode via the JDK's sampled-sound stack (WAV/AIFF/AU
    * readers are built in; no audio DEVICE is touched — this is pure
    * stream parsing, headless-safe). Returns the post-conversion PCM
    * format plus the interleaved samples as Ints. None ⇔ the bytes are
    * not a decodable audio container (unknown magic, truncated header)
    * or use a sample layout outside 8/16-bit integer PCM — one signal,
    * mirroring [[decodeImage]].
    */
  def decodeAudio(payload: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Int])] = {
    import javax.sound.sampled._
    try {
      val raw = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        // normalize to signed PCM (WAV 8-bit is unsigned; this converts)
        val pcm =
          if (raw.getFormat.getEncoding == AudioFormat.Encoding.PCM_SIGNED) raw
          else AudioSystem.getAudioInputStream(AudioFormat.Encoding.PCM_SIGNED, raw)
        val f = pcm.getFormat
        val bits = f.getSampleSizeInBits
        if (bits != 8 && bits != 16) return None
        val bytes = pcm.readAllBytes()
        val step = bits / 8
        val n = bytes.length / step
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) =
            if (bits == 8) bytes(i).toInt
            else if (f.isBigEndian) (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xFF)
            else (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)
          i += 1
        }
        Some((f, out))
      } finally raw.close()
    } catch {
      case _: UnsupportedAudioFileException | _: java.io.IOException |
           _: IllegalArgumentException => None
    }
  }

  /** 8 deterministic audio features: [sampleRate, channels, nFrames,
    * bitsPerSample, meanSample, meanAbs, peakAbs, zeroCrossCount].
    * Integer-exact by construction — sums accumulate as Longs, zero
    * crossings are counted PER CHANNEL over the deinterleaved stream
    * (an interleaved count would register phantom crossings between
    * channels), and no sqrt/duration division appears so every feature
    * of an integer-amplitude fixture is exactly representable in float.
    * meanAbs is the loudness proxy (standard curation signal; RMS would
    * drag a sqrt into the oracle path for no extra discriminative power).
    */
  def audioFeatures(fmt: javax.sound.sampled.AudioFormat, samples: Array[Int]): Array[Float] = {
    val ch = fmt.getChannels
    val nFrames = if (ch > 0) samples.length / ch else 0
    var sum = 0L; var sumAbs = 0L; var peak = 0L; var zc = 0L
    var c = 0
    while (c < ch) {
      var prevNeg = false; var first = true
      var i = c
      while (i < nFrames * ch) {
        val v = samples(i)
        sum += v; val a = math.abs(v.toLong); sumAbs += a
        if (a > peak) peak = a
        val neg = v < 0
        if (!first && neg != prevNeg) zc += 1
        prevNeg = neg; first = false
        i += ch
      }
      c += 1
    }
    val n = (nFrames.toLong * ch).max(1L)
    Array(fmt.getSampleRate, ch.toFloat, nFrames.toFloat,
      fmt.getSampleSizeInBits.toFloat,
      (sum.toDouble / n).toFloat, (sumAbs.toDouble / n).toFloat,
      peak.toFloat, zc.toFloat)
  }

  /** Encode 16-bit signed PCM frames as a WAV container (little-endian,
    * interleaved) via the JDK encoder — the fixture/write half of the
    * [[decodeAudio]] round-trip.
    */
  def encodeWav(samples: Array[Short], sampleRate: Float, channels: Int = 1): Array[Byte] = {
    import javax.sound.sampled._
    require(channels > 0, s"channels must be positive, got $channels")
    require(samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of $channels channels")
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xFF).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(bytes),
      fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 8 deterministic byte-statistics features for payloads that are not
    * decodable media: [length, mean byte, std byte, entropy bits/byte,
    * printable fraction, zero fraction, distinct fraction, top-byte
    * fraction]. Exact integer histogram → double math → float; these are
    * the opaque-blob curation signals (corruption/truncation shows as an
    * entropy/printable shift).
    */
  def byteFeatures(payload: Array[Byte]): Array[Float] = {
    val n = payload.length
    if (n == 0) return Array(0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val hist = new Array[Long](256)
    var s = 0L; var s2 = 0L
    var i = 0
    while (i < n) {
      val v = payload(i) & 0xFF
      hist(v) += 1; s += v; s2 += v.toLong * v
      i += 1
    }
    val mean = s.toDouble / n
    val variance = s2.toDouble / n - mean * mean
    var entropy = 0.0; var printable = 0L; var distinct = 0; var top = 0L
    var b = 0
    while (b < 256) {
      val c = hist(b)
      if (c > 0) {
        val p = c.toDouble / n
        entropy -= p * math.log(p) / math.log(2.0)
        distinct += 1
        if (c > top) top = c
        if (b >= 32 && b <= 126) printable += c
      }
      b += 1
    }
    Array(n.toFloat, mean.toFloat, math.sqrt(math.max(0.0, variance)).toFloat,
      entropy.toFloat, (printable.toDouble / n).toFloat,
      (hist(0).toDouble / n).toFloat, distinct / 256.0f, (top.toDouble / n).toFloat)
  }

  /** The per-row feature decode used by [[extractFeatures]]: real image
    * decode when the bytes are an image, real audio decode when they are
    * an audio container, byte statistics otherwise. All paths emit the
    * same 8-float shape. Dispatch is by container magic (ImageIO and
    * AudioSystem each reject the other's formats at the header), so the
    * order cannot misroute a payload.
    */
  def payloadFeatures(payload: Array[Byte]): Array[Float] =
    decodeImage(payload).map(imageFeatures)
      .orElse(decodeAudio(payload).map { case (f, s) => audioFeatures(f, s) })
      .getOrElse(byteFeatures(payload))

  val featureSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("byte_len", LongType, nullable = false)))

  /** Batched feature extraction over partitions — the Scala analog of a
    * `mapInPandas` batch UDF: one decoder init per partition, rows
    * streamed through it. Repartition first so decode work spreads across
    * executors even when the source is few large files.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      partitions: Int = 0): DataFrame = {
    // numeric id required up front: cast('long') on a string id nulls per
    // row and the executor-side getLong would NPE deep inside the job
    require(df.schema(idCol).dataType.isInstanceOf[NumericType],
      s"extractFeatures: id column '$idCol' must be numeric " +
        s"(got ${df.schema(idCol).dataType.simpleString})")
    requireBinary(df, payloadCol, "extractFeatures")
    val in = if (partitions > 0) df.repartition(partitions) else df
    val spark = df.sparkSession
    val rdd = in.select(col(idCol).cast("long"), col(payloadCol)).rdd.mapPartitions { rows =>
      // per-partition decoder init would go here (codec handles, model…)
      rows.map { r =>
        // fail with the offending id, not a bare NPE three frames deep
        if (r.isNullAt(0)) throw new IllegalArgumentException(
          s"extractFeatures: null id in payload row")
        val payload = r.getAs[Array[Byte]](1)
        if (payload == null) throw new IllegalArgumentException(
          s"extractFeatures: null payload for id ${r.getLong(0)}")
        Row(r.getLong(0), payloadFeatures(payload).toSeq, payload.length.toLong)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Deterministic nearest-neighbor rescale to (targetW, targetH), PNG
    * re-encoded. srcX = x·w/tw integer floor — no interpolation, no
    * rendering pipeline, so the output PIXELS are bit-exact regardless
    * of Graphics2D backends; PNG is lossless, so decode(encode(img))
    * round-trips those pixels exactly (what ResizeSpec pins).
    */
  def resizeImage(img: java.awt.image.BufferedImage,
                  targetW: Int, targetH: Int): Array[Byte] = {
    require(targetW > 0 && targetH > 0,
      s"target dimensions must be positive, got ${targetW}x$targetH")
    val out = new java.awt.image.BufferedImage(
      targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < targetH) {
      val sy = (y.toLong * img.getHeight / targetH).toInt
      var x = 0
      while (x < targetW) {
        out.setRGB(x, y, img.getRGB((x.toLong * img.getWidth / targetW).toInt, sy))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("decoded", BooleanType, nullable = false)))

  /** Payload→payload image transform — the resize/transcode plumbing
    * shape (third of the three: →features, →frames, →payload). Decodable
    * images are rescaled to (targetW, targetH) and PNG re-encoded;
    * payloads that are not images pass through unchanged with
    * `decoded = false` (a poison row must not kill a 100 TB job — filter
    * on the flag downstream). Same per-partition batch contract as
    * [[extractFeatures]]; metadata (byte_len, content_hash) is
    * recomputed for the NEW bytes with the SAME Spark expressions
    * [[withBinaryPayload]] uses, so the hash format can never drift from
    * the attach path (stale or differently-formatted hashes silently
    * poison downstream exact dedup).
    */
  def resizeImages(df: DataFrame, idCol: String, payloadCol: String,
                   targetW: Int, targetH: Int, partitions: Int = 0): DataFrame = {
    require(targetW > 0 && targetH > 0,
      s"target dimensions must be positive, got ${targetW}x$targetH")
    require(df.schema(idCol).dataType.isInstanceOf[NumericType],
      s"resizeImages: id column '$idCol' must be numeric " +
        s"(got ${df.schema(idCol).dataType.simpleString})")
    requireBinary(df, payloadCol, "resizeImages")
    val in = if (partitions > 0) df.repartition(partitions) else df
    val spark = df.sparkSession
    val rdd = in.select(col(idCol).cast("long"), col(payloadCol)).rdd.mapPartitions { rows =>
      rows.map { r =>
        if (r.isNullAt(0)) throw new IllegalArgumentException(
          "resizeImages: null id in payload row")
        val payload = r.getAs[Array[Byte]](1)
        if (payload == null) throw new IllegalArgumentException(
          s"resizeImages: null payload for id ${r.getLong(0)}")
        decodeImage(payload) match {
          case Some(img) => Row(r.getLong(0), resizeImage(img, targetW, targetH), true)
          case None      => Row(r.getLong(0), payload, false)
        }
      }
    }
    spark.createDataFrame(rdd, resizedSchema)
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))
      .withColumn("content_hash", md5(col("payload")))
  }

  /** 64-bit difference hash (dHash) of a decoded image: nearest-neighbor
    * resample to (hashW+1)×hashH (same index arithmetic as
    * [[resizeImage]]), exact integer luma per pixel (299r+587g+114b —
    * the [[imageFeatures]] formula), bit (y·hashW + x) set iff
    * luma(x+1, y) > luma(x, y). Horizontal-gradient signs survive
    * rescaling, re-encoding, and uniform brightness shifts — the
    * canonical cheap perceptual fingerprint. hashW·hashH must be ≤ 64.
    */
  def dHash(img: java.awt.image.BufferedImage,
            hashW: Int = 8, hashH: Int = 8): Long = {
    require(hashW >= 1 && hashH >= 1 && hashW * hashH <= 64,
      s"dHash: need 1 <= hashW*hashH <= 64 bits, got ${hashW}x$hashH")
    val sw = hashW + 1
    val lum = Array.ofDim[Long](sw, hashH)
    var y = 0
    while (y < hashH) {
      val sy = (y.toLong * img.getHeight / hashH).toInt
      var x = 0
      while (x < sw) {
        val rgb = img.getRGB((x.toLong * img.getWidth / sw).toInt, sy)
        lum(x)(y) = 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
          114L * (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    var h = 0L
    y = 0
    while (y < hashH) {
      var x = 0
      while (x < hashW) {
        if (lum(x + 1)(y) > lum(x)(y)) h |= 1L << (y * hashW + x)
        x += 1
      }
      y += 1
    }
    h
  }

  val dhashSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("dhash", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false)))

  /** Per-image [[dHash]] over a binary payload column → (id, dhash,
    * decoded). Non-decodable payloads emit dhash 0 with
    * `decoded = false` (poison-row contract of [[resizeImages]] —
    * filter on the flag before joining). Same per-partition decode
    * plumbing as the other codec operators: pixels never leave the
    * task, only 8 bytes of hash per image are shuffled downstream —
    * which is the entire reason a 100 TB image dedup is tractable.
    */
  def imageDHashes(df: DataFrame, idCol: String, payloadCol: String,
                   hashW: Int = 8, hashH: Int = 8,
                   partitions: Int = 0): DataFrame = {
    require(hashW >= 1 && hashH >= 1 && hashW * hashH <= 64,
      s"imageDHashes: need 1 <= hashW*hashH <= 64 bits, got ${hashW}x$hashH")
    // numeric id required up front (the extractFeatures guard): cast on a
    // string id nulls per row and dies executor-side with a context-free
    // "null id" — fail driver-side with the column name instead
    require(df.schema(idCol).dataType.isInstanceOf[NumericType],
      s"imageDHashes: id column '$idCol' must be numeric " +
        s"(got ${df.schema(idCol).dataType.simpleString})")
    requireBinary(df, payloadCol, "imageDHashes")
    val in = if (partitions > 0) df.repartition(partitions) else df
    val spark = df.sparkSession
    val rdd = in.select(col(idCol).cast("long"), col(payloadCol)).rdd.mapPartitions { rows =>
      rows.map { r =>
        if (r.isNullAt(0)) throw new IllegalArgumentException(
          "imageDHashes: null id in payload row")
        val payload = r.getAs[Array[Byte]](1)
        if (payload == null) throw new IllegalArgumentException(
          s"imageDHashes: null payload for id ${r.getLong(0)}")
        decodeImage(payload) match {
          case Some(img) => Row(r.getLong(0), dHash(img, hashW, hashH), true)
          case None      => Row(r.getLong(0), 0L, false)
        }
      }
    }
    spark.createDataFrame(rdd, dhashSchema)
  }

  /** Near-duplicate image pairs from a dHash column: (id1, id2,
    * hamming) for every pair at Hamming distance ≤ `maxHamming`,
    * id1 < id2.
    *
    * Banded exactly like SimHash dedup: the 64-bit hash splits into
    * `bands` equal slices; candidates are pairs agreeing on ≥ 1 whole
    * band (one self-equi-join on (band, slice) — never all pairs), then
    * one codegen'd `bit_count(xor)` verifies. Pigeonhole makes the
    * filter COMPLETE for maxHamming < bands: fewer flipped bits than
    * bands leaves some band untouched. Raise `bands` for larger radii —
    * candidate volume grows as near-collisions on shorter slices, the
    * standard recall/cost dial.
    */
  def nearDupImagePairs(hashes: DataFrame, idCol: String,
                        hashCol: String = "dhash", maxHamming: Int = 2,
                        bands: Int = 4): DataFrame = {
    require(bands >= 1 && 64 % bands == 0,
      s"nearDupImagePairs: bands must divide 64, got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"nearDupImagePairs: banding is only complete for maxHamming < bands " +
        s"(got maxHamming=$maxHamming, bands=$bands) — raise bands")
    val bits = 64 / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    // id keeps the CALLER's type — loadBinaryDir corpora are naturally
    // keyed by the string `path`, and cast("long") nulled those ids so
    // the x.id < y.id predicate dropped EVERY pair (r14 review). The
    // pair ordering below works for any orderable id type.
    val sliced = hashes.select(col(idCol).as("id"),
        col(hashCol).cast("long").as("h"))
      .select(col("id"), col("h"), explode(sequence(lit(0), lit(bands - 1))).as("b"))
      .select(col("id"), col("h"), col("b"),
        expr(s"shiftrightunsigned(h, b * $bits) & ${mask}L").as("bv"))
    val cand = sliced.as("x")
      .join(sliced.as("y"), Seq("b", "bv"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"),
        col("x.h").as("h1"), col("y.h").as("h2"))
      .distinct()
    cand.select(col("id1"), col("id2"),
        expr("bit_count(h1 ^ h2)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Byte-cap guard: truncate payloads to `maxBytes` — a STORAGE
    * control (bound row size before a shuffle/sink), not a media
    * transform; use [[resizeImages]] to shrink actual images. Pure
    * Spark expression — no partition-level code needed for a slice.
    * Metadata is refreshed for the new bytes (same expressions as
    * [[withBinaryPayload]], see [[resizeImages]]).
    */
  def capPayloads(df: DataFrame, idCol: String, payloadCol: String,
                  maxBytes: Int): DataFrame = {
    require(maxBytes > 0, s"maxBytes must be positive, got $maxBytes")
    requireBinary(df, payloadCol, "capPayloads")
    df.select(col(idCol).as("id"), // caller's id type — cast("long") nulled string ids (r14 review)
        expr(s"substring($payloadCol, 1, $maxBytes)").as("payload"))
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))
      .withColumn("content_hash", md5(col("payload")))
  }

  /** Fail fast, driver-side, with the column name — a wrong payload
    * column otherwise dies as a context-free executor ClassCastException
    * three frames deep in mapPartitions.
    */
  private def requireBinary(df: DataFrame, c: String, op: String): Unit =
    require(df.schema(c).dataType == BinaryType,
      s"$op: payload column '$c' must be binary (got ${df.schema(c).dataType.simpleString})")

  /** Frame-sampling plumbing for video-like payloads: emit every k-th
    * chunk of `chunkBytes` as its own row (id, frame_no, frame_bytes).
    * The chunking stands in for real frame extraction.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   chunkBytes: Int, everyK: Int): DataFrame = {
    require(chunkBytes > 0, s"chunkBytes must be positive, got $chunkBytes")
    // everyK = 0 would make `i % 0 = 0` null under non-ANSI eval and
    // silently drop EVERY frame of every document
    require(everyK > 0, s"everyK must be positive, got $everyK")
    df.select(col(idCol).as("id"), col(payloadCol).as("p"))
      // a NULL payload otherwise slips through as one (id, 0, NULL)
      // frame row (greatest(1, NULL) = 1) — fail loudly like the other
      // codec operators do (r14 review)
      .withColumn("p", when(col("p").isNull,
        raise_error(concat(lit("sampleFrames: null payload for id "),
          col("id").cast("string"))).cast("binary")).otherwise(col("p")))
      .withColumn("n_chunks",
        greatest(lit(1), ceil(octet_length(col("p")) / lit(chunkBytes.toDouble))).cast("int"))
      .withColumn("frame_no", explode(expr(s"filter(sequence(0, n_chunks - 1), i -> i % $everyK = 0)")))
      .select(col("id"), col("frame_no"),
        expr(s"substring(p, frame_no * $chunkBytes + 1, $chunkBytes)").as("frame_bytes"))
  }
}
