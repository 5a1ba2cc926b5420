package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata. The Spark-side contract — schema,
  * partitioning, batch shape — is real and tested; the actual media decode
  * is STUBBED (no image/audio libraries in this container) behind
  * `decodeStub`, clearly marked. On a real cluster the stub body is
  * replaced by the codec call; nothing else changes.
  */
object Multimodal {

  /** Typed metadata carried alongside every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("content_hash", StringType, nullable = false),
    StructField("modality", StringType, nullable = false)))

  /** Read a directory of media files as (path, length, payload, meta)
    * via Spark's distributed `binaryFile` source — the production entry
    * point for [[extractFeatures]]/[[sampleFrames]]/[[resizePayloads]].
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

  /** Deterministic fake "decode": 8 pseudo-features derived from payload
    * bytes. ==== STUB ==== — replace with the real codec (e.g. JPEG
    * decode + CNN features) on a cluster with media libraries. The
    * signature, schema, and per-partition batch shape are the production
    * contract.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val h = java.util.Arrays.hashCode(payload)
    Array.tabulate(8)(i => ((h >>> (i * 4)) & 0xF).toFloat / 15.0f)
  }

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
        Row(r.getLong(0), decodeStub(payload).toSeq, payload.length.toLong)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Deterministic fake "resize": truncate to `targetBytes`. ==== STUB
    * ==== — replace with the real media transform (image resize, audio
    * resample, video transcode) on a cluster with codecs; the
    * binary→binary signature and metadata refresh are the contract.
    */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] =
    if (payload.length <= targetBytes) payload
    else java.util.Arrays.copyOf(payload, targetBytes)

  val resizedSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Payload→payload transform — the resize/transcode plumbing shape
    * (third of the three: →features, →frames, →payload). Same
    * per-partition batch contract as [[extractFeatures]]; metadata
    * (byte_len, content_hash) is recomputed for the NEW bytes — with the
    * SAME Spark expressions [[withBinaryPayload]] uses, so the hash
    * format can never drift from the attach path (stale or differently-
    * formatted hashes silently poison downstream exact dedup).
    */
  def resizePayloads(df: DataFrame, idCol: String, payloadCol: String,
                     targetBytes: Int, partitions: Int = 0): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    require(df.schema(idCol).dataType.isInstanceOf[NumericType],
      s"resizePayloads: id column '$idCol' must be numeric " +
        s"(got ${df.schema(idCol).dataType.simpleString})")
    requireBinary(df, payloadCol, "resizePayloads")
    val in = if (partitions > 0) df.repartition(partitions) else df
    val spark = df.sparkSession
    val rdd = in.select(col(idCol).cast("long"), col(payloadCol)).rdd.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map { r =>
        if (r.isNullAt(0)) throw new IllegalArgumentException(
          "resizePayloads: null id in payload row")
        val payload = r.getAs[Array[Byte]](1)
        if (payload == null) throw new IllegalArgumentException(
          s"resizePayloads: null payload for id ${r.getLong(0)}")
        Row(r.getLong(0), resizeStub(payload, targetBytes))
      }
    }
    spark.createDataFrame(rdd, resizedSchema)
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
      .withColumn("n_chunks",
        greatest(lit(1), ceil(octet_length(col("p")) / lit(chunkBytes.toDouble))).cast("int"))
      .withColumn("frame_no", explode(expr(s"filter(sequence(0, n_chunks - 1), i -> i % $everyK = 0)")))
      .select(col("id"), col("frame_no"),
        expr(s"substring(p, frame_no * $chunkBytes + 1, $chunkBytes)").as("frame_bytes"))
  }
}
