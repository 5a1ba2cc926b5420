package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content manifest for parquet corpora — the reproducibility/audit
  * layer a training-data publish needs: after writing a curated corpus,
  * record per-shard row counts and an order-independent content hash,
  * so any later consumer (or a re-run of the pipeline) can verify the
  * corpus is bit-for-bit the one that was published without trusting
  * file sizes or mtimes.
  *
  * Scale stance: the verification scan is one distributed pass
  * (xxhash64 per row folded with bit_xor per file — commutative, so no
  * ordering requirement and full map-side aggregation); only the
  * per-FILE summary (#files rows, not #rows) ever reaches the driver.
  * The manifest itself is a single JSON file beside the data.
  */
object Manifest {

  val ManifestFile = "_graft_manifest.json"

  /** Per-file (path, rows, xor- AND sum-folded xxhash64 of all
    * columns). The path is RELATIVE to the corpus root — the trailing
    * `depth` hive partition dirs plus the basename — so the manifest
    * survives a directory move or bucket rename, and files in different
    * partition dirs never collide (two tasks each holding two partition
    * values write the SAME basename under different dirs — a
    * basename-only key silently merges them). TWO commutative folds because
    * each alone has a blind spot: xor cancels on even multiplicities
    * (shard [a,a] → 0 ← [b,b]), sum is weaker against crafted
    * collisions — together a tamper must preserve both. The sum runs in
    * decimal(38,0) so it never overflows (2⁶⁴·rows ≪ 10³⁸) and is
    * serialized as a STRING in the manifest (JSON numbers would lose
    * precision past 2⁵³).
    */
  private def shardSummary(back: DataFrame, depth: Int): DataFrame = {
    val cols = back.columns.map(col)
    val segs = split(input_file_name(), "/")
    back
      .withColumn("__file",
        concat_ws("/", slice(segs, size(segs) - lit(depth), lit(depth + 1))))
      .withColumn("__h", xxhash64(cols: _*))
      .groupBy("__file")
      .agg(count(lit(1)).as("rows"), expr("bit_xor(__h)").as("content_hash"),
        sum(col("__h").cast("decimal(38,0)")).cast("string").as("content_sum"))
      .select(col("__file").as("file"), col("rows"), col("content_hash"),
        col("content_sum"))
  }

  /** Write `df` to `path` as parquet, then scan it back and write a
    * manifest JSON recording per-shard rows + content hashes and the
    * corpus totals. Returns the shard summary. `partitionCols` publishes
    * hive-style value directories (shard-by-key publish); the read-back
    * scan restores the partition columns, so they are hashed into the
    * content folds like any other column.
    */
  def writeWithManifest(df: DataFrame, path: String,
                        partitionCols: Seq[String] = Nil): DataFrame = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
    // An EMPTY frame under partitionBy writes no data files at all, so
    // the published dir would be unreadable (parquet schema inference
    // has nothing to read) and every downstream step — the manifest
    // read-back, profiles, consumers — would die on
    // UNABLE_TO_INFER_SCHEMA. An over-filtered pipeline must still
    // publish a VALID, verifiable corpus: emit one explicit 0-row shard
    // carrying the full schema (partition columns ride as ordinary
    // columns — with no hive dirs present the reader takes the file
    // schema whole).
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val files = fs.listFiles(p, true)
    var hasData = false
    while (!hasData && files.hasNext) {
      val n = files.next().getPath.getName
      hasData = !n.startsWith("_") && !n.startsWith(".")
    }
    if (!hasData)
      df.sparkSession.createDataFrame(
          df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
        .coalesce(1).write.mode("append").parquet(path)
    // the placeholder shard lands at the CORPUS ROOT (no hive dirs), so
    // the manifest key depth must be 0 there — keeping partitionCols.size
    // would slice directories ABOVE the corpus root into the file key and
    // break verify-after-move (r14 review)
    writeManifestFor(df.sparkSession, path, if (hasData) partitionCols.size else 0)
  }

  /** Compute and store the manifest for an ALREADY-written parquet dir —
    * the manifest half of [[writeWithManifest]], for writers that control
    * their own layout (e.g. `Layout.zorderWrite`). Returns the per-shard
    * summary frame.
    */
  def writeManifestFor(spark: SparkSession, path: String,
                       partitionDepth: Int = 0): DataFrame = {
    val summary = shardSummary(spark.read.parquet(path), partitionDepth)
    val entries = summary.collect() // one row per FILE — config-sized
    val totalRows = entries.map(_.getAs[Long]("rows")).sum
    val corpusHash = entries.map(_.getAs[Long]("content_hash")).foldLeft(0L)(_ ^ _)
    val corpusSum = entries.map(r => BigInt(r.getAs[String]("content_sum"))).sum
    val json = entries.sortBy(_.getAs[String]("file")).map { r =>
      s"""{"file":"${r.getAs[String]("file")}","rows":${r.getAs[Long]("rows")},""" +
        s""""content_hash":${r.getAs[Long]("content_hash")},""" +
        s""""content_sum":"${r.getAs[String]("content_sum")}"}"""
    }.mkString(
      s"""{"total_rows":$totalRows,"corpus_hash":$corpusHash,"corpus_sum":"$corpusSum",""" +
        s""""partition_depth":$partitionDepth,"shards":[""",
      ",", "]}\n")
    val p = new org.apache.hadoop.fs.Path(path, ManifestFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    summary
  }

  /** [[writeWithManifest]] + stored column profile from ONE read-back
    * scan (r18, guide §6 one-pass I/O): the manifest's per-file
    * aggregation carries the per-column profile aggregates (HLL sketch,
    * null count, min/max) alongside the content folds, so the published
    * corpus is scanned once where write-then-profile scanned it twice.
    * The profile parquet stores one row per (file, column) —
    * [[mergedProfile]] merges per-file rows exactly as it merges
    * per-corpus rows (HLL union + exact-field sums/min/max), so every
    * profile consumer is unchanged. Returns (per-file shard summary,
    * MERGED profile) — both built from the already-collected entries,
    * so consuming them costs no further corpus scan.
    */
  def writeWithManifestAndProfile(df: DataFrame, path: String,
                                  partitionCols: Seq[String] = Nil,
                                  lgK: Int = 12): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listFiles(p, true)
    var hasData = false
    while (!hasData && files.hasNext) {
      val n = files.next().getPath.getName
      hasData = !n.startsWith("_") && !n.startsWith(".")
    }
    if (!hasData) {
      // the writeWithManifest empty-corpus contract: one explicit 0-row
      // root shard so the dir stays readable; the per-file aggregation
      // sees no rows, so the profile falls back to the global (0-row)
      // shape writeProfileFor would store
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
        .coalesce(1).write.mode("append").parquet(path)
      val summary = writeManifestFor(spark, path, 0)
      val prof = writeProfileFor(spark, path, lgK = lgK)
      return (summary, prof)
    }
    val depth = partitionCols.size
    val back = spark.read.parquet(path)
    val cs = back.columns.toSeq
    val byName = back.schema.fields.map(f => f.name -> f.dataType).toMap
    val segs = split(input_file_name(), "/")
    val profAggs = cs.flatMap { c =>
      val numeric = byName(c).isInstanceOf[org.apache.spark.sql.types.NumericType]
      Seq(
        hll_sketch_agg(col(c).cast("string"), lgK).as(s"__hll_$c"),
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nulls_$c"),
        (if (numeric) min(col(c).cast("double")) else lit(null).cast("double")).as(s"__minn_$c"),
        (if (numeric) max(col(c).cast("double")) else lit(null).cast("double")).as(s"__maxn_$c"),
        (if (numeric) lit(null).cast("string") else min(col(c).cast("string"))).as(s"__mins_$c"),
        (if (numeric) lit(null).cast("string") else max(col(c).cast("string"))).as(s"__maxs_$c"))
    }
    val entries = back
      .withColumn("__file",
        concat_ws("/", slice(segs, size(segs) - lit(depth), lit(depth + 1))))
      .withColumn("__h", xxhash64(cs.map(col): _*))
      .groupBy("__file")
      .agg(count(lit(1)).as("rows"),
        (Seq(expr("bit_xor(__h)").as("content_hash"),
          sum(col("__h").cast("decimal(38,0)")).cast("string").as("content_sum")) ++
          profAggs): _*)
      .collect()
    // manifest JSON from the same collected rows writeManifestFor builds
    val totalRows = entries.map(_.getAs[Long]("rows")).sum
    val corpusHash = entries.map(_.getAs[Long]("content_hash")).foldLeft(0L)(_ ^ _)
    val corpusSum = entries.map(r => BigInt(r.getAs[String]("content_sum"))).sum
    val json = entries.sortBy(_.getAs[String]("__file")).map { r =>
      s"""{"file":"${r.getAs[String]("__file")}","rows":${r.getAs[Long]("rows")},""" +
        s""""content_hash":${r.getAs[Long]("content_hash")},""" +
        s""""content_sum":"${r.getAs[String]("content_sum")}"}"""
    }.mkString(
      s"""{"total_rows":$totalRows,"corpus_hash":$corpusHash,"corpus_sum":"$corpusSum",""" +
        s""""partition_depth":$depth,"shards":[""",
      ",", "]}\n")
    val mp = new org.apache.hadoop.fs.Path(path, ManifestFile)
    val out = fs.create(mp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // per-(file, column) profile rows in Sketches.profile's exact schema
    import org.apache.spark.sql.types._
    val profSchema = StructType(Seq(
      StructField("col_name", StringType), StructField("ndv_sketch", BinaryType),
      StructField("null_count", LongType), StructField("row_count", LongType),
      StructField("min_num", DoubleType), StructField("max_num", DoubleType),
      StructField("min_str", StringType), StructField("max_str", StringType)))
    val profRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    entries.foreach { r =>
      cs.foreach { c =>
        profRows.add(org.apache.spark.sql.Row(
          c, r.getAs[Array[Byte]](s"__hll_$c"), r.getAs[Long](s"__nulls_$c"),
          r.getAs[Long]("rows"),
          r.getAs[java.lang.Double](s"__minn_$c"), r.getAs[java.lang.Double](s"__maxn_$c"),
          r.getAs[String](s"__mins_$c"), r.getAs[String](s"__maxs_$c")))
      }
    }
    val profile = spark.createDataFrame(profRows, profSchema)
    profile.coalesce(1).write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(path, ProfileDir).toString)
    val summary = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row]({
        val l = new java.util.ArrayList[org.apache.spark.sql.Row]()
        entries.foreach(r => l.add(org.apache.spark.sql.Row(
          r.getAs[String]("__file"), r.getAs[Long]("rows"),
          r.getAs[Long]("content_hash"), r.getAs[String]("content_sum"))))
        l
      }),
      StructType(Seq(StructField("file", StringType), StructField("rows", LongType),
        StructField("content_hash", LongType), StructField("content_sum", StringType))))
    (summary, graft.stats.Sketches.mergeProfiles(Seq(profile)))
  }

  val ProfileDir = "_graft_profile"

  /** Write the mergeable column-profile table (stats/Sketches) next to
    * an already-published corpus: one scan of `path`, profile parquet at
    * `<path>/_graft_profile/` (underscore prefix → invisible to corpus
    * reads). This is the shard half of the no-rescan stats contract:
    * profile each published shard-dir once, answer corpus-wide stats by
    * [[mergedProfile]] over the profile tables alone.
    */
  def writeProfileFor(spark: SparkSession, path: String,
                      cols: Seq[String] = Nil, lgK: Int = 12): DataFrame = {
    val prof = graft.stats.Sketches.profile(spark.read.parquet(path), cols, lgK)
    prof.coalesce(1).write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(path, ProfileDir).toString)
    readProfile(spark, path)
  }

  /** The stored profile of one published corpus dir. */
  def readProfile(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(new org.apache.hadoop.fs.Path(path, ProfileDir).toString)

  /** Corpus-wide statistics across any number of published dirs —
    * merges the stored profile tables, never rescans the corpora.
    */
  def mergedProfile(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "mergedProfile: no paths given")
    graft.stats.Sketches.estimate(
      graft.stats.Sketches.mergeProfiles(paths.map(p => readProfile(spark, p))))
  }

  /** Drift report between two PUBLISHED corpus versions: merge each
    * side's stored shard profiles, compare (stats/Sketches.profileDrift)
    * — corpus-change audit that never rescans either corpus.
    */
  def profileDrift(spark: SparkSession, oldPaths: Seq[String],
                   newPaths: Seq[String]): DataFrame =
    graft.stats.Sketches.profileDrift(
      mergedProfile(spark, oldPaths), mergedProfile(spark, newPaths))

  /** Re-scan `path` and compare against its stored manifest. Returns a
    * per-shard status frame (file, manifest_rows, actual_rows,
    * manifest_hash, actual_hash, ok) — a full-outer join, so shards
    * that VANISHED since publish and shards that APPEARED both surface
    * (with nulls on the missing side and ok = false).
    */
  def verifyManifest(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(path, ManifestFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no $ManifestFile under $path")
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // r18 opt: the manifest is THIS object's own driver-written format
    // (flat fields, no escapes in the values we emit) — parse it on the
    // driver instead of paying a spark.read.json job + schema inference
    // per verify. Manifests written before partitioned publish lack
    // partition_depth — depth-0 by construction.
    val depth = """"partition_depth":(-?\d+)""".r
      .findFirstMatchIn(text).map(_.group(1).toInt).getOrElse(0)
    val shardRe =
      (""""file":"([^"]*)","rows":(-?\d+),""" +
        """"content_hash":(-?\d+),"content_sum":"(-?\d+)"""").r
    val stored = shardRe.findAllMatchIn(text).map(m =>
        (m.group(1), m.group(2).toLong, m.group(3).toLong, m.group(4)))
      .toSeq.toDF("file", "manifest_rows", "manifest_hash", "manifest_sum")
    val actual = shardSummary(spark.read.parquet(path), depth)
      .withColumnRenamed("rows", "actual_rows")
      .withColumnRenamed("content_hash", "actual_hash")
      .withColumnRenamed("content_sum", "actual_sum")
    stored.join(actual, Seq("file"), "full_outer")
      .withColumn("ok",
        col("manifest_rows") === col("actual_rows") &&
          col("manifest_hash") === col("actual_hash") &&
          col("manifest_sum") === col("actual_sum"))
      .withColumn("ok", coalesce(col("ok"), lit(false)))
  }
}
