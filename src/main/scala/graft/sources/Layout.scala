package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file layout: Z-order (Morton) clustering so parquet
  * min/max statistics prune files and row groups on EVERY clustered
  * dimension, not just a leading sort key (extension — the reference
  * writes whatever partition order the engine produced,
  * TableDdlHandler/persist paths).
  *
  * Why it matters at 100 TB: a linear sort on (a, b) gives perfect
  * pruning on `a` and none on `b`; Z-order interleaves the bits of both,
  * so every file covers a small HYPER-RECTANGLE of the key space and a
  * selective predicate on either dimension (or both) skips most files at
  * planning time — no index structure, just parquet footer stats the
  * scanner already reads.
  *
  * Plan shape: one agg pass for per-column min/max (a handful of scalars
  * to the driver), then `repartitionByRange` on the z-value (distributed
  * range sampling — no global sort) + `sortWithinPartitions`. Cost is one
  * shuffle of the written data, the same as any clustered write.
  */
object Layout {

  /** Morton z-value of `cols`, each linearly quantized to `bits` bits
    * using the [lo, hi] ranges supplied (nulls quantize to 0). Bit j of
    * dimension i lands at position j·k + (k−1−i), so dimension 0 owns the
    * highest bit of each group. k·bits must fit a signed long.
    */
  def zvalue(cols: Seq[Column], ranges: Seq[(Double, Double)], bits: Int): Column = {
    val k = cols.length
    require(k >= 1 && ranges.length == k, "one (lo, hi) range per column")
    require(k * bits <= 62, s"$k cols x $bits bits overflows a long")
    val maxQ = (1L << bits) - 1
    val quantized = cols.zip(ranges).map { case (c, (lo, hi)) =>
      if (hi <= lo) lit(0L)
      else {
        val scaled = floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(maxQ.toDouble))
        coalesce(least(greatest(scaled, lit(0.0)), lit(maxQ.toDouble)), lit(0.0)).cast("long")
      }
    }
    val terms = for {
      (q, i) <- quantized.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(q, j).bitwiseAND(lit(1L)), j * k + (k - 1 - i))
    terms.reduce(_.bitwiseOR(_))
  }

  /** `df` with an appended z-value column over `zCols` — ranges come from
    * one min/max aggregate pass (2·k scalars to the driver, config-size).
    */
  def withZValue(df: DataFrame, zCols: Seq[String], bits: Int = 16,
                 outCol: String = "__z"): DataFrame = {
    val aggs = zCols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"lo_$c"), max(col(c).cast("double")).as(s"hi_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val ranges = zCols.indices.map { i =>
      val lo = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val hi = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      (lo, hi)
    }
    df.withColumn(outCol, zvalue(zCols.map(col), ranges, bits))
  }

  /** Write `df` as `numFiles` parquet files clustered by the z-order of
    * `zCols`. Content is exactly `df` — only the file layout changes.
    */
  def zorderWrite(df: DataFrame, zCols: Seq[String], path: String,
                  numFiles: Int, bits: Int = 16): Unit =
    withZValue(df, zCols, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetFileBytes` files (computed from the ACTUAL on-disk listing,
    * one Hadoop FS call — no data read for the sizing decision). The
    * streaming-ingest failure mode this fixes: a micro-batched or
    * per-epoch writer leaves thousands of KB-sized files whose
    * open/footers dominate every later scan.
    *
    * `shuffle = false` (default) uses `coalesce` — a shuffle-FREE merge
    * where each output task concatenates input partitions; right when
    * input files are uniformly small (the ingest case). `shuffle = true`
    * pays one round-robin repartition for byte-balanced outputs when the
    * inputs are skewed. At 100 TB run this per partition directory (the
    * hive-partitioned publishes of `Bucketing.writePartitioned`), not on
    * the whole table. Returns (filesBefore, filesAfter).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetFileBytes: Long,
              shuffle: Boolean = false): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // overwrite deletes the target BEFORE the lazy source scan runs — an
    // in-place call would destroy the data it is reading; refuse it
    val outP = new org.apache.hadoop.fs.Path(outPath)
    // containment counts as in-place too (r14 review): an out path that
    // is an ANCESTOR of the input gets deleted by mode("overwrite")
    // before the scan reads a file — the source data would be gone; a
    // DESCENDANT pollutes the input dir so later reads double-count
    val inQ = fs.makeQualified(p).toUri.getPath.stripSuffix("/") + "/"
    val outQ = fs.makeQualified(outP).toUri.getPath.stripSuffix("/") + "/"
    require(!inQ.startsWith(outQ) && !outQ.startsWith(inQ),
      s"compact cannot run in place or into a nested path " +
        s"($inPath vs $outPath): write to a sibling path, verify, then swap")
    val files = fs.listStatus(p).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    require(files.nonEmpty, s"no data files under $inPath")
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inPath)
    // coalesce only merges DOWN — if the scan packed the small files into
    // fewer read partitions than the target (large-file splitting case),
    // fall back to the shuffle so the byte target is actually honored
    val canCoalesce = !shuffle && df.rdd.getNumPartitions >= nOut
    val sized = if (canCoalesce) df.coalesce(nOut) else df.repartition(nOut)
    sized.write.mode("overwrite").parquet(outPath)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(outPath)).count { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    (files.length, outFiles)
  }

  /** Per-file [min, max] spans of `cols` in a written layout — the
    * pruning-power probe: the sum over files of the fraction of each
    * column's domain a file covers is what a range predicate multiplies
    * against. Reads footer-equivalent stats by scanning with
    * `input_file_name` (test-scale tool; production reads footers).
    */
  def fileSpans(spark: org.apache.spark.sql.SparkSession, path: String,
                cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"lo_$c"), max(col(c).cast("double")).as(s"hi_$c")))
    spark.read.parquet(path)
      .withColumn("__file", input_file_name())
      .groupBy("__file").agg(aggs.head, aggs.tail: _*)
  }
}
