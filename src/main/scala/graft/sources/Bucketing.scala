package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet sink — the on-disk layout for repeat co-located
  * joins/aggregations at scale. Writing both sides of a recurring join
  * bucketed (and sorted) by the join key lets every later join run
  * WITHOUT a shuffle: the scan's output partitioning already satisfies
  * the join's requirement, so Exchange nodes vanish from the plan
  * (ScaleSpec pins this). At 100 TB that turns the nightly fact-dim join
  * from a full-cluster shuffle into a local sort-merge per bucket.
  *
  * Rules of thumb: bucket count ≈ target parallelism at the LARGEST
  * consumer (both sides must use the SAME count for co-location);
  * sortBy the bucket key so the merge phase needs no per-bucket sort.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted parquet table registered in the
    * session catalog.
    *
    * If the catalog does not know `table` but its managed location
    * survives in the warehouse directory (the in-memory catalog dies
    * with the session, the directory does not), the orphaned location is
    * removed first — otherwise every re-run after a restart fails with
    * LOCATION_ALREADY_EXISTS. The location is resolved through the
    * CATALOG (`defaultTablePath` for the identifier qualified by the
    * session's CURRENT database), not assumed to be
    * `<warehouse>/<table>`: with a non-default current database the
    * naive path would point at the DEFAULT database's same-named
    * managed directory — live data this guard must never touch. Only
    * the qualified table's own default location is ever removed, and
    * only when the catalog has no owner for that exact identifier.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val parsed = spark.sessionState.sqlParser.parseTableIdentifier(table)
      val qualified = parsed.copy(database = Some(parsed.database.getOrElse(
        spark.sessionState.catalog.getCurrentDatabase)))
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(qualified))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog,
    * so joins on the bucket key can skip their Exchange).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Hive-style partitioned parquet sink: one directory per distinct
    * partition-column tuple. Readers filtering on those columns scan ONLY
    * the matching directories (`PartitionFilters` in the plan — pinned by
    * ScaleSpec), which is THE first-order 100 TB lever: a day-partitioned
    * store turns a one-day query into a 1/365 scan before a single row is
    * read. Partition by low-cardinality columns only (date, type, region);
    * high-cardinality partitioning explodes the file count.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Shard-size-controlled parquet sink: caps rows per output file with
    * `maxRecordsPerFile` (task-local splitting — no extra shuffle) and
    * optionally coalesces a many-small-partitions frame first. Output
    * file sizing is the un-glamorous 100 TB lever: thousands of KB-sized
    * shards throttle every later scan on open/seek overhead, while
    * multi-GB shards serialize the consumer's parallelism; training-data
    * loaders want predictable shard row counts.
    */
  def writeSharded(df: DataFrame, path: String, maxRecordsPerFile: Long,
                   coalesceTo: Int = 0): Unit = {
    require(maxRecordsPerFile > 0,
      s"maxRecordsPerFile must be positive, got $maxRecordsPerFile")
    val in = if (coalesceTo > 0) df.coalesce(coalesceTo) else df
    in.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }
}
