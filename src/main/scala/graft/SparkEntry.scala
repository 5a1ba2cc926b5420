package graft

import graft.core.{DDF, DDFManager}
import graft.operators._
import graft.stats.{Sketches, Stats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 (plus the training-data-pipeline
  * extensions) is exposed as a named query over the driver's parquet
  * tables, with a DuckDB-equivalent oracle SQL where the semantics are
  * SQL-expressible.
  *
  * Oracle-determinism rules used throughout (both sides identically):
  *  - money/quantity columns are exact 2-decimal doubles → sums go through
  *    `decimal(18,2)` (exact in Spark AND DuckDB) then cast back to double;
  *  - derived means/variances are computed FROM those exact sums with
  *    identical double arithmetic instead of engine-internal aggregates;
  *  - engine-internal approximate/iterative aggregates (percentile,
  *    stddev) are rounded;
  *  - every query ends in a total ORDER BY; nullable sort keys say
  *    NULLS FIRST explicitly in the oracle (Spark's asc default);
  *  - engine-specific hashing is replaced by PORTABLE hashes where a
  *    query should be oracle-checked: mod-prime char folds
  *    (Dedup.portableFold — DuckDB list_reduce mirrors it), affine
  *    permutations for minhash, plan-time literals (LSH hyperplanes, IVF
  *    centroids) inlined into BOTH sides. The xxhash64 scale paths keep
  *    rows-only twins (d02, q06, ml01);
  *  - any float threshold crossing engines (quality gates, LSH signs,
  *    IVF argmax) gets its data-to-threshold margin measured first —
  *    documented at each use; margins here are ≥1e-4 vs fp noise ~1e-15.
  */
object SparkEntry {

  /** events reader with ts-type adaptation — see [[EntryShared.loadEvents]];
    * kept addressable here for the bench/tooling call sites.
    */
  private[graft] def loadEvents(spark: SparkSession, dir: String): DataFrame =
    EntryShared.loadEvents(spark, dir)

  private val allQueries: Seq[EntryShared.Q] =
    EntryRelationalQ.qs ++ EntrySqlFrontendQ.qs ++ EntryJoinsQ.qs ++
      EntryAggregationQ.qs ++ EntryStatsQ.qs ++ EntryBinningMissingQ.qs ++
      EntryTransformsQ.qs ++ EntryPipelineAQ.qs ++ EntryPipelineBQ.qs ++
      EntryCurationQ.qs ++ EntryIngestQ.qs ++ EntryUrlQ.qs ++ EntryHtmlQ.qs

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.find(_.name == "q10_tpch_q1").get.fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
