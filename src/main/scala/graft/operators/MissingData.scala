package graft.operators

import graft.core.DDF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Missing-data operators (SURVEY §2.7; reference:
  * flink/src/main/scala/io/ddf/flink/etl/MissingDataHandler.scala).
  */
object MissingData {

  sealed trait Axis
  case object RowAxis extends Axis
  case object ColumnAxis extends Axis

  /** Reference threshold formula (MissingDataHandler.scala:80-88):
    * ANY → drop when ≥1 null; ALL → drop when all null; thresh t>0 →
    * drop when nullCount ≥ numCols−t+1. Spark's `na.drop(minNonNulls)`
    * uses min non-nulls: minNonNulls = numCols − nullThreshold + 1, which
    * algebraically matches (SURVEY M1).
    */
  def dropNARows(ddf: DDF, how: String = "any", thresh: Option[Int] = None,
                 cols: Seq[String] = Nil): DDF = {
    val target = if (cols.isEmpty) ddf.df.columns.toSeq else cols
    require(thresh.forall(_ <= target.length),
      s"threshold ${thresh.get} > ${target.length} columns")
    val out = thresh match {
      case Some(t) => ddf.df.na.drop(t, target) // t = min non-null count
      case None    => ddf.df.na.drop(how, target)
    }
    ddf.updateOrDerive(out)
  }

  /** Per-column null counts in ONE aggregate pass (the reference does a
    * flatMap→groupBy(colIdx)→reduceGroup shuffle, MissingDataHandler.scala:
    * 35-61; here it's a single partial-aggregated job with no shuffle of
    * data rows).
    */
  def nullCounts(df: DataFrame, cols: Seq[String]): Map[String, Long] = {
    if (cols.isEmpty) return Map.empty
    // coalesce: sum over ZERO rows is NULL (empty-frame input)
    val aggs = cols.map(c => coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    cols.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
  }

  /** Drop columns whose null count crosses the threshold (SURVEY M2). */
  def dropNAColumns(ddf: DDF, how: String = "any", thresh: Option[Int] = None): DDF = {
    val numRows = ddf.df.count()
    require(thresh.forall(_ <= numRows), s"threshold ${thresh.getOrElse(0)} > $numRows rows")
    val counts = nullCounts(ddf.df, ddf.df.columns.toSeq)
    val threshold: Long = thresh match {
      case Some(t) => numRows - t + 1
      case None    => if (how.equalsIgnoreCase("all")) numRows else 1L
    }
    val keep = ddf.df.columns.filter(c => counts(c) < threshold || numRows == 0)
    ddf.updateOrDerive(ddf.df.select(keep.map(col).toIndexedSeq: _*))
  }

  /** fillNA by single value / per-column map / per-column aggregate
    * (SURVEY M3; reference: MissingDataHandler.scala:119-193). The
    * aggregate mode computes e.g. each column's MEAN in one pass then
    * fills. ffill/bfill — unimplemented in the reference (it throws) —
    * are provided here as an extension via window `last(ignoreNulls)`.
    */
  def fillNAValue(ddf: DDF, value: Any, cols: Seq[String] = Nil): DDF = {
    val target = if (cols.isEmpty) ddf.df.columns.toSeq else cols
    val out = value match {
      case d: Double => ddf.df.na.fill(d, target)
      case l: Long   => ddf.df.na.fill(l, target)
      case i: Int    => ddf.df.na.fill(i.toLong, target)
      case b: Boolean => ddf.df.na.fill(b, target)
      // string fill value: typed coercion per column (the reference's
      // fillNA("0") fills NUMERIC columns too — MissingDataHandler.scala:
      // 119-193 coerces the fill string to each column's type)
      case s: String =>
        import org.apache.spark.sql.types._
        val fills: Map[String, Any] = target.flatMap { c =>
          ddf.schema(c).dataType match {
            case ByteType | ShortType | IntegerType | LongType =>
              scala.util.Try(s.trim.toLong).toOption.map(c -> _)
            case FloatType | DoubleType =>
              scala.util.Try(s.trim.toDouble).toOption.map(c -> _)
            case BooleanType =>
              scala.util.Try(s.trim.toBoolean).toOption.map(c -> _)
            case StringType => Some(c -> s)
            case _ => None
          }
        }.toMap
        ddf.df.na.fill(fills)
      case other => throw new IllegalArgumentException(s"Unsupported fill value $other")
    }
    ddf.updateOrDerive(out)
  }

  def fillNAMap(ddf: DDF, values: Map[String, Any]): DDF =
    ddf.updateOrDerive(ddf.df.na.fill(values))

  /** Fill numeric columns with an aggregate of the column (e.g. MEAN). */
  def fillNAWithAggregate(ddf: DDF, fn: String, cols: Seq[String] = Nil,
                          exactDecimals: Option[Int] = None): DDF = {
    val numericCols = ddf.schema.fields
      .filter(f => f.dataType.isInstanceOf[NumericType]).map(_.name).toSeq
    val target = if (cols.isEmpty) numericCols else cols.filter(numericCols.contains)
    if (target.isEmpty) return ddf
    // `exactDecimals = Some(d)`: the caller declares the column holds
    // exact d-decimal values, so mean/sum go through an EXACT decimal sum
    // (order-independent, reproducible across runs/engines) instead of
    // double accumulation, whose partition-order-dependent rounding can
    // flip a downstream round() (oracle-determinism rule)
    def exactSum(c: String): org.apache.spark.sql.Column = exactDecimals match {
      case Some(dd) => sum(col(c).cast(org.apache.spark.sql.types.DecimalType(38, dd)))
      case None     => sum(col(c))
    }
    // cast to double: min/max return the INPUT type and sum over integrals
    // returns Long — getDouble below would CCE on integral columns otherwise
    val aggs = target.map { c =>
      (fn.toLowerCase match {
        case "mean" | "avg" if exactDecimals.isDefined =>
          exactSum(c).cast("double") / count(col(c))
        case "mean" | "avg" => avg(col(c))
        case "min"          => min(col(c))
        case "max"          => max(col(c))
        case "sum"          => exactSum(c)
        case other => throw new IllegalArgumentException(s"Unsupported fill aggregate '$other'")
      }).cast("double").as(c)
    }
    val row = ddf.df.agg(aggs.head, aggs.tail: _*).first()
    val fills = target.zipWithIndex.collect {
      case (c, i) if !row.isNullAt(i) => c -> row.getDouble(i)
    }.toMap
    ddf.updateOrDerive(ddf.df.na.fill(fills))
  }

  /** Extension: forward/backward fill over an ordering column via
    * `last/first(ignoreNulls) OVER` — the reference declares FillMethod
    * but throws (MissingDataHandler.scala:122-127).
    *
    * With `partitionCols` the fill is per-group (fill each sensor's
    * series independently) and the window is hash-partitioned — fully
    * parallel. With NO partition columns the semantics are a single
    * global ordered fill, which a naive `Window.orderBy` would execute
    * by dragging the whole dataset into ONE task (the round-5
    * scale-killer); that path now range-partitions on the ordering
    * column, fills within each contiguous range in parallel, and
    * resolves each partition's leading (ffill) / trailing (bfill) nulls
    * from a per-partition carry map — one row per partition, so the
    * driver-side prefix scan is config-sized at any data scale. No
    * unpartitioned WindowExec anywhere (pinned by ScaleSpec).
    *
    * Tied ordering keys (global path): rows sharing an `orderCol` value
    * fill only from strictly earlier (ffill) / later (bfill) keys, and a
    * tied group's carry contribution is its max (ffill) / min (bfill)
    * non-null value — deterministic for NON-unique orderings, identical
    * to the classic running fill when the ordering is unique.
    */
  def fillDirectional(ddf: DDF, method: String, orderCol: String, cols: Seq[String],
                      partitionCols: Seq[String] = Nil): DDF = {
    import org.apache.spark.sql.expressions.Window
    val m = method.toLowerCase
    require(m == "ffill" || m == "bfill", s"Unsupported fill method '$method'")
    val out =
      if (partitionCols.nonEmpty) {
        cols.foldLeft(ddf.df) { (df, c) =>
          val base = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
          val filled =
            if (m == "ffill")
              last(col(c), ignoreNulls = true)
                .over(base.rowsBetween(Window.unboundedPreceding, 0))
            else
              first(col(c), ignoreNulls = true)
                .over(base.rowsBetween(0, Window.unboundedFollowing))
          df.withColumn(c, filled)
        }
      } else fillGlobal(ddf.df, m, orderCol, cols)
    ddf.updateOrDerive(out)
  }

  /** Pass 1 of the global directional fill: range-partition on the
    * ordering column (each task owns a contiguous key range; equal keys
    * land together) and run the directional window WITHIN each physical
    * partition. Exposed at package level so ScaleSpec can pin the plan
    * shape: every WindowExec here is partitioned by `__pid`.
    */
  private[graft] def fillGlobalPass1(df: DataFrame, m: String, orderCol: String,
                                     cols: Seq[String]): DataFrame =
    scanFill(fillGlobalPartition(df, orderCol), m, orderCol, cols)

  /** Orderable atomic types whose EXTERNAL Row values implement
    * java.lang.Comparable — the precondition for the deterministic tie
    * carry in [[scanFill]] and the struct-ordered edge aggregate.
    */
  private def comparableType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType | BooleanType | ByteType | ShortType | IntegerType |
           LongType | FloatType | DoubleType | DateType | TimestampType |
           TimestampNTZType => true
      case _: DecimalType => true
      case _ => false // arrays, maps, structs, binary: external values not Comparable
    }
  }

  /** ONE shuffle: the range exchange. Equal ordering keys all compare
    * the same way against the range boundaries, so a tied group is never
    * split across partitions — the group-aware scan in [[scanFill]]
    * relies on that colocation.
    */
  private def fillGlobalPartition(df: DataFrame, orderCol: String): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("__pid", spark_partition_id())
  }

  /** In-partition directional fill, deterministic under NON-unique
    * ordering keys. Rows sharing an `orderCol` value are treated as
    * simultaneous: they fill only from strictly earlier (ffill) /
    * strictly later (bfill) groups, and a tied group contributes its
    * extreme non-null value (max for ffill, min for bfill) to the carry
    * — a pure function of the data, independent of partition layout or
    * intra-group row order. With a unique ordering column every row is
    * its own group and this degenerates to the classic running fill.
    *
    * The deterministic tiebreak needs an ordering on the VALUES, so it
    * applies to fill columns of orderable atomic types (whose external
    * Row values are java.lang.Comparable — boxed numerics, String,
    * Timestamp, Date). Non-comparable fill columns (arrays, maps,
    * binary) keep the legacy last-seen-in-scan-order carry: still
    * correct for unique orderings, implementation-defined under ties —
    * matching the pre-round-8 behavior instead of crashing on a cast.
    *
    * The scan is a mapPartitions over the range-sorted rows — a
    * Window.partitionBy(__pid) here would add a SECOND full-data hash
    * exchange, because Catalyst cannot see that rows with equal
    * spark_partition_id are already colocated. bfill materializes each
    * partition to scan backwards — the same per-partition footprint
    * the window's unboundedFollowing frame buffered.
    */
  private def scanFill(parts: DataFrame, m: String, orderCol: String,
                       cols: Seq[String]): DataFrame = {
    val spark = parts.sparkSession
    val schema = parts.schema
    val idxs = cols.map(schema.fieldIndex).toArray
    val oi = schema.fieldIndex(orderCol)
    val forward = m == "ffill"
    val cmp = cols.map(c => comparableType(schema(c).dataType)).toArray
    val filledRdd = parts.rdd.mapPartitions { it =>
      // does a beat b for this direction? Comparable columns use the
      // deterministic extreme; others take every non-null (last seen in
      // scan order wins — the legacy carry)
      def better(k: Int, a: Any, b: Any): Boolean =
        b == null || !cmp(k) ||
          (if (forward) a.asInstanceOf[Comparable[Any]].compareTo(b) > 0
           else a.asInstanceOf[Comparable[Any]].compareTo(b) < 0)
      val carry = Array.fill[Any](idxs.length)(null)
      val pending = Array.fill[Any](idxs.length)(null)
      var lastKey: Any = null
      var started = false
      def fillRow(r: org.apache.spark.sql.Row): org.apache.spark.sql.Row = {
        val key = r.get(oi)
        if (started && key != lastKey) { // group boundary: publish pending
          var k = 0
          while (k < idxs.length) {
            if (pending(k) != null) { carry(k) = pending(k); pending(k) = null }
            k += 1
          }
        }
        started = true; lastKey = key
        val vals = r.toSeq.toArray
        var k = 0
        while (k < idxs.length) {
          val v = vals(idxs(k))
          if (v == null) vals(idxs(k)) = carry(k)
          else if (better(k, v, pending(k))) pending(k) = v
          k += 1
        }
        org.apache.spark.sql.Row.fromSeq(vals.toIndexedSeq)
      }
      if (forward) it.map(fillRow)
      else { // reversed scan over the materialized partition
        val buf = it.toArray
        val out = new Array[org.apache.spark.sql.Row](buf.length)
        var i = buf.length - 1
        while (i >= 0) { out(i) = fillRow(buf(i)); i -= 1 }
        out.iterator
      }
    }
    spark.createDataFrame(filledRdd, schema)
  }

  private def fillGlobal(df: DataFrame, m: String, orderCol: String,
                         cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    // localCheckpoint pins the __pid assignment: the edge aggregate and
    // the scan fill run over the SAME physical partitioning, and pass 2
    // joins on __pid (same materialization discipline as Dedup's
    // candidate sets). Checkpointing the PRE-fill frame (not the filled
    // one) lets the edge aggregate see original nulls, which the
    // deterministic-tiebreak aggregate below needs.
    val parts = fillGlobalPartition(df, orderCol).localCheckpoint()
    val filled = scanFill(parts, m, orderCol, cols)
    // carry value per partition: per column, the extreme orderCol GROUP
    // containing a non-null, resolved within the group by the same
    // tiebreak as scanFill (max value for ffill, min for bfill) — the
    // lexicographic struct(orderCol, value) extreme over non-null rows.
    // max_by/min_by skip rows whose ordering expression is null, so the
    // when() masks out null values. One row PER PARTITION (config-sized,
    // never data-sized).
    val edgeAggs = cols.map { c =>
      // non-comparable (array/map/binary) columns can't order by value —
      // fall back to the legacy orderCol-only edge (matches scanFill's
      // last-seen carry for those columns)
      val ord =
        if (comparableType(df.schema(c).dataType))
          when(col(c).isNotNull, struct(col(orderCol), col(c)))
        else when(col(c).isNotNull, struct(col(orderCol)))
      (if (m == "ffill") max_by(col(c), ord) else min_by(col(c), ord)).as(c)
    }
    val edges = parts.groupBy("__pid").agg(edgeAggs.head, edgeAggs.tail: _*)
      .collect().map(r => r.getInt(0) -> r).sortBy(_._1)
    // driver-side prefix scan over the (numPartitions)-row edge table:
    // carry for partition p = nearest non-null among partitions before p
    // (ffill) / after p (bfill)
    val ordered = if (m == "ffill") edges else edges.reverse
    val carry = scala.collection.mutable.Map.empty[String, Any]
    val carryRows = ordered.map { case (pid, row) =>
      val snapshot = org.apache.spark.sql.Row.fromSeq(
        pid +: cols.map(c => carry.getOrElse(c, null)))
      cols.foreach { c =>
        val v = row.getAs[Any](c)
        if (v != null) carry(c) = v
      }
      snapshot
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
        cols.map(c => filled.schema(c).copy(name = s"__carry_$c", nullable = true)))
    import scala.jdk.CollectionConverters._
    val carryDf = spark.createDataFrame(carryRows.toSeq.asJava, schema)
    // pass 2: broadcast the tiny carry table and coalesce it under each
    // column's remaining nulls (a partition's rows before its first
    // non-null for ffill / after its last for bfill)
    val joined = filled.join(broadcast(carryDf), Seq("__pid"), "left_outer")
    val out = cols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, coalesce(col(c), col(s"__carry_$c")))
    }.drop("__pid" +: cols.map(c => s"__carry_$c"): _*)
    // materialize the RESULT so the corpus-sized parts checkpoint can be
    // released before returning (r14 review — it was pinned until
    // ContextCleaner GC, accumulating across calls in a long session);
    // the exactJaccardJoin rule: no cache outlives the call beyond the
    // result itself.
    val outM = out.localCheckpoint(eager = true)
    graft.core.Checkpoints.release(parts)
    outM
  }
}
