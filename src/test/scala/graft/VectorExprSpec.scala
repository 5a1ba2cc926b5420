package graft

import graft.functions.{GraftFunctions, VectorFunctions}
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

/** Native VectorDot/VectorCosine Catalyst expressions: parity with the
  * interpreted HOF formulation, null handling, mixed element types, SQL
  * registration.
  */
class VectorExprSpec extends SparkTestBase {

  test("native cosine/dot match the HOF formulation bit-for-bit") {
    import spark.implicits._
    val rng = new scala.util.Random(1)
    val df = (1 to 50).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat),
      Array.fill(16)(rng.nextGaussian().toFloat))).toDF("id", "u", "v")
    val both = df.select(
      Similarity.cosine(col("u"), col("v")).as("native"),
      Similarity.cosineHof(
        expr("transform(u, x -> cast(x as double))"),
        expr("transform(v, x -> cast(x as double))")).as("hof"),
      VectorFunctions.dot(col("u"), col("v")).as("ndot"),
      expr("aggregate(zip_with(transform(u, x -> cast(x as double)), transform(v, x -> cast(x as double)), (a, b) -> a * b), 0D, (acc, x) -> acc + x)").as("hdot"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "cosine mismatch")
      assert(r.getDouble(2) == r.getDouble(3), "dot mismatch")
    }
  }

  test("null vector propagates null; zero vector gives cosine 0") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (2, None, Some(Array(1.0f, 1.0f))),
      (3, Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 1.0f)))
    ).toDF("id", "u", "v")
    val rows = df.select(col("id"), VectorFunctions.cosine(col("u"), col("v")).as("c"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) > 0.9)
    assert(rows(1).isNullAt(1))
    assert(rows(2).getDouble(1) == 0.0)
  }

  test("null ELEMENT null-propagates like the HOF formulation (round-1 advice)") {
    val df = spark.range(1).select(
      expr("array(1.0d, cast(null as double), 3.0d)").as("u"),
      expr("array(1.0d, 1.0d, 1.0d)").as("v"),
      // containsNull=true schema but no actual nulls: guard must not fire
      expr("slice(array(2.0d, 4.0d, cast(null as double)), 1, 2)").as("w"))
    val r = df.select(
      VectorFunctions.dot(col("u"), col("v")).as("d"),
      VectorFunctions.cosine(col("u"), col("v")).as("c"),
      expr("aggregate(zip_with(u, v, (a, b) -> a * b), 0D, (acc, x) -> acc + x)").as("hof"),
      VectorFunctions.dot(col("w"), col("v")).as("dw")).first()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2), "null element must null-propagate")
    assert(r.getDouble(3) == 6.0)
  }

  test("mixed float/double arrays work (bucket hyperplanes path)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(1.0, 0.0))).toDF("f", "d")
    val v = df.select(VectorFunctions.dot(col("f"), col("d"))).first().getDouble(0)
    assert(v == 1.0)
  }

  test("SQL registration: vector_cosine usable from spark.sql") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("u", "v")
      .createOrReplaceTempView("vec_t")
    val v = spark.sql("select vector_cosine(u, v) as c from vec_t").first().getDouble(0)
    assert(v == 1.0)
  }

  test("SQL registration: bounded_top_k usable from spark.sql, == API path") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    Seq((1L, 5L, "a"), (1L, 9L, "b"), (1L, 7L, "c"), (2L, 1L, "d"))
      .toDF("g", "v", "p").createOrReplaceTempView("topk_t")
    val rows = spark.sql(
      """select g, e.v, e.p from (
        |  select g, explode(bounded_top_k(struct(v, p), 2)) as e
        |  from topk_t group by g)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set((1L, 9L, "b"), (1L, 7L, "c"), (2L, 1L, "d")), s"got $rows")
  }

  test("NearestCentroid: matrix argmax equals inline and join paths, ties -> higher cell") {
    import spark.implicits._
    import graft.pipeline.IvfIndex
    // 60 centroids (above the inline cutover) incl. an exact duplicate
    // pair (17, 41) to force score ties
    val cents = Array.tabulate(60)(c =>
      Array.tabulate(6)(i => ((c * 7 + i * 3) % 13).toDouble - 6.0))
    // duplicate a frequently-winning centroid (54, observed) into the
    // HIGHER slot 59 — every 54-winner must flip to 59 under the shared
    // array_max tie rule
    cents(59) = cents(54).clone()
    val vecs = spark.range(500L).select(col("id").as("vec_id"),
      array((0 until 6).map(i =>
        ((col("id") * (i + 3)) % 17).cast("float") - lit(8.0f)): _*).as("embedding"))
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val viaMatrix = vecs.select(col("id"),
        IvfIndex.nearestCellMatrix(col("v"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaInline = vecs.select(col("id"),
        IvfIndex.nearestCell(col("v"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaMatrix == viaInline, "matrix expression == inline-literal argmax")
    // the duplicated winner must resolve to the HIGHER copy everywhere
    // (the array_max tie rule all paths share)
    assert(viaMatrix.values.exists(_ == 59), "tie landed")
    assert(!viaMatrix.values.exists(_ == 54), "tie breaks to the higher duplicate")
    // codegen active: the projection stays inside WholeStageCodegen
    val q = vecs.select(IvfIndex.nearestCellMatrix(col("v"), cents).as("cell"))
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project [nearest_centroid"))
    // guards
    intercept[IllegalArgumentException] {
      graft.functions.NearestCentroid(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("v")),
        Array(Array(1.0), Array(1.0, 2.0)))
    }
  }

  test("codegen path active (no fallback) in a projection") {
    val df = spark.range(10).select(
      array((0 to 3).map(i => (col("id") + i).cast("float")): _*).as("u"),
      array((0 to 3).map(i => (col("id") * i).cast("float")): _*).as("v"))
    val q = df.select(VectorFunctions.dot(col("u"), col("v")).as("d"))
    // the starred `*(n) Project` marks the operator as inside a
    // WholeStageCodegen stage — vector_dot did not force a fallback
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project [vector_dot"))
    assert(q.count() == 10)
  }

  test("MatrixProject: codegen == interpreted == per-row dot composition; nulls; codegen active") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    val m = Similarity.signMatrix(inDim = 8, outDim = 3, seed = 5L)
    def projCol(v: org.apache.spark.sql.Column) = Bridge.column(
      graft.functions.MatrixProject(Bridge.expression(v), m, 0.5))
    val df = (1 to 40).map(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 31 + j * 7) % 11).toFloat - 5f)))
      .toDF("id", "v")
    val out = df.select(col("id"), projCol(col("v")).as("p")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // reference: the native VectorDot per matrix row (same ascending fold)
    val ref = df.select(col("id"),
        array(m.map(row => VectorFunctions.dot(col("v"),
          array(row.map(x => lit(x)): _*)) * 0.5): _*).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out == ref, "MatrixProject == per-row VectorDot composition, bitwise")
    // interpreted path (eval) agrees: force by running on a local Row
    val one = df.filter(col("id") === 1L).select(projCol(col("v"))).collect()(0).getSeq[Double](0)
    assert(one == out(1L))
    // null element -> null row; null vector -> null
    val nulls = Seq((1L, Array[java.lang.Float](1f, null, 3f)), (2L, null))
      .toDF("id", "v")
    val nm = Similarity.signMatrix(3, 2, 1L)
    val nOut = nulls.select(Bridge.column(
      graft.functions.MatrixProject(Bridge.expression(col("v")), nm, 1.0)).as("p")).collect()
    assert(nOut.forall(_.isNullAt(0)))
    // codegen active (no fallback) — on a range frame (a local Seq
    // constant-folds to LocalTableScan via the interpreted eval)
    val rdf = spark.range(10).select(
      array((0 until 8).map(i => ((col("id") + i) % 5).cast("float")): _*).as("v"))
    val q = rdf.select(projCol(col("v")).as("p"))
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project [matrix_project"))
    // dimension drift → NULL row, never a silent truncation (r14 review):
    // a 3-of-8 vector must not get a plausible-looking projection
    val drift = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array.fill(8)(1.0f)))
      .toDF("id", "v")
    val dOut = drift.select(col("id"), projCol(col("v")).as("p"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(dOut(1L) && !dOut(2L), s"drifted row must be NULL: $dOut")
    // guards
    intercept[IllegalArgumentException] {
      graft.functions.MatrixProject(Bridge.expression(col("v")),
        Array(Array(1.0), Array(1.0, 2.0)), 1.0)
    }
  }

  test("randomProject: deterministic, JL distance preservation in expectation") {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    val df = (1 to 80).map(i => (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat)))
      .toDF("id", "vec")
    val p1 = Similarity.randomProject(df, "vec", "proj", outDim = 16, seed = 7L)
    val p2 = Similarity.randomProject(df, "vec", "proj", outDim = 16, seed = 7L)
    assert(p1.select("proj").collect().map(_.getSeq[Double](0)).toSeq ==
      p2.select("proj").collect().map(_.getSeq[Double](0)).toSeq, "same seed, same map")
    // JL sanity: squared norms preserved within a loose band on average
    val ratios = p1.select(
        (VectorFunctions.dot(col("proj"), col("proj")) /
          VectorFunctions.dot(col("vec"), col("vec"))).as("r"))
      .collect().map(_.getDouble(0))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"norm-preservation mean off: $mean")
    intercept[IllegalArgumentException] {
      Similarity.randomProject(df, "vec", "p", outDim = 65)
    }
  }

  test("projected-recall gate: passes on low-intrinsic-dim corpora, fails on isotropic") {
    import spark.implicits._
    // r15 (verdict ask): the a17/a19 eval loop must demonstrate BOTH
    // verdicts — a 64→16 projection of isotropic noise loses the
    // neighborhood structure (gate rejects), while a corpus whose signal
    // lives in 4 coordinates (real embedding manifolds have low
    // intrinsic dim) keeps it (gate passes).
    val rng = new scala.util.Random(31)
    def corpus(intrinsicDim: Int) = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(64)(j =>
        if (j < intrinsicDim) rng.nextGaussian().toFloat else 0.0f))
    }.toDF("vec_id", "embedding")
    def recallOf(all: org.apache.spark.sql.DataFrame): Double = {
      val queries = all.filter(col("vec_id") < 5).withColumnRenamed("vec_id", "qid")
      val exact = Similarity.bruteForceTopK(all, queries, "embedding", "vec_id", "qid", 10)
      val pc = Similarity.randomProject(all, "embedding", "proj", 16, seed = 7L)
        .select(col("vec_id"), col("proj"))
      val pq = Similarity.randomProject(queries, "embedding", "proj", 16, seed = 7L)
        .select(col("qid"), col("proj"))
      val approx = Similarity.bruteForceTopK(pc, pq, "proj", "vec_id", "qid", 10)
      val r = Similarity.annRecall(approx, exact, k = 10)
        .agg(org.apache.spark.sql.functions.avg("recall")).first().getDouble(0)
      r
    }
    val clustered = recallOf(corpus(4))
    val isotropic = recallOf(corpus(64))
    assert(clustered >= 0.5,
      s"low-intrinsic-dim corpus must pass the gate, recall=$clustered")
    assert(clustered > isotropic + 0.2,
      s"gate must separate the regimes: clustered=$clustered isotropic=$isotropic")
  }

  // ---- r17: native int8 kernels (the a11 JIT-shelf fix) ----

  test("QuantizeInt8: bit-parity with the HOF chain; zero vector; codegen active") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val df = ((1 to 60).map(i => (i, Array.fill(24)(rng.nextGaussian().toFloat))) :+
      (61, Array.fill(24)(0.0f))).toDF("id", "v")
    // the retired HOF formulation, inlined here as the parity oracle
    val hofScale = expr("greatest(aggregate(v, 0.0d, (acc, x) -> " +
      "greatest(acc, abs(cast(x as double)))), 0.0d) / 127.0d")
    val rows = df.select(
        VectorFunctions.quantizeInt8(col("v")).as("nq"),
        struct(hofScale.as("scale"),
          when(hofScale === 0.0d, expr("transform(v, x -> 0)"))
            .otherwise(expr("transform(v, x -> cast(floor(cast(x as double) / " +
              "(greatest(aggregate(v, 0.0d, (acc, x) -> greatest(acc, " +
              "abs(cast(x as double)))), 0.0d) / 127.0d) + 0.5d) as int))"))
            .as("codes")).as("hq"))
      .collect()
    rows.foreach { r =>
      val n = r.getStruct(0); val h = r.getStruct(1)
      assert(n.getDouble(0) == h.getDouble(0), "scale mismatch")
      assert(n.getSeq[Int](1) == h.getSeq[Int](1), "codes mismatch")
    }
    // codegen active: the projection stays inside a WholeStageCodegen
    // stage (range source — a LocalRelation would constant-fold away)
    val rdf = spark.range(10).select(
      array((0 to 3).map(i => (col("id") + i).cast("float")): _*).as("v"))
    val q = rdf.select(VectorFunctions.quantizeInt8(col("v")).as("q8"))
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project [quantize_int8"),
      "quantize_int8 must not force a codegen fallback")
    assert(q.count() == 10)
    // null vector -> null struct (documented divergence from the HOF chain)
    val nv = Seq((1, Option.empty[Array[Float]])).toDF("id", "v")
      .select(VectorFunctions.quantizeInt8(col("v"))).collect()
    assert(nv(0).isNullAt(0))
  }

  test("CosineDequantInt8: bit-parity with cosine(u, dequantize(q8)); codegen active") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val df = (1 to 60).map(i => (i,
        Array.fill(24)(rng.nextGaussian().toFloat),
        Array.fill(24)(rng.nextGaussian().toFloat))).toDF("id", "q", "v")
      .withColumn("q8", VectorFunctions.quantizeInt8(col("v")))
    val rows = df.select(
        VectorFunctions.cosineDequantInt8(col("q"), col("q8")).as("fused"),
        VectorFunctions.cosine(col("q"), Similarity.dequantize(col("q8"))).as("chain"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"fused/chain cosine mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}"))
    val rdf = spark.range(10).select(
      array((0 to 3).map(i => (col("id") + i).cast("float")): _*).as("qv"),
      array((0 to 3).map(i => (col("id") * i).cast("float")): _*).as("v"))
    val q = rdf.select(VectorFunctions.cosineDequantInt8(col("qv"),
      VectorFunctions.quantizeInt8(col("v"))).as("c"))
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project [cosine_dequant_int8"),
      "cosine_dequant_int8 must not force a codegen fallback")
    assert(q.count() == 10)
  }
}
