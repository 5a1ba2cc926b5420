package graft

import graft.pipeline.{Dedup, TextAnalysis}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Native text expressions must be DROP-IN equivalents of the HOF
  * formulations they replace — byte-identical arrays, order included —
  * because the DuckDB oracles replicate the HOF semantics.
  */
class TextExprSpec extends SparkTestBase {

  // test the PRODUCTION entry points (Dedup.shingleExpr / TextAnalysis
  // .ngramCol), not re-built wrappers — a wiring bug must fail here too
  private def shinglesNative(c: Column, n: Int): Column =
    Dedup.shingleExpr(c.toString, n)
  private def ngramsNative(c: Column, n: Int): Column =
    TextAnalysis.ngramCol(c, n)

  private val nasty = Seq(
    "the quick brown fox jumps over the lazy dog",
    "repeat repeat repeat repeat repeat",
    "  leading and   trailing   whitespace  ",
    "tabs\tand\nnewlines\r\nmixed   in",
    "MiXeD CaSe ÄÖÜ unicode éàç tokens",
    "single",
    "two words",
    "",
    "   ",
    "a b a b a b",
    "punct, kept. as-is! within? tokens;")

  test("WordShingles == shingleExpr (HOF) on nasty strings, n in 1..5, and NULL") {
    import spark.implicits._
    val df = (nasty.map(Option(_)) :+ Option.empty[String]).toDF("t")
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = df.select(
          Dedup.shingleExprHof("t", n).as("hof"),
          shinglesNative(col("t"), n).as("nat"))
        .collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        val hof = if (r.isNullAt(0)) null else r.getSeq[String](0)
        val nat = if (r.isNullAt(1)) null else r.getSeq[String](1)
        assert(hof == nat, s"n=$n row $i: HOF=$hof native=$nat")
      }
    }
  }

  test("TokenNgrams == ngramsOf (HOF) including duplicates, order, short docs") {
    import spark.implicits._
    val df = nasty.toDF("t")
      .withColumn("__toks", expr(TextAnalysis.tokensExpr("t")))
    for (n <- Seq(2, 3)) {
      val rows = df.select(
          expr(TextAnalysis.ngramsOf("__toks", n)).as("hof"),
          ngramsNative(col("__toks"), n).as("nat"))
        .collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n row $i: HOF=${r.getSeq[String](0)} native=${r.getSeq[String](1)}")
      }
    }
  }

  test("TokenNgrams skips windows containing a NULL element (concat null-propagation)") {
    import spark.implicits._
    val df = Seq(1).toDF("i").select(
      array(lit("a"), lit(null).cast("string"), lit("b"), lit("c")).as("toks"))
    for (n <- Seq(2, 3)) {
      val r = df.select(
        expr(TextAnalysis.ngramsOf("toks", n)).as("hof"),
        ngramsNative(col("toks"), n).as("nat")).collect().head
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"n=$n: HOF=${r.getSeq[String](0)} native=${r.getSeq[String](1)}")
    }
    // the surviving windows are exactly the null-free ones
    val got = df.select(ngramsNative(col("toks"), 2)).collect().head.getSeq[String](0)
    assert(got == Seq("b c"))
  }

  test("PolyHash == portableFold HOF on nasty strings including unicode and NULL") {
    import spark.implicits._
    val df = (nasty.map(Option(_)) :+ Some("😀 surrogate pair") :+ Option.empty[String]).toDF("t")
    for ((m, p) <- Seq((31L, 1000000007L), (131L, 998244353L))) {
      val rows = df.select(
          Dedup.portableFoldHof(col("t"), m, p).as("hof"),
          Dedup.portableFold(col("t"), m, p).as("nat"))
        .collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        val hof = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
        val nat = if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))
        assert(hof == nat, s"mult=$m row $i: HOF=$hof native=$nat")
      }
    }
  }

  test("word_shingles / token_ngrams are SQL-registrable") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    Seq("a b c d").toDF("t").createOrReplaceTempView("textexpr_t")
    val r = spark.sql(
      """SELECT word_shingles(t, 3) AS sh,
        |  token_ngrams(split(t, ' '), 2) AS ng FROM textexpr_t""".stripMargin).collect().head
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getSeq[String](1) == Seq("a b", "b c", "c d"))
  }

  test("StopwordLangId == langIdOf (HOF) on nasty strings, real-language text, and NULL") {
    import spark.implicits._
    val langy = Seq(
      "the cat sat of the mat and it is a that",   // en-heavy
      "le chat est sur la table et les des une",   // fr-heavy
      "der hund und die katze das ist ein von",    // de-heavy
      "el perro y la casa los las un una es",      // es-heavy
      "la de un es le et the and",                 // cross-language ties
      "no function words here whatsoever xyzzy",   // und (below minScore)
      "zz yy xx")                                  // und (zero hits)
    val df = ((nasty ++ langy).map(Option(_)) :+ Option.empty[String]).toDF("t")
      .withColumn("toks", expr(TextAnalysis.tokensExpr("t")))
    for (minScore <- Seq(0.02, 0.2, 0.0)) {
      val rows = df.select(
          TextAnalysis.langIdOf("toks", minScore).as("hof"),
          TextAnalysis.langIdCol(col("toks"), minScore).as("nat"))
        .collect()
      rows.foreach { r => assert(r.get(0) == r.get(1), s"minScore=$minScore: $r") }
    }
    // NULL tokens array → 'und' on both paths (the HOF folds the NULL
    // score through when(...); the native path coalesces)
    val nullToks = Seq(1).toDF("i").select(lit(null).cast("array<string>").as("toks"))
    assert(nullToks.select(TextAnalysis.langIdCol(col("toks"))).collect().head.getString(0) == "und")
  }

  test("TopNgramCount == max multiplicity over ngramsOf, incl. NULL windows and short docs") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val cases: Seq[Seq[String]] = Seq(
      Seq("a", "b", "a", "b", "a", "b"),          // "a b" ×3, "b a" ×2
      Seq("x"),                                    // shorter than n → 0
      Seq(),                                       // empty → 0
      Seq("r", "r", "r", "r"),                     // "r r" ×3
      Seq("u", "v", "w"),                          // all distinct → 1
      Seq("a", null, "a", "a"),                    // null window skipped: "a a" ×1
      nasty.flatMap(s => Option(s)).flatMap(_.split("\\s+")).filter(_.nonEmpty))
    val df = cases.map(Tuple1(_)).toDF("toks")
    val got = df.selectExpr("top_ngram_count(toks, 2) AS c").collect().map(_.getLong(0)).toSeq
    // reference: count string bigrams over the same null-skipping windows
    val want = cases.map { toks =>
      val grams = toks.sliding(2).filter(w => w.size == 2 && !w.contains(null))
        .map(_.mkString(" ")).toSeq
      if (grams.isEmpty) 0L else grams.groupBy(identity).values.map(_.size.toLong).max
    }
    assert(got == want, s"got $got want $want")
    // NULL array → NULL out
    assert(df.limit(1).select(lit(null).cast("array<string>").as("t"))
      .selectExpr("top_ngram_count(t, 2)").collect().head.isNullAt(0))
  }

  test("MinHashAffine == explode+partial-agg minima, both hash families") {
    import spark.implicits._
    val docs = nasty.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (portable <- Seq(true, false); k <- Seq(8, 32)) {
      val sh = Dedup.shingled(docs, "text", "doc_id")
      val native = (if (portable) Dedup.minhashSignaturesPortable(sh, k)
                    else Dedup.minhashSignaturesFromShingles(sh, k))
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val agg = Dedup.minhashSignaturesAgg(sh, k, portable)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(native == agg, s"portable=$portable k=$k: native != aggregate minima")
      assert(native.nonEmpty)
    }
    // a caller-supplied shingle frame with NULL elements: both paths
    // must skip them identically (the null is NOT hashed as seed)
    val withNulls = Seq((1L, Seq("a b c", null, "b c d")), (2L, Seq[String](null, null)))
      .toDF("id", "sh")
    val n1 = Dedup.minhashSignaturesFromShingles(withNulls, 8)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val a1 = Dedup.minhashSignaturesAgg(withNulls, 8, portable = false)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(n1 == a1, "null shingle elements must be skipped by BOTH paths")
    assert(n1.keySet == Set(1L), "an all-null shingle array yields no signature")
    val clean = Dedup.minhashSignaturesFromShingles(
      Seq((1L, Seq("a b c", "b c d"))).toDF("id", "sh"), 8)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(n1 == clean, "nulls must not perturb the surviving elements' minima")
  }

  test("MinHashAffine: one signature evaluation per row (projection boundary holds)") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, s"alpha beta gamma delta tok$i end"))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignaturesFromShingles(
      Dedup.shingled(docs, "text", "doc_id"), k = 32)
    // the plan must contain exactly ONE minhash_affine call — k GetArrayItem
    // references over a collapsed projection would show 32 of them
    val plan = sig.queryExecution.optimizedPlan.toString
    val calls = "minhash_affine".r.findAllIn(plan).length
    assert(calls == 1, s"expected 1 minhash_affine in the plan, got $calls:\n$plan")
  }

  test("UnicodeNormalize: four forms, combining sequences, NULL, idempotence, codegen") {
    import spark.implicits._
    import graft.functions.VectorFunctions.unicodeNormalize
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val decomposed = "cafe\u0301 A\u030A"   // e + combining acute, A + combining ring
    val precomposed = "caf\u00e9 \u00c5"      // precomposed \u00e9, \u00c5
    val compat = "\uFB01le \uFF12\uFF10"     // fi ligature, full-width 2 0
    val df = Seq(Option(decomposed), Option(compat), Option("plain ascii"),
      Option.empty[String]).toDF("t")
    val out = df.select(
        unicodeNormalize(col("t")).as("nfc"),
        unicodeNormalize(col("t"), "NFD").as("nfd"),
        unicodeNormalize(col("t"), "NFKC").as("nfkc"),
        unicodeNormalize(col("t"), "NFKD").as("nfkd"))
      .collect()
    assert(out(0).getString(0) == precomposed)            // NFC composes
    assert(out(0).getString(1) == decomposed)             // NFD decomposes
    assert(out(0).getString(2) == precomposed)            // NFKC ⊇ NFC here
    // NFC leaves compatibility chars alone; NFKC folds them
    assert(out(1).getString(0) == compat)
    assert(out(1).getString(2) == "file 20")
    assert(out(2).getString(0) == "plain ascii")          // fast path
    assert(out(3).isNullAt(0))                            // NULL propagates
    // idempotence: normalize twice == once
    val twice = df.select(
      unicodeNormalize(unicodeNormalize(col("t"))).as("a"),
      unicodeNormalize(col("t")).as("b")).collect()
    twice.foreach(r => assert(r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getString(0) == r.getString(1))))
    // the dedup-key motivation: NFC makes the visually-identical pair
    // hash-equal
    assert(spark.sql(
      s"select unicode_normalize('$decomposed') = unicode_normalize('$precomposed')")
      .first().getBoolean(0))
    // SQL registration: 1-arg defaults to NFC, 2-arg takes a form
    assert(spark.sql(s"select unicode_normalize('$decomposed', 'NFKD')")
      .first().getString(0) == "café Å")
    intercept[IllegalArgumentException] {
      graft.functions.UnicodeNormalize(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("t")), "NFX")
    }
    // r13 ADVICE: a 0-arg call fails with the arity message, not a raw
    // IndexOutOfBoundsException from exprs(0)
    val zeroArg = intercept[Exception](spark.sql("select unicode_normalize()").collect())
    assert(zeroArg.getMessage.contains("unicode_normalize expects"), zeroArg.getMessage)
    // and a 3-arg call hits the same guard
    val threeArg = intercept[Exception](
      spark.sql("select unicode_normalize('a', 'NFC', 'x')").collect())
    assert(threeArg.getMessage.contains("unicode_normalize expects"), threeArg.getMessage)
    // stays inside whole-stage codegen (range() defeats constant folding)
    val plan = spark.range(20)
      .select(unicodeNormalize(concat(lit("x\u0301"), col("id"))).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("unicode_normalize") && l.contains("*(")), plan)
  }

  test("native shingles stay inside whole-stage codegen") {
    // a local relation would constant-fold the projection away, so build
    // text from range() to force a real executed stage
    val df = spark.range(50)
      .select(concat(lit("tok"), col("id"), lit(" tok"), col("id") + 1,
        lit(" tok"), col("id") + 2, lit(" tok"), col("id") + 3).as("t"))
      .select(shinglesNative(col("t"), 3).as("sh"))
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators inside a WholeStageCodegen stage;
    // the shingling Project must carry one (a CodegenFallback expression
    // would strip it from its operator)
    assert(plan.linesIterator.exists(l => l.contains("word_shingles") && l.contains("*(")),
      s"shingling Project not inside a codegen stage:\n$plan")
    assert(df.filter(size(col("sh")) === 2).count() == 50)
  }

  test("char_entropy: hand values, code points, empty/null, SQL + codegen") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rows = Seq(
      (1L, "aaaa"),          // one symbol → 0 bits
      (2L, "aabb"),          // two equiprobable → 1 bit
      (3L, "abcd"),          // four equiprobable → 2 bits
      (4L, ""),              // empty → 0.0 by contract
      (5L, "😀😀aa"), // 😀😀aa: pair counts ONCE → 1 bit
      (6L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val out = rows.selectExpr("id", "char_entropy(t) AS h")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(out(1L) == 0.0 && out(4L) == 0.0)
    assert(math.abs(out(2L) - 1.0) < 1e-12 && math.abs(out(3L) - 2.0) < 1e-12)
    assert(math.abs(out(5L) - 1.0) < 1e-12, "surrogate pair = one code point")
    assert(out(6L).isNaN, "null propagates")
    // codegen active on a range frame
    val big = spark.range(100).selectExpr(
      "char_entropy(concat('x', cast(id as string))) AS h")
    val plan = big.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("char_entropy") && l.contains("*(")),
      s"char_entropy not inside a codegen stage:\n$plan")
    assert(big.filter(col("h") > 0).count() == 100)
    // wrong arity fails with the signature, not an index error
    val err = intercept[Exception](spark.sql("SELECT char_entropy()").collect())
    assert(err.getMessage.contains("char_entropy"), err.getMessage)
  }

  test("sortedStructSum ≡ aggregate(sort_array(...)) on every key type (r17 opt)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // adversarial lists: duplicate keys with different values (tie order
    // matters for float addition), null keys (sort first), negative and
    // denormal-ish values whose sum order is observable, empty handled
    // via the groupBy never emitting one (checked separately below)
    val rows = Seq(
      (1L, "b", 0.1), (1L, "a", 0.7), (1L, "a", -0.3), (1L, "c", 1e-17),
      (1L, "c", 1.0), (2L, "z", 2.5), (3L, "k", -0.0), (3L, "k", 0.0)
    ).toDF("id", "k", "v")
    def hof(df: org.apache.spark.sql.DataFrame, key: Column, v: Column) = df
      .groupBy("id")
      .agg(aggregate(
        sort_array(collect_list(struct(key.as("k"), v.as("v")))),
        lit(0.0), (acc, x) => acc + x.getField("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def native(df: org.apache.spark.sql.DataFrame, key: Column, v: Column) = df
      .groupBy("id")
      .agg(graft.functions.VectorFunctions.orderedStructSum(
        collect_list(struct(key.as("k"), v.as("v")))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // string key
    assert(native(rows, col("k"), col("v")) == hof(rows, col("k"), col("v")))
    // int key (hash spreads the rows; exercises numeric ordering)
    val ik = pmod(xxhash64(col("k")), lit(7)).cast("int")
    assert(native(rows, ik, col("v")) == hof(rows, ik, col("v")))
    // long key
    val lk = xxhash64(col("k"), col("v"))
    assert(native(rows, lk, col("v")) == hof(rows, lk, col("v")))
    // null key sorts first; null value poisons the fold to NULL
    val withNullKey = Seq((1L, Option("a"), 0.5), (1L, None, 0.25))
      .toDF("id", "k", "v")
    assert(native(withNullKey, col("k"), col("v"))
      == hof(withNullKey, col("k"), col("v")))
    val withNullVal = Seq((1L, "a", Option(0.5)), (1L, "b", Option.empty[Double]))
      .toDF("id", "k", "v")
    val nv = withNullVal.groupBy("id")
      .agg(graft.functions.VectorFunctions.orderedStructSum(
        collect_list(struct(col("k"), col("v")))).as("s"))
      .collect()
    assert(nv.length == 1 && nv(0).isNullAt(1), "null value must poison the fold")
    // empty array returns the fold's 0.0 zero element
    val empty = spark.sql(
      "SELECT cast(array() AS array<struct<k: string, v: double>>) AS a")
      .select(graft.functions.VectorFunctions.orderedStructSum(col("a")).as("s"))
      .collect()
    assert(empty(0).getDouble(0) == 0.0)
    // codegen active (not CodegenFallback like the HOF chain it replaces)
    val big = spark.range(50)
      .selectExpr("id % 5 AS g", "cast(id AS int) AS k", "cast(id AS double) / 7 AS v")
      .groupBy("g")
      .agg(graft.functions.VectorFunctions.orderedStructSum(
        collect_list(struct(col("k"), col("v")))).as("s"))
    assert(big.collect().length == 5)
  }

  test("bucketTfPairs ≡ explode(concat(toks, bigrams)) → fold → count (r17 opt)") {
    import spark.implicits._
    val texts = (nasty :+ null.asInstanceOf[String]).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    for (buckets <- Seq(7, 4096)) {
      val toks = expr(TextAnalysis.tokensExpr("t"))
      // reference: the pre-r17 exploded shape
      val ref = texts.select(col("id"),
          explode(concat(toks, TextAnalysis.ngramCol(toks, 2))).as("f"))
        .select(col("id"),
          pmod(Dedup.portableFold(col("f")), lit(buckets.toLong)).cast("int").as("b"))
        .groupBy("id", "b").agg(count(lit(1)).as("tf"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val got = texts.select(col("id"),
          explode(graft.functions.VectorFunctions.bucketTfPairs(toks, buckets)).as("p"))
        .select(col("id"), col("p.bucket").as("b"), col("p.tf").as("tf"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(got == ref, s"buckets=$buckets")
    }
    // pairs arrive bucket-ascending (the weight fold's order contract)
    val pairs = texts.filter(col("t").isNotNull).select(
      graft.functions.VectorFunctions.bucketTfPairs(
        expr(TextAnalysis.tokensExpr("t")), 16).as("p")).collect()
    pairs.foreach { r =>
      val bs = r.getSeq[org.apache.spark.sql.Row](0).map(_.getInt(0))
      assert(bs == bs.sorted && bs.distinct == bs, s"unsorted/dup buckets: $bs")
    }
  }

  test("intersectSize ≡ size(array_intersect) incl. dups and NULL elements (r17 opt)") {
    import spark.implicits._
    val cases = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "b", "b")),        // dups on both sides
      (Seq[String](), Seq("x")),
      (Seq("x"), Seq[String]()),
      (Seq("only"), Seq("only")),
      (nasty.filter(_ != null), nasty.reverse.filter(_ != null)))
    val df = cases.map { case (a, b) => (a, b) }.toDF("a", "b")
    val rows = df.select(
        size(array_intersect(col("a"), col("b"))).as("ref"),
        graft.functions.VectorFunctions.intersectSize(col("a"), col("b")).as("got"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // NULL element counts as one shared value (array_intersect semantics)
    val withNulls = Seq(1).toDF("i").select(
      array(lit("a"), lit(null).cast("string"), lit(null).cast("string")).as("a"),
      array(lit(null).cast("string"), lit("b")).as("b"))
    val r = withNulls.select(
      size(array_intersect(col("a"), col("b"))).as("ref"),
      graft.functions.VectorFunctions.intersectSize(col("a"), col("b")).as("got"))
      .collect().head
    assert(r.getInt(0) == r.getInt(1), r.toString)
    // NULL array propagates
    val nr = Seq(1).toDF("i").select(graft.functions.VectorFunctions.intersectSize(
      lit(null).cast("array<string>"), array(lit("a"))).as("g")).collect().head
    assert(nr.isNullAt(0))
  }

  test("tokenTfPairs ≡ explode → groupBy(id, token).count (r17 opt)") {
    import spark.implicits._
    val texts = (nasty :+ null.asInstanceOf[String]).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val toks = expr(TextAnalysis.tokensExpr("t"))
    val ref = texts.select(col("id"), explode(toks).as("token"))
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = texts.select(col("id"),
        explode(graft.functions.VectorFunctions.tokenTfPairs(toks)).as("p"))
      .select(col("id"), col("p.token"), col("p.tf"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == ref)
    // NULL elements fold into one trailing (NULL, count) pair
    val withNulls = Seq(1L).toDF("id").select(col("id"),
      array(lit("a"), lit(null).cast("string"), lit("a"), lit(null).cast("string")).as("toks"))
    val rows = withNulls.select(
        explode(graft.functions.VectorFunctions.tokenTfPairs(col("toks"))).as("p"))
      .select(col("p.token"), col("p.tf")).collect()
    assert(rows.map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1)).toMap
      == Map("a" -> 2L, (null: String) -> 2L))
  }
}
