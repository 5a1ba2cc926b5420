package graft

import graft.operators.{Joins, Views}
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style specs: scalacheck generators with fixed seeds (each
  * sample is a Spark job, so we draw a handful of deterministic samples
  * instead of the default 100).
  */
class PropertySpec extends SparkTestBase {

  private val params = Gen.Parameters.default
  private def draw[T](g: Gen[T], seed: Long): T = g.pureApply(params, Seed(seed))

  test("property: portableHash60 stays in [0, 2^60) on arbitrary strings") {
    import spark.implicits._
    val strGen = Gen.listOfN(40, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', 'ä', 'é', '!', '.')))
      .map(_.mkString)
    val samples = (1L to 6L).map(i => draw(strGen, i)) ++ Seq("", " ", "a")
    val hs = samples.toDF("t")
      .select(Dedup.portableHash60(col("t")).as("h"))
      .collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0L && (h >>> 60) == 0L))
    // determinism: a second evaluation gives identical hashes
    val hs2 = samples.toDF("t")
      .select(Dedup.portableHash60(col("t")).as("h")).collect().map(_.getLong(0))
    assert(hs.sameElements(hs2))
  }

  test("property: saltedJoin ≡ plain join on random frames and salt factors") {
    import spark.implicits._
    val rowsGen = Gen.listOfN(120, Gen.zip(Gen.chooseNum(-5L, 20L), Gen.alphaStr.map(_.take(4))))
    for (seed <- 1L to 3L) {
      val left = draw(rowsGen, seed).toDF("k", "lv")
      val right = draw(rowsGen, seed + 100).distinct.toDF("k", "rv")
      val factor = draw(Gen.chooseNum(1, 9), seed + 200)
      for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
        val plain = left.join(right.dropDuplicates("k"), Seq("k"), jt)
          .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
        val salted = Joins.saltedJoin(left, right.dropDuplicates("k"), Seq("k"), factor, jt)
          .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
        assert(salted == plain, s"seed=$seed factor=$factor type=$jt")
      }
    }
  }

  test("property: hashSample is monotone in rate, including negative keys") {
    import spark.implicits._
    val keyGen = Gen.listOfN(300, Gen.chooseNum(-100000L, 100000L))
    for (seed <- 1L to 3L) {
      val ddf = m.register(draw(keyGen, seed).toDF("k"))
      val r1 = draw(Gen.chooseNum(0, 500), seed + 10)
      val r2 = draw(Gen.chooseNum(500, 1000), seed + 20)
      val s1 = Views.hashSample(ddf, "k", r1).df.collect().map(_.getLong(0)).toSet
      val s2 = Views.hashSample(ddf, "k", r2).df.collect().map(_.getLong(0)).toSet
      assert(s1.subsetOf(s2), s"seed=$seed rates $r1 <= $r2")
      assert(Views.hashSample(ddf, "k", 1000).df.count() == ddf.df.count(),
        "rate 1000 keeps everything")
    }
  }

  test("property: chunkByTokens covers every token; reassembly round-trips") {
    import spark.implicits._
    val docGen = Gen.chooseNum(0, 60).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(1, 30)).map(_.map(i => s"w$i").mkString(" ")))
    for (seed <- 1L to 4L) {
      val texts = (0 until 12).map(i => (i.toLong, draw(docGen, seed * 31 + i)))
      val df = texts.toDF("doc_id", "text")
      val maxT = draw(Gen.chooseNum(2, 12), seed + 50)
      val ov = draw(Gen.chooseNum(0, maxT - 1), seed + 60)
      val step = maxT - ov
      val out = graft.pipeline.TextAnalysis.chunkByTokens(df, "text", "doc_id", maxT, ov)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("chunk_id"),
          r.getAs[String]("chunk"))).groupBy(_._1)
      texts.foreach { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
        val chunks = out.getOrElse(id, Array.empty).sortBy(_._2).map(_._3.split(" ").toSeq)
        if (toks.isEmpty) assert(chunks.isEmpty, s"seed=$seed id=$id")
        else {
          // expected chunk count and full reassembly (drop each successor's
          // overlap prefix) — tail chunks may be shorter than maxT but the
          // union must be exactly the token stream
          val expN = math.ceil(math.max(toks.size - ov, 1).toDouble / step).toInt
          assert(chunks.length == expN, s"seed=$seed id=$id maxT=$maxT ov=$ov")
          val rebuilt = chunks.zipWithIndex.flatMap { case (c, i) =>
            if (i == 0) c else c.drop(ov) }.toSeq
          assert(rebuilt == toks, s"seed=$seed id=$id maxT=$maxT ov=$ov")
        }
      }
    }
  }

  test("property: spanDedup on an all-unique corpus reassembles every doc verbatim") {
    import spark.implicits._
    // tokens are globally unique across docs -> no span collides, so
    // dedup must be the identity (normalized text) for every width
    val docs = (1L to 8L).map(i =>
      (i, (1 to draw(Gen.choose(1, 17), i).toInt).map(j => s"w${i}_$j").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    for (w <- Seq(1, 3, 6)) {
      val out = Dedup.spanDedup(df, "text", "doc_id", w)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("text")).toMap
      docs.foreach { case (id, text) =>
        assert(out(id) == text, s"w=$w doc $id must round-trip")
      }
    }
  }

  test("property: packChunks respects the budget except lone oversize chunks") {
    import spark.implicits._
    val sizeGen = Gen.listOfN(80, Gen.chooseNum(1L, 30L))
    for (seed <- 1L to 3L) {
      val sizes = draw(sizeGen, seed)
      val chunks = sizes.zipWithIndex.map { case (n, i) => (i.toLong % 7, i.toLong, n) }
        .toDF("id", "chunk_id", "n_tokens")
      val budget = draw(Gen.chooseNum(10L, 40L), seed + 10)
      val packed = graft.pipeline.TextAnalysis.packChunks(chunks, budget, nBuckets = 4)
        .collect().map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("n_tokens")))
      val byBin = packed.groupBy(_._1).map { case (_, g) => (g.map(_._2).sum, g.length) }
      assert(byBin.forall { case (tot, cnt) => tot <= budget || cnt == 1 },
        s"seed=$seed budget=$budget")
      // every chunk survives packing exactly once
      assert(packed.length == sizes.length)
    }
  }

  private lazy val m = graft.core.DDFManager(spark)
}
