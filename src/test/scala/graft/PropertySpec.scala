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

  private lazy val m = graft.core.DDFManager(spark)
}
