package graft

import graft.operators.Validate
import graft.operators.Validate._
import org.apache.spark.sql.functions._

class ValidateSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), 5.0, "AA"),
    (2L, None, 15.0, "BB"),     // null name, range violation
    (2L, Some("c"), 7.0, "zz"), // dup key, bad code
    (4L, Some("d"), -1.0, "AA") // range violation
  ).toDF("id", "name", "v", "code")

  test("report counts every rule class; row rules share one job") {
    val ref = Seq(1L, 2L).toDF("id")
    val rep = Validate.report(df, Seq(
      notNull("name"),
      inRange("v", 0.0, 10.0),
      matches("code", "^[A-Z]{2}$"),
      oneOf("code", Seq("AA", "BB")),
      UniqueKey(Seq("id")),
      ForeignKey(Seq("id"), ref, Seq("id"))
    )).collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep("not_null(name)") == (1L, 4L))
    assert(rep("in_range(v,0.0,10.0)") == (2L, 4L))
    assert(rep("matches(code)") == (1L, 4L))
    assert(rep("one_of(code)") == (1L, 4L))
    assert(rep("unique(id)") == (2L, 4L), "both copies of a dup key count")
    assert(rep("fk(id)") == (1L, 4L), "id=4 has no reference row")
  }

  test("ForeignKey: NULL key rows are exempt (SQL FK semantics)") {
    import spark.implicits._
    // r14 review: a nullable FK column must not flag its NULLs as
    // orphans — NULL never matches an anti-join, so half the table read
    // as violations; null checks compose via the separate notNull rule
    val facts = Seq((1L, Some(10L)), (2L, Some(99L)), (3L, None), (4L, None))
      .toDF("id", "ref_id")
    val dim = Seq(10L, 20L).toDF("rid")
    val rep = Validate.report(facts,
        Seq(ForeignKey(Seq("ref_id"), dim, Seq("rid"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("fk(ref_id)") == 1L, s"only id=2 (99) is an orphan: $rep")
  }

  test("flag appends the failing rule names row-wise, clean rows get []") {
    val flagged = Validate.flag(df, Seq(notNull("name"), inRange("v", 0.0, 10.0)))
      .orderBy("id", "code").collect()
    assert(flagged(0).getSeq[String](4).isEmpty)
    assert(flagged(1).getSeq[String](4).toSet ==
      Set("not_null(name)", "in_range(v,0.0,10.0)"))
    // quarantine routing: rows 2 (null name + range) and 4 (range) only —
    // row 3's violations are code rules, not these two
    val dirty = Validate.flag(df, Seq(notNull("name"), inRange("v", 0.0, 10.0)))
      .filter(size(col("failed_rules")) > 0).count()
    assert(dirty == 2)
  }

  test("empty frame: zero checked, zero violations, no crash") {
    val empty = df.filter(lit(false))
    val rep = Validate.report(empty, Seq(notNull("name"), UniqueKey(Seq("id"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep.values.forall(_ == 0L))
  }

  test("vector rules: dim drift, NaN/Inf, zero and NULL vectors") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f)),                       // clean
      (2L, Array(1.0f, 2.0f, 3.0f)),                 // wrong dim
      (3L, Array(Float.NaN, 1.0f)),                  // NaN
      (4L, Array(Float.NegativeInfinity, 1.0f)),     // -Inf (abs catches)
      (5L, Array(0.0f, -0.0f)),                      // all-zero (±0)
      (6L, null.asInstanceOf[Array[Float]])          // NULL violates all
    ).toDF("id", "v")
    val rep = Validate.report(vecs, Seq(
      Validate.vectorDim("v", 2), Validate.vectorFinite("v"),
      Validate.vectorNonZero("v")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("vector_dim(v,2)") == 2, s"dim: $rep")        // rows 2, 6
    assert(rep("vector_finite(v)") == 3, s"finite: $rep")    // rows 3, 4, 6
    assert(rep("vector_nonzero(v)") == 2, s"nonzero: $rep")  // rows 5, 6
    // flag routes the dirty rows without a shuffle
    val flagged = Validate.flag(vecs, Seq(Validate.vectorFinite("v")))
      .filter(size(col("failed_rules")) > 0)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(3L, 4L, 6L))
    // NULL ELEMENTS violate: a bare exists() returns NULL under 3VL and
    // report() would count the vector clean while every downstream dot
    // product on it returns NULL (r14 review)
    val withNullElems = Seq(
      (1L, Array[java.lang.Float](null, 1.0f)),  // null elem, has nonzero
      (2L, Array[java.lang.Float](null, 0.0f))   // null elem, no definite nonzero
    ).toDF("id", "v")
    val rep2 = Validate.report(withNullElems, Seq(
      Validate.vectorFinite("v"), Validate.vectorNonZero("v")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep2("vector_finite(v)") == 2, s"null elements must fail finite: $rep2")
    assert(rep2("vector_nonzero(v)") == 1, s"no-definite-nonzero must fail: $rep2")
  }
}
