package graft

import graft.core.DDFManager
import java.nio.file.{Files, Paths}

/** Core DDF/DDFManager/dialect behavior (SURVEY §1, §3.1). */
class CoreSpec extends SparkTestBase {

  private def freshManager = DDFManager(spark)

  test("create table registers an empty schema-only DDF") {
    val m = freshManager
    val ddf = m.sql2ddf("CREATE TABLE t1 (a int, b string, c double, d bigint)")
    assert(ddf.name == "t1")
    assert(ddf.numRows == 0)
    assert(ddf.schema.fields.map(_.dataType.simpleString).toSeq ==
      Seq("int", "string", "double", "bigint"))
    assert(m.listDDFs().contains("t1"))
  }

  test("LOAD csv into declared table with defaults and NO DEFAULTS") {
    val dir = Files.createDirectories(Paths.get("target/test-fixtures"))
    val csv = dir.resolve("load1.csv")
    Files.writeString(csv, "1,x,2.5\nNA,y,NA\n3,,1.0\n")
    val m = freshManager
    m.sql2ddf("create table lt (a int, b string, c double)")
    val loaded = m.sql2ddf(s"load '${csv.toAbsolutePath}' into lt")
    assert(loaded.numRows == 3)
    // defaults mode: unparseable/NA numeric → 0
    val rows = loaded.df.orderBy("b").collect()
    assert(rows.map(_.getInt(0)).toSeq.contains(0))
    val m2 = freshManager
    m2.sql2ddf("create table lt2 (a int, b string, c double)")
    val loaded2 = m2.sql2ddf(s"load '${csv.toAbsolutePath}' no defaults into lt2")
    assert(loaded2.df.filter("a is null").count() == 1)
  }

  test("select with @this substitution") {
    val m = freshManager
    import spark.implicits._
    val ddf = m.register(Seq((1, "a"), (2, "b"), (3, "a")).toDF("k", "v"))
    val out = m.sql2ddf("select v, count(*) as n from @this group by v", ddf)
    assert(out.df.collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("a" -> 2L, "b" -> 1L))
  }

  test("sql returns tab-joined strings (SqlResult)") {
    val m = freshManager
    import spark.implicits._
    m.register(Seq((1, "x")).toDF("a", "b"), "sq1")
    val res = m.sql("select a, b from sq1")
    assert(res.rows == Seq("1\tx"))
  }

  test("copy preserves data and factor metadata") {
    val m = freshManager
    import spark.implicits._
    val ddf = m.register(Seq(("a", 1), ("b", 2), ("a", 3)).toDF("f", "x"))
    ddf.setAsFactor("f")
    val c = ddf.copy()
    assert(c.name != ddf.name)
    assert(c.numRows == 3)
    assert(c.factorInfo("f").get.counts == Map("a" -> 2L, "b" -> 1L))
  }

  test("setName re-registers; mutability updates in place") {
    val m = freshManager
    import spark.implicits._
    val ddf = m.register(Seq((1, 2)).toDF("a", "b"))
    ddf.setName("renamed_1")
    assert(m.getDDFByName("renamed_1").eq(ddf))
    ddf.isMutable = true
    val out = graft.operators.Views.removeColumns(ddf, Seq("b"))
    assert(out.eq(ddf) && ddf.columnNames == Seq("a"))
  }

  test("persist/unpersist round-trip") {
    val m = freshManager
    import spark.implicits._
    val ddf = m.register(Seq((1, "x"), (2, "y")).toDF("a", "b"))
    val path = m.persist(ddf, "target/test-fixtures/persist")
    val back = m.unpersist(path, "restored_1")
    assert(back.numRows == 2)
  }

  test("persist catalog: listNamespaces / listPersisted mirror the layout") {
    val m = freshManager
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_catalog").toString
    // nothing persisted yet → both listings empty, no error
    assert(m.listNamespaces(root).isEmpty)
    assert(m.listPersisted(root, "nope").isEmpty)
    val a = m.register(Seq((1, "x")).toDF("a", "b"), "item_a")
    val b = m.register(Seq((2, "y")).toDF("a", "b"), "item_b")
    m.persist(a, root) // default namespace
    m.persist(b, root, namespace = "training")
    m.persist(a, root, namespace = "training")
    assert(m.listNamespaces(root) == Seq("default", "training"))
    assert(m.listPersisted(root) == Seq("item_a"))
    assert(m.listPersisted(root, "training") == Seq("item_a", "item_b"))
    // listed path round-trips through unpersist
    val back = m.unpersist(s"$root/training/item_b", "restored_cat")
    assert(back.numRows == 1)
  }

  test("loadJson reads JSONL with inferred and declared schemas") {
    val dir = Files.createDirectories(Paths.get("target/test-fixtures"))
    val jsonl = dir.resolve("docs.jsonl")
    Files.writeString(jsonl,
      """{"doc_id": 1, "text": "alpha beta", "lang": "en"}
        |{"doc_id": 2, "text": "gamma", "lang": "fr"}
        |""".stripMargin)
    val m = freshManager
    val ddf = m.loadJson(jsonl.toAbsolutePath.toString, "jdocs")
    assert(ddf.numRows == 2 && ddf.columnNames.toSet == Set("doc_id", "text", "lang"))
    val declared = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("text", org.apache.spark.sql.types.StringType)
    val d2 = m.loadJson(jsonl.toAbsolutePath.toString, "jdocs2", declared)
    assert(d2.columnNames == Seq("doc_id", "text")) // declared schema prunes
    assert(m.sql("select text from @this where doc_id = 2", d2).rows == Seq("gamma"))
  }

  test("loadFile infers schema and names columns V1..Vn") {
    val dir = Files.createDirectories(Paths.get("target/test-fixtures"))
    val csv = dir.resolve("infer1.csv")
    Files.writeString(csv, "1,a,2.5,true\n2,b,3.5,false\n3,c,1.0,true\n")
    val m = freshManager
    val ddf = m.loadFile(csv.toAbsolutePath.toString)
    assert(ddf.columnNames == Seq("V1", "V2", "V3", "V4"))
    assert(ddf.schema("V1").dataType.simpleString == "int")
    assert(ddf.schema("V3").dataType.simpleString == "double")
    assert(ddf.schema("V4").dataType.simpleString == "boolean")
  }

  test("loadFile 5-row sample inference matches the reference vote (Utils.java:97-150)") {
    val dir = Files.createDirectories(Paths.get("target/test-fixtures"))
    val csv = dir.resolve("infer5.csv")
    // V1 integral for the first 5 rows, fractional at row 6: full-scan
    // inference says double; the reference's 5-row vote says int.
    // V2: T/F logicals (Spark CSV alone can't parse these as boolean).
    // V3: all NA in the sample → string.
    Files.writeString(csv,
      "1,T,NA\n2,F,NA\n3,T,NA\n4,F,NA\n5,T,NA\n6.5,T,x\n")
    val m = freshManager
    val five = m.loadFile(csv.toAbsolutePath.toString, sampleInference = true)
    assert(five.schema("V1").dataType.simpleString == "int")
    assert(five.schema("V2").dataType.simpleString == "boolean")
    assert(five.schema("V3").dataType.simpleString == "string")
    // row 6's 6.5 fails the int cast → null; the T/F cells survive
    assert(five.df.filter("V1 IS NULL").count() == 1)
    assert(five.df.filter("V2 = true").count() == 4)
    val full = m.loadFile(csv.toAbsolutePath.toString)
    assert(full.schema("V1").dataType.simpleString == "double")
  }

  test("setName drops the stale view: SQL on the old name fails, new name works") {
    val m = freshManager
    import spark.implicits._
    val ddf = m.register(Seq((1, 2)).toDF("a", "b"), "pre_rename_x")
    assert(spark.sql("SELECT * FROM pre_rename_x").count() == 1)
    ddf.setName("post_rename_x")
    assert(spark.sql("SELECT * FROM post_rename_x").count() == 1)
    // the old name must be GONE — a query against it must not silently
    // read the pre-rename frame
    intercept[Exception] { spark.sql("SELECT * FROM pre_rename_x").count() }
    assert(!m.listDDFs().contains("pre_rename_x"))
  }

  test("5-row inference with a regex-metachar separator ('|') splits per cell") {
    val dir = Files.createDirectories(Paths.get("target/test-fixtures"))
    val csv = dir.resolve("infer_pipe.csv")
    // String.split takes a REGEX: an unquoted "|" matches the empty string
    // and explodes every row into single characters
    Files.writeString(csv, "1|a|2.5\n2|b|3.5\n3|c|1.0\n4|d|9.0\n5|e|0.5\n")
    val m = freshManager
    val ddf = m.loadFile(csv.toAbsolutePath.toString, sep = "|", sampleInference = true)
    assert(ddf.columnNames == Seq("V1", "V2", "V3"))
    assert(ddf.schema("V1").dataType.simpleString == "int")
    assert(ddf.schema("V3").dataType.simpleString == "double")
    assert(ddf.numRows == 5)
  }

  test("manifest: published profiles merge to corpus stats without rescans") {
    import spark.implicits._
    import graft.sources.Manifest
    val root = Files.createTempDirectory("graft_prof").toString
    // two "ingest epochs" published separately
    val a = (1L to 300L).map(i => (i, s"w${i % 11}")).toDF("id", "w")
    val b = (301L to 500L).map(i => (i, s"w${i % 11}")).toDF("id", "w")
    Manifest.writeWithManifest(a, s"$root/e1")
    Manifest.writeWithManifest(b, s"$root/e2")
    Manifest.writeProfileFor(spark, s"$root/e1")
    Manifest.writeProfileFor(spark, s"$root/e2")
    // the profile dir must be invisible to corpus reads
    assert(spark.read.parquet(s"$root/e1").count() == 300L)
    val merged = Manifest.mergedProfile(spark, Seq(s"$root/e1", s"$root/e2"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(merged("id").getAs[Long]("row_count") == 500L)
    assert(merged("id").getAs[Long]("null_count") == 0L)
    assert(merged("id").getAs[Double]("max_num") == 500.0)
    assert(merged("w").getAs[Long]("ndv_estimate") == 11L)
    // distinct ids across both epochs: 500 exact, estimate within bound
    val est = merged("id").getAs[Long]("ndv_estimate").toDouble
    assert(math.abs(est - 500.0) <= 500.0 * 6 * graft.stats.Sketches.hllRse(12))
  }

  test("manifest: publish-verify roundtrip; tampered and vanished shards both surface") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum}
    import graft.sources.Manifest
    val dir = Files.createTempDirectory("graft_manifest").toString + "/corpus"
    val df = (1L to 500L).map(i => (i, s"doc $i")).toDF("id", "text").repartition(4)
    val summary = Manifest.writeWithManifest(df, dir)
    assert(summary.count() == 4, "one manifest entry per shard")
    assert(summary.agg(sum("rows")).first().getLong(0) == 500L)
    // pristine corpus verifies clean
    val v1 = Manifest.verifyManifest(spark, dir)
    assert(v1.count() == 4 && v1.filter(!col("ok")).count() == 0)
    // tamper: rewrite one shard with different content, same name
    val shard = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .minBy(_.getName)
    val replacement = Seq((999999L, "evil")).toDF("id", "text").coalesce(1)
    val tmpOut = Files.createTempDirectory("graft_manifest_t").toString
    replacement.write.mode("overwrite").parquet(tmpOut)
    val newFile = new java.io.File(tmpOut).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(newFile.toPath, shard.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop Hadoop LocalFS's .crc sidecar — otherwise the read fails on
    // the checksum BEFORE our content verify runs (object stores, the
    // production target, have no such sidecar)
    new java.io.File(shard.getParentFile, s".${shard.getName}.crc").delete()
    val v2 = Manifest.verifyManifest(spark, dir)
    val bad = v2.filter(!col("ok")).collect()
    assert(bad.length == 1 && bad.head.getAs[String]("file") == shard.getName,
      s"tampered shard must be the one flagged: ${bad.mkString(",")}")
    // vanish: delete the shard entirely — verify must surface it with a
    // null actual side, not silently pass on the survivors
    assert(shard.delete())
    val v3 = Manifest.verifyManifest(spark, dir)
    val gone = v3.filter(!col("ok")).collect()
    assert(gone.length == 1 && gone.head.isNullAt(gone.head.fieldIndex("actual_rows")))
  }

  test("persistVerified catalog item: tamper flags on verify and blocks unpersist; clean item round-trips") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.Manifest
    val m = freshManager
    val root = Files.createTempDirectory("graft_catalog_v").toString
    val ddf = m.register(
      (1L to 400L).map(i => (i, s"row $i")).toDF("id", "text").repartition(4),
      "cat_item")
    // persist lands in the SAME catalog layout persist() uses…
    val path = m.persistVerified(ddf, root)
    assert(m.listNamespaces(root) == Seq("default"))
    assert(m.listPersisted(root) == Seq("cat_item"))
    // …and the clean item round-trips through the verified unpersist
    val back = m.unpersistVerified(path, "cat_back")
    assert(back.numRows == 400 &&
      back.df.orderBy("id").collect().toSeq == ddf.df.orderBy("id").collect().toSeq)
    // tamper one shard in place (row-count preserved: 1 replacement row
    // would also be caught, but keep the stronger case — content change
    // only), same machinery as the publish-path tamper test above
    val shard = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .minBy(_.getName)
    val tmpOut = Files.createTempDirectory("graft_catalog_t").toString
    Seq((999999L, "evil")).toDF("id", "text").coalesce(1)
      .write.mode("overwrite").parquet(tmpOut)
    val newFile = new java.io.File(tmpOut).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(newFile.toPath, shard.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new java.io.File(shard.getParentFile, s".${shard.getName}.crc").delete()
    // verify surfaces exactly the tampered shard…
    val bad = Manifest.verifyManifest(spark, path).filter(!col("ok")).collect()
    assert(bad.length == 1 && bad.head.getAs[String]("file") == shard.getName)
    // …and the verified unpersist REFUSES to serve the item, naming it
    val e = intercept[IllegalArgumentException] {
      m.unpersistVerified(path, "cat_bad")
    }
    assert(e.getMessage.contains(shard.getName))
  }

  test("manifest: even-multiplicity swap (xor blind spot) is still caught by the sum fold") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.Manifest
    // [a, a] vs [b, b]: same row count, and both xor-folds cancel to 0 —
    // only the sum fold distinguishes them
    val dir = Files.createTempDirectory("graft_manifest_xor").toString + "/corpus"
    Manifest.writeWithManifest(
      Seq((1L, "x"), (1L, "x")).toDF("id", "text").coalesce(1), dir)
    val evil = Files.createTempDirectory("graft_manifest_xor_e").toString
    Seq((2L, "y"), (2L, "y")).toDF("id", "text").coalesce(1)
      .write.mode("overwrite").parquet(evil)
    val shard = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    val donor = new java.io.File(evil).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(donor.toPath, shard.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new java.io.File(shard.getParentFile, s".${shard.getName}.crc").delete()
    val v = Manifest.verifyManifest(spark, dir).collect()
    assert(v.length == 1 && !v.head.getAs[Boolean]("ok"),
      "the duplicated-row swap must fail verification via content_sum")
    assert(v.head.getAs[Long]("manifest_rows") == v.head.getAs[Long]("actual_rows"),
      "precondition: the tamper preserves the row count (xor+rows alone would pass)")
  }

  test("publishing an EMPTY partitioned corpus stays readable, verifiable, profilable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.Manifest
    // an over-filtered pipeline (e.g. a decontamination pass that drops
    // everything) must still produce a valid corpus: partitionBy + zero
    // rows writes NO data files, and before r13 every downstream read —
    // manifest read-back, profile, consumers — died UNABLE_TO_INFER_SCHEMA
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest_empty")
      .toString + "/corpus"
    val empty = Seq((1L, "x", 0L)).toDF("id", "text", "shard").limit(0)
    Manifest.writeWithManifest(empty, dir, partitionCols = Seq("shard"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 0)
    assert(back.columns.toSet == Set("id", "text", "shard"),
      s"published empty corpus must carry the FULL schema, got ${back.columns.toSeq}")
    assert(Manifest.verifyManifest(spark, dir).filter(!col("ok")).count() == 0)
    Manifest.writeProfileFor(spark, dir)
    val prof = Manifest.mergedProfile(spark, Seq(dir))
    assert(prof.filter(col("col_name") === "id")
      .select("row_count").head().getLong(0) == 0L)
  }
}
