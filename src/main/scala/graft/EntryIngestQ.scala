package graft

import graft.core.{DDF, DDFManager}
import graft.operators._
import graft.stats.{Sketches, Stats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryShared._

/** SparkEntry query rows — load/ingest rows (s02-s04) and streaming ingest loops (s05-s12). Split from SparkEntry.scala by family
  * (r15 verdict ask #7); composed into the pinned registry by
  * [[SparkEntry.queries]].
  */
private[graft] object EntryIngestQ {

  val qs: Seq[Q] = Seq(
    Q("s02_load_csv",
      (s, d) => {
        val m = mgr(s, d)
        val path = s02Fixture()
        // S2/S3 end-to-end through the dialect: declared schema, then
        // LOAD with reference cell semantics (strings verbatim, null
        // string / empty → null under NO DEFAULTS, pinned ts format)
        m.sql2ddf("CREATE TABLE s02_tbl (id bigint, lang varchar, " +
          "n_chars bigint, score double, ts timestamp)")
        m.sql2ddf(s"LOAD '$path' WITH NULL 'NA' WITH TIMESTAMP FORMAT " +
          "'yyyy-MM-dd HH:mm:ss' NO DEFAULTS INTO s02_tbl")
          .df.orderBy("id")
      },
      // DuckDB reads every cell as VARCHAR (empty → NULL) and applies
      // the SAME per-column semantics the loader declares: strings
      // verbatim-with-"" , null-string match then try-parse for typed
      // columns. NULLIF also routes the empty-as-NULL cells — TRY_CAST
      // of NULL is NULL either way.
      Some(s"""SELECT TRY_CAST(c0 AS BIGINT) AS id,
              |  COALESCE(c1, '') AS lang,
              |  TRY_CAST(NULLIF(c2, 'NA') AS BIGINT) AS n_chars,
              |  TRY_CAST(NULLIF(c3, 'NA') AS DOUBLE) AS score,
              |  try_strptime(NULLIF(c4, 'NA'), '%Y-%m-%d %H:%M:%S') AS ts
              |FROM read_csv('$s02Path', header=false, all_varchar=true,
              |  columns={'c0':'VARCHAR','c1':'VARCHAR','c2':'VARCHAR',
              |           'c3':'VARCHAR','c4':'VARCHAR'})
              |ORDER BY id""".stripMargin)),

    Q("s04_load_defaults",
      (s, d) => {
        val m = mgr(s, d)
        val path = s02Fixture()
        // the defaults path of the same LOAD: unparseable/null numeric
        // cells take the typed default (0) instead of null; timestamps
        // have no default and stay null (reference
        // RepresentationHandler.scala:115-137)
        m.sql2ddf("CREATE TABLE s04_tbl (id bigint, lang varchar, " +
          "n_chars bigint, score double, ts timestamp)")
        m.sql2ddf(s"LOAD '$path' WITH NULL 'NA' WITH TIMESTAMP FORMAT " +
          "'yyyy-MM-dd HH:mm:ss' INTO s04_tbl")
          .df.orderBy("id")
      },
      Some(s"""SELECT TRY_CAST(c0 AS BIGINT) AS id,
              |  COALESCE(c1, '') AS lang,
              |  COALESCE(TRY_CAST(NULLIF(c2, 'NA') AS BIGINT), 0) AS n_chars,
              |  COALESCE(TRY_CAST(NULLIF(c3, 'NA') AS DOUBLE), 0.0) AS score,
              |  try_strptime(NULLIF(c4, 'NA'), '%Y-%m-%d %H:%M:%S') AS ts
              |FROM read_csv('$s02Path', header=false, all_varchar=true,
              |  columns={'c0':'VARCHAR','c1':'VARCHAR','c2':'VARCHAR',
              |           'c3':'VARCHAR','c4':'VARCHAR'})
              |ORDER BY id""".stripMargin)),

    Q("s03_load_infer",
      (s, d) => {
        val m = mgr(s, d)
        val path = s03Fixture()
        // S1 five-row vote (reference Utils.java:97-150): V1 int, V2 int
        // despite post-sample garbage, V3 double, V4 boolean, V5 string
        m.loadFile(path, ",", sampleInference = true).df.orderBy("V1")
      },
      Some(s"""SELECT TRY_CAST(c0 AS INTEGER) AS V1,
              |  TRY_CAST(c1 AS INTEGER) AS V2,
              |  TRY_CAST(c2 AS DOUBLE) AS V3,
              |  CASE WHEN lower(c3) IN ('t', 'true') THEN true
              |       WHEN lower(c3) IN ('f', 'false') THEN false END AS V4,
              |  NULLIF(c4, 'NA') AS V5
              |FROM read_csv('$s03Path', header=false, all_varchar=true,
              |  columns={'c0':'VARCHAR','c1':'VARCHAR','c2':'VARCHAR',
              |           'c3':'VARCHAR','c4':'VARCHAR'})
              |ORDER BY V1""".stripMargin)),

    Q("m02_image_roundtrip",
      (s, d) => {
        val m = mgr(s, d)
        // The REAL image codec path, oracle-checked end-to-end: for each
        // doc_id < 20, build a 4×2 grayscale PNG whose halves hold
        // colors c1 = (id·37) mod 256 and c2 = (id·91) mod 256, then
        // PNG-encode → distributed nearest-neighbor resize to 2×1 →
        // PNG-re-encode → decode → pixel statistics. Grayscale makes
        // every emitted feature a closed-form EXACT value (channel means
        // = (c1+c2)/2, per-mille luma = 1000·c so meanLuma = (c1+c2)/2
        // and stdLuma = |c1−c2|/2 — all integers or halves, exact in
        // float and double), so DuckDB verifies the whole codec chain
        // from the id arithmetic alone. A decode/resize/encode bug
        // CANNOT reproduce these values.
        import s.implicits._
        val docIds = m.getDDFByName("documents").df
          .filter(col("doc_id") < 20).select("doc_id")
          .collect().map(_.getLong(0)).toSeq.sorted
        val imgs = docIds.map { id =>
          val c1 = ((id * 37) % 256).toInt; val c2 = ((id * 91) % 256).toInt
          val img = new java.awt.image.BufferedImage(4, 2,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until 2; x <- 0 until 4) {
            val c = if (x < 2) c1 else c2
            img.setRGB(x, y, (c << 16) | (c << 8) | c)
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
        val df = imgs.toDF("id", "payload")
        val resized = pipeline.Multimodal.resizeImages(df, "id", "payload",
          targetW = 2, targetH = 1)
        pipeline.Multimodal.extractFeatures(
            resized.select("id", "payload"), "id", "payload")
          .select(col("id"),
            col("features")(0).cast("double").as("w"),
            col("features")(1).cast("double").as("h"),
            col("features")(2).cast("double").as("aspect"),
            col("features")(3).cast("double").as("mean_r"),
            col("features")(4).cast("double").as("mean_g"),
            col("features")(5).cast("double").as("mean_b"),
            col("features")(6).cast("double").as("mean_luma"),
            col("features")(7).cast("double").as("std_luma"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id, 2.0::DOUBLE AS w, 1.0::DOUBLE AS h,
             |  2.0::DOUBLE AS aspect,
             |  (((doc_id*37)%256 + (doc_id*91)%256)/2.0)::DOUBLE AS mean_r,
             |  (((doc_id*37)%256 + (doc_id*91)%256)/2.0)::DOUBLE AS mean_g,
             |  (((doc_id*37)%256 + (doc_id*91)%256)/2.0)::DOUBLE AS mean_b,
             |  (((doc_id*37)%256 + (doc_id*91)%256)/2.0)::DOUBLE AS mean_luma,
             |  (abs((doc_id*37)%256 - (doc_id*91)%256)/2.0)::DOUBLE AS std_luma
             |FROM documents WHERE doc_id < 20 ORDER BY id""".stripMargin)),

    Q("m03_audio_roundtrip",
      (s, d) => {
        val m = mgr(s, d)
        // The REAL audio codec path, oracle-checked end-to-end: for each
        // doc_id < 20, build a 1024-frame mono 16-bit WAV at 8 kHz whose
        // first half holds +a and second half −a, a = 256 + 16·((id·37)
        // mod 1024). WAV-encode via the JDK → distributed decode →
        // sample statistics. Every emitted feature is a closed-form
        // EXACT integer (mean 0, meanAbs = peak = a, one zero crossing),
        // so DuckDB verifies the whole encode→decode chain from the id
        // arithmetic alone. A header-parse or sample-unpack bug CANNOT
        // reproduce these values.
        import s.implicits._
        val docIds = m.getDDFByName("documents").df
          .filter(col("doc_id") < 20).select("doc_id")
          .collect().map(_.getLong(0)).toSeq.sorted
        val wavs = docIds.map { id =>
          val a = (256 + 16 * ((id * 37) % 1024)).toShort
          val samples = Array.tabulate[Short](1024)(i => if (i < 512) a else (-a).toShort)
          (id, pipeline.Multimodal.encodeWav(samples, 8000f))
        }
        pipeline.Multimodal.extractFeatures(wavs.toDF("id", "payload"), "id", "payload")
          .select(col("id"),
            col("features")(0).cast("double").as("sample_rate"),
            col("features")(1).cast("double").as("channels"),
            col("features")(2).cast("double").as("n_frames"),
            col("features")(3).cast("double").as("bits"),
            col("features")(4).cast("double").as("mean_sample"),
            col("features")(5).cast("double").as("mean_abs"),
            col("features")(6).cast("double").as("peak_abs"),
            col("features")(7).cast("double").as("zero_crossings"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id, 8000.0::DOUBLE AS sample_rate,
             |  1.0::DOUBLE AS channels, 1024.0::DOUBLE AS n_frames,
             |  16.0::DOUBLE AS bits, 0.0::DOUBLE AS mean_sample,
             |  (256 + 16*((doc_id*37)%1024))::DOUBLE AS mean_abs,
             |  (256 + 16*((doc_id*37)%1024))::DOUBLE AS peak_abs,
             |  1.0::DOUBLE AS zero_crossings
             |FROM documents WHERE doc_id < 20 ORDER BY id""".stripMargin)),

    Q("m04_frame_sample",
      (s, d) => {
        val m = mgr(s, d)
        // Video-style frame sampling oracle-checked end-to-end: payloads
        // are the UTF-8 bytes of documents text (ASCII in the fixtures,
        // so DuckDB's character substring is byte-identical to the
        // engine's binary substring), chunked at 64 bytes, every 2nd
        // frame kept. Emitting md5 of each frame pins the exact BYTES of
        // every sampled chunk — an off-by-one in the chunk arithmetic or
        // a dropped tail frame cannot reproduce the hashes.
        val docs = m.getDDFByName("documents").df
          .filter(col("doc_id") < 50).select(col("doc_id"), col("text"))
        val withBin = pipeline.Multimodal.withBinaryPayload(docs, "text", "video")
        pipeline.Multimodal.sampleFrames(withBin, "doc_id", "payload",
            chunkBytes = 64, everyK = 2)
          .select(col("id"), col("frame_no").cast("long").as("frame_no"),
            octet_length(col("frame_bytes")).cast("long").as("frame_len"),
            md5(col("frame_bytes")).as("frame_hash"))
          .orderBy("id", "frame_no")
      },
      Some("""WITH f AS (
             |  SELECT doc_id AS id, text AS p,
             |    greatest(1, CAST(ceil(length(text)/64.0) AS BIGINT)) AS nc
             |  FROM documents WHERE doc_id < 50),
             |e AS (SELECT id, p, unnest(range(0, nc)) AS frame_no FROM f)
             |SELECT id, frame_no,
             |  length(substring(p, CAST(frame_no*64+1 AS INT), 64)) AS frame_len,
             |  md5(substring(p, CAST(frame_no*64+1 AS INT), 64)) AS frame_hash
             |FROM e WHERE frame_no % 2 = 0
             |ORDER BY id, frame_no""".stripMargin)),

    Q("m05_image_neardup",
      (s, d) => {
        val m = mgr(s, d)
        // Perceptual near-dup detection through the REAL codec chain:
        // 24 actual 9×8 grayscale PNGs whose dHash is a KNOWN 64-bit
        // pattern — each pixel row walks ±8 from 128 following the bits
        // of pat(doc_id % 6), so decode → NN-resample → luma → dHash
        // must reproduce the pattern bits exactly (m02's closed-form
        // trick, extended from pixel statistics to gradient signs).
        // pat1 = pat0^1 (Hamming 1) and pat4 = pat3^3 (Hamming 2) are
        // the designed near-dups; pat2 = pat0 with 3 flipped bits must
        // be REJECTED at maxHamming = 2; same-k ids are exact dups
        // (Hamming 0). The oracle knows only the id arithmetic + the
        // pattern literals and replays the 16-bit banding — a codec,
        // hashing, or banding bug cannot reproduce its pairs.
        import s.implicits._
        val docIds = m.getDDFByName("documents").df
          .filter(col("doc_id") < 24).select("doc_id")
          .collect().map(_.getLong(0)).toSeq.sorted
        val imgs = patternImages(docIds)
        val hashes = pipeline.Multimodal.imageDHashes(
          imgs.toDF("id", "payload"), "id", "payload")
        pipeline.Multimodal.nearDupImagePairs(hashes, "id",
            maxHamming = 2, bands = 4)
          .orderBy("id1", "id2")
      },
      Some("""WITH pat(k, p) AS (VALUES
             |  (0, 4348954285570149135::BIGINT), (1, 4348954285570149134::BIGINT),
             |  (2, 4348954287449197327::BIGINT), (3, 1317473026990674775::BIGINT),
             |  (4, 1317473026990674772::BIGINT), (5, 6510615555426900570::BIGINT)),
             |h AS MATERIALIZED (
             |  SELECT doc_id AS id, p FROM documents
             |  JOIN pat ON pat.k = doc_id % 6 WHERE doc_id < 24),
             |bands AS MATERIALIZED (
             |  SELECT id, p, b, (p >> (b * 16)) & 65535 AS bv
             |  FROM h, (VALUES (0), (1), (2), (3)) t(b)),
             |cand AS (
             |  SELECT DISTINCT a.id AS id1, b.id AS id2, a.p AS p1, b.p AS p2
             |  FROM bands a JOIN bands b
             |    ON a.b = b.b AND a.bv = b.bv AND a.id < b.id)
             |SELECT id1, id2, bit_count(xor(p1, p2))::BIGINT AS hamming
             |FROM cand WHERE bit_count(xor(p1, p2)) <= 2
             |ORDER BY id1, id2""".stripMargin)),

    Q("z01_zorder_roundtrip",
      (s, d) => {
        val m = mgr(s, d)
        // Z-order clustered rewrite of lineitem on (l_partkey, l_suppkey),
        // then read back: content must be EXACTLY the source — only the
        // file layout (and so footer-stat pruning) changes. The layout
        // win itself is measured in tools/ZorderSmoke + LayoutSpec.
        val src = m.getDDFByName("lineitem").df
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        val dir = s"${System.getProperty("java.io.tmpdir")}/graft_z01_" +
          java.security.MessageDigest.getInstance("MD5")
            .digest(d.getBytes).map("%02x".format(_)).mkString.take(8)
        sources.Layout.zorderWrite(src, Seq("l_partkey", "l_suppkey"), dir,
          numFiles = 8)
        s.read.parquet(dir).orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("bk01_bucketed_join",
      (s, d) => {
        val m = mgr(s, d)
        // The full bucketed-sink loop oracle-checked end-to-end: write
        // BOTH join sides bucketed+sorted on the join key, read back via
        // the catalog, join and aggregate. The oracle is the PLAIN join
        // — bucketing is layout-only, so the content must be invisible
        // (the no-Exchange plan win itself is pinned in ScaleSpec).
        val o = m.getDDFByName("orders").df
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val c = m.getDDFByName("customer").df
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
        sources.Bucketing.writeBucketed(o, "graft_bk01_orders", Seq("o_custkey"), 8)
        sources.Bucketing.writeBucketed(c, "graft_bk01_customer", Seq("o_custkey"), 8)
        sources.Bucketing.readBucketed(s, "graft_bk01_orders")
          .join(sources.Bucketing.readBucketed(s, "graft_bk01_customer"), "o_custkey")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("rev"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
              |  ${dsumSql("o_totalprice")} AS rev
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))
  )
}
