package graft

import graft.core.{DDF, DDFManager}
import graft.operators._
import graft.stats.{Sketches, Stats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryShared._

/** SparkEntry query rows — pipeline rows A: dedup (d), ANN (a), text (t) families. Split from SparkEntry.scala by family
  * (r15 verdict ask #7); composed into the pinned registry by
  * [[SparkEntry.queries]].
  */
private[graft] object EntryPipelineAQ {

  val qs: Seq[Q] = Seq(
    Q("d01_dedup_exact",
      (s, d) => {
        val m = mgr(s, d)
        pipeline.Dedup.exact(m.getDDFByName("documents").df, "text", "doc_id")
          .orderBy("fingerprint")
      },
      Some(s"""SELECT md5(${duckNorm("text")}) AS fingerprint,
              |  min(doc_id) AS keep_id, count(*) AS n_dups
              |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin)),

    Q("d02_dedup_minhash",
      (s, d) => {
        val m = mgr(s, d)
        // candidate generation via banded MinHash (engine-specific hashes →
        // rows-only check); candidates verified with exact Jaccard
        pipeline.Dedup.minhashDedup(m.getDDFByName("documents").df, "text", "doc_id",
          threshold = 0.5)
          .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id1", "id2")
      },
      None),

    Q("d07_minhash_portable",
      (s, d) => {
        val m = mgr(s, d)
        // Same MinHash-LSH pipeline as d02 instantiated with the portable
        // mod-prime shingle hash + string band signatures, so the WHOLE
        // pipeline (shingles → k affine minhashes → banding → candidate
        // join → exact-Jaccard verify) is replicated in DuckDB below.
        // d02 stays on xxhash64 — the codegen'd 100 TB path, benched.
        pipeline.Dedup.minhashDedup(m.getDDFByName("documents").df, "text", "doc_id",
          threshold = 0.5, portable = true)
          .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id1", "id2")
      },
      // mirror: fold31 per shingle, h_i = ((2i+1)·H + (i·1000003+12345) mod p) mod p,
      // bands of 4 joined as "m0,m1,m2,m3", candidates share a band,
      // verify exact jaccard ≥ 0.5 on the UNROUNDED ratio (like Spark)
      Some(s"""WITH ${duckMinhashCtes("documents")}
              |SELECT id1, id2, round(jr, 6) AS jaccard FROM mpairs
              |WHERE jr >= 0.5 ORDER BY id1, id2""".stripMargin)),

    Q("d03_dedup_simhash",
      (s, d) => {
        val m = mgr(s, d)
        // Portable 60-bit fingerprint so the result is cross-engine
        // checkable. The pigeonhole banding (nChunks = maxHamming+1) has
        // EXACT recall, so the output is a pure function of the
        // fingerprints — the oracle can use a brute-force pairwise join
        // while we exercise the banded path.
        pipeline.Dedup.simhashDedup(m.getDDFByName("documents").df, "text", "doc_id",
          maxHamming = 12, tokenHash = pipeline.Dedup.portableHash60, nBits = 60)
          .select(col("id1"), col("id2"), col("hamming").cast("long").as("hamming"))
          .orderBy("id1", "id2")
      },
      // Same 60-bit simhash in DuckDB: two mod-prime char folds per token
      // (31/1e9+7 → bits 0–29, 131/998244353 → bits 30–59), ±1 bit votes,
      // sign → fingerprint, then brute-force hamming ≤ 12 over all pairs.
      Some(s"""WITH n AS (SELECT doc_id, ${duckNorm("text")} AS t FROM documents),
              |tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tk FROM n),
              |hh AS (SELECT doc_id,
              |  list_reduce(list_prepend(0::BIGINT,
              |      list_transform(regexp_split_to_array(tk, ''), c -> coalesce(ascii(c), 0)::BIGINT)),
              |    (acc, x) -> (acc * 31 + x) % 1000000007)
              |  + list_reduce(list_prepend(0::BIGINT,
              |      list_transform(regexp_split_to_array(tk, ''), c -> coalesce(ascii(c), 0)::BIGINT)),
              |    (acc, x) -> (acc * 131 + x) % 998244353) * 1073741824 AS h
              |  FROM tok),
              |bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
              |  FROM hh, (SELECT unnest(range(60)) AS b) GROUP BY doc_id, b),
              |fp AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS fp
              |  FROM bits GROUP BY doc_id)
              |SELECT a.doc_id AS id1, b.doc_id AS id2,
              |  bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
              |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
              |WHERE bit_count(xor(a.fp, b.fp)) <= 12
              |ORDER BY id1, id2""".stripMargin)),

    Q("d14_jaccard_join",
      (s, d) => {
        val m = mgr(s, d)
        // EXACT threshold similarity self-join (prefix filter + verify):
        // the ground truth the MinHash banding (d02/d07) approximates
        pipeline.SetJoin.exactJaccardJoin(
            m.getDDFByName("documents").df.filter(col("doc_id") < 120),
            "text", "doc_id", threshold = 0.6)
          .orderBy("id_a", "id_b")
      },
      // brute-force replay over the same 120-doc subset: identical pair
      // set AND identical double jaccard (integer-valued double division)
      Some(s"""WITH dset AS (SELECT doc_id,
              |    list_distinct(${duckToks("text")}) AS s
              |  FROM documents WHERE doc_id < 120),
              |sized AS (SELECT doc_id, s, len(s) AS n FROM dset WHERE len(s) > 0),
              |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              |    len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE AS inter,
              |    a.n AS na, b.n AS nb
              |  FROM sized a JOIN sized b ON a.doc_id < b.doc_id)
              |SELECT id_a, id_b, inter / (na + nb - inter) AS jaccard
              |FROM p WHERE inter / (na + nb - inter) >= 0.6
              |ORDER BY id_a, id_b""".stripMargin)),

    Q("d15_minhash_recall_eval",
      (s, d) => {
        val m = mgr(s, d)
        // the banding-parameter evaluation loop (round 13): exact truth
        // (complete shared-shingle join + exact Jaccard) vs the portable
        // banding's candidates on an eval slice — recall tells you what
        // the (k=32, bands=8) collision curve actually surfaces at
        // threshold 0.5 on THIS corpus, precision what fraction of
        // candidates verify. The text twin of a07's ANN recall.
        pipeline.Dedup.minhashRecallEval(
          m.getDDFByName("documents").df.filter(col("doc_id") < 300),
          "text", "doc_id", threshold = 0.5, portable = true)
      },
      // d07's portable minhash CTE stack supplies the banding candidates
      // (mcand); truth is the complete shared-shingle join (any pair at
      // J ≥ 0.5 > 0 shares a shingle) + exact Jaccard. Integer counts,
      // one IEEE division each.
      Some(s"""WITH corpus AS (SELECT * FROM documents WHERE doc_id < 300),
              |${duckMinhashCtes("corpus")},
              |tcand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
              |  FROM mex a JOIN mex b ON a.s = b.s AND a.doc_id < b.doc_id),
              |truth AS (SELECT id1, id2 FROM (
              |    SELECT id1, id2, len(list_intersect(s1.sh, s2.sh))::DOUBLE
              |        / len(list_distinct(s1.sh || s2.sh)) AS jr
              |    FROM tcand JOIN msh s1 ON s1.doc_id = id1
              |    JOIN msh s2 ON s2.doc_id = id2)
              |  WHERE jr >= 0.5),
              |nd AS (SELECT count(*)::BIGINT AS n_docs FROM corpus),
              |nt AS (SELECT count(*)::BIGINT AS n_true FROM truth),
              |nc AS (SELECT count(*)::BIGINT AS n_cand FROM mcand),
              |nh AS (SELECT count(*)::BIGINT AS n_hit FROM truth t
              |  JOIN mcand c ON t.id1 = c.id1 AND t.id2 = c.id2)
              |SELECT n_docs, n_true, n_cand, n_hit,
              |  CASE WHEN n_true = 0 THEN 1.0
              |       ELSE n_hit::DOUBLE / n_true END AS recall,
              |  CASE WHEN n_cand = 0 THEN 1.0
              |       ELSE n_hit::DOUBLE / n_cand END AS "precision"
              |FROM nd, nt, nc, nh""".stripMargin)),

    Q("d04_jaccard_pairs",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        val pairs = docs.filter(col("doc_id") < 29)
          .select(col("doc_id").as("id1"), (col("doc_id") + 1).as("id2"))
        pipeline.Dedup.jaccardOnPairs(pairs, docs, "text", "doc_id")
          .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id1")
      },
      Some(s"""WITH sh AS (SELECT doc_id, ${duckShingles("text")} AS s FROM documents)
              |SELECT a.doc_id AS id1, b.doc_id AS id2,
              |  round(len(list_intersect(a.s, b.s))::DOUBLE
              |        / len(list_distinct(a.s || b.s)), 6) AS jaccard
              |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
              |WHERE a.doc_id < 29 ORDER BY id1""".stripMargin)),

    Q("d05_embedding_dedup",
      (s, d) => {
        val m = mgr(s, d)
        // native VectorCosine widens each float element to double inside
        // its loop — bit-identical to the oracle's list_transform(::DOUBLE)
        // with no interpreted per-row cast/allocation; brute-force is
        // restricted to a bounded id range — the full-scale path is
        // Dedup.embeddingDedup (LSH-bucketed)
        val vecs = m.getDDFByName("embeddings").df.filter(col("vec_id") < 200)
          .select(col("vec_id"), col("embedding").as("v"))
        val l = vecs.alias("l"); val r = vecs.alias("r")
        l.join(r, col("l.vec_id") < col("r.vec_id"))
          .select(col("l.vec_id").as("id1"), col("r.vec_id").as("id2"),
            pipeline.Similarity.cosine(col("l.v"), col("r.v")).as("c"))
          .filter(col("c") >= 0.3)
          .select(col("id1"), col("id2"), round(col("c"), 6).as("cosine"))
          .orderBy("id1", "id2")
      },
      Some(s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              |           FROM embeddings WHERE vec_id < 200)
              |SELECT a.vec_id AS id1, b.vec_id AS id2, round($duckCos, 6) AS cosine
              |FROM dv a JOIN dv b ON a.vec_id < b.vec_id
              |WHERE $duckCos >= 0.3 ORDER BY id1, id2""".stripMargin)),

    Q("a01_ann_brute",
      (s, d) => {
        val m = mgr(s, d)
        // raw float arrays: VectorCosine's loop widens losslessly, so the
        // result is bit-identical to the previous transform(cast) pre-pass
        // (removed — it was an interpreted per-row allocation)
        val all = m.getDDFByName("embeddings").df.select(col("vec_id"), col("embedding"))
        val queries = all.filter(col("vec_id") < 3)
          .withColumnRenamed("vec_id", "qid")
        pipeline.Similarity.bruteForceTopK(all, queries, "embedding", "vec_id", "qid", 10)
          .select(col("query_id"), col("id"), round(col("cosine"), 6).as("cosine"), col("rk"))
          .orderBy("query_id", "rk")
      },
      Some(s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              |            FROM embeddings),
              |scored AS (SELECT a.vec_id AS query_id, b.vec_id AS id, $duckCos AS c,
              |    row_number() OVER (PARTITION BY a.vec_id ORDER BY $duckCos DESC, b.vec_id) AS rk
              |  FROM (SELECT * FROM dv WHERE vec_id < 3) a CROSS JOIN dv b)
              |SELECT query_id, id, round(c, 6) AS cosine, rk FROM scored
              |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),

    Q("a02_ann_lsh",
      (s, d) => {
        val m = mgr(s, d)
        val all = m.getDDFByName("embeddings").df
        val queries = all.filter(col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        pipeline.Similarity.lshTopK(all, queries, "embedding", "vec_id", "qid", 10,
          planes = 8)
          .select(col("query_id"), col("id"), round(col("cosine"), 6).as("cosine"), col("rk"))
          .orderBy("query_id", "rk")
      },
      // The hyperplanes are seeded pseudo-randoms fixed at plan-build
      // time, so the SAME literals are inlined here (Double.toString
      // round-trips exactly; DuckDB's decimal→double cast preserves the
      // value) — bucketing, candidate join, scoring, and ranking are all
      // replicated. Embeddings fixture is 64-dim at every sf.
      Some {
        val hp = pipeline.Similarity.hyperplanes(dim = 64, planes = 8, seed = 7L)
        val bucketExpr = hp.zipWithIndex.map { case (p, i) =>
          val lits = p.map(_.toString).mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product(v, $lits::DOUBLE[]) >= 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
        val cos = "list_dot_product(a.v, c.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)))"
        s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           |            FROM embeddings),
           |bk AS (SELECT vec_id, v, $bucketExpr AS bucket FROM dv),
           |scored AS (SELECT a.vec_id AS query_id, c.vec_id AS id, $cos AS c,
           |    row_number() OVER (PARTITION BY a.vec_id ORDER BY $cos DESC, c.vec_id) AS rk
           |  FROM (SELECT * FROM bk WHERE vec_id < 3) a JOIN bk c ON a.bucket = c.bucket)
           |SELECT query_id, id, round(c, 6) AS cosine, rk FROM scored
           |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin
      }),

    Q("a09_ann_lsh_multiprobe",
      (s, d) => {
        val m = mgr(s, d)
        // the SERVING-LOOP form of a02: corpus bucketed once into an
        // index (buildLshIndex), queries probe their bucket PLUS every
        // Hamming-1 neighbor (multiProbe = 1) — the recall lever for
        // sign-LSH's boundary misses. Same seeded hyperplanes as a02, so
        // the oracle inlines identical literals and replays the probe
        // expansion with the same bit masks.
        val all = m.getDDFByName("embeddings").df
        val queries = all.filter(col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        val idx = pipeline.Similarity.buildLshIndex(all, "embedding", "vec_id",
          planes = 8)
        pipeline.Similarity.lshTopKIndexed(idx, queries, "embedding", "qid", 10,
          multiProbe = 1)
          .select(col("query_id"), col("id"), round(col("cosine"), 6).as("cosine"), col("rk"))
          .orderBy("query_id", "rk")
      },
      Some {
        val hp = pipeline.Similarity.hyperplanes(dim = 64, planes = 8, seed = 7L)
        val bucketExpr = hp.zipWithIndex.map { case (p, i) =>
          val lits = p.map(_.toString).mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product(v, $lits::DOUBLE[]) >= 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
        val masks = pipeline.Similarity.probeMasks(planes = 8, multiProbe = 1)
          .mkString("[", ", ", "]")
        val cos = "list_dot_product(a.v, c.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)))"
        s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           |            FROM embeddings),
           |bk AS (SELECT vec_id, v, $bucketExpr AS bucket FROM dv),
           |pr AS (SELECT q.vec_id AS query_id, q.v, xor(q.bucket, f.m) AS bucket
           |       FROM (SELECT * FROM bk WHERE vec_id < 3) q,
           |            (SELECT unnest($masks::BIGINT[]) AS m) f),
           |scored AS (SELECT a.query_id, c.vec_id AS id, $cos AS c,
           |    row_number() OVER (PARTITION BY a.query_id ORDER BY $cos DESC, c.vec_id) AS rk
           |  FROM pr a JOIN bk c ON a.bucket = c.bucket)
           |SELECT query_id, id, round(c, 6) AS cosine, rk FROM scored
           |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin
      }),

    Q("a07_ann_recall",
      (s, d) => {
        val m = mgr(s, d)
        // the ANN evaluation loop: recall@10 of the sign-LSH index
        // against the brute-force baseline, per query — the measurement
        // that justifies (or rejects) an approximate index's parameters
        // before it runs at corpus scale
        val all = m.getDDFByName("embeddings").df.select(col("vec_id"), col("embedding"))
        val queries = all.filter(col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        val exact = pipeline.Similarity.bruteForceTopK(all, queries, "embedding", "vec_id", "qid", 10)
        val approx = pipeline.Similarity.lshTopK(all, queries, "embedding", "vec_id", "qid", 10,
          planes = 8)
        pipeline.Similarity.annRecall(approx, exact, k = 10).orderBy("query_id")
      },
      // both pipelines' DuckDB twins (a01/a02) composed as CTEs, then the
      // same hits/denominator arithmetic — integer counts and ONE double
      // division, so the recall value is bit-identical across engines
      Some {
        val hp = pipeline.Similarity.hyperplanes(dim = 64, planes = 8, seed = 7L)
        val bucketExpr = hp.zipWithIndex.map { case (p, i) =>
          val lits = p.map(_.toString).mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product(v, $lits::DOUBLE[]) >= 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
        val cosB = "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
        val cosL = "list_dot_product(a.v, c.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)))"
        s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           |            FROM embeddings),
           |brute AS (SELECT query_id, id FROM (
           |    SELECT a.vec_id AS query_id, b.vec_id AS id,
           |      row_number() OVER (PARTITION BY a.vec_id ORDER BY $cosB DESC, b.vec_id) AS rk
           |    FROM (SELECT * FROM dv WHERE vec_id < 3) a CROSS JOIN dv b) WHERE rk <= 10),
           |bk AS (SELECT vec_id, v, $bucketExpr AS bucket FROM dv),
           |lsh AS (SELECT query_id, id FROM (
           |    SELECT a.vec_id AS query_id, c.vec_id AS id,
           |      row_number() OVER (PARTITION BY a.vec_id ORDER BY $cosL DESC, c.vec_id) AS rk
           |    FROM (SELECT * FROM bk WHERE vec_id < 3) a JOIN bk c ON a.bucket = c.bucket)
           |  WHERE rk <= 10),
           |hits AS (SELECT b.query_id, count(l.id) AS n_hits FROM brute b
           |    LEFT JOIN lsh l ON b.query_id = l.query_id AND b.id = l.id
           |  GROUP BY b.query_id),
           |den AS (SELECT query_id, count(*) AS n_truth FROM brute GROUP BY query_id)
           |SELECT d.query_id AS query_id, coalesce(h.n_hits, 0) AS n_hits,
           |  d.n_truth, coalesce(h.n_hits, 0)::DOUBLE / d.n_truth AS recall
           |FROM den d LEFT JOIN hits h ON d.query_id = h.query_id
           |ORDER BY d.query_id""".stripMargin
      }),

    Q("a08_matryoshka_ann",
      (s, d) => {
        val m = mgr(s, d)
        // matryoshka tiering: search at prefix dim 16 (4× cheaper dot
        // products, 4× smaller index). renormalize=false here because
        // cosine ranking is scale-invariant and raw slices are bit-exact
        // against DuckDB's list slicing; the renormalized path is
        // CurationSpec-pinned (unit norms, ranking preserved)
        val all = m.getDDFByName("embeddings").df.select(col("vec_id"), col("embedding"))
        val trunc = pipeline.Similarity.matryoshkaTruncate(
          all, "embedding", k = 16, renormalize = false)
        val queries = trunc.filter(col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        pipeline.Similarity.bruteForceTopK(trunc, queries, "embedding", "vec_id", "qid", 5)
          .select(col("query_id"), col("id"), round(col("cosine"), 6).as("cosine"), col("rk"))
          .orderBy("query_id", "rk")
      },
      Some(s"""WITH dv AS (SELECT vec_id,
              |    list_transform(embedding[1:16], x -> x::DOUBLE) AS v
              |  FROM embeddings),
              |scored AS (SELECT a.vec_id AS query_id, b.vec_id AS id, $duckCos AS c,
              |    row_number() OVER (PARTITION BY a.vec_id ORDER BY $duckCos DESC, b.vec_id) AS rk
              |  FROM (SELECT * FROM dv WHERE vec_id < 3) a CROSS JOIN dv b)
              |SELECT query_id, id, round(c, 6) AS cosine, rk FROM scored
              |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin)),

    Q("a03_ann_ivf",
      (s, d) => {
        val m = mgr(s, d)
        val all = m.getDDFByName("embeddings").df
        val queries = all.filter(col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        // Deterministic centroids (the first 16 corpus vectors) instead of
        // the k-means|| build: the k-means path's init is engine-specific
        // RNG (spec-checked for recall instead), while fixed centroids
        // make assign→probe→score exactly replicable by the oracle below.
        // 16×64 doubles — config-size driver collect, not data-scale.
        val centroids = all.filter(col("vec_id") < 16).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble))
        val idx = pipeline.IvfIndex.buildFromCentroids(all, "embedding", "vec_id", centroids)
        pipeline.IvfIndex.topK(idx, queries, "embedding", "qid", k = 10, nprobe = 4)
          .select(col("query_id"), col("id"), round(col("cosine"), 6).as("cosine"), col("rk"))
          .orderBy("query_id", "rk")
      },
      // Mirror of the whole IVF pipeline: cell = argmax(dot − ‖c‖²/2)
      // (ties → HIGHER cell, as array_max/max_by break them), probe the 4
      // cells nearest by the SAME L2 score (ties → lower cell, as the
      // window orders), score only vectors in probed cells, rank
      // (cosine DESC, id). Probe-by-assignment-metric keeps the index
      // geometry consistent (review fix).
      Some {
        val cos = (a: String, b: String) =>
          s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
        s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           |            FROM embeddings),
           |cents AS (SELECT vec_id AS cell, v AS cv FROM dv WHERE vec_id < 16),
           |assigned AS (SELECT id, v, cell FROM (
           |    SELECT d.vec_id AS id, d.v, c.cell,
           |      row_number() OVER (PARTITION BY d.vec_id ORDER BY
           |        list_dot_product(d.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
           |        c.cell DESC) AS rn
           |    FROM dv d CROSS JOIN cents c) WHERE rn = 1),
           |probes AS (SELECT query_id, qv, cell FROM (
           |    SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        list_dot_product(q.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
           |        c.cell) AS crk
           |    FROM (SELECT * FROM dv WHERE vec_id < 3) q CROSS JOIN cents c)
           |  WHERE crk <= 4),
           |scored AS (SELECT p.query_id, a.id, ${cos("p.qv", "a.v")} AS cs
           |  FROM probes p JOIN assigned a ON a.cell = p.cell)
           |SELECT query_id, id, round(cs, 6) AS cosine, rk FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY cs DESC, id) AS rk FROM scored)
           |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin
      }),

    Q("a10_ivf_append",
      (s, d) => {
        val m = mgr(s, d)
        val all = m.getDDFByName("embeddings").df
        // corpus = 90% of vectors; batch = every 10th id, appended later
        val corpus = all.filter(col("vec_id") % 10 =!= 0)
        val batch = all.filter(col("vec_id") % 10 === 0)
        // deterministic frozen centroids: the 16 lowest corpus ids
        // (vec_id < 18, excluding the two multiples of 10)
        val centroids = all
          .filter(col("vec_id") < 18 && col("vec_id") % 10 =!= 0)
          .orderBy("vec_id").select("embedding").collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble))
        val idx = pipeline.IvfIndex.buildFromCentroids(corpus, "embedding", "vec_id", centroids)
        val idx2 = pipeline.IvfIndex.append(idx, batch, "embedding", "vec_id")
        // batch rows' cells out of the APPENDED index — the append path's
        // assignment, not a rebuild's
        idx2.corpus.filter(col("id") % 10 === 0)
          .select("id", "cell").orderBy("id")
      },
      // replay: cell = argmax(dot − ‖c‖²/2), ties → HIGHER cell (array_max
      // struct order), centroids ranked by vec_id
      Some("""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
             |            FROM embeddings),
             |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
             |          FROM dv WHERE vec_id < 18 AND vec_id % 10 != 0)
             |SELECT id, cell FROM (
             |  SELECT d.vec_id AS id, c.cell,
             |    row_number() OVER (PARTITION BY d.vec_id ORDER BY
             |      list_dot_product(d.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
             |      c.cell DESC) AS rn
             |  FROM (SELECT * FROM dv WHERE vec_id % 10 = 0) d CROSS JOIN cents c)
             |WHERE rn = 1 ORDER BY id""".stripMargin)),

    Q("a11_ivf_int8_rerank",
      (s, d) => {
        val m = mgr(s, d)
        val all = m.getDDFByName("embeddings").df
        // memory-tiered IVF: int8 sidecar scores the probed cells, the
        // float corpus is touched only for the per-query shortlist
        // (IvfIndex.topKQuantized scaladoc). Same deterministic frozen
        // centroids as a03; the oracle replays quantize → shortlist →
        // exact re-rank step for step.
        val centroids = all.filter(col("vec_id") < 16).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble))
        val idx = pipeline.IvfIndex.buildFromCentroids(all, "embedding", "vec_id", centroids)
        val queries = all.filter(col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        pipeline.IvfIndex.topKQuantized(idx, queries, "embedding", "qid",
          k = 10, nprobe = 4, shortlist = 20)
          .select(col("query_id"), col("id"), round(col("cosine"), 6).as("cosine"), col("rk"))
          .orderBy("query_id", "rk")
      },
      // a03's assign/probe mirror + the int8 tier: per-vector scale =
      // max|x|/127, codes = floor(x/scale + 0.5) (the a04 portable
      // rounding), shortlist = top-20 by dequantized cosine (ties → id),
      // exact cosine re-rank of the shortlist to top-10
      Some("""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
             |            FROM embeddings),
             |cents AS (SELECT vec_id AS cell, v AS cv FROM dv WHERE vec_id < 16),
             |assigned AS (SELECT id, v, cell FROM (
             |    SELECT d.vec_id AS id, d.v, c.cell,
             |      row_number() OVER (PARTITION BY d.vec_id ORDER BY
             |        list_dot_product(d.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
             |        c.cell DESC) AS rn
             |    FROM dv d CROSS JOIN cents c) WHERE rn = 1),
             |q8 AS (SELECT id, cell,
             |    CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
             |         ELSE list_transform(v, x -> floor(x / scale + 0.5)) END AS codes,
             |    scale FROM (SELECT id, cell, v,
             |      greatest(coalesce(list_max(list_transform(v, x -> abs(x))), 0.0), 0.0)
             |        / 127.0 AS scale FROM assigned)),
             |dq AS (SELECT id, cell, list_transform(codes, c -> c * scale) AS dv8 FROM q8),
             |probes AS (SELECT query_id, qv, cell FROM (
             |    SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
             |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |        list_dot_product(q.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
             |        c.cell) AS crk
             |    FROM (SELECT * FROM dv WHERE vec_id < 3) q CROSS JOIN cents c)
             |  WHERE crk <= 4),
             |approx AS (SELECT p.query_id, d.id,
             |    list_dot_product(p.qv, d.dv8)
             |      / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(d.dv8, d.dv8)))
             |      AS cos8
             |  FROM probes p JOIN dq d ON d.cell = p.cell),
             |short AS (SELECT query_id, id FROM (
             |    SELECT *, row_number() OVER (PARTITION BY query_id
             |      ORDER BY cos8 DESC, id) AS srk FROM approx) WHERE srk <= 20),
             |exact AS (SELECT s.query_id, s.id,
             |    list_dot_product(q.v, a.v)
             |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(a.v, a.v))) AS cs
             |  FROM short s JOIN dv q ON q.vec_id = s.query_id
             |  JOIN assigned a ON a.id = s.id)
             |SELECT query_id, id, round(cs, 6) AS cosine, rk FROM (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY cs DESC, id) AS rk FROM exact)
             |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),

    Q("a12_diversity_sample",
      (s, d) => {
        val m = mgr(s, d)
        val all = m.getDDFByName("embeddings").df
        // cluster-balanced coverage sample: cap every IVF cell at 20
        // vectors picked by the portable hash rank of the id — the
        // diversity-preserving subsample (a uniform sample would mirror
        // cluster-size skew; the cap keeps embedding-space coverage).
        // Deterministic frozen centroids as in a03 so the oracle can
        // replay assignment; the per-cell cap is the q08 rank idiom.
        val centroids = all.filter(col("vec_id") < 16).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble))
        val idx = pipeline.IvfIndex.buildFromCentroids(all, "embedding", "vec_id", centroids)
        pipeline.IvfIndex.diversitySample(idx, perCell = 20)
          .select(col("id"), col("cell"))
          .orderBy("cell", "id")
      },
      // a03's assignment mirror (argmax(dot − ‖c‖²/2), ties → HIGHER
      // cell), then q08's xor-fold rank capped at 20 per cell
      Some("""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
             |            FROM embeddings),
             |cents AS (SELECT vec_id AS cell, v AS cv FROM dv WHERE vec_id < 16),
             |assigned AS (SELECT id, cell FROM (
             |    SELECT d.vec_id AS id, c.cell,
             |      row_number() OVER (PARTITION BY d.vec_id ORDER BY
             |        list_dot_product(d.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
             |        c.cell DESC) AS rn
             |    FROM dv d CROSS JOIN cents c) WHERE rn = 1),
             |h AS (SELECT id, cell, (id % 1000000000) * 2654435761 AS p FROM assigned),
             |r AS (SELECT id, cell, row_number() OVER (PARTITION BY cell
             |      ORDER BY xor(p, p >> 31) % 1000000007, id) AS rn FROM h)
             |SELECT id, cell FROM r WHERE rn <= 20 ORDER BY cell, id""".stripMargin)),

    Q("a13_knn_classify",
      (s, d) => {
        val m = mgr(s, d)
        // leave-one-out kNN majority vote over the embedding index — the
        // auto-labeling / embedding-sanity primitive: each query's own
        // row is excluded BEFORE ranking, the ≤5 neighbors vote, ties
        // break to the smallest label (deterministic, no float tie)
        val all = m.getDDFByName("embeddings").df
        val queries = all.filter(col("vec_id") < 30).withColumnRenamed("vec_id", "qid")
        val nn = pipeline.Similarity.bruteForceTopK(all, queries, "embedding",
          "vec_id", "qid", k = 5, excludeSelf = true)
        pipeline.Similarity.knnClassify(nn, all.select("vec_id", "label"),
            "vec_id", "label", k = 5)
          .orderBy("query_id")
      },
      Some(s"""WITH dv AS (SELECT vec_id, label,
              |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
              |nn AS (SELECT query_id, id FROM (
              |    SELECT a.vec_id AS query_id, b.vec_id AS id,
              |      row_number() OVER (PARTITION BY a.vec_id
              |        ORDER BY $duckCos DESC, b.vec_id) AS rk
              |    FROM (SELECT * FROM dv WHERE vec_id < 30) a
              |    JOIN dv b ON a.vec_id != b.vec_id) WHERE rk <= 5),
              |v AS (SELECT n.query_id, d.label, count(*) AS nv
              |  FROM nn n JOIN dv d ON d.vec_id = n.id GROUP BY 1, 2),
              |r AS (SELECT query_id, label, nv, row_number() OVER (
              |    PARTITION BY query_id ORDER BY nv DESC, label) AS rn FROM v)
              |SELECT query_id, label AS pred_label, nv AS n_votes FROM r
              |WHERE rn = 1 ORDER BY query_id""".stripMargin)),

    Q("a14_centroid_outliers",
      (s, d) => {
        val m = mgr(s, d)
        // noisy/mislabeled-example detection: the 5 vectors farthest
        // (cosine) from their OWN label's centroid. exact=true folds each
        // centroid dimension in vec_id order (bit-identical to the
        // oracle's ordered list_reduce); the default associative sum is
        // the corpus-scale twin, spec-checked instead.
        pipeline.Similarity.centroidOutliers(m.getDDFByName("embeddings").df,
            "embedding", "vec_id", "label", k = 5, exact = true)
          .select(col("label"), col("vec_id"),
            round(col("dist"), 6).as("dist"), col("rk"))
          .orderBy("label", "rk")
      },
      Some("""WITH dv AS (SELECT vec_id, label,
             |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
             |ex AS (SELECT vec_id, label, i AS dim, v[i] AS val
             |  FROM dv, unnest(range(1, len(v) + 1)) AS t(i)),
             |cent AS (SELECT label, dim,
             |    list_reduce(list_prepend(0.0, list(val ORDER BY vec_id)),
             |      (acc, x) -> acc + x) / count(*) AS c
             |  FROM ex GROUP BY 1, 2),
             |cl AS (SELECT label, list(c ORDER BY dim) AS cv FROM cent GROUP BY 1),
             |sc AS (SELECT dv.vec_id, dv.label,
             |    1 - list_dot_product(dv.v, cl.cv)
             |        / (sqrt(list_dot_product(dv.v, dv.v))
             |           * sqrt(list_dot_product(cl.cv, cl.cv))) AS dist
             |  FROM dv JOIN cl USING (label))
             |SELECT label, vec_id, round(dist, 6) AS dist, rk FROM (
             |  SELECT *, row_number() OVER (PARTITION BY label
             |    ORDER BY dist DESC, vec_id) AS rk FROM sc)
             |WHERE rk <= 5 ORDER BY label, rk""".stripMargin)),

    Q("a15_hard_negatives",
      (s, d) => {
        val m = mgr(s, d)
        // contrastive hard negatives: per query, the 8 nearest vectors
        // whose LABEL DIFFERS — label filter applied before ranking so
        // every slot is a true negative
        val all = m.getDDFByName("embeddings").df
          .select(col("vec_id"), col("embedding"), col("label"))
        val queries = all.filter(col("vec_id") < 5)
          .withColumnRenamed("vec_id", "qid")
        pipeline.Similarity.hardNegatives(all, queries, "embedding",
            "vec_id", "qid", "label", k = 8)
          .select(col("query_id"), col("id"),
            round(col("cosine"), 6).as("cosine"), col("rk"))
          .orderBy("query_id", "rk")
      },
      Some(s"""WITH dv AS (SELECT vec_id, label,
              |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
              |scored AS (SELECT a.vec_id AS query_id, b.vec_id AS id, $duckCos AS c,
              |    row_number() OVER (PARTITION BY a.vec_id
              |      ORDER BY $duckCos DESC, b.vec_id) AS rk
              |  FROM (SELECT * FROM dv WHERE vec_id < 5) a
              |  JOIN dv b ON a.label != b.label)
              |SELECT query_id, id, round(c, 6) AS cosine, rk FROM scored
              |WHERE rk <= 8 ORDER BY query_id, rk""".stripMargin)),

    Q("a16_random_projection",
      (s, d) => {
        val m = mgr(s, d)
        // JL sign projection 64→16: one codegen'd MatrixProject pass; the
        // ±1 matrix is reproduced in the oracle as inlined literals from
        // the same SplitMix64 arithmetic. Both engines fold i ascending.
        val emb = m.getDDFByName("embeddings").df.filter(col("vec_id") < 50)
        pipeline.Similarity.randomProject(emb, "embedding", "proj",
            outDim = 16, seed = 7L)
          .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "val")))
          .select(col("vec_id"), col("j"), round(col("val"), 6).as("val"))
          .orderBy("vec_id", "j")
      },
      Some(s"""WITH mt AS (SELECT $a16MatrixSql::DOUBLE[][] AS mat),
              |m AS (SELECT j - 1 AS j, mat[j] AS mrow
              |  FROM mt, unnest(range(1, 17)) AS t(j)),
              |dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              |  FROM embeddings WHERE vec_id < 50)
              |SELECT vec_id, j, round(0.25 * list_dot_product(v, mrow), 6) AS val
              |FROM dv CROSS JOIN m ORDER BY vec_id, j""".stripMargin)),

    Q("a17_projected_recall",
      (s, d) => {
        val m = mgr(s, d)
        // the JL projection's eval loop: recall@10 of brute-force top-k
        // in PROJECTED (16-dim) space vs the full-dim exact baseline —
        // the measurement that justifies (or rejects) a projection dim
        // before the cheap space becomes the index key at corpus scale.
        // On THIS corpus recall is ~0.1-0.2 BY CONSTRUCTION: the synthetic
        // embeddings are isotropic noise (near-orthogonal, no low-dim
        // structure), the provable worst case for any 4× reduction —
        // which is exactly what the eval loop exists to catch before an
        // index is built on the projected key. Real embedding manifolds
        // (low intrinsic dim) are the case the projection serves.
        val all = m.getDDFByName("embeddings").df
          .select(col("vec_id"), col("embedding"))
        val queries = all.filter(col("vec_id") < 5)
          .withColumnRenamed("vec_id", "qid")
        val exact = pipeline.Similarity.bruteForceTopK(
          all, queries, "embedding", "vec_id", "qid", 10)
        val pc = pipeline.Similarity.randomProject(all, "embedding",
          "proj", outDim = 16, seed = 7L).select(col("vec_id"), col("proj"))
        val pq = pipeline.Similarity.randomProject(queries, "embedding",
          "proj", outDim = 16, seed = 7L).select(col("qid"), col("proj"))
        val approx = pipeline.Similarity.bruteForceTopK(
          pc, pq, "proj", "vec_id", "qid", 10)
        pipeline.Similarity.annRecall(approx, exact, k = 10)
          .orderBy("query_id")
      },
      Some {
        val cosB = "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
        val cosP = "list_dot_product(a.p, b.p) / (sqrt(list_dot_product(a.p, a.p)) * sqrt(list_dot_product(b.p, b.p)))"
        s"""WITH mt AS (SELECT $a16MatrixSql::DOUBLE[][] AS mat),
           |m AS (SELECT j, mat[j] AS mrow FROM mt, unnest(range(1, 17)) AS t(j)),
           |dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           |       FROM embeddings),
           |brute AS (SELECT query_id, id FROM (
           |    SELECT a.vec_id AS query_id, b.vec_id AS id,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY $cosB DESC, b.vec_id) AS rk
           |    FROM (SELECT * FROM dv WHERE vec_id < 5) a CROSS JOIN dv b)
           |  WHERE rk <= 10),
           |pv AS (SELECT dv.vec_id,
           |    list(0.25 * list_dot_product(dv.v, m.mrow) ORDER BY m.j) AS p
           |  FROM dv CROSS JOIN m GROUP BY dv.vec_id),
           |pb AS (SELECT query_id, id FROM (
           |    SELECT a.vec_id AS query_id, b.vec_id AS id,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY $cosP DESC, b.vec_id) AS rk
           |    FROM (SELECT * FROM pv WHERE vec_id < 5) a CROSS JOIN pv b)
           |  WHERE rk <= 10),
           |hits AS (SELECT b.query_id, count(l.id) AS n_hits FROM brute b
           |    LEFT JOIN pb l ON b.query_id = l.query_id AND b.id = l.id
           |  GROUP BY b.query_id),
           |den AS (SELECT query_id, count(*) AS n_truth FROM brute GROUP BY query_id)
           |SELECT d.query_id AS query_id, coalesce(h.n_hits, 0) AS n_hits,
           |  d.n_truth, coalesce(h.n_hits, 0)::DOUBLE / d.n_truth AS recall
           |FROM den d LEFT JOIN hits h ON d.query_id = h.query_id
           |ORDER BY d.query_id""".stripMargin
      }),

    Q("a18_ivf_save_load",
      (s, d) => {
        val m = mgr(s, d)
        // durability round trip (r15): the a03 search, but the index is
        // SAVED (manifest-verified parquet: centroids + cell-partitioned
        // corpus + int8 sidecar + raw float tier) and LOADED back before
        // searching. The oracle is a03's search math untouched — storage
        // must be invisible to results, which is exactly the
        // search-after-load ≡ search-before-save contract.
        val all = m.getDDFByName("embeddings").df
        val queries = all.filter(col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        val centroids = all.filter(col("vec_id") < 16).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble))
        val idx = pipeline.IvfIndex.buildFromCentroids(all, "embedding", "vec_id", centroids)
        withScratch("graft_a18") { tmp =>
          pipeline.IvfIndex.save(idx, s"$tmp/ivf")
          val loaded = pipeline.IvfIndex.load(s, s"$tmp/ivf", verify = true)
          collectAndClean(s,
            pipeline.IvfIndex.topK(loaded, queries, "embedding", "qid",
                k = 10, nprobe = 4)
              .select(col("query_id"), col("id"),
                round(col("cosine"), 6).as("cosine"), col("rk"))
              .orderBy("query_id", "rk"), tmp)
        }
      },
      // identical to a03's oracle: persistence must not change one bit
      Some {
        val cos = (a: String, b: String) =>
          s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
        s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           |            FROM embeddings),
           |cents AS (SELECT vec_id AS cell, v AS cv FROM dv WHERE vec_id < 16),
           |assigned AS (SELECT id, v, cell FROM (
           |    SELECT d.vec_id AS id, d.v, c.cell,
           |      row_number() OVER (PARTITION BY d.vec_id ORDER BY
           |        list_dot_product(d.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
           |        c.cell DESC) AS rn
           |    FROM dv d CROSS JOIN cents c) WHERE rn = 1),
           |probes AS (SELECT query_id, qv, cell FROM (
           |    SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        list_dot_product(q.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
           |        c.cell) AS crk
           |    FROM (SELECT * FROM dv WHERE vec_id < 3) q CROSS JOIN cents c)
           |  WHERE crk <= 4),
           |scored AS (SELECT p.query_id, a.id, ${cos("p.qv", "a.v")} AS cs
           |  FROM probes p JOIN assigned a ON a.cell = p.cell)
           |SELECT query_id, id, round(cs, 6) AS cosine, rk FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY cs DESC, id) AS rk FROM scored)
           |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin
      }),

    Q("a19_projected_recall_clustered",
      (s, d) => {
        val m = mgr(s, d)
        // a17's PASSING twin (r15): same eval loop, but the corpus is
        // given genuine low intrinsic dimension (signal confined to the
        // first 4 coordinates — the structure real embedding manifolds
        // have) before the 64→16 JL projection. a17 demonstrates the
        // gate REJECTING a projection (isotropic noise, recall ~0.15);
        // this demonstrates it passing — together they show the eval
        // measures the corpus, not the harness.
        val all = m.getDDFByName("embeddings").df
          .select(col("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i < 4, x).otherwise(lit(0.0f))).as("embedding"))
        val queries = all.filter(col("vec_id") < 5)
          .withColumnRenamed("vec_id", "qid")
        val exact = pipeline.Similarity.bruteForceTopK(
          all, queries, "embedding", "vec_id", "qid", 10)
        val pc = pipeline.Similarity.randomProject(all, "embedding",
          "proj", outDim = 16, seed = 7L).select(col("vec_id"), col("proj"))
        val pq = pipeline.Similarity.randomProject(queries, "embedding",
          "proj", outDim = 16, seed = 7L).select(col("qid"), col("proj"))
        val approx = pipeline.Similarity.bruteForceTopK(
          pc, pq, "proj", "vec_id", "qid", 10)
        pipeline.Similarity.annRecall(approx, exact, k = 10)
          .orderBy("query_id")
      },
      Some {
        val cosB = "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
        val cosP = "list_dot_product(a.p, b.p) / (sqrt(list_dot_product(a.p, a.p)) * sqrt(list_dot_product(b.p, b.p)))"
        s"""WITH mt AS (SELECT $a16MatrixSql::DOUBLE[][] AS mat),
           |m AS (SELECT j, mat[j] AS mrow FROM mt, unnest(range(1, 17)) AS t(j)),
           |dv AS (SELECT vec_id, list_transform(embedding,
           |         (x, i) -> CASE WHEN i <= 4 THEN x::DOUBLE ELSE 0.0 END) AS v
           |       FROM embeddings),
           |brute AS (SELECT query_id, id FROM (
           |    SELECT a.vec_id AS query_id, b.vec_id AS id,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY $cosB DESC, b.vec_id) AS rk
           |    FROM (SELECT * FROM dv WHERE vec_id < 5) a CROSS JOIN dv b)
           |  WHERE rk <= 10),
           |pv AS (SELECT dv.vec_id,
           |    list(0.25 * list_dot_product(dv.v, m.mrow) ORDER BY m.j) AS p
           |  FROM dv CROSS JOIN m GROUP BY dv.vec_id),
           |pb AS (SELECT query_id, id FROM (
           |    SELECT a.vec_id AS query_id, b.vec_id AS id,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY $cosP DESC, b.vec_id) AS rk
           |    FROM (SELECT * FROM pv WHERE vec_id < 5) a CROSS JOIN pv b)
           |  WHERE rk <= 10),
           |hits AS (SELECT b.query_id, count(l.id) AS n_hits FROM brute b
           |    LEFT JOIN pb l ON b.query_id = l.query_id AND b.id = l.id
           |  GROUP BY b.query_id),
           |den AS (SELECT query_id, count(*) AS n_truth FROM brute GROUP BY query_id)
           |SELECT d.query_id AS query_id, coalesce(h.n_hits, 0) AS n_hits,
           |  d.n_truth, coalesce(h.n_hits, 0)::DOUBLE / d.n_truth AS recall
           |FROM den d LEFT JOIN hits h ON d.query_id = h.query_id
           |ORDER BY d.query_id""".stripMargin
      }),

    Q("d17_source_overlap",
      (s, d) => {
        val m = mgr(s, d)
        // source-admission analysis: a synthetic aggregator source
        // ("crawl_dup", every 4th doc re-tagged) overlaps each real
        // source — the matrix reports containment/jaccard per direction.
        // The synthetic corpus has no natural cross-source dups (verified
        // at sf0.01), so the aggregator is the deterministic fixture.
        val docs = m.getDDFByName("documents").df
        val aug = docs.select(col("source"), col("text"))
          .unionByName(docs.filter(col("doc_id") % 4 === 0)
            .select(lit("crawl_dup").as("source"), col("text")))
        pipeline.Dedup.sourceOverlap(aug, "text", "source")
          .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
            col("n_shared"), round(col("containment"), 6).as("containment"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy("source_a", "source_b")
      },
      Some(s"""WITH aug AS (SELECT source, text FROM documents
              |    UNION ALL
              |    SELECT 'crawl_dup' AS source, text FROM documents
              |    WHERE doc_id % 4 = 0),
              |sk AS (SELECT DISTINCT source, md5(${duckNorm("text")}) AS k FROM aug),
              |t AS (SELECT source, count(*) AS n FROM sk GROUP BY 1),
              |p AS (SELECT a.source AS source_a, b.source AS source_b,
              |    count(*) AS n_shared
              |  FROM sk a JOIN sk b ON a.k = b.k AND a.source != b.source
              |  GROUP BY 1, 2)
              |SELECT source_a, source_b, t1.n::BIGINT AS n_a, t2.n::BIGINT AS n_b,
              |  n_shared::BIGINT AS n_shared,
              |  round(n_shared::DOUBLE / t1.n, 6) AS containment,
              |  round(n_shared::DOUBLE / (t1.n + t2.n - n_shared), 6) AS jaccard
              |FROM p JOIN t t1 ON t1.source = p.source_a
              |JOIN t t2 ON t2.source = p.source_b
              |ORDER BY source_a, source_b""".stripMargin)),

    Q("d16_soft_dedup_weights",
      (s, d) => {
        val m = mgr(s, d)
        // downweight-instead-of-remove dedup: every doc keeps a row, a
        // dup cluster's members share one document's worth of weight —
        // the trainer (or a later weighted sample) consumes the column
        val docs = m.getDDFByName("embeddings").df
          .filter(col("vec_id") < 200).select("vec_id")
        pipeline.Dedup.softDedupWeights(docs, embeddingPairs(m), "vec_id")
          .select(col("vec_id"), round(col("weight"), 6).as("weight"))
          .orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE
              |$duckClusterCtes,
              |cs AS (SELECT cluster_id, count(*) AS n FROM c GROUP BY cluster_id),
              |w AS (SELECT c.id, 1.0::DOUBLE / cs.n AS weight
              |      FROM c JOIN cs USING (cluster_id))
              |SELECT e.vec_id, round(coalesce(w.weight, 1.0::DOUBLE), 6) AS weight
              |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 200) e
              |LEFT JOIN w ON w.id = e.vec_id
              |ORDER BY e.vec_id""".stripMargin)),

    Q("d06_dup_clusters",
      (s, d) => {
        val m = mgr(s, d)
        pipeline.Dedup.dupClusters(embeddingPairs(m))
          .groupBy("cluster_id").agg(count(lit(1)).as("csize"))
          .orderBy("cluster_id")
      },
      Some(s"""WITH RECURSIVE
              |$duckClusterCtes
              |SELECT cluster_id, count(*) AS csize FROM c
              |GROUP BY cluster_id ORDER BY cluster_id""".stripMargin)),

    Q("d09_cluster_reps",
      (s, d) => {
        val m = mgr(s, d)
        // quality-aware survivor choice: keep the max-L2-norm member of
        // each near-dup cluster (norm² via the codegen'd dot product on
        // the raw array<double> column — same left-to-right double
        // summation as DuckDB's list_dot_product, so the ranking key is
        // bit-identical; d05 proves the raw column needs no cast)
        val scores = m.getDDFByName("embeddings").df.filter(col("vec_id") < 200)
          .select(col("vec_id"),
            graft.functions.VectorFunctions.dot(
              col("embedding"), col("embedding")).as("norm2"))
        pipeline.Dedup.clusterRepresentativesBy(
            pipeline.Dedup.dupClusters(embeddingPairs(m)), scores, "vec_id", "norm2")
          .orderBy("cluster_id")
      },
      Some(s"""WITH RECURSIVE
              |$duckClusterCtes,
              |sc AS (SELECT vec_id AS id, list_dot_product(v, v) AS norm2 FROM dv),
              |rr AS (SELECT c.cluster_id, c.id,
              |    row_number() OVER (PARTITION BY c.cluster_id
              |      ORDER BY sc.norm2 DESC, c.id DESC) AS rn
              |  FROM c JOIN sc ON sc.id = c.id)
              |SELECT cluster_id, id AS keep_id FROM rr WHERE rn = 1
              |ORDER BY cluster_id""".stripMargin)),

    Q("t01_text_enrich",
      (s, d) => {
        val m = mgr(s, d)
        pipeline.TextAnalysis.enrich(m.getDDFByName("documents").df, "text")
          .select(col("doc_id"), col("token_count"), col("subword_count"),
            col("lang_pred"), round(col("quality"), 6).as("quality"), col("fingerprint"))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH sc AS (SELECT doc_id, text, $duckLangScores FROM documents)
           |SELECT doc_id,
           |  ${duckTokenCount("text")} AS token_count,
           |  coalesce(list_sum(list_transform(${duckToks("text")},
           |    t -> greatest(1, ceil(length(t) / 6.0)::BIGINT))), 0)::BIGINT AS subword_count,
           |  $duckLangCase AS lang_pred,
           |  round(${duckQuality("text")}, 6) AS quality,
           |  md5(${duckNorm("text")}) AS fingerprint
           |FROM sc ORDER BY doc_id""".stripMargin)),

    Q("t08_balanced_lang_sample",
      (s, d) => {
        val m = mgr(s, d)
        // composition: language-ID the corpus, then a deterministic
        // exact-n sample per language — the "balance the mixture" step
        val tagged = m.getDDFByName("documents").df
          .select(col("doc_id"), pipeline.TextAnalysis.langId("text").as("lang_pred"))
        Views.stratifiedSample(m.register(tagged), "lang_pred", 25, "doc_id")
          .df.orderBy("lang_pred", "doc_id")
      },
      Some(
        s"""WITH sc AS (SELECT doc_id, $duckLangScores FROM documents),
           |lang AS (SELECT doc_id, $duckLangCase AS lang_pred FROM sc),
           |h AS (SELECT doc_id, lang_pred,
           |    (doc_id % 1000000000) * 2654435761 AS p FROM lang),
           |r AS (SELECT doc_id, lang_pred,
           |    row_number() OVER (PARTITION BY lang_pred
           |      ORDER BY xor(p, p >> 31) % 1000000007, doc_id) AS rn FROM h)
           |SELECT doc_id, lang_pred FROM r WHERE rn <= 25
           |ORDER BY lang_pred, doc_id""".stripMargin)),

    Q("t02_rolling_hash",
      (s, d) => {
        val m = mgr(s, d)
        m.getDDFByName("documents").df
          .select(col("doc_id"), pipeline.TextAnalysis.rollingHash("text").as("rhash"))
          .orderBy("doc_id")
      },
      // same char fold in DuckDB: list_reduce with a prepended 0 seed;
      // % == pmod here because every operand is non-negative
      Some(s"""WITH n AS (SELECT doc_id, ${duckNorm("text")} AS t FROM documents)
              |SELECT doc_id,
              |  list_reduce(
              |    list_prepend(0::BIGINT, list_transform(regexp_split_to_array(t, ''),
              |      c -> coalesce(ascii(c), 0)::BIGINT)),
              |    (acc, x) -> (acc * 31 + x) % 1000000007) AS rhash
              |FROM n ORDER BY doc_id""".stripMargin)),

    Q("d08_incremental_dedup",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        // ingest shape: first half of the corpus is the existing index,
        // second half arrives as the new batch
        val index = pipeline.Dedup.exact(docs.filter(col("doc_id") % 2 === 0),
          "text", "doc_id").select("fingerprint")
        pipeline.Dedup.incrementalExact(docs.filter(col("doc_id") % 2 === 1),
            index, "text", "doc_id")
          .orderBy("fingerprint")
      },
      Some(s"""WITH fp AS (SELECT doc_id, md5(${duckNorm("text")}) AS fingerprint
              |  FROM documents),
              |idx AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 2 = 0),
              |batch AS (SELECT fingerprint, min(doc_id) AS keep_id FROM fp
              |  WHERE doc_id % 2 = 1 GROUP BY 1)
              |SELECT fingerprint, keep_id FROM batch
              |WHERE fingerprint NOT IN (SELECT fingerprint FROM idx)
              |ORDER BY fingerprint""".stripMargin)),

    Q("t03_repetition",
      (s, d) => {
        val m = mgr(s, d)
        pipeline.TextAnalysis.repetitionMetrics(
            m.getDDFByName("documents").df, "text", "doc_id")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      // all fractions are small-int ratios — identical IEEE division on
      // both engines, no rounding needed. top-bigram count via
      // unnest+groupBy mirrors the explode+partial-agg shape.
      Some(s"""WITH toks AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
              |ng AS (SELECT doc_id,
              |  ${duckNgrams("tk", 2)} AS bgs,
              |  ${duckNgrams("tk", 3)} AS tgs FROM toks),
              |bgex AS (SELECT doc_id, unnest(bgs) AS b FROM ng),
              |cnt AS (SELECT doc_id, b, count(*) AS c FROM bgex GROUP BY 1, 2),
              |mx AS (SELECT doc_id, max(c) AS m FROM cnt GROUP BY 1)
              |SELECT t.doc_id, len(tk)::BIGINT AS token_count,
              |  CASE WHEN len(tk) = 0 THEN 0.0
              |       ELSE 1.0 - len(list_distinct(tk)) / len(tk)::DOUBLE END AS dup_word_frac,
              |  CASE WHEN len(bgs) = 0 THEN 0.0
              |       ELSE coalesce(m, 0) / len(bgs)::DOUBLE END AS top_bigram_frac,
              |  CASE WHEN len(tgs) = 0 THEN 0.0
              |       ELSE 1.0 - len(list_distinct(tgs)) / len(tgs)::DOUBLE END AS dup_trigram_frac
              |FROM toks t JOIN ng USING (doc_id) LEFT JOIN mx USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    Q("t04_decontaminate",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        // benchmark/eval corpus stand-in: every 37th document; 5-gram
        // overlap flags its planted near-duplicates in the corpus
        val bench = docs.filter(col("doc_id") % 37 === 0)
        pipeline.TextAnalysis.decontaminate(
            docs.filter(col("doc_id") % 37 =!= 0), bench, "text", "doc_id", n = 5)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      // oracle joins raw shingle STRINGS (the engine joins their 64-bit
      // hashes — identical counts absent a collision in this data)
      Some(s"""WITH toks AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
              |sh AS (SELECT doc_id, ${duckNgrams("tk", 5)} AS shs FROM toks),
              |ex AS (SELECT DISTINCT doc_id, unnest(shs) AS s FROM sh),
              |bench AS (SELECT DISTINCT s FROM ex WHERE doc_id % 37 = 0),
              |hits AS (SELECT e.doc_id, count(*) AS n FROM ex e JOIN bench USING (s)
              |  WHERE e.doc_id % 37 != 0 GROUP BY 1)
              |SELECT t.doc_id, coalesce(n, 0)::BIGINT AS overlap_shingles,
              |  coalesce(n, 0) > 0 AS contaminated
              |FROM toks t LEFT JOIN hits USING (doc_id)
              |WHERE t.doc_id % 37 != 0 ORDER BY doc_id""".stripMargin)),

    Q("t17_contamination_matrix",
      (s, d) => {
        // multi-suite decontamination in ONE corpus pass: the held-out
        // docs (doc_id % 37 == 0) split into three benchmark suites by
        // doc_id % 3; the matrix gives per-(doc, suite) distinct-shingle
        // overlap. Engine joins 64-bit shingle hashes; the oracle joins
        // the raw shingle strings (t04's identical-absent-collision
        // argument).
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        val benches = docs.filter(col("doc_id") % 37 === 0)
          .select(concat(lit("b"), (col("doc_id") % 3).cast("string")).as("bench_id"),
            col("text"))
        pipeline.TextAnalysis.contaminationMatrix(
            docs.filter(col("doc_id") % 37 =!= 0), benches,
            "text", "doc_id", "bench_id", n = 3)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id", "bench_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
              |sh AS (SELECT doc_id, ${duckNgrams("tk", 3)} AS shs FROM toks),
              |ex AS (SELECT DISTINCT doc_id, unnest(shs) AS s FROM sh),
              |bench AS (SELECT DISTINCT 'b' || (doc_id % 3) AS bench_id, s
              |  FROM ex WHERE doc_id % 37 = 0)
              |SELECT e.doc_id, b.bench_id, count(*)::BIGINT AS overlap_shingles
              |FROM ex e JOIN bench b USING (s) WHERE e.doc_id % 37 <> 0
              |GROUP BY 1, 2 ORDER BY doc_id, bench_id""".stripMargin)),

    Q("t18_contamination_report",
      (s, d) => {
        // the publish-gate rollup of t17: per-suite contaminated-doc and
        // overlap totals, zero rows for clean suites — config-sized
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        val benches = docs.filter(col("doc_id") % 37 === 0)
          .select(concat(lit("b"), (col("doc_id") % 3).cast("string")).as("bench_id"),
            col("text"))
        pipeline.TextAnalysis.contaminationReport(
            docs.filter(col("doc_id") % 37 =!= 0), benches,
            "text", "doc_id", "bench_id", n = 3)
          .orderBy("bench_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
              |sh AS (SELECT doc_id, ${duckNgrams("tk", 3)} AS shs FROM toks),
              |ex AS (SELECT DISTINCT doc_id, unnest(shs) AS s FROM sh),
              |bench AS (SELECT DISTINCT 'b' || (doc_id % 3) AS bench_id, s
              |  FROM ex WHERE doc_id % 37 = 0),
              |m AS (SELECT e.doc_id, b.bench_id, count(*) AS o
              |  FROM ex e JOIN bench b USING (s) WHERE e.doc_id % 37 <> 0
              |  GROUP BY 1, 2),
              |r AS (SELECT bench_id, count(DISTINCT doc_id)::BIGINT AS contaminated_docs,
              |    sum(o)::BIGINT AS total_overlap_shingles
              |  FROM m GROUP BY 1),
              |ids AS (SELECT DISTINCT 'b' || (doc_id % 3) AS bench_id
              |  FROM documents WHERE doc_id % 37 = 0)
              |SELECT ids.bench_id,
              |  coalesce(contaminated_docs, 0) AS contaminated_docs,
              |  coalesce(total_overlap_shingles, 0) AS total_overlap_shingles
              |FROM ids LEFT JOIN r USING (bench_id)
              |ORDER BY bench_id""".stripMargin)),

    Q("t05_redact_pii",
      (s, d) => {
        val m = mgr(s, d)
        // synthesize PII-bearing text from customer fields — one planted
        // instance per redaction class (r16 adds IBAN, payment card,
        // IPv6 to the original phone/email/IPv4), then redact all six
        val phone = concat(
          lpad((col("c_nationkey") + 10).cast("string"), 2, "0"), lit("-"),
          lpad(pmod(col("c_custkey"), lit(1000)).cast("string"), 3, "0"), lit("-"),
          lpad(pmod(col("c_custkey") * 7, lit(1000)).cast("string"), 3, "0"), lit("-"),
          lpad(pmod(col("c_custkey") * 13, lit(10000)).cast("string"), 4, "0"))
        val iban = concat(lit("GB"),
          lpad((col("c_nationkey") + 10).cast("string"), 2, "0"),
          lit("NWBK6016"),
          lpad(pmod(col("c_custkey"), lit(100000000)).cast("string"), 8, "0"))
        val card = concat(lit("4"),
          lpad(pmod(col("c_custkey"), lit(1000)).cast("string"), 3, "0"), lit(" "),
          lpad(pmod(col("c_custkey") * 3, lit(10000)).cast("string"), 4, "0"), lit(" "),
          lpad(pmod(col("c_custkey") * 7, lit(10000)).cast("string"), 4, "0"), lit(" "),
          lpad(pmod(col("c_custkey") * 11, lit(10000)).cast("string"), 4, "0"))
        val txt = concat(lit("contact "), col("c_name"), lit(" at "), phone,
          lit(" or mail "),
          lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", ".")),
          lit("@example.com from host 10.1."),
          pmod(col("c_custkey"), lit(200)).cast("string"), lit(".7"),
          lit("; iban "), iban, lit(" card "), card,
          lit(" via fe80::"), pmod(col("c_custkey"), lit(997)).cast("string"))
        m.getDDFByName("customer").df
          .select(col("c_custkey"), pipeline.TextAnalysis.redactPII(txt).as("redacted"))
          .orderBy("c_custkey")
      },
      Some("""WITH t AS (SELECT c_custkey,
             |  'contact ' || c_name || ' at '
             |    || lpad((c_nationkey + 10)::VARCHAR, 2, '0') || '-'
             |    || lpad((c_custkey % 1000)::VARCHAR, 3, '0') || '-'
             |    || lpad((c_custkey * 7 % 1000)::VARCHAR, 3, '0') || '-'
             |    || lpad((c_custkey * 13 % 10000)::VARCHAR, 4, '0') || ' or mail '
             |    || lower(regexp_replace(c_name, '[^A-Za-z0-9]', '.', 'g'))
             |    || '@example.com from host 10.1.'
             |    || (c_custkey % 200)::VARCHAR || '.7'
             |    || '; iban GB' || lpad((c_nationkey + 10)::VARCHAR, 2, '0')
             |    || 'NWBK6016' || lpad((c_custkey % 100000000)::VARCHAR, 8, '0')
             |    || ' card 4' || lpad((c_custkey % 1000)::VARCHAR, 3, '0') || ' '
             |    || lpad((c_custkey * 3 % 10000)::VARCHAR, 4, '0') || ' '
             |    || lpad((c_custkey * 7 % 10000)::VARCHAR, 4, '0') || ' '
             |    || lpad((c_custkey * 11 % 10000)::VARCHAR, 4, '0')
             |    || ' via fe80::' || (c_custkey % 997)::VARCHAR AS txt
             |  FROM customer)
             |SELECT c_custkey, regexp_replace(regexp_replace(regexp_replace(
             |  regexp_replace(regexp_replace(regexp_replace(txt,
             |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |  '\b[A-Z]{2}[0-9]{2}( ?[A-Z0-9]{4}){2,7}( ?[A-Z0-9]{1,3})?\b',
             |    '<IBAN>', 'g'),
             |  '\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{1,4}\b', '<CARD>', 'g'),
             |  '\d{2,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]\d{4}', '<PHONE>', 'g'),
             |  '(?i)(\b([0-9a-f]{1,4}:){7}[0-9a-f]{1,4}\b|\b[0-9a-f]{1,4}(:[0-9a-f]{1,4})*::([0-9a-f]{1,4}(:[0-9a-f]{1,4})*\b)?|::[0-9a-f]{1,4}(:[0-9a-f]{1,4})*\b)',
             |    '<IPV6>', 'g'),
             |  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
             |FROM t ORDER BY c_custkey""".stripMargin)),

    Q("t06_vocabulary",
      (s, d) => {
        val m = mgr(s, d)
        pipeline.TextAnalysis.vocabulary(
            m.getDDFByName("documents").df, "text", "doc_id", minDocFreq = 5)
          .orderBy("token")
      },
      Some(s"""WITH ex AS (SELECT doc_id, unnest(${duckToks("text")}) AS token
              |  FROM documents),
              |g AS (SELECT token, doc_id, count(*) AS c FROM ex GROUP BY 1, 2)
              |SELECT token, count(*)::BIGINT AS doc_freq,
              |  sum(c)::BIGINT AS term_count
              |FROM g GROUP BY token HAVING count(*) >= 5
              |ORDER BY token""".stripMargin)),

    Q("t22_ngram_novelty",
      (s, d) => {
        val m = mgr(s, d)
        // corpus-order novelty: share of each doc's distinct 3-gram
        // shingles first seen in THAT doc (min doc_id over the corpus).
        // Portable string shingles so the oracle joins the same keys;
        // the default hashShingles=true path is the 64-bit scale twin
        // (same identical-absent-collision trade as t04/t17).
        pipeline.TextAnalysis.ngramNovelty(
          m.getDDFByName("documents").df, "text", "doc_id",
          hashShingles = false)
          .orderBy("doc_id")
      },
      Some(s"""WITH docs AS (SELECT doc_id, text FROM documents
              |  WHERE text IS NOT NULL AND doc_id IS NOT NULL),
              |posts AS (SELECT doc_id, unnest(${duckShingles("text")}) AS sh FROM docs),
              |tot AS (SELECT doc_id, count(*) AS n_shingles FROM posts GROUP BY doc_id),
              |fst AS (SELECT sh, min(doc_id) AS doc_id FROM posts GROUP BY sh),
              |nov AS (SELECT doc_id, count(*) AS novel_shingles FROM fst GROUP BY doc_id)
              |SELECT t.doc_id, t.n_shingles,
              |  coalesce(n.novel_shingles, 0)::BIGINT AS novel_shingles,
              |  coalesce(n.novel_shingles, 0) / t.n_shingles::DOUBLE AS novelty
              |FROM tot t LEFT JOIN nov n ON n.doc_id = t.doc_id
              |ORDER BY t.doc_id""".stripMargin)),

    Q("t23_ngram_novelty_fast",
      (s, d) => {
        val m = mgr(s, d)
        // the benched 100 TB path: 8-byte xxhash64 shingle keys through
        // the postings shuffle (t22's d02-style rows-only twin — the
        // result is identical absent a 64-bit collision, which the t22
        // oracle pins on this corpus)
        pipeline.TextAnalysis.ngramNovelty(
          m.getDDFByName("documents").df, "text", "doc_id",
          hashShingles = true)
          .orderBy("doc_id")
      },
      None),

    Q("t26_distinct_ngrams",
      (s, d) => {
        val m = mgr(s, d)
        // per-source diversity: distinct-1/2/3 over the source slices.
        // Counts are exact via the two-level aggregate; the ratio is one
        // IEEE division of identical ints — unrounded, bit-exact
        pipeline.TextAnalysis.distinctNgrams(
            m.getDDFByName("documents").df, "text", "source", Seq(1, 2, 3))
          .orderBy("source", "n")
      },
      Some(s"""WITH tok AS (SELECT source, ${duckToks("text")} AS tk
              |  FROM documents WHERE text IS NOT NULL),
              |g1 AS (SELECT source, unnest(tk) AS gram FROM tok),
              |g2 AS (SELECT source, unnest(list_transform(range(1, len(tk)),
              |    i -> tk[i] || ' ' || tk[i+1])) AS gram FROM tok),
              |g3 AS (SELECT source, unnest(list_transform(range(1, len(tk) - 1),
              |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gram FROM tok),
              |a1 AS (SELECT source, gram, count(*) AS c FROM g1 GROUP BY 1, 2),
              |a2 AS (SELECT source, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
              |a3 AS (SELECT source, gram, count(*) AS c FROM g3 GROUP BY 1, 2),
              |u AS (
              |  SELECT source, 1 AS n, sum(c)::BIGINT AS total_ngrams,
              |    count(*)::BIGINT AS distinct_ngrams FROM a1 GROUP BY source
              |  UNION ALL
              |  SELECT source, 2 AS n, sum(c)::BIGINT, count(*)::BIGINT
              |    FROM a2 GROUP BY source
              |  UNION ALL
              |  SELECT source, 3 AS n, sum(c)::BIGINT, count(*)::BIGINT
              |    FROM a3 GROUP BY source)
              |SELECT source, n, total_ngrams, distinct_ngrams,
              |  distinct_ngrams::DOUBLE / total_ngrams::DOUBLE AS distinct_ratio
              |FROM u ORDER BY source, n""".stripMargin)),

    Q("t14_token_ids",
      (s, d) => {
        val m = mgr(s, d)
        // vocabulary → frequency-ranked ids → per-doc id sequences; the
        // rank's (term_count desc, token) tiebreak is a total order, so
        // the oracle's row_number reproduces it exactly. token_ids is
        // emitted as a comma string — oracle outputs are scalar-typed
        val docs = m.getDDFByName("documents").df
        val ranked = pipeline.TextAnalysis.rankVocabulary(
          pipeline.TextAnalysis.vocabulary(docs, "text", "doc_id", minDocFreq = 5))
        pipeline.TextAnalysis.encodeTokens(docs, "text", "doc_id", ranked)
          .select(col("id").as("doc_id"), col("n_tokens"),
            concat_ws(",", col("token_ids")).as("token_ids"))
          .orderBy("doc_id")
      },
      Some(s"""WITH dt AS (SELECT doc_id, ${duckToks("text")} AS toks FROM documents),
              |v0 AS (SELECT doc_id, unnest(toks) AS token FROM dt),
              |g AS (SELECT token, doc_id, count(*) AS c FROM v0 GROUP BY 1, 2),
              |v AS (SELECT token, sum(c) AS term_count FROM g GROUP BY token
              |      HAVING count(*) >= 5),
              |r AS (SELECT token,
              |    cast(row_number() OVER (ORDER BY term_count DESC, token) - 1 AS int) AS tid
              |  FROM v),
              |ex AS (SELECT doc_id, i AS pos, toks[i] AS token
              |  FROM dt, unnest(range(1, len(toks) + 1)) AS u(i)),
              |j AS (SELECT doc_id, pos, coalesce(r.tid, -1) AS tid
              |  FROM ex LEFT JOIN r USING (token))
              |SELECT doc_id, count(*)::BIGINT AS n_tokens,
              |  string_agg(tid::varchar, ',' ORDER BY pos) AS token_ids
              |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("t15_bpe_train",
      (s, d) => {
        val m = mgr(s, d)
        // real BPE trainer, BYTE-LEVEL (round 11): 6 greedy merges over a
        // corpus enriched with digits, punctuation, and non-ASCII text —
        // exactly what the alphabetic fast path silently drops. Symbols
        // are UTF-8 bytes as hex pairs; minFreq=1 mirrors the oracle's
        // unconditional 6 stages. Alphabetic mode stays spec-covered
        // (PipelineSpec "bpe").
        pipeline.TextAnalysis.bpeTrain(
            bpeCorpus(m.getDDFByName("documents").df),
            "text", nMerges = 6, minFreq = 1L, byteLevel = true)
          .orderBy("merge_rank")
      },
      Some(s"""WITH $duckBpeCorpus,
              |${duckBpeStages(6, "corpus", byteLevel = true)}
              |SELECT * FROM (${(0 until 6).map(k =>
                 s"SELECT $k AS merge_rank, l AS lhs, r AS rhs, l||r AS merged, " +
                 s"n AS pair_freq FROM b$k").mkString(" UNION ALL ")})
              |ORDER BY merge_rank""".stripMargin)),

    Q("t16_bpe_encode",
      (s, d) => {
        val m = mgr(s, d)
        val docs = bpeCorpus(m.getDDFByName("documents").df)
        val merges = pipeline.TextAnalysis.bpeTrain(docs, "text", nMerges = 6,
            minFreq = 1L, byteLevel = true)
          .orderBy("merge_rank").collect()
          .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
        // byte-level encode with the learned merges — one chained codegen
        // expression, no join, no OOV branch (every word byte-decomposes);
        // emit hex tokens space-joined (oracle outputs are scalar)
        pipeline.TextAnalysis.bpeEncode(docs.filter(col("doc_id") < 30), "text",
            merges, byteLevel = true)
          .select(col("doc_id").as("id"),
            array_join(col("bpe_tokens"), " ").as("bpe_text"))
          .orderBy("id")
      },
      Some(duckBpeEncodeSql)),

    Q("t19_bpe_vocab_roundtrip",
      (s, d) => {
        // tokenizer-artifact persistence: train → SAVE the merge table to
        // parquet → LOAD it back → encode. The oracle is t16's encode SQL
        // verbatim — the round-trip must be invisible in the result, which
        // is exactly the artifact contract (a vocab trained today encodes
        // identically from storage forever).
        val m = mgr(s, d)
        val docs = bpeCorpus(m.getDDFByName("documents").df)
        val trained = pipeline.TextAnalysis.bpeTrain(docs, "text", nMerges = 6,
          minFreq = 1L, byteLevel = true)
        withScratch("graft_t19") { tmp =>
          pipeline.TextAnalysis.bpeSave(trained, s"$tmp/vocab")
          val merges = pipeline.TextAnalysis.bpeLoad(s, s"$tmp/vocab")
          collectAndClean(s,
            pipeline.TextAnalysis.bpeEncode(docs.filter(col("doc_id") < 30), "text",
                merges, byteLevel = true)
              .select(col("doc_id").as("id"),
                array_join(col("bpe_tokens"), " ").as("bpe_text"))
              .orderBy("id"), tmp)
        }
      },
      Some(duckBpeEncodeSql)),

    Q("t20_bpe_encode_scale",
      (s, d) => {
        // bpeEncodeAtScale — the production-vocabulary encoder (broadcast
        // merge ranks + per-partition greedy loop instead of nMerges
        // nested codegen HOFs) — against t16's oracle VERBATIM: the loop
        // must be token-for-token the same greedy fold the expression
        // form (and the DuckDB replay) computes.
        val m = mgr(s, d)
        val docs = bpeCorpus(m.getDDFByName("documents").df)
        val merges = pipeline.TextAnalysis.bpeTrain(docs, "text", nMerges = 6,
            minFreq = 1L, byteLevel = true)
          .orderBy("merge_rank").collect()
          .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
        pipeline.TextAnalysis.bpeEncodeAtScale(docs.filter(col("doc_id") < 30),
            "text", merges, byteLevel = true)
          .select(col("doc_id").as("id"),
            array_join(col("bpe_tokens"), " ").as("bpe_text"))
          .orderBy("id")
      },
      Some(duckBpeEncodeSql)),

    Q("t21_unicode_normalize",
      (s, d) => {
        val m = mgr(s, d)
        // NFC canonicalization in front of dedup keys (round 13): append
        // a decomposed combining sequence ("e"+U+0301, "A"+U+030A) to
        // every doc, normalize with the native codegen'd expression via
        // the SQL registration, and flag the byte change. DuckDB's
        // nfc_normalize is the oracle twin — both engines must emit
        // identical UTF-8 bytes (precomposed é/Å).
        val suffix = " caf\u0065\u0301 \u0041\u030A"
        val raw = concat(col("text"), lit(suffix))
        m.getDDFByName("documents").df
          .select(col("doc_id"),
            functions.VectorFunctions.unicodeNormalize(raw).as("nfc_text"),
            (functions.VectorFunctions.unicodeNormalize(raw) =!= raw).as("changed"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  nfc_normalize(text || ' caf' || chr(101) || chr(769) || ' ' || chr(65) || chr(778)) AS nfc_text,
             |  nfc_normalize(text || ' caf' || chr(101) || chr(769) || ' ' || chr(65) || chr(778))
             |    <> (text || ' caf' || chr(101) || chr(769) || ' ' || chr(65) || chr(778)) AS changed
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("t07_chunking",
      (s, d) => {
        val m = mgr(s, d)
        // context-window chunking: 16-token windows, 4-token overlap
        pipeline.TextAnalysis.chunkByTokens(
            m.getDDFByName("documents").df, "text", "doc_id",
            maxTokens = 16, overlap = 4)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id", "chunk_id")
      },
      // step = 12; chunk i = tokens [i*12+1, i*12+16] (1-based inclusive)
      Some(s"""WITH toks AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
              |nz AS (SELECT doc_id, tk,
              |    ceil(greatest(len(tk) - 4, 1) / 12.0)::INT AS n
              |  FROM toks WHERE len(tk) > 0),
              |ex AS (SELECT doc_id, tk, unnest(range(0, n)) AS chunk_id FROM nz)
              |SELECT doc_id, chunk_id,
              |  len(tk[chunk_id*12+1 : chunk_id*12+16])::BIGINT AS n_tokens,
              |  array_to_string(tk[chunk_id*12+1 : chunk_id*12+16], ' ') AS chunk
              |FROM ex ORDER BY doc_id, chunk_id""".stripMargin)),

    Q("m01_multimodal_meta",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df.filter(col("doc_id") < 100)
        pipeline.Multimodal.withBinaryPayload(docs, "text", "text/plain")
          .select(col("doc_id"), col("meta.byte_len"), col("meta.content_hash"),
            col("meta.modality"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, octet_length(encode(text))::BIGINT AS byte_len,
             |  md5(text) AS content_hash, 'text/plain' AS modality
             |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin)),

    Q("e01_tumbling_30m",
      (s, d) => {
        val m = mgr(s, d)
        // same transform serves readStream sources (see StreamingSpec)
        streaming.EventStreams.tumblingCounts(m.getDDFByName("events").df, "30 minutes")
          .select(unix_timestamp(col("window_start")).as("bucket"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("bucket", "event_type")
      },
      Some(s"""SELECT (floor(epoch(ts))::BIGINT // 1800) * 1800 AS bucket, event_type,
              |  count(*) AS n, ${dsumSql("value")} AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin)),

    Q("e02_interval_join",
      (s, d) => {
        val m = mgr(s, d)
        // stream-stream interval join, exercised on its batch twin (the
        // SAME function serves two readStream sources — StreamingSpec
        // pins batch==stream row parity): purchases within 30 min of a
        // click by the same user
        val ev = m.getDDFByName("events").df
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"), col("value"))
        streaming.EventStreams.intervalJoin(clicks, purchases, Seq("user_id"),
            "click_ts", "purchase_ts", lowerMs = 0L, upperMs = 30 * 60 * 1000L)
          .select(col("user_id"), col("click_id"), col("purchase_id"),
            (unix_millis(col("purchase_ts")) - unix_millis(col("click_ts"))).as("gap_ms"),
            col("value"))
          .orderBy("click_id", "purchase_id")
      },
      Some("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
             |  epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms, p.value
             |FROM events c JOIN events p ON c.user_id = p.user_id
             |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
             |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
             |ORDER BY click_id, purchase_id""".stripMargin)),

    Q("e03_json_extract",
      (s, d) => {
        val m = mgr(s, d)
        // JSON string column → typed struct with an EXPLICIT schema
        // (one codegen'd parse per row, no inference job); integer sums
        // are exact on both engines. NULL-parse tolerance is part of
        // the contract: n counts all rows, n_parsed the parseable ones.
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))
        operators.Semistructured.extractJson(
            m.getDDFByName("events").df, "props", schema)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            count(col("json.k")).as("n_parsed"),
            sum(col("json.k")).as("sum_k"),
            min(col("json.k")).as("min_k"),
            max(col("json.k")).as("max_k"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  count(cast(json_extract_string(props, '$.k') AS int)) AS n_parsed,
             |  cast(sum(cast(json_extract_string(props, '$.k') AS int)) AS bigint) AS sum_k,
             |  min(cast(json_extract_string(props, '$.k') AS int)) AS min_k,
             |  max(cast(json_extract_string(props, '$.k') AS int)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("e04_json_nested",
      (s, d) => {
        val m = mgr(s, d)
        // nested-payload depth: build a deterministic nested JSON string
        // FROM the table's own values (both engines construct the same
        // bytes), then drive the full extraction chain — explicit-schema
        // parse → dotted-path projection → nested-array explode. Rows
        // whose k fails to parse propagate NULL payload → NULL struct →
        // explode drops them, mirrored by the oracle's k IS NOT NULL.
        import org.apache.spark.sql.types._
        val k = get_json_object(col("props"), "$.k").cast("int")
        val ev = m.getDDFByName("events").df
          .withColumn("payload", concat(
            lit("{\"m\":{\"et\":\""), col("event_type"), lit("\",\"k\":"), k,
            lit("},\"a\":["), k, lit(","), (k * 2), lit("]}")))
        val schema = StructType(Seq(
          StructField("m", StructType(Seq(
            StructField("et", StringType), StructField("k", IntegerType)))),
          StructField("a", ArrayType(IntegerType))))
        val parsed = operators.Semistructured.extractJson(ev, "payload", schema)
        val proj = operators.Semistructured.selectPaths(parsed, "json", Seq("m.et", "m.k"))
        operators.Semistructured.explodeArray(proj, "json.a", "elem")
          .groupBy(col("m_et"))
          .agg(count(lit(1)).as("n_elems"), sum(col("m_k")).as("sum_k"),
            sum(col("elem")).as("sum_elem"))
          .orderBy("m_et")
      },
      Some("""WITH base AS (SELECT event_type,
             |    cast(json_extract_string(props, '$.k') AS int) AS k FROM events),
             |p AS (SELECT '{"m":{"et":"' || event_type || '","k":' || k::VARCHAR ||
             |    '},"a":[' || k::VARCHAR || ',' || (k*2)::VARCHAR || ']}' AS payload
             |  FROM base WHERE k IS NOT NULL),
             |e0 AS (SELECT json_extract_string(payload, '$.m.et') AS m_et,
             |    cast(json_extract_string(payload, '$.m.k') AS int) AS m_k,
             |    payload FROM p),
             |el AS (SELECT m_et, m_k,
             |    cast(json_extract_string(payload, '$.a[0]') AS int) AS elem FROM e0
             |  UNION ALL SELECT m_et, m_k,
             |    cast(json_extract_string(payload, '$.a[1]') AS int) FROM e0)
             |SELECT m_et, count(*) AS n_elems, sum(m_k)::BIGINT AS sum_k,
             |  sum(elem)::BIGINT AS sum_elem
             |FROM el GROUP BY m_et ORDER BY m_et""".stripMargin)),

    Q("e05_funnel",
      (s, d) => {
        // ordered conversion funnel view→click→purchase per user —
        // greedy match in the (ts, event_id) total order (unique
        // event_id ⇒ deterministic ties); one shuffle on user_id, no
        // windows (TimeSeries.funnel scaladoc). The oracle spells the
        // same greedy semantics as K chained first-after-previous CTEs.
        operators.TimeSeries.funnel(loadEvents(s, d),
          "user_id", "ts", "event_id", "event_type",
          Seq("view", "click", "purchase"))
          .orderBy("step_idx")
      },
      Some("""WITH f AS (SELECT user_id, ts, event_id, event_type FROM events
             |  WHERE event_type IN ('view','click','purchase')
             |    AND user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL),
             |m1 AS (SELECT user_id, ts, event_id FROM f WHERE event_type='view'
             |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1),
             |m2 AS (SELECT f.user_id, f.ts, f.event_id FROM f JOIN m1 ON f.user_id = m1.user_id
             |  WHERE f.event_type='click'
             |    AND (f.ts > m1.ts OR (f.ts = m1.ts AND f.event_id > m1.event_id))
             |  QUALIFY row_number() OVER (PARTITION BY f.user_id ORDER BY f.ts, f.event_id) = 1),
             |m3 AS (SELECT f.user_id FROM f JOIN m2 ON f.user_id = m2.user_id
             |  WHERE f.event_type='purchase'
             |    AND (f.ts > m2.ts OR (f.ts = m2.ts AND f.event_id > m2.event_id))
             |  QUALIFY row_number() OVER (PARTITION BY f.user_id ORDER BY f.ts, f.event_id) = 1)
             |SELECT 1 AS step_idx, 'view' AS step, (SELECT count(*) FROM m1) AS reached
             |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM m2)
             |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM m3)
             |ORDER BY step_idx""".stripMargin)),

    Q("s01_sessionize",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        val ev = m.getDDFByName("events").df
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
          .as[streaming.EventStreams.EventRow]
        streaming.EventStreams.sessionize(ev, gapMs = 30 * 60 * 1000L)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("total_events"))
          .orderBy("user_id")
      },
      Some("""WITH g AS (SELECT user_id, ts,
             |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events)
             |SELECT user_id,
             |  count(CASE WHEN prev IS NULL
             |             OR epoch_ms(ts) - epoch_ms(prev) > 1800000 THEN 1 END) AS n_sessions,
             |  count(*) AS total_events
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("e06_temporal_split",
      (s, d) => {
        // entity-level purged temporal split: each USER lands wholly in
        // train/embargo/test by their FIRST event vs the cutoff (noon
        // Jan 1), 6 h embargo band dropped from both sides — the
        // leakage-safe eval prep for serially-correlated events
        operators.TimeSeries.entityTemporalSplit(loadEvents(s, d),
            "user_id", "ts",
            java.sql.Timestamp.valueOf("2024-01-01 12:00:00"),
            embargoMs = 6L * 3600 * 1000)
          .groupBy("split", "event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("split", "event_type")
      },
      Some("""WITH f AS (SELECT user_id, min(ts) AS ft FROM events GROUP BY 1),
             |lab AS (SELECT user_id,
             |    CASE WHEN ft < TIMESTAMP '2024-01-01 06:00:00' THEN 'train'
             |         WHEN ft < TIMESTAMP '2024-01-01 12:00:00' THEN 'embargo'
             |         ELSE 'test' END AS split
             |  FROM f)
             |SELECT split, event_type, count(*)::BIGINT AS n,
             |  count(DISTINCT e.user_id)::BIGINT AS n_users
             |FROM events e JOIN lab USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("u02_mapreduce",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        // typed map-reduce (reference U2): key by lang, reduce to
        // (n_docs, max_chars) — deterministic, SQL-mirrorable
        val docs = m.getDDFByName("documents")
        Transforms.mapReduce[String, (String, Long, Long)](docs)(_.getAs[String]("lang")) {
          case (k, rows) =>
            var n = 0L; var mx = 0L
            rows.foreach { r => n += 1; val c = r.getAs[Long]("n_chars"); if (c > mx) mx = c }
            (k, n, mx)
        }.df.toDF("lang", "n_docs", "max_chars").orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs, max(n_chars) AS max_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),
  )
}
