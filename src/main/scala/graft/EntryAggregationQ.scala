package graft

import graft.core.{DDF, DDFManager}
import graft.operators._
import graft.stats.{Sketches, Stats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryShared._

/** SparkEntry query rows — aggregation rows (q30-q39, q86-q91 etc.). Split from SparkEntry.scala by family
  * (r15 verdict ask #7); composed into the pinned registry by
  * [[SparkEntry.queries]].
  */
private[graft] object EntryAggregationQ {

  // =====================================================================
  // §2.4 Aggregation API
  // =====================================================================

  val qs: Seq[Q] = Seq(
    Q("q30_aggregate_api",
      (s, d) => {
        val m = mgr(s, d)
        Aggregations.aggregate(m.getDDFByName("lineitem"),
          "l_returnflag, n=count(*), mx=max(l_quantity), mn=min(l_quantity)")
          .df.orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n, max(l_quantity) AS mx,
             |  min(l_quantity) AS mn
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("q31_groupby_2step",
      (s, d) => {
        val m = mgr(s, d)
        val g = Aggregations.groupByStep1(m.getDDFByName("orders"), Seq("o_orderstatus"))
        Aggregations.groupByStep2(g, Seq("n=count(*)", "mx=max(o_totalprice)"))
          .df.orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n, max(o_totalprice) AS mx
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    Q("v01_validate",
      (s, d) => {
        val m = mgr(s, d)
        // publish-gate expectations over lineitem: two row rules (one
        // violated on purpose), a unique key, a clean FK, and a
        // deliberately wrong FK — all five counts oracle-exact
        import operators.Validate
        Validate.report(m.getDDFByName("lineitem").df, Seq(
          Validate.inRange("l_discount", 0.0, 0.05),
          Validate.oneOf("l_returnflag", Seq("A", "N")),
          Validate.UniqueKey(Seq("l_orderkey", "l_linenumber")),
          Validate.ForeignKey(Seq("l_orderkey"),
            m.getDDFByName("orders").df, Seq("o_orderkey")),
          Validate.ForeignKey(Seq("l_partkey"),
            m.getDDFByName("region").df, Seq("r_regionkey"))
        )).orderBy("rule")
      },
      Some("""SELECT * FROM (
             |  SELECT 'in_range(l_discount,0.0,0.05)' AS rule,
             |    sum(CASE WHEN l_discount IS NULL OR l_discount < 0.0
             |             OR l_discount > 0.05 THEN 1 ELSE 0 END)::BIGINT AS violations,
             |    count(*)::BIGINT AS checked FROM lineitem
             |  UNION ALL
             |  SELECT 'one_of(l_returnflag)',
             |    sum(CASE WHEN l_returnflag IS NULL
             |             OR l_returnflag NOT IN ('A', 'N') THEN 1 ELSE 0 END)::BIGINT,
             |    count(*)::BIGINT FROM lineitem
             |  UNION ALL
             |  SELECT 'unique(l_orderkey,l_linenumber)',
             |    coalesce((SELECT sum(n) FROM (
             |      SELECT count(*) AS n FROM lineitem
             |      GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)), 0)::BIGINT,
             |    count(*)::BIGINT FROM lineitem
             |  UNION ALL
             |  SELECT 'fk(l_orderkey)',
             |    (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
             |     AND NOT EXISTS (
             |       SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))::BIGINT,
             |    count(*)::BIGINT FROM lineitem
             |  UNION ALL
             |  SELECT 'fk(l_partkey)',
             |    (SELECT count(*) FROM lineitem l WHERE l.l_partkey IS NOT NULL
             |     AND NOT EXISTS (
             |       SELECT 1 FROM region r WHERE r.r_regionkey = l.l_partkey))::BIGINT,
             |    count(*)::BIGINT FROM lineitem
             |) ORDER BY rule""".stripMargin)),

    Q("v02_vector_validate",
      (s, d) => {
        val m = mgr(s, d)
        // embedding publish gate: dimension drift / NaN poisoning /
        // zero vectors, planted deterministically (every 97th vec gets a
        // NaN head, every 89th is truncated to dim 3, every 83rd zeroed;
        // the when-chain precedence mirrors the oracle's CASE)
        import operators.Validate
        val aug = m.getDDFByName("embeddings").df.select(col("vec_id"),
          when(col("vec_id") % 97 === 0,
            concat(array(lit(Float.NaN)), slice(col("embedding"), 2, 63)))
            .when(col("vec_id") % 89 === 0, slice(col("embedding"), 1, 3))
            .when(col("vec_id") % 83 === 0,
              transform(col("embedding"), _ => lit(0.0f)))
            .otherwise(col("embedding")).as("embedding"))
        Validate.report(aug, Seq(
          Validate.vectorDim("embedding", 64),
          Validate.vectorFinite("embedding"),
          Validate.vectorNonZero("embedding"))).orderBy("rule")
      },
      Some("""WITH aug AS (SELECT vec_id,
             |    CASE WHEN vec_id % 97 = 0
             |           THEN list_concat(['NaN'::FLOAT], embedding[2:64])
             |         WHEN vec_id % 89 = 0 THEN embedding[1:3]
             |         WHEN vec_id % 83 = 0
             |           THEN list_transform(embedding, x -> 0.0::FLOAT)
             |         ELSE embedding END AS embedding
             |  FROM embeddings)
             |SELECT * FROM (
             |  SELECT 'vector_dim(embedding,64)' AS rule,
             |    sum(CASE WHEN embedding IS NULL OR len(embedding) != 64
             |             THEN 1 ELSE 0 END)::BIGINT AS violations,
             |    count(*)::BIGINT AS checked FROM aug
             |  UNION ALL
             |  SELECT 'vector_finite(embedding)',
             |    sum(CASE WHEN embedding IS NULL OR len(list_filter(embedding,
             |             x -> isnan(x) OR isinf(x))) > 0 THEN 1 ELSE 0 END)::BIGINT,
             |    count(*)::BIGINT FROM aug
             |  UNION ALL
             |  SELECT 'vector_nonzero(embedding)',
             |    sum(CASE WHEN embedding IS NULL OR len(list_filter(embedding,
             |             x -> x != 0)) = 0 THEN 1 ELSE 0 END)::BIGINT,
             |    count(*)::BIGINT FROM aug
             |) ORDER BY rule""".stripMargin)),

    Q("iv01_incremental_agg",
      (s, d) => {
        val m = mgr(s, d)
        // incremental view maintenance: aggregate old and new partitions
        // separately, merge the FINISHED aggregates — must equal a direct
        // aggregate over the union (the oracle). sum(l_quantity) is exact
        // (integral doubles), so the merge identity is bitwise.
        val li = m.getDDFByName("lineitem").df
        val spec = "l_returnflag, n=count(*), mx=max(l_quantity), " +
          "mn=min(l_quantity), sq=sum(l_quantity)"
        val old = m.register(li.filter(col("l_orderkey") % 10 =!= 0))
        val nw = m.register(li.filter(col("l_orderkey") % 10 === 0))
        Aggregations.mergeAggregates(
          Aggregations.aggregate(old, spec).df,
          Aggregations.aggregate(nw, spec).df, spec)
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n, max(l_quantity) AS mx,
             |  min(l_quantity) AS mn, sum(l_quantity) AS sq
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("g01_pagerank",
      (s, d) => {
        val m = mgr(s, d)
        // fixed-point integer PageRank over the undirected part↔supplier
        // bipartite graph from lineitem — deterministic by construction
        // (floor divisions, integer sums), so the oracle replays it exactly
        val li = m.getDDFByName("lineitem").df
        val fwd = li.select(concat(lit("p"), col("l_partkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
        Graph.pageRank(edges, "src", "dst", iterations = 5)
          .orderBy(col("pr").desc, col("node"))
      },
      Some {
        val base =
          """edges AS (
            |  SELECT DISTINCT 'p' || l_partkey AS src, 's' || l_suppkey AS dst
            |  FROM lineitem
            |  UNION
            |  SELECT DISTINCT 's' || l_suppkey AS src, 'p' || l_partkey AS dst
            |  FROM lineitem),
            |deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
            |nodes AS (SELECT DISTINCT src AS node FROM edges
            |          UNION SELECT DISTINCT dst FROM edges),
            |pr0 AS (SELECT node, 1000000::BIGINT AS pr FROM nodes)""".stripMargin
        val iters = (0 until 5).map { k =>
          s"""c$k AS (
             |  SELECT e.dst AS node, sum(p.pr // d.outdeg)::BIGINT AS contrib
             |  FROM edges e JOIN pr$k p ON e.src = p.node JOIN deg d ON e.src = d.src
             |  GROUP BY e.dst),
             |pr${k + 1} AS (
             |  SELECT n.node,
             |    (150000 + (85 * coalesce(c.contrib, 0)) // 100)::BIGINT AS pr
             |  FROM nodes n LEFT JOIN c$k c ON n.node = c.node)""".stripMargin
        }
        s"WITH ${(base +: iters).mkString(",\n")}\n" +
          "SELECT node, pr FROM pr5 ORDER BY pr DESC, node"
      }),

    Q("g06_hits",
      (s, d) => {
        val m = mgr(s, d)
        // HITS hubs/authorities over the DIRECTED part→supplier graph
        // (r17): parts are pure hubs, suppliers pure authorities — the
        // bipartite regime where every node zeroes one side, plus the
        // max-of-each-column-equals-scale invariant. Deterministic by
        // the g01 discipline (exact long sums; max normalization in
        // fixed-operand-order DOUBLE), so the oracle replays all five
        // iterations exactly, scalar maxes as single-row CTEs.
        val li = m.getDDFByName("lineitem").df
        val edges = li.select(concat(lit("p"), col("l_partkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        Graph.hits(edges, "src", "dst", iterations = 5)
          .orderBy("node")
      },
      Some {
        val base =
          """edges AS MATERIALIZED (
            |  SELECT DISTINCT 'p' || l_partkey AS src, 's' || l_suppkey AS dst
            |  FROM lineitem),
            |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
            |          UNION SELECT DISTINCT dst FROM edges),
            |hb0 AS MATERIALIZED (SELECT node, 1000000::BIGINT AS hub FROM nodes)""".stripMargin
        val iters = (0 until 5).map { k =>
          s"""ar$k AS MATERIALIZED (SELECT e.dst AS node, sum(h.hub)::BIGINT AS ar
             |  FROM edges e JOIN hb$k h ON e.src = h.node GROUP BY e.dst),
             |am$k AS (SELECT max(ar) AS m FROM ar$k),
             |au${k + 1} AS MATERIALIZED (SELECT n.node,
             |    CASE WHEN am$k.m > 0
             |      THEN floor((coalesce(a.ar, 0)::DOUBLE * 1000000)
             |        / am$k.m::DOUBLE)::BIGINT
             |      ELSE 0 END AS auth
             |  FROM nodes n LEFT JOIN ar$k a ON n.node = a.node, am$k),
             |hr$k AS MATERIALIZED (SELECT e.src AS node, sum(a.auth)::BIGINT AS hr
             |  FROM edges e JOIN au${k + 1} a ON e.dst = a.node GROUP BY e.src),
             |hm$k AS (SELECT max(hr) AS m FROM hr$k),
             |hb${k + 1} AS MATERIALIZED (SELECT n.node,
             |    CASE WHEN hm$k.m > 0
             |      THEN floor((coalesce(h.hr, 0)::DOUBLE * 1000000)
             |        / hm$k.m::DOUBLE)::BIGINT
             |      ELSE 0 END AS hub
             |  FROM nodes n LEFT JOIN hr$k h ON n.node = h.node, hm$k)""".stripMargin
        }
        s"WITH ${(base +: iters).mkString(",\n")}\n" +
          "SELECT n.node, a.auth, h.hub FROM nodes n " +
          "JOIN au5 a ON n.node = a.node JOIN hb5 h ON n.node = h.node " +
          "ORDER BY n.node"
      }),

    Q("g05_kcore",
      (s, d) => {
        val m = mgr(s, d)
        // 6-core over a two-regime graph: 25 cliques over ids 0–250
        // (custkeys start at 0, so group 0 has 11 members at degree 10;
        // the rest are ten-member at degree 9 — the robust core) plus a
        // {3,5,8}-offset lattice on ids 251–400 whose max degree 6
        // unravels through a ~10-round peel cascade (simulated during
        // design) — the oracle replays 12 peel rounds (post-fixpoint
        // rounds are no-ops) and reads the final in-core degrees.
        import s.implicits._
        val ids = m.getDDFByName("customer").df.select(col("c_custkey").as("id"))
        val cl = ids.filter(col("id") <= 250)
          .withColumn("g", expr("(id - 1) div 10"))
        val cliqueEdges = cl.as("x")
          .join(cl.select(col("id").as("id2"), col("g")).as("y"),
            col("x.g") === col("y.g") && col("x.id") < col("id2"))
          .select(col("x.id").as("src"), col("id2").as("dst"))
        val off = Seq(3L, 5L, 8L).toDF("o")
        val latEdges = ids.filter(col("id") > 250 && col("id") <= 400)
          .crossJoin(broadcast(off))
          .select(col("id").as("src"), (col("id") + col("o")).as("dst"))
          .join(ids.filter(col("id") > 250 && col("id") <= 400)
            .select(col("id").as("dst")), "dst")
          .select("src", "dst")
        Graph.kCore(cliqueEdges.unionByName(latEdges), "src", "dst", k = 6)
          .orderBy("node")
      },
      Some {
        val base =
          """ids AS MATERIALIZED (SELECT c_custkey AS id FROM customer),
            |ce AS (SELECT a.id AS a, b.id AS b FROM ids a JOIN ids b
            |  ON a.id <= 250 AND b.id <= 250
            |  AND (a.id - 1) // 10 = (b.id - 1) // 10 AND a.id < b.id),
            |le AS (SELECT a.id AS a, b.id AS b FROM ids a
            |  JOIN (VALUES (3), (5), (8)) t(o) ON true
            |  JOIN ids b ON b.id = a.id + t.o
            |  WHERE a.id > 250 AND a.id <= 400 AND b.id <= 400),
            |canon AS MATERIALIZED (SELECT DISTINCT a, b
            |  FROM (SELECT * FROM ce UNION ALL SELECT * FROM le)),
            |sym AS MATERIALIZED (
            |  SELECT a AS src, b AS dst FROM canon
            |  UNION ALL SELECT b, a FROM canon),
            |a0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM sym)""".stripMargin
        val rounds = (0 to 12).map { r =>
          s"""d$r AS MATERIALIZED (
             |  SELECT s.src AS v, count(*)::BIGINT AS dg FROM sym s
             |  JOIN a$r x ON s.src = x.v JOIN a$r y ON s.dst = y.v
             |  GROUP BY s.src),
             |a${r + 1} AS MATERIALIZED (SELECT v FROM d$r WHERE dg >= 6)""".stripMargin
        }
        s"WITH ${(base +: rounds).mkString(",\n")}\n" +
          "SELECT v AS node, dg AS core_deg FROM d12 ORDER BY node"
      }),

    Q("g04_pagerank_weighted",
      (s, d) => {
        val m = mgr(s, d)
        // weighted fixed-point PageRank over the same part↔supplier
        // bipartite graph as g01, edge weight = lineitem row count per
        // (part, supp) pair — rank splits proportionally to shipment
        // volume. Deterministic by the same integer-floor construction;
        // the oracle replays all 5 weighted rounds.
        val li = m.getDDFByName("lineitem").df
        val fwd = li.groupBy(
            concat(lit("p"), col("l_partkey")).as("src"),
            concat(lit("s"), col("l_suppkey")).as("dst"))
          .agg(count(lit(1)).as("w"))
        val edges = fwd.unionByName(
          fwd.select(col("dst").as("src"), col("src").as("dst"), col("w")))
        Graph.pageRankWeighted(edges, "src", "dst", "w", iterations = 5)
          .orderBy(col("pr").desc, col("node"))
      },
      Some {
        val base =
          """ew AS MATERIALIZED (
            |  SELECT 'p' || l_partkey AS src, 's' || l_suppkey AS dst,
            |    count(*)::BIGINT AS w
            |  FROM lineitem GROUP BY 1, 2),
            |edges AS MATERIALIZED (
            |  SELECT src, dst, w FROM ew
            |  UNION ALL SELECT dst, src, w FROM ew),
            |deg AS MATERIALIZED (SELECT src, sum(w)::BIGINT AS sw FROM edges GROUP BY src),
            |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
            |pr0 AS (SELECT node, 1000000::BIGINT AS pr FROM nodes)""".stripMargin
        val iters = (0 until 5).map { k =>
          s"""c$k AS MATERIALIZED (
             |  SELECT e.dst AS node, sum((p.pr * e.w) // d.sw)::BIGINT AS contrib
             |  FROM edges e JOIN pr$k p ON e.src = p.node JOIN deg d ON e.src = d.src
             |  GROUP BY e.dst),
             |pr${k + 1} AS MATERIALIZED (
             |  SELECT n.node,
             |    (150000 + (85 * coalesce(c.contrib, 0)) // 100)::BIGINT AS pr
             |  FROM nodes n LEFT JOIN c$k c ON n.node = c.node)""".stripMargin
        }
        s"WITH ${(base +: iters).mkString(",\n")}\n" +
          "SELECT node, pr FROM pr5 ORDER BY pr DESC, node"
      }),

    Q("g02_triangle_count",
      (s, d) => {
        val m = mgr(s, d)
        // Sparse deterministic triangle-rich graph on customer keys:
        // edges (k, k+o) for o ∈ {7, 11, 18} whenever both endpoints
        // exist — 7 + 11 = 18 closes two triangle families per anchor
        // key, so the graph has ~2·|nodes| triangles at degree ≤ 6.
        // The operator's degree orientation is exercised for real; the
        // oracle replays the orientation-independent a<b<c formulation.
        val ids = m.getDDFByName("customer").df.select(col("c_custkey").as("k"))
        import s.implicits._
        val off = Seq(7L, 11L, 18L).toDF("o")
        val cand = ids.crossJoin(broadcast(off))
          .select(col("k").as("src"), (col("k") + col("o")).as("dst"))
        val edges = cand.join(ids.select(col("k").as("dst")), "dst")
        Graph.triangleCount(edges, "src", "dst").orderBy("node")
      },
      Some("""WITH ids AS (SELECT c_custkey AS k FROM customer),
             |e AS (
             |  SELECT a.k AS a, b.k AS b FROM ids a JOIN ids b ON b.k = a.k + 7
             |  UNION ALL
             |  SELECT a.k, b.k FROM ids a JOIN ids b ON b.k = a.k + 11
             |  UNION ALL
             |  SELECT a.k, b.k FROM ids a JOIN ids b ON b.k = a.k + 18),
             |tri AS (
             |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |  FROM e e1 JOIN e e2 ON e2.a = e1.b
             |       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
             |corners AS (
             |  SELECT x AS node FROM tri
             |  UNION ALL SELECT y FROM tri
             |  UNION ALL SELECT z FROM tri)
             |SELECT node, count(*)::BIGINT AS triangles
             |FROM corners GROUP BY node ORDER BY node""".stripMargin)),

    Q("g03_connected_components",
      (s, d) => {
        val m = mgr(s, d)
        // Chain graph: k — k+7 when both customers share a market
        // segment. Segment changes break the chains, so the graph is
        // hundreds of genuinely multi-hop path components — the
        // pointer-doubling propagation does real work. The oracle
        // replays the EXACT per-round recurrence (one-hop min + label-
        // of-label) for 10 rounds; rounds past convergence are no-ops,
        // so any oracle depth ≥ the converged round count matches.
        val c = m.getDDFByName("customer").df
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
        val edges = c.join(
            c.select(col("k").as("k2"), col("seg").as("seg2")),
            col("k2") === col("k") + 7 && col("seg2") === col("seg"))
          .select(col("k").as("src"), col("k2").as("dst"))
        Graph.connectedComponents(edges, "src", "dst").orderBy("id")
      },
      Some {
        val base =
          """c AS MATERIALIZED (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer),
            |ed AS MATERIALIZED (SELECT a.k AS src, b.k AS dst FROM c a
            |       JOIN c b ON b.k = a.k + 7 AND b.seg = a.seg),
            |edges AS MATERIALIZED (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed),
            |lab0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM edges)""".stripMargin
        val rounds = (0 until 10).map { k =>
          s"""n$k AS MATERIALIZED (SELECT e.dst AS id, min(l.label) AS nlabel
             |  FROM edges e JOIN lab$k l ON e.src = l.id GROUP BY e.dst),
             |hop$k AS MATERIALIZED (SELECT l.id, least(l.label, coalesce(n.nlabel, l.label)) AS label
             |  FROM lab$k l LEFT JOIN n$k n USING (id)),
             |lab${k + 1} AS MATERIALIZED (SELECT a.id, least(a.label, coalesce(b.label, a.label)) AS label
             |  FROM hop$k a LEFT JOIN hop$k b ON a.label = b.id)""".stripMargin
        }
        s"WITH ${(base +: rounds).mkString(",\n")}\n" +
          "SELECT id, label AS cluster_id FROM lab10 ORDER BY id"
      }),

    Q("q32_agg_on_column",
      (s, d) => {
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem")
        val mx = Aggregations.aggregateOnColumn(li, "max", "l_quantity")
        val cnt = Aggregations.aggregateOnColumn(li, "count", "*")
        import s.implicits._
        Seq((mx.asInstanceOf[Double], cnt.asInstanceOf[Long])).toDF("max_qty", "n_rows")
      },
      Some("SELECT max(l_quantity) AS max_qty, count(*) AS n_rows FROM lineitem")),

    Q("q33_xtabs",
      (s, d) => {
        val m = mgr(s, d)
        Aggregations.xtabs(m.getDDFByName("orders"),
          "o_orderstatus, o_orderpriority, n=count(*)")
          .df.orderBy("o_orderstatus", "o_orderpriority")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
             |FROM orders GROUP BY o_orderstatus, o_orderpriority
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // corr/covar from exact 2-decimal sufficient statistics — identical
    // double arithmetic in both engines, no iterative-aggregate drift.
    // A ScalaTest pins library corr()/covariance() against these values.
    Q("q34_corr",
      (s, d) => {
        val m = mgr(s, d)
        m.getDDFByName("lineitem").df.agg(
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sx"),
          dsum(col("l_extendedprice")).as("sy"),
          dsum2(col("l_quantity"), col("l_extendedprice")).as("sxy"),
          dsum2(col("l_quantity"), col("l_quantity")).as("sxx"),
          dsum2(col("l_extendedprice"), col("l_extendedprice")).as("syy"))
          .select(round(
            (col("sxy") - col("sx") * col("sy") / col("n")) /
              sqrt((col("sxx") - col("sx") * col("sx") / col("n")) *
                   (col("syy") - col("sy") * col("sy") / col("n"))), 6).as("corr_qty_price"))
      },
      Some(s"""WITH t AS (SELECT count(*) AS n,
              |  ${dsumSql("l_quantity")} AS sx, ${dsumSql("l_extendedprice")} AS sy,
              |  ${dsum2Sql("l_quantity", "l_extendedprice")} AS sxy,
              |  ${dsum2Sql("l_quantity", "l_quantity")} AS sxx,
              |  ${dsum2Sql("l_extendedprice", "l_extendedprice")} AS syy
              |  FROM lineitem)
              |SELECT round((sxy - sx*sy/n) / sqrt((sxx - sx*sx/n)*(syy - sy*sy/n)), 6)
              |  AS corr_qty_price FROM t""".stripMargin)),

    Q("q35_covar",
      (s, d) => {
        val m = mgr(s, d)
        m.getDDFByName("lineitem").df.agg(
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sx"),
          dsum(col("l_extendedprice")).as("sy"),
          dsum2(col("l_quantity"), col("l_extendedprice")).as("sxy"))
          .select(round(
            (col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1), 4)
            .as("covar_qty_price"))
      },
      Some(s"""WITH t AS (SELECT count(*) AS n,
              |  ${dsumSql("l_quantity")} AS sx, ${dsumSql("l_extendedprice")} AS sy,
              |  ${dsum2Sql("l_quantity", "l_extendedprice")} AS sxy
              |  FROM lineitem)
              |SELECT round((sxy - sx*sy/n) / (n - 1), 4) AS covar_qty_price FROM t""".stripMargin)),

    Q("q95_pivot",
      (s, d) => {
        val m = mgr(s, d)
        // long→wide pivot with EXPLICIT values (one hash aggregate, no
        // distinct-scan job — see Aggregations.pivot scaladoc). sum of
        // the integer-valued l_quantity is order-exact in doubles; max
        // is order-free — both hash-match without decimal detours.
        Aggregations.pivot(m.getDDFByName("lineitem"),
          Seq("l_linenumber"), "l_returnflag", Seq("A", "N", "R"),
          Seq("qty=sum(l_quantity)", "mx=max(l_extendedprice)"))
          .df.orderBy("l_linenumber")
      },
      Some("""SELECT l_linenumber,
             |  sum(CASE WHEN l_returnflag='A' THEN l_quantity END) AS A_qty,
             |  max(CASE WHEN l_returnflag='A' THEN l_extendedprice END) AS A_mx,
             |  sum(CASE WHEN l_returnflag='N' THEN l_quantity END) AS N_qty,
             |  max(CASE WHEN l_returnflag='N' THEN l_extendedprice END) AS N_mx,
             |  sum(CASE WHEN l_returnflag='R' THEN l_quantity END) AS R_qty,
             |  max(CASE WHEN l_returnflag='R' THEN l_extendedprice END) AS R_mx
             |FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""".stripMargin)),

    Q("q96_corr_matrix",
      (s, d) => {
        val m = mgr(s, d)
        // pairwise Pearson matrix from ONE sufficient-statistics pass
        // (k(k-1)/2 separate corr() calls would re-scan per pair);
        // decimal-exact sums (the q34 recipe) → identical double
        // arithmetic both sides → round(6) is noise-free
        Stats.corrMatrix(m.getDDFByName("lineitem").df,
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
          decimalScale = Some(2))
          .select(col("col_x"), col("col_y"), round(col("corr"), 6).as("corr"))
          .orderBy("col_x", "col_y")
      },
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val sums = cols.map(c => s"${dsumSql(c)} AS s_$c")
        val prods = for { i <- cols.indices; j <- i until cols.size }
          yield s"${dsum2Sql(cols(i), cols(j))} AS p_${cols(i)}__${cols(j)}"
        val pairRows = for { i <- cols.indices; j <- (i + 1) until cols.size }
          yield {
            val (a, b) = (cols(i), cols(j))
            s"""SELECT '$a' AS col_x, '$b' AS col_y,
               |  round((p_${a}__$b - s_$a*s_$b/n) /
               |    sqrt((p_${a}__$a - s_$a*s_$a/n)*(p_${b}__$b - s_$b*s_$b/n)), 6)
               |  AS corr FROM t""".stripMargin
          }
        s"""WITH t AS (SELECT cast(count(*) AS double) AS n,
           |  ${(sums ++ prods).mkString(",\n  ")}
           |  FROM lineitem)
           |${pairRows.mkString("\nUNION ALL\n")}
           |ORDER BY col_x, col_y""".stripMargin
      })
  )
}
