package graft

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions._

/** BPE tokenizer training — the Sennrich et al. (2016) worked example
  * (no end-of-word marker): corpus low×5 lower×2 newest×6 widest×3 must
  * learn es, est, lo, low in that order, with ties broken to the
  * lexicographically smallest pair.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // spread across rows to exercise the distributed word count
    words.grouped(4).map(_.mkString(" ")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("id", "text")
  }

  test("bpeTrain learns the classic merge sequence with deterministic ties") {
    val m = TextAnalysis.bpeTrain(corpus, "text", nMerges = 4)
      .orderBy("merge_rank").collect()
    val merges = m.map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
    // round 1: (e,s)=9 ties (s,t)=9 -> lexicographic; then est, lo(7 ties ow), low
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")),
      s"got $merges")
    assert(m.map(_.getAs[Long]("pair_freq")).toSeq == Seq(9L, 9L, 7L, 7L))
    assert(m.map(_.getAs[String]("merged")).toSeq == Seq("es", "est", "lo", "low"))
  }

  test("bpeTrain stops early when no pair reaches minFreq") {
    val tiny = Seq((1L, "ab cd")).toDF("id", "text")
    val m = TextAnalysis.bpeTrain(tiny, "text", nMerges = 10, minFreq = 2L)
    assert(m.count() == 0, "all pairs have freq 1 < minFreq 2")
  }

  test("mergePair is greedy left-to-right and never re-merges its own output") {
    val df = Seq(Tuple1(Array("a", "a", "a"))).toDF("syms")
    val out = df.select(TextAnalysis.mergePair(col("syms"), "a", "a").as("m"))
      .first().getSeq[String](0)
    assert(out == Seq("aa", "a"), s"got $out")
  }

  test("byte-level bpeTrain learns the classic merges as hex byte pairs") {
    val m = TextAnalysis.bpeTrain(corpus, "text", nMerges = 4, minFreq = 2L,
      byteLevel = true).orderBy("merge_rank").collect()
    val merges = m.map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
    // same corpus, same greedy sequence, symbols now UTF-8 hex:
    // e=65 s=73 t=74 l=6C o=6F w=77; hex tie-break picks the same winners
    assert(merges == Seq(("65", "73"), ("6573", "74"), ("6C", "6F"), ("6C6F", "77")),
      s"got $merges")
    assert(m.map(_.getAs[Long]("pair_freq")).toSeq == Seq(9L, 9L, 7L, 7L))
  }

  test("byte-level mode covers digits and multi-byte UTF-8 the alpha filter drops") {
    // año = 61 C3.B1 6F (2-byte ñ); 42 = 34 32. Alpha mode sees NOTHING here.
    val df = Seq((1L, "año año 42"), (2L, "42 42 año")).toDF("id", "text")
    assert(TextAnalysis.bpeTrain(df, "text", nMerges = 2, minFreq = 2L).count() == 0)
    val m = TextAnalysis.bpeTrain(df, "text", nMerges = 2, minFreq = 2L,
      byteLevel = true).orderBy("merge_rank").collect()
    val merges = m.map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
    // all pairs tie at freq 3 -> lexicographic: ("34","32") then ("61","C3")
    assert(merges == Seq(("34", "32"), ("61", "C3")), s"got $merges")
  }

  test("byte-level mode preserves case — 'Ab' and 'ab' are different byte words") {
    val df = Seq((1L, "Ab Ab ab")).toDF("id", "text")
    // alpha mode lowercases: 'ab' seen 3× → ("a","b") at freq 3
    val alpha = TextAnalysis.bpeTrain(df, "text", nMerges = 1, minFreq = 3L).collect()
    assert(alpha.length == 1 && alpha.head.getAs[Long]("pair_freq") == 3)
    // byte mode: 'Ab' (41 62) ×2 and 'ab' (61 62) ×1 stay distinct words
    val m = TextAnalysis.bpeTrain(df, "text", nMerges = 1, minFreq = 2L,
      byteLevel = true).collect()
    assert(m.length == 1 && m.head.getAs[String]("lhs") == "41" &&
      m.head.getAs[String]("rhs") == "62" && m.head.getAs[Long]("pair_freq") == 2,
      m.mkString(";"))
    val enc = TextAnalysis.bpeEncode(df, "text", Seq(("41", "62")), byteLevel = true)
      .select("bpe_tokens").first().getSeq[String](0)
    assert(enc == Seq("4162", "4162", "61", "62"), s"got $enc")
  }

  test("byte-level bpeEncode has no OOV and hex tokens decode for display") {
    val df = Seq((1L, "año 42")).toDF("id", "text")
    val toks = TextAnalysis.bpeEncode(df, "text",
        Seq(("C3", "B1"), ("61", "C3B1")), byteLevel = true)
      .select("bpe_tokens").first().getSeq[String](0)
    assert(toks == Seq("61C3B1", "6F", "34", "32"), s"got $toks")
    val dec = Seq(Tuple1(toks.toArray)).toDF("t")
      .select(TextAnalysis.bpeDecodeHex(col("t")).as("d"))
      .first().getSeq[String](0)
    assert(dec == Seq("añ", "o", "4", "2"), s"got $dec")
  }

  test("bpeEncode applies merges in rank order; OOV/non-alpha words pass through") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val df = Seq((1L, "lowest newest 42 xyz")).toDF("id", "text")
    val toks = TextAnalysis.bpeEncode(df, "text", merges)
      .select("bpe_tokens").first().getSeq[String](0)
    // lowest: es -> est -> lo -> low => [low, est]; newest => [n,e,w,est];
    // "42" fails the alpha filter and stays whole; xyz has no merges
    assert(toks == Seq("low", "est", "n", "e", "w", "est", "42", "x", "y", "z"),
      s"got $toks")
  }

  test("bpeEncodeAtScale == bpeEncode token-for-token in both alphabets") {
    // adversarial corpus: case, digits, multi-byte UTF-8, repeats
    // ("aaa" exercises the no-re-merge rule), OOV, leading whitespace
    val df = Seq(
      (1L, "lowest newest 42 xyz aaa"),
      (2L, " Café über 数据 MIXED-case"),
      (3L, "aaa aa a ab abc")).toDF("id", "text")
    val alphaMerges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
      ("a", "a"), ("a", "b"), ("ab", "c"))
    val byteMerges = Seq(("C3", "A9"), ("61", "61"), ("61", "62"),
      ("6162", "63"), ("34", "32"))
    for ((merges, bl) <- Seq((alphaMerges, false), (byteMerges, true))) {
      val exprOut = TextAnalysis.bpeEncode(df, "text", merges, byteLevel = bl)
        .select(col("id"), array_join(col("bpe_tokens"), " ").as("t"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val loopOut = TextAnalysis.bpeEncodeAtScale(df, "text", merges, byteLevel = bl)
        .select(col("id"), array_join(col("bpe_tokens"), " ").as("t"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(loopOut == exprOut, s"byteLevel=$bl: $loopOut vs $exprOut")
    }
    // vocabulary size the expression form cannot reach: 2 000 synthetic
    // merges (mostly inapplicable — the presence-set skip path) plus the
    // real ones interleaved; the loop must stay correct and fast
    val wide = (0 until 2000).map(i => (s"q$i", s"z$i")) ++ alphaMerges
    val wideOut = TextAnalysis.bpeEncodeAtScale(df, "text", wide)
      .filter(col("id") === 1L)
      .select(array_join(col("bpe_tokens"), " ")).first().getString(0)
    assert(wideOut == "low est n e w est 42 x y z aa a", s"got $wideOut")
  }
}
