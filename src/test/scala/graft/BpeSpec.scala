package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learnMerges: hand-verified merge order on a tiny corpus") {
    // word types: ab x3, abc x1 -> pairs: (a,b)=4, (b,c)=1
    // merge 1 = (a,b,4); then syms: |ab| x3, |ab|c| -> (ab,c)=1
    // merge 2 = (ab,c,1); nothing left after.
    val docs = Seq("ab ab ab", "abc").toDF("text")
    val out = Bpe.learnMerges(docs, "text", k = 3).orderBy("step").collect()
    assert(out.length == 2) // exhausts after 2 merges
    assert((out(0).getInt(0), out(0).getString(1), out(0).getString(2),
      out(0).getLong(3)) == ((1, "a", "b", 4L)))
    assert((out(1).getInt(0), out(1).getString(1), out(1).getString(2),
      out(1).getLong(3)) == ((2, "ab", "c", 1L)))
  }

  test("learnMerges: count ties break lexicographically on (left, right)") {
    // 'xy' and 'ab' both freq 1 -> (a,b)=1 and (x,y)=1; (a,b) wins
    val docs = Seq("xy ab").toDF("text")
    val out = Bpe.learnMerges(docs, "text", k = 1).collect()
    assert(out.head.getString(1) == "a" && out.head.getString(2) == "b")
  }

  test("learnMerges: repeated-symbol runs follow the left-to-right merge convention") {
    // 'aaaa' x2: (a,a) counted at all 3 adjacent positions x2 = 6;
    // rewrite merges left-to-right: a a a a -> (aa)(aa), so round 2
    // sees (aa,aa)=2 from this word.
    val docs = Seq("aaaa", "aaaa").toDF("text")
    val out = Bpe.learnMerges(docs, "text", k = 2).orderBy("step").collect()
    assert((out(0).getString(1), out(0).getString(2), out(0).getLong(3))
      == (("a", "a", 6L)))
    assert((out(1).getString(1), out(1).getString(2), out(1).getLong(3))
      == (("aa", "aa", 2L)))
  }

  test("docTokenCounts: hand-verified per-doc counts; totals reconcile with encode()") {
    // merges on this corpus: (a,b) then (ab,c) (the first fixture).
    // doc 1 'ab ab ab' -> 3 x |ab| = 3 tokens
    // doc 2 'abc'      -> |abc| = 1 token after both merges
    // doc 3 'zq ab'    -> |z|q| (2) + |ab| (1) = 3 tokens
    // doc 4 '!!!'      -> no subword tokens, absent from the output
    val docs = Seq((1L, "ab ab ab"), (2L, "abc"), (3L, "zq ab"),
                   (4L, "!!!")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", k = 2).orderBy("step")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = Bpe.docTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.ops.Staging.releaseAll()
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 3L))
    // the per-doc counts sum to the corpus-level encode() token mass
    val encodeTotal = Bpe.encode(docs, "text", merges)
      .agg(org.apache.spark.sql.functions.sum("freq")).head().getLong(0)
    assert(got.values.sum == encodeTotal)
  }
}
