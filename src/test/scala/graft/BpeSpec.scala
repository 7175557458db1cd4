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
}
