package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** BPE induction semantics the oracle can't isolate: greedy
  * left-to-right merge application on overlapping (l = r) matches,
  * and multi-round symbol composition — hand-computed cases. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("greedy overlap: runs of a repeated symbol merge left-to-right") {
    // corpus: aaaa aaa b
    // round 1 pairs: (a,a) in 'aaaa' x3 + in 'aaa' x2 = 5
    // greedy apply: 'aaaa' -> [aa, aa]; 'aaa' -> [aa, a] (NOT [a, aa])
    // round 2 pairs: (aa,aa) x1 from 'aaaa'; (aa,a) x1 from 'aaa';
    //   tie on cnt=1 -> lexicographic (l, r): 'aa','a' < 'aa','aa'
    val docs = Seq("aaaa aaa b").toDF("text")
    val m = Bpe.mergesFor(docs, 2).collect()
    assert(m(0).getString(1) == "a" && m(0).getString(2) == "a"
      && m(0).getLong(4) == 5L, s"${m(0)}")
    assert(m(1).getString(1) == "aa" && m(1).getString(2) == "a"
      && m(1).getLong(4) == 1L, s"${m(1)}")
  }

  test("merges compose across rounds and weight by word frequency") {
    // 'the' x3, 'then' x1: round 1 ties (t,h) and (h,e) at cnt 4 ->
    // lexicographic tiebreak picks (h,e); round 2 then fuses t + he
    val docs = Seq("the the then", "the").toDF("text")
    val m = Bpe.mergesFor(docs, 2).collect()
    assert(m(0).getString(3) == "he" && m(0).getLong(4) == 4L, s"${m(0)}")
    assert(m(1).getString(1) == "t" && m(1).getString(2) == "he"
      && m(1).getString(3) == "the" && m(1).getLong(4) == 4L, s"${m(1)}")
  }
}
