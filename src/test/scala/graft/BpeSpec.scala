package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** BPE merge-learning semantics on hand-checkable fixtures. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("classic fixture: most frequent pair merges first, merged symbols compose") {
    // "ab" appears in every word with high frequency -> (a, b) must be
    // merge 1; then (ab, c) composes the merged symbol
    val docs = Seq(
      (1L, "abc abc abc abd"),
      (2L, "abc abd abe"),
      (3L, "abc")
    ).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, $"text", numMerges = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(merges.head == ((1L, "a", "b", 8L)))        // 8 words, each one (a,b)
    assert(merges(1) == ((2L, "ab", "c", 5L)))         // abc x5
    assert(merges(2)._2 == "ab")                       // then ab+d (x2)
  }

  test("tie in pair frequency breaks to the lexicographically smallest pair") {
    val docs = Seq((1L, "xy zw")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, $"text", numMerges = 1)
      .as[(Long, String, String, Long)].collect()
    assert(merges.head == ((1L, "x", "y", 1L))) // (x,y) < (z,w)
  }

  test("vocabulary exhaustion stops the merge list early in both routes") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text") // 1 pair, then single symbols
    val merges = Bpe.learnMerges(docs, $"text", numMerges = 8)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(merges.map(m => (m._2, m._3)) == Seq(("a", "b")))
  }

  test("same-symbol runs merge leftmost-compatible (replace-pass semantics)") {
    // " l l l " must become [ll, l], never [l, ll]
    assert(Bpe.applyMerge(" l l l ", "l", "l", passes = 8) == " ll l ")
    // alternating-boundary runs need >1 pass; 8 passes reach fixpoint here
    assert(Bpe.applyMerge(" a b a b ", "a", "b", passes = 8) == " ab ab ")
  }

  test("distributed token count with merges matches a driver-side replay") {
    val docs = Seq((1L, "abc abd"), (2L, "xyz abc")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "c"))
    val out = Bpe.tokenCountWithMerges(docs, "doc_id", $"text", merges)
      .as[(Long, Long)].collect().toMap
    // doc1: "abc"->[abc] (1), "abd"->[ab, d] (2) => 3
    // doc2: "xyz"->[x,y,z] (3), "abc"->[abc] (1) => 4
    assert(out == Map(1L -> 3L, 2L -> 4L))
  }

  test("fertility by group: a language the merges cover pays fewer tokens per word") {
    // merges learned (by construction) for lang A's vocabulary only:
    // A words collapse to 1 token each, B words stay character-split
    val docs = Seq(
      (1L, "A", "abc abc abd"), (2L, "A", "abd abc"),
      (3L, "B", "xyz wvu"), (4L, "B", "xyz")
    ).toDF("doc_id", "lang", "text")
    val merges = Seq(("a", "b"), ("ab", "c"), ("ab", "d"))
    val out = Bpe.fertilityByGroup(docs, "lang", $"text", merges)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("A") == ((5L, 5L, 1.0)), out.toString)   // every A word fully merges
    assert(out("B") == ((3L, 9L, 3.0)), out.toString)   // 3-char words stay split
    // per-group sums agree with the per-doc operator under the same merges
    val perDoc = Bpe.tokenCountWithMerges(docs, "doc_id", $"text", merges)
      .as[(Long, Long)].collect().toMap
    assert(perDoc.values.sum == out.values.map(_._2).sum)
  }
}
