package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Naive ground truth: all-pairs shingle Jaccard with the same rational
    * accept test.
    */
  private def naive(docs: Seq[(Long, String)], n: Int, num: Long, den: Long)
      : Set[(Long, Long, Long, Long)] = {
    def shingles(t: String): Set[String] = {
      val toks = t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      if (toks.size < n) Set.empty
      else toks.sliding(n).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa intersect sb).size.toLong
      union = (sa union sb).size.toLong
      if inter * den >= union * num
    } yield (ia, ib, inter, union)).toSet
  }

  test("prefix-filtered join equals the naive all-pairs join exactly") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => s"w$i")
    // clustered corpus: 15 base docs, each with 2 mutated near-copies
    val docs = (0 until 15).flatMap { b =>
      val base = Seq.fill(30)(vocab(rnd.nextInt(vocab.size)))
      (0 until 3).map { v =>
        val mutated = base.map(t =>
          if (rnd.nextDouble() < 0.1 * v) vocab(rnd.nextInt(vocab.size)) else t)
        ((b * 3 + v).toLong, mutated.mkString(" "))
      }
    }
    for ((num, den) <- Seq((1L, 5L), (1L, 2L), (4L, 5L))) {
      val got = SetSimJoin.jaccardShingleJoin(
          docs.toDF("doc_id", "text"), "text", "doc_id", 3, num, den)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === naive(docs, 3, num, den), s"threshold $num/$den")
    }
  }

  test("identical docs and disjoint docs are the two extremes") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),
      (3L, "p q r s t u v w"))
    val got = SetSimJoin.jaccardShingleJoin(
        docs.toDF("doc_id", "text"), "text", "doc_id", 3, 99L, 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)))
  }
}
