package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge training ([[Bpe.bpeMerges]]) vs a sequential reference
  * implementation: pair counting, deterministic tie-break, and the
  * bounded-pass merge application (incl. overlapping runs).
  */
class BpeSpec extends SparkSpec {

  // ---- sequential reference BPE ------------------------------------

  private def refApply(toks: Vector[String], a: String, b: String)
      : Vector[String] = {
    val acc = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        acc += (a + b); i += 2
      } else { acc += toks(i); i += 1 }
    }
    acc.result()
  }

  private def refBpe(texts: Seq[String], n: Int): Seq[(Int, String, Long)] = {
    val words = texts.flatMap(_.toLowerCase.split("[^a-z]+"))
      .filter(w => w.nonEmpty && w.length <= 30)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var seqs: Map[Vector[String], Long] =
      words.toSeq.map { case (w, c) =>
        (w.map(_.toString).toVector :+ Bpe.EndMark, c)
      }.groupMapReduce(_._1)(_._2)(_ + _)
    (1 to n).map { round =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((toks, c) <- seqs; i <- 0 until toks.length - 1)
        pc((toks(i), toks(i + 1))) += c
      val ((a, b), cnt) = pc.toSeq.minBy { case ((x, y), c) =>
        (-c, x + " " + y)
      }
      seqs = seqs.toSeq.map { case (toks, c) => (refApply(toks, a, b), c) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      (round, a + " " + b, cnt)
    }
  }

  private def sparkBpe(texts: Seq[String], n: Int): Seq[(Int, String, Long)] = {
    val df = spark.createDataFrame(texts.zipWithIndex.map(_.swap))
      .toDF("id", "text")
    Bpe.bpeMerges(df, "text", n).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
  }

  test("matches the reference on a hand corpus, in order") {
    val texts = Seq("low lower lowest", "new newer newest news",
      "low low low", "wider wide widest new")
    assert(sparkBpe(texts, 8) === refBpe(texts, 8))
  }

  test("overlapping identical runs merge fully (pass bound is enough)") {
    val texts = Seq("aaaa aaaaaaaa aa", "aaaa aaaa b")
    assert(sparkBpe(texts, 4) === refBpe(texts, 4))
  }

  test("ties break by pair string, deterministically") {
    // 'ab' and 'cd' both appear exactly twice; 'a b' sorts first
    val texts = Seq("ab cd", "ab cd")
    val got = sparkBpe(texts, 2)
    assert(got === refBpe(texts, 2))
    assert(got.head._2 < got(1)._2 || got.head._3 > got(1)._3)
  }

  test("random corpora agree with the reference") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val texts = Seq.fill(30)(
        Seq.fill(rnd.nextInt(12) + 1)(
          Seq.fill(rnd.nextInt(6) + 1)(
            ('a' + rnd.nextInt(4)).toChar).mkString).mkString(" "))
      assert(sparkBpe(texts, 6) === refBpe(texts, 6))
    }
  }

  test("applyMerges encodes with the learned table, matching training") {
    val texts = Seq("low lower lowest", "low slow glow")
    val merges = sparkBpe(texts, 5).map(_._2)
    val df = spark.createDataFrame(
      Seq((1, "(s)(l)(o)(w)(_)"), (2, "(l)(o)(w)(_)"))).toDF("id", "seq")
    val enc = Bpe.applyMerges(df, "seq", merges)
      .orderBy(col("id")).collect().map(_.getString(1))
    // every learned merge is applied greedily in order; the result has
    // no remaining adjacent pair equal to a learned merge
    enc.foreach { s =>
      merges.foreach { pr =>
        assert(!s.contains("(" + pr.replace(" ", ")(") + ")"),
          s"unapplied merge '$pr' in '$s'")
      }
    }
  }
}
