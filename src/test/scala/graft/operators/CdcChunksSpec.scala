package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcChunksSpec extends SparkSpec {

  private def tokens(n: Int): Seq[String] =
    (0 until n).map(i => s"w${(i * i + 3 * i) % 997}")

  test("chunks partition the token stream exactly") {
    import spark.implicits._
    val df = Seq((1L, tokens(2000).mkString(" "))).toDF("doc_id", "text")
    val ch = TrainingData.contentDefinedChunks(df).orderBy("chunk").collect()
    assert(ch.length > 5, s"expected multiple chunks, got ${ch.length}")
    assert(ch.map(_.getAs[Long]("n_tokens")).sum === 2000L)
    assert(ch.head.getAs[Long]("chunk_start") === 0L)
    ch.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("chunk_start") === a.getAs[Long]("chunk_end") + 1)
      case _ =>
    }
  }

  test("front insertion re-aligns suffix chunks; fixed stride does not") {
    import spark.implicits._
    val base = tokens(2000)
    val df = Seq((1L, base.mkString(" ")),
      (2L, ("zzz" +: base).mkString(" "))).toDF("doc_id", "text")
    val ch = TrainingData.contentDefinedChunks(df)
    val a = ch.filter(col("doc_id") === 1).select("chunk_hash")
      .as[String].collect().toSet
    val b = ch.filter(col("doc_id") === 2).select("chunk_hash")
      .as[String].collect().toSet
    val shared = (a intersect b).size
    // every boundary is content-local, so only the head chunk (plus at
    // most one extra split at the inserted token) can differ
    assert(shared >= a.size - 2, s"CDC shared only $shared of ${a.size}")
    assert(shared > 5)
    // the fixed-stride twin shifts EVERY window past the insertion
    val fw = TrainingData.chunkWindows(df)
    val fa = fw.filter(col("doc_id") === 1).select("chunk_hash")
      .as[String].collect().toSet
    val fb = fw.filter(col("doc_id") === 2).select("chunk_hash")
      .as[String].collect().toSet
    assert((fa intersect fb).size < shared)
  }
}
