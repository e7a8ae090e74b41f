package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test for the as-of join family: on arbitrary inputs, the
  * composed (union+window) form, the native Catalyst operator, and a
  * plain in-memory reference model must agree exactly — including ties
  * on (key, time), duplicate right rows, empty sides, and keys present
  * on only one side.
  */
// Top-level fixture rows: case classes nested in the suite would need an
// outer instance in the generated encoder code and fail janino compilation.
case class AsOfPropL(id: Long, k: String, lt: Long)
case class AsOfPropR(k: String, rt: Long, rv: String)

class AsOfJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private type L = AsOfPropL
  private type R = AsOfPropR
  private val L = AsOfPropL
  private val R = AsOfPropR

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }

  // ~1 in 9 keys is null on either side: SQL join semantics say a null
  // key matches nothing (null = null is never true), pinned in the model.
  private def genKey(nKeys: Int): Gen[String] =
    Gen.frequency(8 -> Gen.choose(0, nKeys - 1).map(i => s"k$i"),
      1 -> Gen.const(null: String))

  private val genData = for {
    nKeys <- Gen.choose(1, 5)
    nLeft <- Gen.choose(0, 40)
    nRight <- Gen.choose(0, 40)
    lefts <- Gen.listOfN(nLeft, for {
      k <- genKey(nKeys)
      t <- Gen.choose(0L, 20L)
    } yield (k, t))
    rights <- Gen.listOfN(nRight, for {
      k <- genKey(nKeys)
      t <- Gen.choose(0L, 20L)
      v <- Gen.choose(0, 99).map(i => f"v$i%02d")
    } yield R(k, t, v))
  } yield (lefts.zipWithIndex.map { case ((k, t), i) => L(i.toLong, k, t) }, rights)

  /** Reference model: latest right at-or-before; (rt, rv) max on ties;
    * null keys on either side never match.
    */
  private def modelBackward(ls: Seq[L], rs: Seq[R]): Map[Long, Option[(Long, String)]] =
    ls.map { l =>
      l.id -> rs.filter(r => l.k != null && r.k != null && r.k == l.k && r.rt <= l.lt)
        .sortBy(r => (r.rt, r.rv)).lastOption.map(r => (r.rt, r.rv))
    }.toMap

  /** Reference model: earliest right at-or-after; (rt, rv) min on ties;
    * null keys on either side never match.
    */
  private def modelForward(ls: Seq[L], rs: Seq[R]): Map[Long, Option[(Long, String)]] =
    ls.map { l =>
      l.id -> rs.filter(r => l.k != null && r.k != null && r.k == l.k && r.rt >= l.lt)
        .sortBy(r => (r.rt, r.rv)).headOption.map(r => (r.rt, r.rv))
    }.toMap

  private def collectAsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Option[(Long, String)]] =
    df.collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getString(4))))
    }.toMap

  test("composed, native, and model backward as-of agree on random inputs") {
    check(Prop.forAll(genData) { case (ls, rs) =>
      val left = ls.toDF()
      val right = rs.toDF()
      val expect = modelBackward(ls, rs)
      val composed = collectAsOf(
        AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", Seq("rt", "rv")))
      val native = collectAsOf(
        AsOfJoin.backwardNative(left, right, Seq("k"), "lt", "rt", Seq("rt", "rv")))
      composed == expect && native == expect
    }, minSuccessful = 12)
  }

  test("composed forward as-of agrees with the model on random inputs") {
    check(Prop.forAll(genData) { case (ls, rs) =>
      val expect = modelForward(ls, rs)
      val got = collectAsOf(
        AsOfJoin.forward(ls.toDF(), rs.toDF(), Seq("k"), "lt", "rt", Seq("rt", "rv")))
      got == expect
    }, minSuccessful = 12)
  }
}
