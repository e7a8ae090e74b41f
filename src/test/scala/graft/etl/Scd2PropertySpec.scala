package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based SCD2 invariants (SURVEY §5): for ANY sequence of
  * batches over a small key space, after every merge —
  *   1. exactly one current row per natural key ever seen;
  *   2. surrogate keys are unique and dense (1..N);
  *   3. current rows never carry an expiry date, expired rows always do;
  *   4. the current row reflects the latest batch's attributes;
  *   5. replaying the final batch is a no-op.
  */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }

  private val cfg = Scd2Config(Seq("id"), Seq("attr"), "key")
  private val dates = Seq("2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01")
    .map(java.sql.Date.valueOf)

  private val genBatch: Gen[List[(String, String)]] =
    Gen.listOfN(6, for {
      id <- Gen.oneOf("a", "b", "c", "d")
      attr <- Gen.oneOf("x", "y", "z")
    } yield (id, attr)).map(_.distinctBy(_._1))

  private def toDf(b: List[(String, String)]): DataFrame =
    b.toDF("id", "attr")

  test("SCD2 invariants hold for arbitrary batch sequences") {
    check(Prop.forAll(Gen.listOfN(3, genBatch).suchThat(_.forall(_.nonEmpty))) { batches =>
      val dim = batches.zipWithIndex.foldLeft(Option.empty[DataFrame]) {
        case (acc, (b, i)) =>
          val df = toDf(b)
          Some(acc match {
            case None      => Scd2.initialLoad(df, cfg, dates(i))
            case Some(cur) => Scd2.merge(cur, df, cfg, dates(i))
          })
      }.get.collect()

      // columns: 0 key, 1 id, 2 attr, 3 effective, 4 expiry, 5 is_current,
      // 6 version
      val currents = dim.filter(_.getInt(5) == 1)
      val expired = dim.filter(_.getInt(5) == 0)
      val seenKeys = batches.flatten.map(_._1).toSet
      val latest: Map[String, String] = batches.flatten
        .foldLeft(Map.empty[String, String]) { case (m, (id, a)) => m + (id -> a) }

      val oneCurrentPerKey = currents.groupBy(_.getString(1)).forall(_._2.length == 1)
      val allSeenCurrent = currents.map(_.getString(1)).toSet == seenKeys
      val keys = dim.map(_.getLong(0)).sorted.toSeq
      val denseUnique = keys == (1L to dim.length).toSeq
      val currentNoExpiry = currents.forall(_.isNullAt(4))
      val expiredHasExpiry = expired.forall(!_.isNullAt(4))
      val latestAttrWins = currents.forall(r => latest(r.getString(1)) == r.getString(2))
      // 6. versions are dense 1..n per key, monotone in effective date,
      //    and the current row carries the max version.
      val versionsDense = dim.groupBy(_.getString(1)).forall { case (_, rows) =>
        val byEff = rows.sortBy(_.getDate(3).toString).map(_.getInt(6)).toSeq
        byEff == (1 to rows.length) &&
          rows.filter(_.getInt(5) == 1).forall(_.getInt(6) == rows.length)
      }

      oneCurrentPerKey && allSeenCurrent && denseUnique &&
        currentNoExpiry && expiredHasExpiry && latestAttrWins && versionsDense
    }, minSuccessful = 15)
  }

  test("replaying the last batch is always a no-op") {
    check(Prop.forAll(genBatch.suchThat(_.nonEmpty)) { b =>
      val df = toDf(b)
      val d1 = Scd2.initialLoad(df, cfg, dates(0))
      val d2 = Scd2.merge(d1, df, cfg, dates(1))
      val d3 = Scd2.merge(d2, df, cfg, dates(2))
      d2.collect().sortBy(_.getLong(0)).toSeq ==
        d3.collect().sortBy(_.getLong(0)).toSeq
    }, minSuccessful = 10)
  }
}
