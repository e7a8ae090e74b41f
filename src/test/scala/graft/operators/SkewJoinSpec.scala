package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join on a skewed key distribution") {
    val li = Tables.lineitem(spark, sf001)
    // synthesize skew: fold most partkeys onto one hot key
    val skewed = li.withColumn("k",
      when(col("l_partkey") % 4 === 0, lit(1L)).otherwise(col("l_partkey")))
    val dim = Tables.part(spark, sf001)
      .select(col("p_partkey").as("k"), col("p_type"))
    val plain = skewed.join(dim, Seq("k")).groupBy("p_type")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    val salted = SkewJoin.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8)
      .groupBy("p_type").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salted left join preserves unmatched rows exactly once") {
    import spark.implicits._
    val left = Seq((1, "a"), (2, "b"), (99, "no-match")).toDF("k", "v")
    val right = Seq((1, "x"), (2, "y")).toDF("k", "w")
    val got = SkewJoin.saltedJoin(left, right, Seq("k"), 4, "left")
      .orderBy("k").collect()
    assert(got.length === 3)
    assert(got(2).isNullAt(2))
  }

  test("discriminator salt fans identical hot rows across reducers deterministically") {
    import spark.implicits._
    // 400 byte-identical rows except a unique id: whole-row salting would
    // still fan these (id differs), so check the discriminator path
    // directly and its determinism across runs
    val hot = (1 to 400).map(i => ("hotkey", i.toLong)).toDF("k", "uid")
    val dim = Seq(("hotkey", "d")).toDF("k", "dv")
    val a = SkewJoin.saltedJoin(hot, dim, Seq("k"), saltFactor = 8,
      discriminators = Seq("uid")).collect().map(_.toSeq).toSet
    val b = SkewJoin.saltedJoin(hot, dim, Seq("k"), saltFactor = 8,
      discriminators = Seq("uid")).collect().map(_.toSeq).toSet
    assert(a === b && a.size === 400)
    // the salt expression itself spreads the uids over several buckets
    val salts = hot.select(
      pmod(xxhash64(col("uid")), lit(8L)).cast("int").as("s"))
      .distinct().count()
    assert(salts > 4)
  }
}
