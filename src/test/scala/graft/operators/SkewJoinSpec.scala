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

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    // The automatic counterpart of saltedJoin: with skew-join splitting
    // tuned below the hot partition's size, AQE must replan the skewed
    // side into multiple reader splits (the `skew=true` marker). This pins
    // the configuration actually engaging — a silently-ignored threshold
    // would leave 100 TB hot keys on one reducer with no test noticing.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled",
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // half of all rows share key 0, so its partition is >2x the median
      val hot = spark.range(40000L).select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id")).as("k"),
        concat(lit("x" * 100), col("id")).as("payload"))
      val dim = spark.range(200L).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = hot.join(dim, "k")
      val plan = executedPlan(joined) // collect() finalizes the AQE plan
      assert(plan.contains("skew=true"),
        s"expected AQE skew-split marker in:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
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
