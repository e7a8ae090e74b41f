package graft

import org.apache.spark.sql.SparkSession

/** The bench artifact's plan-regression guard is only useful if the
  * fingerprint is deterministic: the same query on the same data must
  * hash identically in two independent sessions (fresh expression ids,
  * fresh exchange ids, fresh temp state), and materially different plans
  * must hash differently.
  */
class PlanFingerprintSpec extends SparkSpec {

  private def fingerprint(s: SparkSession, name: String): String = {
    val df = SparkEntry.queries(name)(s, sf001)
    df.count() // finalize AQE so the post-execution shape is hashed
    PlanFingerprint.of(df)
  }

  test("fingerprints are stable across two independent sessions") {
    // joins+broadcast, window+TakeOrdered, and a native-expression scan —
    // the three plan families most at risk of silent shape drift
    for (q <- Seq("q_star_monthly_segment", "q_top_customers", "q_ann_lsh")) {
      val a = fingerprint(spark.newSession(), q)
      val b = fingerprint(spark.newSession(), q)
      assert(a === b, s"$q fingerprint must not depend on session state")
    }
  }

  test("different plan shapes produce different fingerprints") {
    val a = fingerprint(spark.newSession(), "q_top_customers")
    val b = fingerprint(spark.newSession(), "q_star_monthly_segment")
    assert(a !== b)
  }

  test("normalization strips ids and paths but keeps operators") {
    val s = """*(2) BroadcastHashJoin [c_custkey#123L], [o_custkey#456L]
              |  Scan parquet [c_custkey#123L] Location: InMemoryFileIndex
              |    file:/tmp/graft_x_local-1755034/part-0.parquet, plan_id=42
              |  Exchange hashpartitioning(o_custkey#456L, 32), [id=#99]""".stripMargin
    val n = PlanFingerprint.normalize(s)
    assert(!n.contains("#123") && !n.contains("plan_id=42") && !n.contains("[id=#99]"))
    assert(!n.contains("local-1755034"))
    assert(n.contains("BroadcastHashJoin") && n.contains("hashpartitioning"))
  }
}
