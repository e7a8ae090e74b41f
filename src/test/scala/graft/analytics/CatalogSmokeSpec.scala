package graft.analytics

import graft.{SparkEntry, SparkSpec}

/** Every catalog query runs at sf0.001 and yields a sane, non-degenerate
  * result. The value-level gate is the DuckDB oracle (tools/check.py /
  * driver t2); this smoke keeps refactors from silently breaking plans.
  */
class CatalogSmokeSpec extends SparkSpec {

  test("catalog names are unique and every oracle key has a query") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.length === names.length)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.catalog) {
    test(s"${q.name} executes at sf0.001 with non-empty schema") {
      val df = q.run(spark, sf001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
