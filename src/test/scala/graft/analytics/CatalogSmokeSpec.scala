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

  // The driver's correctness harness sorts result rows by every column in
  // pandas, which cannot hash numpy arrays — an array/map/struct output
  // column errors the whole row (q_embed_quantize / q_encode_corpus, r7).
  // Catalog outputs therefore serialize nested values (concat_ws etc.).
  test("no catalog query output schema contains array/map/struct columns") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.catalog.flatMap { q =>
      q.run(spark, sf001).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"${q.name}.${f.name}"
      }
    }
    assert(offenders.isEmpty, s"nested output columns: $offenders")
  }

  for (q <- SparkEntry.catalog) {
    test(s"${q.name} executes at sf0.001 with non-empty schema") {
      val df = q.run(spark, sf001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
