package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line `{"metric":"total",...,"queries":{...}}`.
  *
  * Protocol: each query runs `SPARK_GRAFT_BENCH_ITERS` times (default 3)
  * and reports the MINIMUM — single-shot numbers on a shared box carry
  * multi-second scheduler noise that has twice poisoned round artifacts.
  * The cache manager is cleared between runs so a query's persist() calls
  * can't leak warm state into its later iterations or into other queries.
  * Failures are recorded under "errors" (name → exception) instead of
  * being silently folded into the timing.
  *
  * `SPARK_GRAFT_BENCH_ONLY=q_a,q_b` restricts to named queries (local
  * iteration loop); the driver runs the full catalog.
  *
  * Each query also reports a [[PlanFingerprint]] under `"plans"` — a
  * hash of its normalized statically-planned physical tree, so a silent
  * plan regression (lost broadcast, new shuffle) diffs loudly between
  * round artifacts even when timing noise hides it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/scheduler paths once so the first measured
    // query doesn't absorb session startup cost.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1).count()

    def jsonStr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""

    var errors = Map.empty[String, String]
    var plans = Map.empty[String, String]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to iters).flatMap { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          // static-plan fingerprint, taken BEFORE execution: deterministic
          // across runs (post-AQE trees carry scheduling-dependent stage
          // reuse/coalesce artifacts). A toString+md5 costs microseconds.
          plans += name -> PlanFingerprint.of(df)
          df.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
            None
        }
      }
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => jsonStr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => jsonStr(k) + ":" + jsonStr(v) }
      .mkString("{", ",", "}")
    val planJson = plans.toSeq.sortBy(_._1)
      .map { case (k, v) => jsonStr(k) + ":" + jsonStr(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // Per-query timings go LAST in the line: the driver's tail capture
    // truncates from the front, and r7's artifact kept only the trailing
    // fingerprint map — rounds could not be timing-compared without a
    // re-measure. Headline total first, bulky maps ordered so timings
    // survive any truncation.
    println(s"""{"metric":"total","value":$total,"unit":"sec","iters":$iters,"sf":"$sfDir","errors":$errJson,"plans":$planJson,"queries":$qs}""")
    // Second, compact line (the r7 verdict's suggested form): the driver's
    // tail capture keeps only the LAST ~2000 chars of output, and the full
    // line above outgrew it (r8: 65 of 164 timings survived). Integer-ms
    // timings, slowest LAST so front-truncation can only ever drop the
    // cheapest queries. The ~1900-char capture window is now SHARED with
    // the tables+fingerprints line below (which prints last, so it always
    // survives whole); timings get what remains.
    // sized so line2 + line3 + sbt's trailing success line fit the
    // ~2000-char window together: 800 + ~80 overhead + ~990 (line3) + ~90
    val budget = 800
    val entries = results.filter(_._2 >= 0).sortBy(_._2)
      .map { case (k, v) => jsonStr(k) + ":" + math.round(v * 1000) }
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    entries.reverse.foreach { e => // take from the slow end first
      if (used + e.length + 1 <= budget) { kept.prepend(e); used += e.length + 1 }
    }
    println(s"""{"timings_ms":{${kept.mkString(",")}},"n_shown":${kept.size},"n_total":${entries.size},"total_ms":${math.round(total * 1000)},"err":${errors.size}}""")
    // Third, LAST line — survives the tail capture whole by construction:
    // (a) per-table footer row counts + schema fingerprints, because the
    // driver regenerates testdata between rounds and r8→r9 changed both
    // row distributions and the events.ts encoding with nothing in the
    // artifact to show it — timing drift could not be adjudicated without
    // a re-measure; (b) 8-hex static plan fingerprints of the slowest
    // queries, so "same plan, different data/box" vs "plan regression"
    // diffs loudly across round artifacts alone (full fingerprints stay
    // in line 1, which may truncate).
    def md5_8(s: String): String = PlanFingerprint.md5hex(s).take(8)
    val tableNames = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val tblJson = tableNames.flatMap { t =>
      val p = s"$sfDir/$t.parquet"
      try {
        val rows = graft.sources.ParquetMeta.rowCount(spark, p)
        val fp = md5_8(spark.read.parquet(p).schema.json)
        Some(jsonStr(t) + ":[" + rows + "," + jsonStr(fp) + "]")
      } catch { case _: Throwable => None }
    }.mkString("{", ",", "}")
    // FULL-catalog fingerprint coverage: the complete name→fp8 map is
    // written to disk every run (baseline regeneration material) and
    // diffed against the committed sf0.1 baseline; the artifact carries
    // n_fp = full catalog size, the baseline count, and the DRIFT map —
    // normally empty, so a regression ANYWHERE in the catalog surfaces
    // by name inside the ~2 KB tail window instead of only the slowest
    // ~20 queries fitting.
    val fp8 = plans.map { case (k, v) => k -> v.take(8) }
    PlanBaseline.write(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_OUT", "target/bench_plans.json"),
      fp8)
    val baseline = PlanBaseline.load(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_BASELINE", "PLAN_BASELINE_sf01.json"))
    val drift = PlanBaseline.drift(fp8, baseline)
    val driftBudget = 400
    val driftKept = scala.collection.mutable.ArrayBuffer.empty[String]
    var driftUsed = 0
    drift.toSeq.sortBy(_._1).foreach { case (k, fp) =>
      val e = jsonStr(k) + ":" + jsonStr(fp)
      if (driftUsed + e.length + 1 <= driftBudget) {
        driftKept += e; driftUsed += e.length + 1
      }
    }
    val newCount = fp8.keys.count(k => !baseline.contains(k))
    // heavy-tail fp map stays for box-independent cross-round timing
    // adjudication of the slowest queries (shares the line budget with
    // the drift map, which is empty on a clean run)
    val fpBudget = 300
    val fpKept = scala.collection.mutable.ArrayBuffer.empty[String]
    var fpUsed = 0
    results.filter(_._2 >= 0).sortBy(-_._2).foreach { case (k, _) =>
      fp8.get(k).foreach { fp =>
        val e = jsonStr(k) + ":" + jsonStr(fp)
        if (fpUsed + e.length + 1 <= fpBudget) { fpKept += e; fpUsed += e.length + 1 }
      }
    }
    println(s"""{"tables":$tblJson,"n_fp":${fp8.size},"n_base":${baseline.size},"n_drift":${drift.size},"n_new":$newCount,"fp_drift":{${driftKept.mkString(",")}},"plan_fp":{${fpKept.mkString(",")}}}""")
    spark.stop()
  }
}
