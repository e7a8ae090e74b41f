package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, Dedup}

/** Scratch A/B probe for the corpus-prep near-dedup shapes (round-12
  * regression hunt; not part of the product surface). Pass the variant
  * name as arg so each measurement gets a fresh JVM: fused | unfused |
  * stages | confirm.
  */
object CorpusProbe {
  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("fused")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = CorpusPipeline.Config()

    def docs: DataFrame = graft.Tables.documents(spark, sfDir)

    val stageCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stageCount.incrementAndGet()
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobCount.incrementAndGet()
    })

    def time(name: String, iters: Int = 3)(f: => Long): Unit = {
      (1 to iters).foreach { i =>
        spark.sharedState.cacheManager.clearCache()
        Thread.sleep(300) // let listener events drain
        stageCount.set(0); jobCount.set(0)
        val t0 = System.nanoTime()
        val n = f
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"[probe] $name%-28s iter$i n=$n%-8d $secs%.2f s " +
          f"jobs=${jobCount.get} stages=${stageCount.get}")
      }
    }

    variant match {
      case "fused" =>
        time("fused_full") {
          CorpusPipeline.tokenReport(CorpusPipeline.prepare(docs, cfg)).count()
        }
      case "unfused" =>
        time("unfused_full") {
          val base = CorpusPipeline.exactDedup(CorpusPipeline.gate(docs, cfg))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val cand = Dedup.minhashLshCandidates(base, "text", "doc_id",
            shingleSize = cfg.nearDupShingle).select(col("id_a"), col("id_b"))
          val confirmed = Dedup.jaccardOnCandidates(cand, base, "text", "doc_id",
            cfg.nearDupShingle)
            .filter(col("jaccard") >= cfg.nearDupThreshold)
            .select(col("id_b").as("drop_id")).distinct()
          val out = base.join(broadcast(confirmed),
            base("doc_id") === col("drop_id"), "left_anti")
          val n = CorpusPipeline.tokenReport(out).count()
          base.unpersist()
          n
        }
      case "stages" =>
        time("gate+exactDedup", 1) {
          CorpusPipeline.exactDedup(CorpusPipeline.gate(docs, cfg)).count()
        }
        time("shingleHashRows", 1) {
          Dedup.shingleHashRows(
            CorpusPipeline.exactDedup(CorpusPipeline.gate(docs, cfg)),
            "text", "doc_id", cfg.nearDupShingle).count()
        }
        time("persist sh", 1) {
          val sh = Dedup.shingleHashRows(
            CorpusPipeline.exactDedup(CorpusPipeline.gate(docs, cfg)),
            "text", "doc_id", cfg.nearDupShingle)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val n = sh.count(); sh.unpersist(); n
        }
        time("candidates", 1) {
          val base = CorpusPipeline.exactDedup(CorpusPipeline.gate(docs, cfg))
          val sh = Dedup.shingleHashRows(base, "text", "doc_id", cfg.nearDupShingle)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val n = Dedup.minhashLshCandidatesFromHashes(sh).count()
          sh.unpersist(); n
        }
      case "confirm" =>
        def t[A](name: String)(f: => A): A = {
          val t0 = System.nanoTime()
          val r = f
          println(f"[probe]   $name%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s")
          r
        }
        val corpus = CorpusPipeline.exactDedup(CorpusPipeline.gate(docs, cfg))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sh = Dedup.shingleHashRows(corpus, "text", "doc_id", cfg.nearDupShingle)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val candidates = Dedup.minhashLshCandidatesFromHashes(sh)
          .select(col("id_a"), col("id_b"))
        val pairs = t("pairs distinct+count") {
          val p = candidates.distinct()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          println(s"[probe]   n_pairs=${p.count()}")
          p
        }
        val candidateIds = broadcast(
          pairs.select(col("id_a").as("_cand_doc"))
            .unionByName(pairs.select(col("id_b").as("_cand_doc"))).distinct())
        val sh2 = t("sh prune+distinct+count") {
          val s2 = sh.join(candidateIds, col("doc") === col("_cand_doc"), "left_semi")
            .distinct()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          println(s"[probe]   n_sh2=${s2.count()}")
          s2
        }
        t("inter count") {
          val shA = sh2.select(col("doc").as("id_a"), col("h"))
          val shB = sh2.select(col("doc").as("id_b"), col("h"))
          val inter = broadcast(pairs).join(shA, "id_a").join(shB, Seq("id_b", "h"))
            .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
          println(s"[probe]   n_inter=${inter.count()}")
        }
        t("full confirm via operator") {
          val confirmed = Dedup.jaccardOnShingleSets(pairs, sh, broadcastHint = true)
            .filter(col("jaccard") >= cfg.nearDupThreshold)
            .select(col("id_b").as("drop_id")).distinct()
          println(s"[probe]   n_confirmed=${confirmed.count()}")
        }
    }
    spark.stop()
  }
}
