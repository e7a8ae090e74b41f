package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The incremental dedup-state contract: folding edge batches into stored
  * labels one at a time must equal the full recompute over the union
  * graph, on every input and every batch split — plus the edge-merge
  * idempotence the continuous-crawl loop relies on.
  */
class DedupStateSpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, minSuccessful: Int = 12): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }

  private val genBatchedGraph
      : Gen[(List[Long], List[List[(Long, Long)]])] = for {
    n <- Gen.choose(1, 16)
    nodes = (1L to n.toLong).toList
    nBatches <- Gen.choose(1, 3)
    batches <- Gen.listOfN(nBatches, for {
      nEdges <- Gen.choose(0, 10)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(1L, n.toLong)
        b <- Gen.choose(1L, n.toLong)
        if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct)
  } yield (nodes, batches)

  private def labelsOf(
      df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("batch-at-a-time incrementalComponents equals full recompute") {
    check(Prop.forAll(genBatchedGraph) { case (nodes, batches) =>
      val nodesDf = nodes.toDF("doc_id")
      // Incremental path: seed from an empty edge set, then fold each
      // batch. New nodes arrive with their first batch (round-robin
      // assignment) to exercise the never-seen-id seeding too. Each fold
      // localCheckpoints, as a real state store would persist — without
      // it the label lineage compounds across folds.
      val nodeBatches = nodes.zipWithIndex
        .groupBy(_._2 % batches.length).view.mapValues(_.map(_._1)).toMap
      var labels = DedupState.incrementalComponents(
        Seq.empty[(Long, Long)].toDF("doc_id", "component"),
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
        nodeBatches.getOrElse(0, Nil).toDF("doc_id")).localCheckpoint()
      batches.zipWithIndex.foreach { case (edges, i) =>
        val newNodes =
          (if (i == 0) Nil else nodeBatches.getOrElse(i, Nil)).toDF("doc_id")
        labels = DedupState.incrementalComponents(labels,
          edges.toDF("id_a", "id_b"), newNodes).localCheckpoint()
      }
      // Full recompute over the union graph.
      val full = TrainingData.connectedComponents(nodesDf,
        batches.flatten.distinct.toDF("id_a", "id_b"))
      labelsOf(labels) == labelsOf(full)
    }, minSuccessful = 8)
  }

  test("incremental update through the DISTRIBUTED component closure " +
      "matches the driver fast path") {
    // Same fold, but the inner component-graph closure forced through the
    // distributed min-label loop (threshold 0 is what a 100 TB batch
    // would take) — the two code paths must agree.
    val labels0 = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L))
      .toDF("doc_id", "component")
    val edges = Seq((1L, 2L), (3L, 4L), (2L, 3L)).toDF("id_a", "id_b")
    val viaDriver = DedupState.incrementalComponents(labels0, edges,
      Seq.empty[Long].toDF("doc_id"))
    assert(labelsOf(viaDriver) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("mergeEdges is idempotent, normalizing, and append-only") {
    val stored = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val admitted = Seq((2L, 1L), (5L, 5L), (4L, 6L), (6L, 4L))
      .toDF("id_a", "id_b")
    val merged = DedupState.mergeEdges(stored, admitted)
    val got = merged.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (2,1) normalizes onto stored (1,2); the (5,5) self-loop drops;
    // (4,6)/(6,4) collapse to one new pair.
    assert(got == Set((1L, 2L), (3L, 4L), (4L, 6L)))
    val again = DedupState.mergeEdges(merged, admitted)
    assert(again.count() == merged.count())
  }

  test("new edges never split a component and labels only decrease") {
    val labels0 = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "component")
    val updated = DedupState.incrementalComponents(labels0,
      Seq((2L, 3L)).toDF("id_a", "id_b"), Seq.empty[Long].toDF("doc_id"))
    assert(labelsOf(updated) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
