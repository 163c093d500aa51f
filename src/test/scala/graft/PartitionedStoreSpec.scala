package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.TextFunctions
import graft.sources.{Corpus, PartitionedStore}

/** The partition-pruning contract of the persisted index shape: a probe
  * against a cell-partitioned store must OPEN only the probed cells'
  * files — this is what makes "IVF probe = partition pruning" true at
  * 100 TB, and it is checked here against the actual file lists, not
  * plan text. */
class PartitionedStoreSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  test("probe of a cell-partitioned store opens only the probed cells' files") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pstore").toString + "/emb"
    val embs = Corpus.table(spark, "/root/testdata/sf0.001", "embeddings")
      .withColumn("cell", TextFunctions.signBucket(col("embedding"), 4))
    PartitionedStore.writeByCell(embs, dir, "cell")

    val all = PartitionedStore.readAll(spark, dir, "cell")
    val cells = all.select("cell").distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    // the store defeats partition-value inference: bitstring cells keep
    // their leading zeros instead of collapsing to integers
    assert(cells.forall(_.length == 4), cells.mkString(","))
    assert(cells.size > 1, "need multiple cells for pruning to mean anything")

    val probed = PartitionedStore.probeCells(spark, dir, "cell",
      cells.take(2))
    // the plan prunes on the partition column (no data-filter fallback)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    // file-level proof via the scan's RUNTIME metrics (inputFiles
    // reflects the pre-pruning file index, so it cannot show pruning)
    val expected = all.where(col("cell").isin(cells.take(2): _*)).count()
    // collect() executes THIS queryExecution (count() would plan a new
    // one, leaving the inspected scan's metrics at zero)
    assert(probed.collect().length.toLong == expected)
    val scan = probed.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    val numFiles = scan.metrics("numFiles").value
    val totalFiles = all.inputFiles.length
    assert(numFiles > 0)
    assert(numFiles < totalFiles,
      s"probe read $numFiles/$totalFiles files — no pruning")
  }

  test("persisted IVF probe == in-memory ivfTopK for the same model and query") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfstore").toString + "/ivf"
    val embs = Corpus.table(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = pipeline.Similarity.buildIvfStore(embs, dir, nClusters = 8)
    assert(centroids.length == 8)

    val queryVec = embs.where(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val fromStore = pipeline.Similarity.probeIvfStore(
        spark, dir, centroids, queryVec, 0L, k = 10, nProbe = 3)
      .collect().map(_.toSeq)
    val inMemory = pipeline.Similarity.ivfTopK(
        embs, 0L, k = 10, nClusters = 8, nProbe = 3)
      .collect().map(_.toSeq)
    assert(fromStore.toSeq == inMemory.toSeq)
  }

  test("store round-trips the full frame (no rows lost to partitioning)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pstore2").toString + "/docs"
    val docs = Corpus.table(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("shard",
        TextFunctions.hash64(col("doc_id").cast("string"), "shard") % 8)
    PartitionedStore.writeByCell(docs, dir, "shard")
    val back = PartitionedStore.readAll(spark, dir, "shard")
    assert(back.count() == docs.count())
    // partition column survives with its values intact
    val sums = docs.agg(sum(col("doc_id"))).head.getLong(0)
    assert(back.agg(sum(col("doc_id"))).head.getLong(0) == sums)
  }

  test("multi-probe store: full ball == exact top-k; recall monotone in radius") {
    val embs = Corpus.table(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pstore4").toString + "/mp"
    val nBits = 4
    pipeline.Similarity.buildSignBucketStore(embs, dir, nBits)
    val qv = embs.where(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val exact = pipeline.Similarity.cosineTopK(embs, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    def hits(radius: Int): Int =
      pipeline.Similarity.multiProbeStoreTopK(spark, dir, qv, 0L,
        10, nBits, radius).collect().map(_.getLong(0)).count(exact)
    // full ball probes every bucket — brute force through the store
    assert(pipeline.Similarity.multiProbeStoreTopK(spark, dir, qv, 0L,
        10, nBits, nBits).collect().map(r => (r.getLong(0), r.getDouble(2)))
        .toSeq ==
      pipeline.Similarity.cosineTopK(embs, 0L, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq)
    // widening the ball never loses true neighbors (superset probes)
    val rs = (0 to nBits).map(hits)
    assert(rs.zip(rs.tail).forall { case (a, b) => a <= b }, rs.toString)
    assert(rs.last == 10)
  }

  test("immediate same-second rewrite with a new schema is re-discovered, not served stale") {
    // the version marker (not root mtime) keys the schema memo: two
    // writes landing within the filesystem timestamp granularity must
    // still invalidate — the exact failure mode of an mtime key
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pstore3").toString + "/evolving"
    val v1 = Corpus.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), (col("doc_id") % 4).cast("string").as("cell"))
    PartitionedStore.writeByCell(v1, dir, "cell")
    assert(PartitionedStore.readAll(spark, dir, "cell")
      .schema.fieldNames.sorted.toSeq == Seq("cell", "doc_id"))
    val v2 = v1.withColumn("extra", lit(1L)) // schema evolves, rewrite NOW
    PartitionedStore.writeByCell(v2, dir, "cell")
    assert(PartitionedStore.readAll(spark, dir, "cell")
      .schema.fieldNames.sorted.toSeq == Seq("cell", "doc_id", "extra"))
  }
}
