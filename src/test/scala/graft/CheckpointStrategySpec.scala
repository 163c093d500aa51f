package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.{Checkpoints, SparkTestSession}

/** Pins the injectable checkpoint strategy (graft.Checkpoints): the
  * reliable-directory path and the default localCheckpoint path must
  * reach the IDENTICAL connected-components fixpoint — the strategy may
  * only change fault-tolerance cost, never results — and the reliable
  * path must actually write under the configured directory (otherwise
  * the "100 TB recipe" is prose, not an executable code path). */
class CheckpointStrategySpec extends AnyFunSuite {

  test("reliable-dir checkpoint path reaches the same CC fixpoint as local") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // a chain, a star, a self-loop, and an isolated pair — enough
    // structure that the propagation loop needs several rounds
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 20L), (30L, 31L))
    val pairs = edges.toDF("doc_a", "doc_b")
    def run(): Map[Long, Long] =
      // maxIter routes past the union-find fast path into the
      // distributed loop — the only consumer of the checkpoint strategy
      Dedup.minLabelComponents(pairs, "doc_a", "doc_b", maxIter = 64)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val localResult = run()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    try {
      spark.conf.set(Checkpoints.DirConf, dir.getAbsolutePath)
      val reliableResult = run()
      assert(reliableResult == localResult,
        "checkpoint strategy changed the CC fixpoint")
      // the reliable path must have materialized rdd checkpoints under
      // the configured directory — proof the injection took effect
      def anyFiles(f: java.io.File): Boolean = {
        val cs = f.listFiles()
        cs != null && (cs.exists(_.isFile) || cs.exists(anyFiles))
      }
      assert(anyFiles(dir),
        s"no checkpoint files written under ${dir.getAbsolutePath}")
    } finally {
      spark.conf.unset(Checkpoints.DirConf)
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
      }
      rm(dir)
    }
  }
}
