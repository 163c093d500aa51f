package graft

import org.apache.spark.sql.DataFrame

/** Injectable checkpoint strategy for iterative loops (the min-label
  * connected-components propagation in [[graft.pipeline.Dedup]]).
  *
  * Iterative plans must truncate lineage each round or the plan tree —
  * and with it task serialization and any recovery replay — grows with
  * the iteration count. HOW to truncate is a deployment decision:
  *
  *  - `localCheckpoint` (the default): blocks pinned in executor
  *    memory/disk. Zero external storage, right for local mode, tests,
  *    and short loops — but blocks die with their executor, so on a
  *    real cluster a lost executor aborts the loop.
  *  - RELIABLE checkpoint to a fault-tolerant directory (HDFS/object
  *    store): each round's labels survive executor loss; the loop
  *    resumes from the last round instead of restarting. This is the
  *    100 TB setting (SCALE.md), where a 1000-executor loop WILL see
  *    executor churn mid-iteration.
  *
  * Selection is a session conf rather than a parameter threaded through
  * every operator signature: set `spark.graft.checkpoint.dir` to a
  * reliable path to opt in; unset means local. Both paths produce the
  * identical fixpoint (pinned by CheckpointStrategySpec) — the choice
  * affects fault-tolerance cost only. Checkpoint files under the
  * reliable dir are reclaimed by Spark's ContextCleaner when
  * `spark.cleaner.referenceTracking.cleanCheckpoints` is set, or by the
  * deployment's retention policy on the directory.
  */
object Checkpoints {
  /** Session conf key: reliable checkpoint directory; unset = local. */
  val DirConf = "spark.graft.checkpoint.dir"

  /** Eagerly checkpoint `df` under the session's configured strategy. */
  def checkpoint(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(DirConf) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir is idempotent for the same path; only touch
        // it when it actually differs so concurrent loops don't race
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
}
