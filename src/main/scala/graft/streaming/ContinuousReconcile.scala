package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.engine.{ModuleResult, ReconcileEngine, UserSpec}

/** Continuous reconciliation: the batch engine lifted onto Structured
  * Streaming exactly as SURVEY §7 frames it — "a foreachBatch loop over
  * the same batch apply". The reference has no streaming surface
  * (SURVEY §2.8); this is the engine's own extension, so it reuses the
  * batch semantics verbatim: each micro-batch of UserSpecs replays
  * EP1/EP2 against the catalog, and idempotence (O1) makes redelivery
  * harmless — at-least-once delivery composes with probe-before-write
  * to give effectively-once catalog convergence.
  *
  * Specs are control-plane records (bounded, tiny); the per-batch
  * driver-side loop is the same deliberate design as the catalog
  * itself (SURVEY §7 risk register). Data-plane work stays in the
  * engine's Spark operators.
  */
object ContinuousReconcile {

  /** Build the writer (caller picks trigger/checkpoint and starts it).
    * Within a batch, specs apply in userName order for determinism. */
  def writer(specs: Dataset[UserSpec], engine: ReconcileEngine)
            (onResult: (UserSpec, ModuleResult) => Unit = (_, _) => ())
      : DataStreamWriter[UserSpec] =
    specs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[UserSpec], _: Long) =>
        batch.orderBy("userName").collect()
          .foreach(spec => onResult(spec, engine.usersModule(spec)))
      }

  /** Convenience: start with an AvailableNow trigger (drain-and-stop). */
  def startAvailableNow(specs: Dataset[UserSpec], engine: ReconcileEngine,
                        checkpointDir: String)
                       (onResult: (UserSpec, ModuleResult) => Unit = (_, _) => ())
      : StreamingQuery =
    writer(specs, engine)(onResult)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()
}
