package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.engine.{GrantSpec, ModuleResult, ReconcileEngine, UserSpec}

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
    * Within a batch, specs apply in (userName, full-spec) order — the
    * secondary key makes the order TOTAL, so two specs for the same
    * user in one micro-batch apply deterministically too (a
    * userName-only sort leaves their relative order to partition
    * nondeterminism, and with replace semantics last-writer wins). */
  def writer(specs: Dataset[UserSpec], engine: ReconcileEngine)
            (onResult: (UserSpec, ModuleResult) => Unit = (_, _) => ())
      : DataStreamWriter[UserSpec] =
    specs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[UserSpec], _: Long) =>
        batch.collect().sortBy(s => (s.userName, s.toString))
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

  /** The GRANTS-path writer — the streaming spelling of
    * ReconcileEngine.grantsModule (EP3), completing the control-plane
    * streaming surface next to the users-path writer above. Same
    * contract: at-least-once delivery composes with the engine's
    * probe-before-write idempotence; within a batch, specs apply in
    * (granteeName, full-spec) order — total, so same-grantee specs in
    * one micro-batch are deterministic under replace semantics too. */
  def grantsWriter(specs: Dataset[GrantSpec], engine: ReconcileEngine)
                  (onResult: (GrantSpec, ModuleResult) => Unit = (_, _) => ())
      : DataStreamWriter[GrantSpec] =
    specs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[GrantSpec], _: Long) =>
        batch.collect().sortBy(s => (s.granteeName, s.toString))
          .foreach(spec => onResult(spec, engine.grantsModule(spec)))
      }

  /** Grants-path drain-and-stop starter (q92 and ops tooling). */
  def startGrantsAvailableNow(specs: Dataset[GrantSpec],
                              engine: ReconcileEngine, checkpointDir: String)
                             (onResult: (GrantSpec, ModuleResult) => Unit =
                                (_, _) => ())
      : StreamingQuery =
    grantsWriter(specs, engine)(onResult)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()

  private def rmTree(f: java.io.File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(rmTree); f.delete(); ()
  }

  /** Stage a tiny spec batch as ONE parquet file under `root`/specs and
    * return the PRODUCTION readStream frame over it — the control
    * plane's file entry path (a spec drop directory), replacing the
    * driver-held MemoryStream feed (r13 VERDICT task 2). Specs are
    * control-plane records: one file, one micro-batch, by design. */
  private def stageSpecFeed[T <: Product : org.apache.spark.sql.Encoder](
      spark: org.apache.spark.sql.SparkSession, specs: Seq[T],
      root: java.io.File): Dataset[T] = {
    import spark.implicits._
    val dir = new java.io.File(root, "specs")
    specs.toDS().repartition(1).write.parquet(dir.toString)
    spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[T]].schema)
      .parquet(dir.toString)
      .as[T]
  }

  /** Gate composition (q89): the playbook's user specs streamed
    * through the continuous reconcile onto an EMPTY catalog — the
    * control plane's parity gate, mirroring what q80/q88 are for the
    * data plane. The specs arrive through the production
    * readStream-over-files entry path (stageSpecFeed). The emitted
    * statements must be the SAME golden strings as the q15 batch
    * replay's user steps; only the order differs (within a batch,
    * specs apply in userName order — the writer's documented
    * determinism rule — vs the playbook's file order), so the gate
    * sorts by (grantee, statement). onResult runs driver-side inside
    * foreachBatch, so the local buffer is safe. */
  def replayTranscript(spark: org.apache.spark.sql.SparkSession,
                       fixtureDir: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val engine = new ReconcileEngine(
      graft.catalog.SecurityCatalog.inMemory(spark))
    val (userSpecs, _) = graft.sources.PlaybookYaml.specs(
      graft.sources.PlaybookYaml.resourceText())
    val results =
      scala.collection.mutable.ListBuffer[(String, Boolean, String)]()
    val root = new java.io.File(fixtureDir)
    rmTree(root); root.mkdirs()
    try {
      val stream = stageSpecFeed(spark, userSpecs, root)
      val ckpt = new java.io.File(root, "ckpt")
      val q = startAvailableNow(stream, engine, ckpt.toString) {
        (spec, res) =>
          if (res.runQueries.isEmpty)
            results += ((spec.userName, res.changed, ""))
          else res.runQueries.foreach(stmt =>
            results += ((spec.userName, res.changed, stmt)))
      }
      q.awaitTermination()
    } finally rmTree(root) // transcript is a local buffer; nothing lazy
    results.toSeq.toDF("grantee", "changed", "statement")
      .orderBy("grantee", "statement")
  }

  /** Gate composition (q92): the playbook's GRANT specs streamed
    * through the grants-path writer — q89's twin for EP3. The batch
    * user pass seeds the catalog first (grants require their grantee
    * roles to exist, the playbook's own ordering), then the grant
    * specs stream in through the production readStream-over-files
    * entry path (stageSpecFeed); the emitted statements must be the
    * SAME golden D6/D8 strings as the q15 batch replay's grant steps,
    * sorted by (grantee, statement) per the writer's determinism
    * rule. */
  def replayGrantsTranscript(spark: org.apache.spark.sql.SparkSession,
                             fixtureDir: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val engine = new ReconcileEngine(
      graft.catalog.SecurityCatalog.inMemory(spark))
    val (userSpecs, grantSpecs) = graft.sources.PlaybookYaml.specs(
      graft.sources.PlaybookYaml.resourceText())
    userSpecs.foreach(engine.usersModule(_)) // seed users + roles (EP1)
    val results =
      scala.collection.mutable.ListBuffer[(String, Boolean, String)]()
    val root = new java.io.File(fixtureDir)
    rmTree(root); root.mkdirs()
    try {
      val stream = stageSpecFeed(spark, grantSpecs, root)
      val ckpt = new java.io.File(root, "ckpt")
      val q = startGrantsAvailableNow(stream, engine, ckpt.toString) {
        (spec, res) =>
          if (res.runQueries.isEmpty)
            results += ((spec.granteeName, res.changed, ""))
          else res.runQueries.foreach(stmt =>
            results += ((spec.granteeName, res.changed, stmt)))
      }
      q.awaitTermination()
    } finally rmTree(root) // transcript is a local buffer; nothing lazy
    results.toSeq.toDF("grantee", "changed", "statement")
      .orderBy("grantee", "statement")
  }
}
