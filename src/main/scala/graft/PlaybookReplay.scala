package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.SecurityCatalog
import graft.engine._

/** End-to-end replay of the reference's own usage example
  * (playbook_example.yaml:39-68) through the public engine API:
  * create 2 users with roles, apply 3 grant specs, then re-run the user
  * specs to prove O1 idempotence. The flattened (step, statement)
  * transcript is the observable output — the golden strings the
  * reference would send to ClickHouse.
  *
  * Input comes from the reference's REAL input surface: playbook vars
  * YAML (resources/graft/playbook_vars.yaml, the yaml:13-36 scenario),
  * lowered to module specs by sources.PlaybookYaml with the
  * task-template defaults (hash-always, init_roles=true). */
object PlaybookReplay {

  def run(spark: SparkSession): Seq[(Int, String, Boolean, String)] = {
    val engine = new ReconcileEngine(SecurityCatalog.inMemory(spark))
    val (userSpecs, grantSpecs) =
      graft.sources.PlaybookYaml.specs(graft.sources.PlaybookYaml.resourceText())

    val firstPass = userSpecs.map(s => s.userName -> engine.usersModule(s))
    val grantPass = grantSpecs.map(s => s.granteeName -> engine.grantsModule(s))
    val secondPass = userSpecs.map(s => s.userName -> engine.usersModule(s))

    (firstPass ++ grantPass ++ secondPass).zipWithIndex.flatMap {
      case ((who, res), step) =>
        if (res.runQueries.isEmpty)
          Seq((step, who, res.changed, "")) // idempotent no-op row
        else res.runQueries.map(q => (step, who, res.changed, q))
    }
  }

  /** DataFrame shape for the correctness gate. */
  def transcript(spark: SparkSession): DataFrame = {
    import spark.implicits._
    run(spark).toDF("step", "grantee", "changed", "statement")
      .orderBy("step", "statement")
  }
}
