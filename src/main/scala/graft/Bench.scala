package graft
import org.apache.spark.sql.SparkSession
/** Per-round benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Action is a `noop`-format write, not `count()`: count() lets Catalyst
  * prune aggregate columns (round 1 under-measured q12) while the noop
  * sink materializes every output column through the full plan. Failures
  * are reported explicitly as -1 plus a "failed" list — never as a
  * healthy-looking wall time. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failed = scala.collection.mutable.ListBuffer[String]()
    // deterministic (sorted) order so per-query numbers are comparable
    // across rounds; live stderr line per query for anomaly triage
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // isolate queries from each other's heap debt (lingering broadcast
      // and shuffle structures otherwise tax whoever runs next)
      System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s ${dt}%8.2f s")
      name -> (if (ok) dt else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // the frozen SURVEY §2.9 set (q1–q14) — comparable across rounds
    // even as self-declared pipeline queries keep being added
    val coreTotal = results.collect {
      case (k, v) if v >= 0 &&
        k.matches("q(1[0-4]|[1-9])(b?)_.*") => v
    }.sum
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","core14_total":$coreTotal,"queries":$qs,"failed":$fl,"sf":"$sfDir"}""")
    spark.stop()
  }
}
