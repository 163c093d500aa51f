package graft

import org.apache.spark.sql.SparkSession

/** Time one SparkEntry query (noop sink) on a clean JVM.
  * Usage: tools/run.sh graft.TimeTool <query> <sfDir> [cpus] */
object TimeTool {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 2) args(2) else "32"
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same JIT guard as Verify/Bench (see Bench.scala) — the isolated
      // retime tool must not be able to diverge from the gate session
      // on conf (r18 VERDICT task 7)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
    // extra confs: SPARK_GRAFT_CONF="k1=v1,k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = if (args.length > 3) args(3).toInt else 1
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(args(0))(spark, args(1))
        .write.format("noop").mode("overwrite").save()
      println(f"[time] ${args(0)} run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
