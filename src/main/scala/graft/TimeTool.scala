package graft

import org.apache.spark.sql.SparkSession

/** Time one SparkEntry query (noop sink) on a clean JVM.
  * Usage: tools/run.sh graft.TimeTool <query> <sfDir> [cpus] */
object TimeTool {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    SparkEntry.queries(args(0))(spark, args(1))
      .write.format("noop").mode("overwrite").save()
    println(f"[time] ${args(0)} ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
