package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: dump the formatted physical plan of any SparkEntry
  * query. Usage: tools/run.sh graft.ExplainTool <query> <sfDir> */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(args(0))(spark, args(1)).explain("formatted")
    spark.stop()
  }
}
