package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.GraftFunctions

/** Session-extension entry point: inject the dialect functions at
  * session build time —
  * `spark.sql.extensions=graft.GraftExtensions` (cluster deploy config)
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * Equivalent to GraftFunctions.register but resolved by Spark itself,
  * so every session on the cluster gets the functions without
  * application code. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
