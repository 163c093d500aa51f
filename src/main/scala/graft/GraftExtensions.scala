package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.GraftFunctions

/** Session-extension entry point: inject the dialect functions AND the
  * native-kernel optimizer rule at session build time —
  * `spark.sql.extensions=graft.GraftExtensions` (cluster deploy config)
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * Equivalent to GraftFunctions.register but resolved by Spark itself,
  * so every session on the cluster gets the functions without
  * application code; the optimizer rule additionally rewrites the
  * portable sha2/conv/substring hash spelling to the Sha256Prefix60
  * kernel, so pure-SQL users get the native fast path transparently. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.functions.NativeHashRewrite)
  }
}
