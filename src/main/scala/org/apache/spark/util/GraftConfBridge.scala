package org.apache.spark.util

import org.apache.hadoop.conf.Configuration

/** Bridge to Spark's `private[spark]` SerializableConfiguration so sink
  * closures can carry the Hadoop configuration to executors (needed for
  * executor-side single-file writes against whatever FS the session is
  * configured for — local, HDFS, s3a). The wrapper type cannot escape the
  * spark package, so it travels as `AnyRef with Serializable`. */
object GraftConfBridge {
  def wrap(conf: Configuration): AnyRef with java.io.Serializable =
    new SerializableConfiguration(conf)

  def unwrap(w: AnyRef): Configuration =
    w.asInstanceOf[SerializableConfiguration].value
}
