package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/**
 * Java-serializable wrapper around a Hadoop `Configuration`, broadcast
 * once per job so TASK-SIDE filesystem access (footer reads in
 * [[ParquetMeta.rowGroupStats]], the `.wet.gz` member writer in
 * [[Warc.writeWetGz]]) sees the DRIVER's configuration — credentials,
 * object-store endpoints, filesystem implementations — instead of the
 * JVM-default `new Configuration()`, which only works for `file://`
 * and default-configured HDFS. `Configuration` itself is Writable but
 * not Serializable, hence the custom hooks (its own
 * `write`/`readFields` wire format).
 */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    // loadDefaults = false: the driver's serialized view IS the
    // truth — re-layering task-local defaults under it could shadow
    // driver-set keys with whatever happens to be on the executor
    value = new Configuration(false)
    value.readFields(in)
  }
}

object SerializableHadoopConf {
  /** Broadcast the session's Hadoop conf — call DRIVER-SIDE before
    * the task closure, read `bc.value.value` inside it. */
  def broadcast(spark: SparkSession): Broadcast[SerializableHadoopConf] =
    spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
}
