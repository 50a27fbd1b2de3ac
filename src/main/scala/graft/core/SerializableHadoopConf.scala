package graft.core

import org.apache.hadoop.conf.Configuration

/** Serializable carrier for the session Hadoop configuration — executor
  * closures must see the DRIVER's settings (credentials, object-store
  * endpoints, filesystem bindings), not a fresh default
  * `Configuration()`: paths that list fine driver-side would otherwise
  * fail (or bind the wrong FileSystem) at task time (ADVICE r6). Spark
  * ships the same idea as `org.apache.spark.util.SerializableConfiguration`,
  * which is `private[spark]`; Hadoop's Writable round-trip below is the
  * published serialization surface.
  *
  * Use: `sc.broadcast(new SerializableHadoopConf(sc.hadoopConfiguration))`
  * and read `.value.value` inside the closure. */
final class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {

  def value: Configuration = conf

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}
