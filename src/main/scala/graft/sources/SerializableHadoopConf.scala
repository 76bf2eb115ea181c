package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}
import org.apache.hadoop.conf.Configuration

/** Hadoop `Configuration` is not `Serializable`; tasks that open files
  * through the Hadoop `FileSystem` API (so `s3a://`/`gs://`/`hdfs://` roots
  * work, not just local paths) need the driver's conf shipped to executors.
  * Standard write/readFields envelope — the same pattern Spark uses
  * internally for its own (private) wrapper. */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
