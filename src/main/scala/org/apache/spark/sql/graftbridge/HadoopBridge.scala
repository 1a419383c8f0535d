package org.apache.spark.sql.graftbridge

import scala.reflect.ClassTag

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** Spark keeps `SerializableConfiguration` — the only sanctioned way to
  * ship the driver's Hadoop configuration (filesystem credentials,
  * endpoint overrides) into executor tasks — `private[spark]`. This
  * bridge wraps the one pattern graft needs: run a filesystem-touching
  * function over a driver-known item list ON EXECUTORS, with the
  * driver's conf. Rebuilding a `new Configuration()` per task instead
  * would silently drop runtime-set conf (object-store credentials) and
  * only happen to work on a local filesystem. */
object HadoopBridge {

  /** Map `f` over `items` distributed across `slices` tasks, each task
    * seeing the DRIVER's Hadoop configuration. The item list is
    * driver-side metadata (file names, never rows); results collect
    * back bounded by the same count. */
  def mapWithConf[T: ClassTag, R: ClassTag](
      spark: SparkSession, items: Seq[T], slices: Int)(
      f: (org.apache.hadoop.conf.Configuration, T) => R): Seq[R] = {
    if (items.isEmpty) Seq.empty
    else {
      val ser = new SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      spark.sparkContext
        .parallelize(items, math.max(1, math.min(slices, items.length)))
        .map(t => f(ser.value, t))
        .collect().toSeq
    }
  }
}
