package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge: `SparkContext.checkpointDir` is `private[spark]`
  * and there is no public way to UNSET it, but specs that exercise the
  * reliable-checkpoint path must restore the shared test context to its
  * no-checkpoint-dir default so suite order can't change other suites'
  * materialize behavior. */
object CheckpointBridge {
  def clearCheckpointDir(sc: SparkContext): Unit = sc.checkpointDir = None
}
