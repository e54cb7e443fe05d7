/** Bridge into Spark-core `private[spark]` members (see ColumnBridge for
  * the sql-side equivalent).
  */
package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

object CoreBridge {
  /** Flush the async listener bus so metric listeners observe every task. */
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
