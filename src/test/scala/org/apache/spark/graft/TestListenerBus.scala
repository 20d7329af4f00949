/* Hosted under org.apache.spark to reach the private[spark] listener bus —
 * test-only: lets specs flush pending listener events before asserting on
 * job counts (the bus is asynchronous, so a plain sleep would be a race).
 */
package org.apache.spark.graft

import org.apache.spark.SparkContext

object TestListenerBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
