package graft

import org.apache.spark.sql.DataFrame

/**
 * Handle to unpersist a DataFrame that an operator caches internally and the
 * caller cannot reach (e.g. the persisted intermediate inside
 * [[RowNumbers.withRowNumbers]] or `writePartitionedBy`).
 *
 * Semantics match the reference
 * (/root/reference/src/main/scala/uk/co/gresearch/spark/UnpersistHandle.scala:27-72):
 * set-once; `unpersist` before `setDataFrame` throws; `SilentUnpersistHandle`
 * tolerates being unset; `NoopUnpersistHandle` ignores everything.
 */
class UnpersistHandle {
  protected var df: Option[DataFrame] = None

  private[graft] def setDataFrame(dataframe: DataFrame): DataFrame = {
    if (df.isDefined)
      throw new IllegalStateException("DataFrame has been set already, it cannot be reused.")
    df = Some(dataframe)
    dataframe
  }

  def unpersist(): Unit = unpersist(blocking = false)

  def unpersist(blocking: Boolean): Unit = {
    df.map(_.unpersist(blocking)).getOrElse {
      throw new IllegalStateException("DataFrame has to be set first")
    }
    ()
  }

  /** Run `func` with this handle's DataFrame guaranteed to be unpersisted afterwards. */
  def withUnpersist[R](blocking: Boolean = false)(func: => R): R =
    try func finally unpersist(blocking)
}

/** Unpersist handle that silently ignores a missing DataFrame. */
class SilentUnpersistHandle extends UnpersistHandle {
  override def unpersist(blocking: Boolean): Unit = {
    df.foreach(_.unpersist(blocking))
  }
}

/** Handle used when the caller opts out of caching entirely. */
case object NoopUnpersistHandle extends UnpersistHandle {
  override private[graft] def setDataFrame(dataframe: DataFrame): DataFrame = dataframe
  override def unpersist(blocking: Boolean): Unit = ()
}

object UnpersistHandle {
  def apply(): UnpersistHandle = new UnpersistHandle()
  val Noop: UnpersistHandle = NoopUnpersistHandle
}
