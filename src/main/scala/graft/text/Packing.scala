package graft.text

import graft.UnpersistHandle
import graft.agg.PrefixSum
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel

/**
 * Sequence packing for training-data prep: assign every document a position
 * in a stream of fixed-capacity token sequences.
 *
 * Training pipelines concatenate the tokenized corpus in a deterministic
 * order and cut it into `capacity`-token sequences; what they need per
 * document is WHERE it lands: `seq_id` (which sequence its first token
 * falls in) and `seq_offset` (token offset within that sequence). Both are
 * pure functions of the exclusive running token total, so the heavy lifting
 * is [[graft.agg.PrefixSum]]'s three-phase global prefix sum — no
 * single-partition window, no driver loop, reproducible at any parallelism.
 * Documents crossing a sequence boundary spill into the following sequence
 * (the downstream chunker's concern; `chunkByTokens` covers the in-doc
 * split).
 */
object Packing {

  /**
   * Add `seq_id` / `seq_offset` for a pack of `capacity` tokens per
   * sequence, streaming documents in the (total) order `order`. `tokensCol`
   * is the per-document token count — e.g.
   * `TextFunctions.tokenStatsAscii(text)(0)` or a stored count column.
   */
  def packSequences(
      df: DataFrame,
      tokensCol: Column,
      order: Seq[Column],
      capacity: Long,
      storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
      unpersistHandle: UnpersistHandle = UnpersistHandle.Noop): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val cum = "__graft_cum_tokens"
    PrefixSum.withRunningTotal(df, tokensCol, order, cum,
        exclusive = true, storageLevel, unpersistHandle)
      .withColumn("seq_id", floor(col(cum) / capacity).cast("long"))
      .withColumn("seq_offset", (col(cum) % capacity).cast("long"))
      .drop(cum)
  }
}
