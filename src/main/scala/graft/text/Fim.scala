package graft.text

import graft.sample.Sampling
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Fill-in-the-middle (FIM) transform — the pretraining data augmentation
 * behind infilling-capable code/text models (GPT/StarCoder lineage):
 * a deterministic fraction of documents is re-rendered in PSM order,
 * `<|fim_pre|>prefix<|fim_suf|>suffix<|fim_mid|>middle`, so the model
 * learns to generate a middle conditioned on both sides; the rest pass
 * through unchanged.
 *
 * Everything is deterministic, engine-portable string algebra (the P26
 * md5-threshold discipline) — no RNG, so task retries and re-runs cannot
 * disagree, and the DuckDB oracle replays the whole transform verbatim:
 *  - apply decision: `md5(salt:fim: || id)` 8-hex prefix under the rate
 *    threshold ([[Sampling.hashSamplePredicate]]);
 *  - two cut points: independent md5 draws mod (len+1), in CHARACTER
 *    units (both engines' `length`/`substr` are character-based, so
 *    multi-byte text cuts identically), `c1 = min, c2 = max` — empty
 *    middles/prefixes/suffixes are legal FIM (the model must learn them);
 *  - the three markers are the reserved-special composition: encode the
 *    output with `ByteBpe.encodeIds(_, model, Fim.Specials)` and each
 *    marker is ONE reserved id (the P63g codec), exactly like the chat
 *    template markers.
 *
 * Narrow per-row Column algebra: no shuffle, no state, streaming-legal.
 * Injection note (same contract as [[Chat.renderTemplate]]): a document
 * whose raw text contains a marker literal renders indistinguishably
 * from a control token — scrub `<|` upstream when that matters.
 */
object Fim {

  val PreMarker = "<|fim_pre|>"
  val SufMarker = "<|fim_suf|>"
  val MidMarker = "<|fim_mid|>"

  /** The reserved control tokens in P63g specials order. */
  val Specials: Seq[String] = Seq(PreMarker, SufMarker, MidMarker)

  /** Uniform draw in [0, len] from the tagged md5 of `id` (character
    * units). */
  private def cut(id: Column, len: Column, tag: String,
                  salt: String): Column =
    pmod(conv(substring(md5(concat(lit(s"$salt:$tag:"),
      id.cast("string"))), 1, 8), 16, 10).cast("long"),
      (len + 1).cast("long"))

  /**
   * The FIM-rendered text: PSM order for the deterministic `rate`
   * fraction of ids, the raw text for the rest. Null text reads as ''.
   */
  def fimTransform(text: Column, id: Column, rate: Double,
                   salt: String = "graft"): Column = {
    val t = coalesce(text, lit(""))
    val len = length(t)
    val a = cut(id, len, "fim1", salt)
    val b = cut(id, len, "fim2", salt)
    val c1 = least(a, b)
    val c2 = greatest(a, b)
    val prefix = t.substr(lit(1), c1.cast("int"))
    val middle = t.substr((c1 + 1).cast("int"), (c2 - c1).cast("int"))
    val suffix = t.substr((c2 + 1).cast("int"), (len - c2).cast("int"))
    when(applied(id, rate, salt),
      concat(lit(PreMarker), prefix, lit(SufMarker), suffix,
        lit(MidMarker), middle))
      .otherwise(t)
  }

  /** The transform's apply decision (exposed so pipelines can carry it as
    * a column and oracles/filters can replay it). */
  def applied(id: Column, rate: Double, salt: String = "graft"): Column =
    Sampling.hashSamplePredicate(id, rate, s"$salt:fim")
}
