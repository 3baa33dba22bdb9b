package graft.join

import graft.functions.vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Fuzzy self-join at edit distance <= 1 — the entity-resolution primitive
 * (near-identical names, IDs with one typo) that a naive implementation
 * writes as a cross join with a `levenshtein` filter: O(n^2) comparisons,
 * a broadcast-nested-loop plan, dead at a million rows.
 *
 * Deletion-neighborhood blocking (the FastSS scheme) instead: each string
 * emits its single-character-deletion variants plus itself. Any two strings
 * within edit distance 1 share at least one variant (substitution at i:
 * both drop position i; insertion/deletion: the shorter string IS a variant
 * of the longer), so an equi-join on the variant key finds every true pair
 * — a hash shuffle join on short strings, O(n * len) join rows. Chance
 * signature collisions (distinct strings reducing to the same variant) are
 * removed by an exact `levenshtein` check on the candidates, so the result
 * is exact.
 *
 * Scale: shuffle carries (len+1) short signatures per row; signature
 * buckets are bounded by the alphabet (all strings one insertion away from
 * the shared variant), so no quadratic bucket risk on real keys. The
 * verify filter runs codegen'd `levenshtein` on candidates only.
 */
object FuzzyJoin {

  /**
   * All pairs (idA < idB) of rows whose `str` values are within edit
   * distance 1 (and not equal — use exact dedup for identical keys).
   * Output: `idA`, `idB`, `dist` (always 1).
   */
  def editDistance1Pairs(df: DataFrame, id: Column, str: Column): DataFrame = {
    val base = df.select(id.as("__fj_id"), str.as("__fj_s"))
      .filter(col("__fj_s").isNotNull)
    // join on the 64-bit hash of the signature, not the signature string:
    // the shuffle carries 8 bytes per key instead of the variant text, and
    // a 2^-64 hash collision only adds a candidate the levenshtein verify
    // removes — exactness is unaffected
    // array_distinct BEFORE the explode: a string with repeated characters
    // (zero-padded ids, doubled letters) emits the SAME variant once per
    // repeat position — each duplicate signature multiplies the self-join's
    // candidate pairs QUADRATICALLY within its bucket, and the trailing
    // distinct() was re-verifying and then discarding every copy. The
    // candidate SET is unchanged (pairs join on shared signature values),
    // so the output is identical.
    val sigs = base
      .select(col("__fj_id"), col("__fj_s"),
        explode(array_distinct(vectors.deletion_variants(col("__fj_s"))))
          .as("__fj_sigtext"))
      .select(col("__fj_id"), col("__fj_s"), xxhash64(col("__fj_sigtext")).as("__fj_sig"))
    // self-join via ALIASES of the one signature plan (not two re-projected
    // copies): both join children then canonicalize to the same subtree, so
    // ReuseExchange materializes the explode+shuffle ONCE and the second
    // side reads the shuffle files — halving the dominant cost (verified by
    // the ReusedExchange plan assertion in JoinsSuite).
    //
    // verify BEFORE dedup: candidates that fail levenshtein (chance
    // signature collisions — the majority) die right after the join instead
    // of paying the distinct shuffle; a true pair seen via several shared
    // signatures re-evaluates the (codegen'd) levenshtein and dedups after,
    // so the distinct shuffles only verified pairs.
    // threshold-banded verify: levenshtein(l, r, 1) computes the O(len)
    // band and returns -1 the moment the distance exceeds 1, instead of
    // filling the full O(len^2) matrix per candidate — the verify is the
    // per-pair hot loop, and candidates are quadratic in bucket size.
    // Surviving pairs have distinct strings, so the thresholded value IS
    // the exact distance (always 1) — output unchanged.
    sigs.as("__fjA").join(sigs.as("__fjB"),
        col("__fjA.__fj_sig") === col("__fjB.__fj_sig"))
      .filter(col("__fjA.__fj_id") < col("__fjB.__fj_id") &&
        col("__fjA.__fj_s") =!= col("__fjB.__fj_s") &&
        levenshtein(col("__fjA.__fj_s"), col("__fjB.__fj_s"), 1) >= 0)
      .select(col("__fjA.__fj_id").as("idA"), col("__fjB.__fj_id").as("idB"),
        levenshtein(col("__fjA.__fj_s"), col("__fjB.__fj_s"), 1).as("dist"))
      .distinct()
  }
}
