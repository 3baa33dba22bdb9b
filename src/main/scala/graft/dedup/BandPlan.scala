package graft.dedup

/**
 * MinHash-LSH banding planner — the design knob every banded dedup
 * deployment has to set and almost nobody derives: with `b` bands of `r`
 * rows, a pair at Jaccard `j` becomes a candidate with probability
 * `1 - (1 - j^r)^b` (the S-curve), and the curve's waterline sits at
 * `(1/b)^(1/r)`. Picking (b, r) by folklore ("16 bands of 8") silently
 * fixes the recall/cost trade; this object makes the choice explicit and
 * testable before a 100 TB run pays for it.
 *
 * All driver-side closed-form arithmetic — nothing here touches data. The
 * planner feeds [[Dedup.nearDupPairsMinHash]]-family `bands`/`rowsPerBand`
 * arguments (and the streaming/index twins, which share the banding).
 */
object BandPlan {

  /** Candidate probability of a pair at Jaccard `j` under (bands,
    * rowsPerBand) banding: `1 - (1 - j^r)^b`. */
  def collisionProbability(j: Double, bands: Int, rowsPerBand: Int): Double = {
    require(j >= 0.0 && j <= 1.0, s"jaccard must be in [0, 1]: $j")
    require(bands >= 1 && rowsPerBand >= 1, s"need bands, rows >= 1: $bands, $rowsPerBand")
    1.0 - math.pow(1.0 - math.pow(j, rowsPerBand.toDouble), bands.toDouble)
  }

  /** The S-curve waterline `(1/b)^(1/r)` — the Jaccard where candidate
    * probability crosses ~1 - 1/e ≈ 0.63; pairs meaningfully above it are
    * near-certain candidates, pairs meaningfully below near-certain
    * non-candidates. */
  def thresholdOf(bands: Int, rowsPerBand: Int): Double = {
    require(bands >= 1 && rowsPerBand >= 1, s"need bands, rows >= 1: $bands, $rowsPerBand")
    math.pow(1.0 / bands.toDouble, 1.0 / rowsPerBand.toDouble)
  }

  /** A concrete banding choice with its quality read-outs: recall at the
    * target threshold (want ~1) and the candidate rate at `0.5 * target`
    * (the false-candidate cost the exact verify must absorb — want ~0). */
  case class Plan(bands: Int, rowsPerBand: Int, threshold: Double,
                  recallAtTarget: Double, candidateRateAtHalfTarget: Double)

  /**
   * Choose (bands, rowsPerBand) with `bands * rowsPerBand == nHashes` whose
   * waterline sits closest BELOW-or-at the target Jaccard — below, because
   * banding false-negatives are unrecoverable (a missed candidate never
   * reaches the exact verify) while false candidates only cost verify work.
   * If no divisor pair's waterline is <= target (tiny nHashes, high
   * target), the closest one overall is returned. Ties prefer higher
   * recall at the target.
   */
  def planBands(nHashes: Int, targetJaccard: Double): Plan = {
    require(nHashes >= 2, s"need at least 2 hashes: $nHashes")
    require(targetJaccard > 0.0 && targetJaccard < 1.0,
      s"target must be in (0, 1): $targetJaccard")
    val candidates = (1 to nHashes)
      .filter(nHashes % _ == 0)
      .map { r =>
        val b = nHashes / r
        Plan(b, r, thresholdOf(b, r),
          collisionProbability(targetJaccard, b, r),
          collisionProbability(targetJaccard * 0.5, b, r))
      }
    val under = candidates.filter(_.threshold <= targetJaccard)
    val pool = if (under.nonEmpty) under else candidates
    pool.minBy(p => (math.abs(p.threshold - targetJaccard), -p.recallAtTarget))
  }
}
