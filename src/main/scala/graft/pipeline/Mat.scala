package graft.pipeline

import org.apache.spark.sql.DataFrame

/**
 * Materialization strategy for pipeline intermediates that feed several
 * downstream consumers (postings tables, candidate-pair inputs,
 * iteration state). Two tiers:
 *
 *  - `corpus`: CORPUS-SCALE intermediates (one row per document / posting
 *    / pair — the tables that are petabyte-scale at 100 TB input). On a
 *    real cluster an eager `localCheckpoint` is NON-reliable: the
 *    truncated lineage lives in executor block managers, so one lost
 *    executor invalidates the blocks and — with the lineage gone — kills
 *    the job. When the session has a RELIABLE checkpoint directory
 *    configured (`sparkContext.setCheckpointDir`, HDFS/object-store on a
 *    cluster), `corpus` uses a reliable eager checkpoint instead: blocks
 *    are re-readable from the checkpoint dir after executor loss. Without
 *    one (local/sandbox runs) it falls back to the eager local
 *    checkpoint — identical results, single-JVM-safe.
 *
 *  - `small`: VOCABULARY-/SKETCH-/NODE-LABEL-scale iteration state (BPE
 *    round tables, sketch merges, cluster-label rounds). Always a local
 *    checkpoint: the state is small enough that recomputing the round on
 *    a (rare) executor loss is cheaper than a distributed-FS round-trip
 *    per iteration.
 *
 * Observed metrics (`Dataset.observe`) ride both variants: reliable
 * `Dataset.checkpoint(eager = true)` and `localCheckpoint(true)` execute
 * the same physical plan through the same action path, so a
 * CollectMetrics node fires either way (pinned by MatSpec together with
 * the output-equality contract).
 */
object Mat {

  /** True when `df`'s session has a reliable checkpoint dir configured. */
  def reliable(df: DataFrame): Boolean =
    df.sparkSession.sparkContext.getCheckpointDir.isDefined

  /** Eagerly materialize a corpus-scale intermediate: reliable checkpoint
    * when the session has a checkpoint dir, local checkpoint otherwise. */
  def corpus(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Eagerly materialize small (vocabulary-/sketch-sized) iteration
    * state — always local; see the class doc for why. */
  def small(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)
}
