package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared iteration plumbing for the loop-structured operators
  * (PageRank, HITS, k-core, label propagation, connected components,
  * perceptron, random walks, PCA): one checkpoint policy, one
  * checkpoint-cadence implementation — a change to either lands in
  * every operator at once instead of eight hand-copied variants.
  */
private[ops] object Iterate {

  /** Materialize a distributed frame in place: reliable checkpoint when
    * a checkpoint dir is configured (the cluster deployment path), local
    * checkpoint otherwise. NEVER collects — for sqrt(n)-row index
    * metadata that should become a local relation, use
    * [[IvfIndex.materialize]] instead.
    */
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Checkpoint-every-k-rounds bookkeeping: `step` returns the frame the
    * next round should build on (checkpointed on every `every`-th round
    * and on the last, the raw plan otherwise), unpersisting only the
    * previously CHECKPOINTED frame — plans between checkpoints hold no
    * storage.
    */
  final class Cadence(initial: DataFrame, every: Int = 2) {
    require(every >= 1)
    private var lastMat = initial
    def step(i: Int, isLast: Boolean, next: DataFrame): DataFrame =
      if (i % every == 0 || isLast) {
        val m = materialize(next)
        lastMat.unpersist()
        lastMat = m
        m
      } else next
  }
}
