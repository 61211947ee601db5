package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.unsafe.types.UTF8String

/** Serving path for the trained [[graft.ops.Perceptron]] model: score an
  * arriving document stream with a frozen weight vector — the learned
  * quality gate a curation pipeline runs at ingest (the trained twin of
  * DocStream's heuristic gate).
  *
  * Scale shape: the model is a dense Long array of `dims` entries,
  * task-serialized with the closure (KBs — the stream is the big side);
  * scoring is entirely ROW-LOCAL (hash tokens, sum weights: the same
  * md5p60 % dims featurization and exact int64 dot product as training),
  * so the scorer adds no state, no shuffle, and no join to the stream —
  * it composes anywhere a `Dataset` map does, batch or streaming.
  * Margins are bit-identical to the batch `trainPredict` scoring pass
  * (the parity spec pins this).
  */
object PerceptronServe {

  final case class Doc(id: Long, text: String)

  final case class Scored(id: Long, margin_fp: Long, pred: Int)

  /** `w(dim)` from the (dim, w) frame [[graft.ops.Perceptron.train]]
    * returns — d rows of model metadata, collected once.
    */
  def weightsArray(w: org.apache.spark.sql.DataFrame, dims: Int): Array[Long] = {
    val arr = new Array[Long](dims)
    w.collect().foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Score `docs` (batch or streaming Dataset — the scorer is stateless)
    * with the frozen model.
    */
  def scored(docs: Dataset[Doc], w: Array[Long]): Dataset[Scored] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dims = w.length
    docs.map { d =>
      var m = 0L
      d.text.split(" ").foreach { t =>
        if (t.nonEmpty) {
          val dim = (graft.functions.Md5Prefix60.hash60(
            UTF8String.fromString(t)) % dims).toInt
          m += w(dim)
        }
      }
      Scored(d.id, m, if (m > 0) 1 else -1)
    }
  }
}
