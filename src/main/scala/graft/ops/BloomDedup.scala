package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge => CB}
import org.apache.spark.sql.types.BinaryType

/** Incremental dedup of an incoming batch against a historical corpus,
  * EXACT result, with a Bloom filter doing the heavy lifting so nothing
  * corpus-sized ever shuffles:
  *
  *   1. build a Bloom filter over the history keys (one distributed
  *      aggregate; the filter bytes are index metadata, ~1.2 GB per 10^9
  *      keys at 1% fpp — shard by key range beyond that);
  *   2. incoming rows whose key misses the filter are DEFINITELY new
  *      (Bloom filters have no false negatives) — they never join at all;
  *   3. only the bloom-positive slice (true dups + ~fpp% of the new rows)
  *      is verified exactly: its distinct keys broadcast to a semi-join
  *      scan of history, and the confirmed keys broadcast back to an
  *      anti-join on incoming.
  *
  * Both verification joins broadcast the SMALL side, so the whole
  * pipeline is scans + broadcast hash joins — no shuffle of history or
  * incoming. The plain alternative (incoming LEFT ANTI history) shuffles
  * both sides by key at every ingest; this shape re-reads history but
  * moves only kilobytes, which is the right trade when history is 100 TB
  * and a batch is gigabytes. The filter and its expressions are Spark's
  * own runtime-filter machinery (BloomFilterAggregate /
  * BloomFilterMightContain over xxhash64) — codegen'd, no UDF.
  *
  * The bloom routes rows but never decides the result, so the output is
  * exactly `incoming` minus the rows whose key appears in `history`
  * (the q_dedup_bloom oracle states that anti-join directly).
  */
object BloomDedup {

  /** Serialized Bloom filter over the (possibly composite) `keys` of `df`
    * (no false negatives; ~fpp false-positive rate at the given expected
    * item count).
    */
  def buildBloom(df: DataFrame, keys: Seq[Column], expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(keys.map(CB.expression)), expectedItems)
      .toAggregateExpression()
    df.select(CB.column(agg).as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(keys...))` as a codegen'd Column. */
  def mightContain(bloom: Array[Byte], keys: Seq[Column]): Column =
    CB.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(keys.map(CB.expression))))

  /** The rows of `incoming` whose composite `keyNames` value does NOT
    * appear in `history` — exact, bloom-routed (see object doc).
    *
    * @param expectedItems caller's estimate of the history key count for
    *   Bloom sizing (e.g. from table stats or the previous ingest's
    *   count). When absent, a `history.count()` pass derives it — at
    *   100 TB that is a full extra scan, so production callers should
    *   pass the estimate. Oversizing only wastes filter bytes;
    *   undersizing only raises the false-positive rate (more rows take
    *   the verify join) — correctness never depends on it.
    * @param maxBroadcastKeys bound on the maybe-dup key set the verify
    *   path may broadcast. The maybe-set is unbounded in adversarial
    *   batches (a batch that is mostly duplicates over a wide key
    *   space), so above this bound the verify switches to a shuffled
    *   anti join of the bloom-positive slice against the history keys
    *   that a batch-side Bloom admits — batch-bounded state on every
    *   executor, history still never shuffled beyond its matching keys.
    */
  def newRows(
      history: DataFrame,
      incoming: DataFrame,
      keyNames: Seq[String],
      expectedItems: Option[Long] = None,
      maxBroadcastKeys: Long = 1L << 22): DataFrame = {
    val keyCols = keyNames.map(col)
    val bloom = buildBloom(history, keyCols,
      expectedItems = math.max(1L, expectedItems.getOrElse(history.count())))
    val maybe = incoming.filter(mightContain(bloom, keyCols))
      .select(keyCols: _*).distinct()
    // batch-sized count (never history-sized): routes the verify shape
    val maybeCount = maybe.count()
    if (maybeCount <= maxBroadcastKeys) {
      // confirmed existing keys: scan history once, broadcast the maybe-set
      val confirmed = history
        .join(broadcast(maybe), keyNames, "left_semi")
        .select(keyCols: _*).distinct()
      incoming.join(broadcast(confirmed), keyNames, "left_anti")
    } else {
      // oversized maybe-set: bloom-definite-new rows still skip all joins;
      // the positive slice anti-joins history pruned by a BATCH-side bloom
      // (so only history keys colliding with the batch shuffle at all)
      val batchBloom = buildBloom(maybe, keyCols, math.max(1L, maybeCount))
      val histSlice = history.filter(mightContain(batchBloom, keyCols))
        .select(keyCols: _*)
      incoming.filter(!mightContain(bloom, keyCols))
        .unionByName(
          incoming.filter(mightContain(bloom, keyCols))
            .join(histSlice, keyNames, "left_anti"))
    }
  }
}
