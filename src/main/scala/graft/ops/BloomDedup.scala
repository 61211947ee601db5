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
    */
  def newRows(history: DataFrame, incoming: DataFrame, keyNames: Seq[String]): DataFrame = {
    val keyCols = keyNames.map(col)
    val bloom = buildBloom(history, keyCols,
      expectedItems = math.max(1L, history.count()))
    val maybe = incoming.filter(mightContain(bloom, keyCols))
      .select(keyCols: _*).distinct()
    // confirmed existing keys: scan history once, broadcast the maybe-set
    val confirmed = history
      .join(broadcast(maybe), keyNames, "left_semi")
      .select(keyCols: _*).distinct()
    incoming.join(broadcast(confirmed), keyNames, "left_anti")
  }
}
