package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column wrappers over Spark's internal bloom-filter expressions (the
  * machinery behind AQE's runtime row-level filtering, not exposed in the
  * public function registry). At 100 TB this is the manual form of
  * bloom-pruned joins: build a compact filter over the small side's keys,
  * broadcast it, and discard non-matching fact rows INSIDE their scan stage
  * — rows that would never survive the join skip the shuffle entirely.
  * Guarantees: no false negatives; false-positive rate set by
  * `expectedItems` sizing.
  */
object SketchFunctions {

  /** Aggregate a bloom filter (as binary) over the hashed key column. */
  def bloomFilterAgg(key: Column, expectedItems: Long = 1000000L): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(XxHash64(Seq(ColumnBridge.expression(key)), 42L), expectedItems)
        .toAggregateExpression())

  /** Probe: may the key be in the filter? (false ⇒ definitely absent). */
  def mightContain(filter: Column, key: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        ColumnBridge.expression(filter),
        XxHash64(Seq(ColumnBridge.expression(key)), 42L)))
}
