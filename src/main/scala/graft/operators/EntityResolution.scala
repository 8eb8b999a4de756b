package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): collapse rows that refer to the same
  * real-world entity despite textual variation — the classic warehouse
  * cleanup step before any customer/supplier dimension is trusted.
  *
  * The standard scalable shape (Fellegi–Sunter blocking + pairwise match +
  * transitive closure), expressed as pure dataflow:
  *
  *   1. BLOCKING: a caller-chosen key (phonetic code, attribute prefix,
  *      sorted-neighborhood bucket…) partitions the corpus; only same-block
  *      pairs are candidates. This is the scale knob — pair volume is
  *      Σ block², never corpus², and the block key rides an equi-join that
  *      Spark shuffles by key (an AQE-splittable hash join, no cross join).
  *   2. MATCHING: candidate pairs are verified with an edit-distance
  *      threshold on a match attribute, evaluated as the join's non-equi
  *      condition inside the block — codegen'd `levenshtein`, no UDF.
  *   3. CLUSTERING: matched pairs form edges; [[Dedup.connectedComponents]]
  *      (pointer doubling, O(log diameter) rounds) assigns every record the
  *      min record id of its entity cluster — the same deterministic
  *      keep-rule as the dedup family.
  *
  * Returns one row per input record: (idCol, entity_id, entity_size) where
  * entity_id is the cluster representative (a record's own id when nothing
  * matched it) and entity_size counts the cluster's members.
  */
object EntityResolution {

  def resolve(
      df: DataFrame,
      idCol: String,
      blockKey: Column,
      matchAttr: Column,
      maxDistance: Int): DataFrame = {
    val ents = df.select(col(idCol).as("__id"), blockKey.as("__blk"), matchAttr.as("__attr"))
    // self-join through aliases: the two sides share lineage by design
    val edges = ents.alias("a")
      .join(
        ents.alias("b"),
        col("a.__blk") === col("b.__blk") &&
          col("a.__id") < col("b.__id") &&
          levenshtein(col("a.__attr"), col("b.__attr")) <= maxDistance)
      .select(col("a.__id").as("a"), col("b.__id").as("b"))
    val clusters = Dedup.connectedComponents(edges) // (id, label = min id)
    // resolve against the full input: unmatched records are their own entity
    val assigned = df.select(col(idCol))
      .join(clusters, col(idCol) === clusters("id"), "left")
      .select(col(idCol), coalesce(col("label"), col(idCol)).as("entity_id"))
    // entity-keyed window (partitioned — never global); counts ride the
    // already-shuffled cluster assignment
    assigned.withColumn(
      "entity_size",
      count(lit(1)).over(Window.partitionBy(col("entity_id"))))
  }
}
