package graft.operators

import graft.Checkpointing
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
  * MEGA-BLOCK GUARD: Σ block² is only a bound if no single block is huge. A
  * skewed blocking key — one common name prefix, an empty/null attribute —
  * concentrates the corpus into one block and the all-pairs join inside it
  * goes quadratic. Blocks above `guardBlockSize` therefore switch from
  * ALL-PAIRS matching to SORTED-NEIGHBORHOOD matching (Hernández & Stolfo's
  * merge/purge): rows are ordered by the match attribute inside the block
  * and each row is compared only against its next `guardWindow` neighbors,
  * via an (block, position) EQUI-join — pair volume is size × window,
  * strictly linear in block size. For the floods that create mega-blocks
  * (many near-identical values) sorted order places matches adjacently and
  * transitive closure recovers the full cluster, so the result is identical;
  * in adversarial mixed blocks the guard can only UNDER-match (a pair whose
  * neighborhood is interrupted by > window unrelated-but-same-block rows),
  * never over-match — the same degradation contract as
  * [[Dedup.semanticDedup]]'s oversized-cluster guard.
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
      maxDistance: Int,
      guardBlockSize: Int = 4096,
      guardWindow: Int = 16): DataFrame = {
    val ents = df.select(col(idCol).as("__id"), blockKey.as("__blk"), matchAttr.as("__attr"))
    // block-size census rides ONE __blk window exchange (no groupBy + join
    // back); the two matching strategies then split on a plain filter. The
    // tagged frame is materialized once — the small path self-joins it and
    // the big path windows + probes it, four subtree evaluations without
    // the checkpoint, each repeating the scan and the census exchange.
    val flagged = ents.withColumn(
      "__bsize", count(lit(1)).over(Window.partitionBy(col("__blk"))))
      .transform(Checkpointing.materialize)

    // banded edit distance: with a threshold the DP runs O(len × maxD), not
    // O(len²), and returns -1 above the bound — so `>= 0` IS `<= maxD`. The
    // length-gap prefilter is a codegen'd subtraction that rejects most
    // pairs before any DP row is touched.
    def matches(a: Column, b: Column): Column =
      abs(length(a) - length(b)) <= maxDistance &&
        levenshtein(a, b, maxDistance) >= 0

    // exact path: all-pairs within blocks of sane size (Σ block² bounded by
    // guardBlockSize × corpus); self-join through aliases — the two sides
    // share lineage by design
    val small = flagged.filter(col("__bsize") <= guardBlockSize).drop("__bsize")
    val edgesSmall = small.alias("a")
      .join(
        small.alias("b"),
        col("a.__blk") === col("b.__blk") &&
          col("a.__id") < col("b.__id") &&
          matches(col("a.__attr"), col("b.__attr")))
      .select(col("a.__id").as("a"), col("b.__id").as("b"))

    // guarded path: sorted neighborhood inside oversized blocks. Each row
    // probes positions rn+1 … rn+window of the block's attr-sorted order via
    // an (blk, position) equi-join, so a mega-block costs size × window
    // comparisons and the join key is fine-grained — no reducer ever sees
    // the whole block twice.
    val big = flagged.filter(col("__bsize") > guardBlockSize).drop("__bsize")
    val order = Window.partitionBy(col("__blk")).orderBy(col("__attr"), col("__id"))
    val ranked = big.withColumn("__rn", row_number().over(order))
    val probes = ranked.select(
      col("__blk"), col("__id"), col("__attr"),
      explode(sequence(col("__rn") + 1, col("__rn") + guardWindow)).as("__target"))
    val edgesBig = probes.alias("a")
      .join(
        ranked.alias("b"),
        col("a.__blk") === col("b.__blk") &&
          col("a.__target") === col("b.__rn") &&
          matches(col("a.__attr"), col("b.__attr")))
      .select(
        least(col("a.__id"), col("b.__id")).as("a"),
        greatest(col("a.__id"), col("b.__id")).as("b"))

    // CC output renamed so a caller idCol literally named "id" can't clash
    val clusters = Dedup.connectedComponents(edgesSmall.unionByName(edgesBig))
      .select(col("id").as("__cc_id"), col("label"))
    // resolve against the full input: unmatched records are their own entity
    val assigned = df.select(col(idCol))
      .join(clusters, col(idCol) === col("__cc_id"), "left")
      .select(col(idCol), coalesce(col("label"), col(idCol)).as("entity_id"))
    // entity-keyed window (partitioned — never global); counts ride the
    // already-shuffled cluster assignment
    assigned.withColumn(
      "entity_size",
      count(lit(1)).over(Window.partitionBy(col("entity_id"))))
  }
}
