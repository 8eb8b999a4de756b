package graft.sources.v2

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Planning-time FILE skipping for the `graft-parquet` connector: per-file
  * min/max/null-count zone maps, collected for free while each task writes
  * its rows and carried crash-safely through the staged-commit manifest
  * (the manifest line format is `fileName\t<stats json>`; the manifest is
  * already the commit point, so a replayed roll-forward replays the zone-map
  * write too — see [[GraftParquetWrite]]).
  *
  * Why this matters at 100 TB: [[GraftScan.planInputPartitions]] reads one
  * parquet FOOTER per file to tile row groups. Row-group skipping via
  * parquet statistics only helps after that footer read; on a 100k-file
  * table the planner pays 100k metadata round-trips per query. The zone map
  * is the Delta/Iceberg data-skipping move re-expressed on this connector:
  * the driver folds `_zonemap/zm-*` (one small line-file per commit,
  * O(commits) reads, compactable) and drops every file whose statistics
  * PROVE the pushed conjunction empty — those files cost zero footer reads,
  * zero partitions, zero tasks.
  *
  * Semantics contract: pruning must agree with the record-level evaluator
  * ([[GraftScan.eval]]) — a file is skipped only when NO row in it could
  * satisfy every pushed filter. All comparisons go through the same
  * [[GraftScan.cmp]] total order the evaluator uses, so the two can never
  * disagree on ordering. Conservatism rules:
  *
  *   - a file with no zone-map entry (written before this feature, or a
  *     torn sidecar line) is always scanned;
  *   - a column with NaN values suppresses pruning on that column entirely
  *     (`nan` flag; NaN's ordering vs min/max would otherwise need
  *     per-filter-shape case analysis — the Delta approach);
  *   - a column absent from the entry is always may-match;
  *   - min/max absent with `nulls == rows` means the column is entirely
  *     NULL in that file, which REFUTES any comparison filter (SQL
  *     three-valued logic: `x < v` is never true for NULL x).
  *
  * The sidecar is advisory for liveness but load-bearing for correctness in
  * one direction only: an entry must never describe different content than
  * the file it names. File names are queryId-unique and never reused
  * ([[GraftDataWriter]]), so a stale entry can only name a file that no
  * longer exists — harmless, the file listing drives the scan.
  */
object ZoneMap {

  val DirName = "_zonemap"

  /** Per-column statistics of one committed file. `min`/`max` are the
    * column's native values rendered to strings (Long/Int/Boolean exact;
    * Double/Float via shortest-round-trip `toString`, re-parsed bitwise;
    * Strings verbatim — JSON escaping keeps tabs/newlines out of the
    * line format). Absent when the column is entirely NULL in the file.
    */
  final case class ColStats(min: Option[String], max: Option[String], nulls: Long, nan: Boolean)

  final case class FileStats(rows: Long, cols: Map[String, ColStats])

  // ---------------------------------------------------------------- encode

  def encode(s: FileStats): String = {
    val cols = JObject(s.cols.toList.sortBy(_._1).map { case (name, c) =>
      name -> JObject(List(
        "min" -> c.min.map(JString(_): JValue).getOrElse(JNothing),
        "max" -> c.max.map(JString(_): JValue).getOrElse(JNothing),
        "nulls" -> JLong(c.nulls),
        "nan" -> JBool(c.nan)).filterNot(_._2 == JNothing))
    })
    JsonMethods.compact(JsonMethods.render(JObject("rows" -> JLong(s.rows), "cols" -> cols)))
  }

  def decode(json: String): FileStats = {
    val v = JsonMethods.parse(json)
    val rows = (v \ "rows") match {
      case JLong(n) => n
      case JInt(n) => n.toLong
      case other => throw new graft.GraftDataError(s"zonemap entry missing rows: $other")
    }
    val cols = (v \ "cols") match {
      case JObject(fields) => fields.map { case (name, cv) =>
        def str(k: String) = (cv \ k) match { case JString(x) => Some(x); case _ => None }
        // an absent/malformed null count is UNDECODABLE, not zero: nulls=0
        // would wrongly refute IsNull and prune a file that may hold nulls —
        // throwing drops the line and the file scans un-pruned (the same
        // conservative handling as a missing `rows`)
        def lng(k: String) = (cv \ k) match {
          case JLong(x) => x; case JInt(x) => x.toLong
          case other => throw new graft.GraftDataError(s"zonemap entry missing $k: $other")
        }
        val nan = (cv \ "nan") match { case JBool(b) => b; case _ => false }
        name -> ColStats(str("min"), str("max"), lng("nulls"), nan)
      }.toMap
      case _ => Map.empty[String, ColStats]
    }
    FileStats(rows, cols)
  }

  // ------------------------------------------------------------- collector

  /** Streaming min/max/null collector the data writer drives once per row.
    * Each column gets a TYPED updater closure resolved once at
    * construction: scalars track primitive extremes (no per-cell boxing or
    * dataType match), strings compare the row's UTF8String view directly
    * (binary order — the same code-point order [[GraftScan.cmp]] uses) and
    * clone only when a new extreme is retained (the view aliases a reused
    * row buffer). Restricted to the connector's primitive type set
    * (enforced at plan time by [[GraftParquetWrite.toMessageType]]).
    */
  final class Collector(schema: StructType) {
    private val n = schema.length
    private val nulls = new Array[Long](n)
    private var rows = 0L

    // per-column (updater, finisher): finisher renders (min, max, nan)
    private val cols: Array[(InternalRow => Unit, () => (Option[String], Option[String], Boolean))] =
      schema.fields.zipWithIndex.map { case (f, i) =>
        f.dataType match {
          case LongType =>
            var mn = Long.MaxValue; var mx = Long.MinValue; var seen = false
            ((row: InternalRow) => {
              val v = row.getLong(i); seen = true
              if (v < mn) mn = v; if (v > mx) mx = v
            }, () => (if (seen) Some(mn.toString) else None,
              if (seen) Some(mx.toString) else None, false))
          case IntegerType =>
            var mn = Int.MaxValue; var mx = Int.MinValue; var seen = false
            ((row: InternalRow) => {
              val v = row.getInt(i); seen = true
              if (v < mn) mn = v; if (v > mx) mx = v
            }, () => (if (seen) Some(mn.toString) else None,
              if (seen) Some(mx.toString) else None, false))
          case DoubleType =>
            // first value ASSIGNS rather than comparing against a sentinel:
            // ±Infinity lies outside [-MaxValue, MaxValue], so a sentinel
            // init would silently never record an infinite extreme and the
            // metadata MIN/MAX answer would be wrong
            var mn = 0.0; var mx = 0.0; var seen = false; var nan = false
            ((row: InternalRow) => {
              val v = row.getDouble(i)
              if (java.lang.Double.isNaN(v)) nan = true
              else if (!seen) { seen = true; mn = v; mx = v }
              else {
                // Double.compare semantics (-0.0 < 0.0), like cmp
                if (java.lang.Double.compare(v, mn) < 0) mn = v
                if (java.lang.Double.compare(v, mx) > 0) mx = v
              }
            }, () => (if (seen) Some(mn.toString) else None,
              if (seen) Some(mx.toString) else None, nan))
          case FloatType =>
            var mn = 0.0f; var mx = 0.0f; var seen = false; var nan = false
            ((row: InternalRow) => {
              val v = row.getFloat(i)
              if (java.lang.Float.isNaN(v)) nan = true
              else if (!seen) { seen = true; mn = v; mx = v }
              else {
                if (java.lang.Float.compare(v, mn) < 0) mn = v
                if (java.lang.Float.compare(v, mx) > 0) mx = v
              }
            }, () => (if (seen) Some(mn.toString) else None,
              if (seen) Some(mx.toString) else None, nan))
          case BooleanType =>
            var seenT = false; var seenF = false
            ((row: InternalRow) => {
              if (row.getBoolean(i)) seenT = true else seenF = true
            }, () => {
              val mn = if (seenF) Some("false") else if (seenT) Some("true") else None
              val mx = if (seenT) Some("true") else if (seenF) Some("false") else None
              (mn, mx, false)
            })
          case StringType =>
            var mn: org.apache.spark.unsafe.types.UTF8String = null
            var mx: org.apache.spark.unsafe.types.UTF8String = null
            ((row: InternalRow) => {
              val v = row.getUTF8String(i) // a VIEW into a reused buffer
              if (mn == null || v.compareTo(mn) < 0) mn = v.clone()
              if (mx == null || v.compareTo(mx) > 0) mx = v.clone()
            }, () => (Option(mn).map(_.toString), Option(mx).map(_.toString), false))
          case other => throw new graft.GraftConfigError(
            s"unreachable: '${f.name}' ($other) was gated at plan time")
        }
      }

    def observe(row: InternalRow): Unit = {
      var i = 0
      while (i < n) {
        if (row.isNullAt(i)) nulls(i) += 1 else cols(i)._1(row)
        i += 1
      }
      rows += 1
    }

    def result: FileStats = FileStats(rows, schema.fields.zipWithIndex.map { case (f, i) =>
      val (mn, mx, nan) = cols(i)._2()
      f.name -> ColStats(mn, mx, nulls(i), nan)
    }.toMap)
  }

  // --------------------------------------------------------------- pruning

  /** Parse a stored bound back into the comparison domain of the table
    * schema's column type (the domain [[GraftScan.cmp]] orders). Double and
    * Float round-trip bitwise through `toString`/`parse` for every non-NaN
    * value (Java shortest-round-trip contract); NaN never reaches storage.
    */
  private[v2] def parseBound(s: String, dt: DataType): Option[Any] =
    scala.util.Try[Any](dt match {
      case LongType => java.lang.Long.parseLong(s)
      case IntegerType => java.lang.Integer.parseInt(s)
      case DoubleType => java.lang.Double.parseDouble(s)
      case FloatType => java.lang.Float.parseFloat(s)
      case BooleanType => java.lang.Boolean.parseBoolean(s)
      case StringType => s
      case other => throw new graft.GraftDataError(s"no bound domain for $other")
    }).toOption // a corrupt bound must stay may-match, never fail the plan

  /** Bounds usable for comparison pruning on column `a`: None = cannot
    * prune on this column (no entry, NaN-poisoned, or unparseable);
    * Some(None) = the column is entirely NULL here (no non-null value was
    * observed and the null count covers every row — the guard keeps a
    * malformed entry conservative), so every comparison is refuted;
    * Some(Some((min, max))) = the comparison domain. Shared by
    * [[mayMatch]] and the prepared-IN fast path so they can never
    * disagree.
    */
  private[v2] def colBounds(a: String, stats: FileStats, schema: StructType)
      : Option[Option[(Any, Any)]] =
    stats.cols.get(a).flatMap { c =>
      if (c.nan) None
      else if (c.min.isEmpty || c.max.isEmpty) {
        if (c.nulls == stats.rows) Some(None) else None
      } else schema.fields.find(_.name == a).flatMap { f =>
        // a float→double-WIDENED column (epoch metadata marker): entries
        // written before the widening rendered FLOAT values, whose double
        // re-parse is off by up to one float ulp — and we cannot tell
        // which era wrote an entry. Parse each bound BOTH ways and take
        // the hull: min of the two interpretations for the lower bound,
        // max for the upper. The hull always contains the true value
        // whichever era wrote it, so pruning stays a proof of emptiness
        // (it merely prunes a hair less around widened bounds).
        if (f.dataType == DoubleType && GraftScan.widenedFromFloat(f)) {
          def hull(s: String, lower: Boolean): Option[Any] =
            parseBound(s, DoubleType).zip(parseBound(s, FloatType)).map {
              case (d: Double, fl: Float) =>
                if (lower) math.min(d, fl.toDouble) else math.max(d, fl.toDouble)
              case (d, _) => d
            }
          hull(c.min.get, lower = true).zip(hull(c.max.get, lower = false)).map(b => Some(b))
        } else
          parseBound(c.min.get, f.dataType).zip(parseBound(c.max.get, f.dataType))
            .map(b => Some(b))
      }
    }

  /** True iff SOME row of a file with these statistics could satisfy the
    * filter — the may-match test. Returning true when unsure is the safe
    * direction; returning false is a proof of emptiness.
    */
  def mayMatch(f: Filter, stats: FileStats, schema: StructType): Boolean = {
    def col(a: String): Option[ColStats] = stats.cols.get(a)
    def bounds(a: String): Option[Option[(Any, Any)]] = colBounds(a, stats, schema)
    def cmpMay(a: String, test: ((Any, Any)) => Boolean): Boolean = bounds(a) match {
      case None => true // unknown: may match
      case Some(None) => false // all NULL: comparison refuted
      case Some(Some(b)) => test(b)
    }
    // a cross-type cmp miss (None) must stay may-match in BOTH polarities
    def lt(x: Any, y: Any) = GraftScan.cmp(x, y).forall(_ < 0)
    def le(x: Any, y: Any) = GraftScan.cmp(x, y).forall(_ <= 0)
    f match {
      case IsNull(a) => col(a).forall(_.nulls > 0)
      case IsNotNull(a) => col(a).forall(c => c.nulls < stats.rows)
      case EqualTo(a, v) => cmpMay(a, { case (mn, mx) => le(mn, v) && le(v, mx) })
      case GreaterThan(a, v) => cmpMay(a, { case (_, mx) => lt(v, mx) })
      case GreaterThanOrEqual(a, v) => cmpMay(a, { case (_, mx) => le(v, mx) })
      case LessThan(a, v) => cmpMay(a, { case (mn, _) => lt(mn, v) })
      case LessThanOrEqual(a, v) => cmpMay(a, { case (mn, _) => le(mn, v) })
      case In(a, vs) => cmpMay(a, { case (mn, mx) => vs.exists(v => le(mn, v) && le(v, mx)) })
      case _ => true // unreachable: evaluable() gates acceptance
    }
  }

  /** May the file match the whole pushed CONJUNCTION? One refuted conjunct
    * refutes the file.
    */
  def mayMatchAll(filters: Array[Filter], stats: FileStats, schema: StructType): Boolean =
    filters.forall(mayMatch(_, stats, schema))

  // -------------------------------------------------- prepared IN pruning

  /** A filter pre-processed for repeated per-file testing. The runtime
    * join-filter seam can hand the scan an IN of THOUSANDS of dim keys;
    * the naive test is O(files × keys) driver work at plan time — at
    * 100 TB (1e5 keys × 1e5 files) that is minutes of planning. Sorting
    * each large IN once (under the SAME total order [[GraftScan.cmp]]
    * everything else uses) turns the per-file test into two binary
    * searches: "is any value inside [min, max]?".
    */
  sealed trait Prepared
  private final case class PlainP(f: Filter) extends Prepared
  private final case class SortedIn(attr: String, values: Array[Any]) extends Prepared

  private val PrepareThreshold = 16

  def prepare(filters: Array[Filter]): Array[Prepared] =
    filters.map {
      case f @ In(a, vs) if vs.length > PrepareThreshold &&
          // sortable only when every value is non-null and of ONE runtime
          // class: within a class cmp is a genuine total order, while a
          // numeric MIX (Long with Double) is pairwise comparable but
          // INTRANSITIVE above 2^53 (the Double path loses precision) —
          // TimSort only sometimes detects a broken comparator, and a
          // silently mis-sorted array would make the binary search wrongly
          // refute files. Mixed/null sets keep the linear form.
          vs.forall(_ != null) && vs.iterator.map(_.getClass).distinct.size == 1 =>
        val sorted = vs.clone()
        java.util.Arrays.sort(sorted.asInstanceOf[Array[Object]],
          new java.util.Comparator[Object] {
            def compare(x: Object, y: Object): Int =
              GraftScan.cmp(x, y).getOrElse(
                throw new IllegalStateException(s"incomparable within one class: $x vs $y"))
          })
        SortedIn(a, sorted)
      case f => PlainP(f)
    }

  /** Same decision as [[mayMatch]] on the underlying filter (the property
    * ZoneMapSpec pins over randomized inputs), O(log keys) for a prepared
    * IN. Any incomparable pair met during the search degrades to
    * may-match — the conservative direction, matching the linear form's
    * cross-type behavior.
    */
  def mayMatchPrepared(p: Prepared, stats: FileStats, schema: StructType): Boolean = p match {
    case PlainP(f) => mayMatch(f, stats, schema)
    case SortedIn(a, sorted) => colBounds(a, stats, schema) match {
      case None => true // unknown: may match
      case Some(None) => false // all NULL: IN refuted
      case Some(Some((mn, mx))) =>
        // leftmost value >= min, then test it against max
        var lo = 0
        var hi = sorted.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          GraftScan.cmp(sorted(mid), mn) match {
            case None => return true
            case Some(c) => if (c < 0) lo = mid + 1 else hi = mid
          }
        }
        lo < sorted.length && (GraftScan.cmp(sorted(lo), mx) match {
          case None => true
          case Some(c) => c <= 0
        })
    }
  }

  def mayMatchAllPrepared(prepared: Array[Prepared], stats: FileStats,
      schema: StructType): Boolean =
    prepared.forall(mayMatchPrepared(_, stats, schema))

  // --------------------------------------------------------------- sidecar

  def dir(table: Path): Path = new Path(table, DirName)

  /** One sidecar file per commit, named by the commit's queryId so a
    * replayed roll-forward overwrites its own entry idempotently.
    */
  def write(fs: FileSystem, table: Path, commitId: String,
      entries: Seq[(String, FileStats)]): Unit =
    if (entries.nonEmpty) {
      val out = fs.create(new Path(dir(table), s"zm-$commitId"), true)
      try out.write(entries.map { case (n, s) => s"$n\t${encode(s)}" }
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }

  /** Fold every commit's sidecar into fileName → stats. Torn or malformed
    * lines are dropped (their files simply scan un-pruned); file names are
    * never reused, so later commits cannot shadow earlier ones.
    */
  def load(fs: FileSystem, table: Path): Map[String, FileStats] = {
    val d = dir(table)
    if (!fs.exists(d)) Map.empty
    else {
      val acc = mutable.Map.empty[String, FileStats]
      fs.listStatus(d).map(_.getPath).filter(_.getName.startsWith("zm-")).sortBy(_.getName)
        .foreach { p =>
          val in = fs.open(p)
          val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
          text.split('\n').foreach { line =>
            val cut = line.indexOf('\t')
            if (cut > 0) {
              try acc.put(line.substring(0, cut), decode(line.substring(cut + 1)))
              catch { case _: Exception => () } // torn line: scan un-pruned
            }
          }
        }
      acc.toMap
    }
  }

  /** Planner-grade prune report for a table + pushed conjunction, the same
    * decision [[GraftScan.planInputPartitions]] makes — public so a caller
    * (or an oracle query's engine-verified flag) can pin that skipping
    * actually happened without reaching into the scan.
    * Returns (totalDataFiles, prunedDataFiles).
    */
  def pruneReport(fs: FileSystem, table: Path, filters: Array[Filter],
      schema: StructType): (Int, Int) = {
    val files = GraftParquetWrite.listDataFiles(fs, table)
    val zm = load(fs, table)
    val pruned = files.count(f =>
      zm.get(f.getPath.getName).exists(st => !mayMatchAll(filters, st, schema)))
    (files.length, pruned)
  }
}
