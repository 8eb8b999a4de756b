package graft

import graft.pipeline.Pipeline
import graft.sinks.Sinks
import graft.sources.Sources
import graft.types._
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PipelineSinksSpec extends SparkTestBase {
  import spark.implicits._

  test("missing source: failOnMissing=false skips (checkpoint untouched), true raises") {
    var checkpointed = false
    val p = Pipeline(
      Sources.ParquetSource("/tmp/does/not/exist.parquet"),
      failOnMissing = false,
      checkpoint = Some(() => { checkpointed = true }))
    assert(p.run(spark).isEmpty)
    assert(!checkpointed, "checkpoint must not advance when the source is missing")
    intercept[java.io.FileNotFoundException] {
      p.copy(failOnMissing = true).run(spark)
    }
  }

  test("a sink-less pipeline still executes the plan before checkpointing") {
    val order = scala.collection.mutable.ArrayBuffer[String]()
    // the failure must live in a FILTER: an unused error column would be
    // pruned away by the count() materialization
    val boom = Pipeline(
      Sources.ParquetSource(s"$sfDir/orders.parquet"),
      transforms = Seq(df => df.filter(assert_true(col("o_totalprice") < 0).isNull)),
      checkpoint = Some(() => order += "checkpoint"))
    intercept[Exception] { boom.run(spark) }
    assert(order.isEmpty, "a failing transform must keep the checkpoint untouched even with no sink")
  }

  test("pipeline runs transforms lazily as one plan and checkpoints after the sink") {
    val order = scala.collection.mutable.ArrayBuffer[String]()
    val p = Pipeline(
      Sources.ParquetSource(s"$sfDir/orders.parquet"),
      transforms = Seq(_.filter(col("o_orderstatus") === "F")),
      sink = Some(df => { df.count(); order += "sink" }),
      checkpoint = Some(() => order += "checkpoint"))
    assert(p.run(spark).isDefined)
    assert(order.toSeq == Seq("sink", "checkpoint"))
  }

  test("upsert DO UPDATE keeps incoming row on conflict; DO NOTHING keeps existing") {
    val existing = Seq((1L, "old"), (2L, "old")).toDF("k", "v")
    val incoming = Seq((2L, "new"), (3L, "new")).toDF("k", "v")
    val updated = Sinks.upsert(existing, incoming, Seq("k"), ConflictUpdate)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(updated == Seq((1L, "old"), (2L, "new"), (3L, "new")))
    val nothing = Sinks.upsert(existing, incoming, Seq("k"), ConflictNothing)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(nothing == Seq((1L, "old"), (2L, "old"), (3L, "new")))
  }

  test("NDJSON sink writes one object per line and round-trips exactly (C3 write half)") {
    val dir = Files.createTempDirectory("graft-json").toString
    val df = Seq((1L, "a", 1.25), (2L, null.asInstanceOf[String], -0.5), (3L, "c\nd", 0.1))
      .toDF("id", "payload", "score")
    Sinks.writeJson(df, s"$dir/out")
    // raw shape: newline-delimited JSON objects (embedded \n is escaped)
    val lines = Files.list(java.nio.file.Paths.get(s"$dir/out")).toArray.map(_.toString)
      .filter(_.endsWith(".json"))
      .flatMap(p => scala.io.Source.fromFile(p).getLines().toSeq)
    assert(lines.length == 3)
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}")))
    // round-trip equality, including the double and the embedded newline
    val back = spark.read.schema("id BIGINT, payload STRING, score DOUBLE").json(s"$dir/out")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(back == Seq((1L, "a", 1.25), (2L, null, -0.5), (3L, "c\nd", 0.1)))
  }

  test("upsert DO UPDATE with explicit orderBy: last-by-order wins on intra-batch conflicts") {
    val existing = Seq((1L, "old", 0L)).toDF("k", "v", "seq")
    // two incoming rows conflict on k=1; seq says which is "last inserted"
    val incoming = Seq((1L, "first", 10L), (1L, "second", 20L), (2L, "new", 5L))
      .toDF("k", "v", "seq")
    val byOrder = Sinks.upsert(existing, incoming, Seq("k"), ConflictUpdate, orderBy = Seq("seq"))
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(byOrder == Seq((1L, "second", 20L), (2L, "new", 5L)),
      "highest seq per key must win under DO UPDATE")
    // the ordering column does not leak into DO NOTHING semantics
    val nothing = Sinks.upsert(existing, incoming, Seq("k"), ConflictNothing, orderBy = Seq("seq"))
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(nothing == Seq((1L, "old", 0L), (2L, "new", 5L)))
  }

  test("TSV sink sanitizes tabs/newlines and writes empty string for NULL (COPY contract)") {
    val dir = Files.createTempDirectory("graft-tsv").toString
    val df = Seq((1L, "a\tb\nc"), (2L, null)).toDF("id", "payload")
    Sinks.writeTsv(df, s"$dir/out")
    val back = spark.read.option("header", "true").option("sep", "\t").csv(s"$dir/out")
    val rows = back.orderBy("id").collect()
    assert(rows(0).getString(1) == "a b c")
    assert(rows(1).isNullAt(1))
  }

  test("versioned sink writes run dir + latest alias with identical content") {
    val dir = Files.createTempDirectory("graft-ver").toString
    val df = Seq((1L, "x")).toDF("id", "v")
    val (runPath, latest) = Sinks.writeVersioned(df, dir, "run-001")
    assert(spark.read.parquet(runPath).count() == 1)
    assert(spark.read.parquet(latest).count() == 1)
  }

  test("checkpoint write stamps a run-scoped current_time row") {
    val dir = Files.createTempDirectory("graft-ckpt").toString + "/meta"
    Sinks.writeCheckpoint(spark, dir, Map("start_time" -> "2024-01-01 00:00:00", "rows" -> "42"))
    val row = spark.read.parquet(dir).head()
    val cols = spark.read.parquet(dir).columns.toSet
    assert(cols == Set("current_time", "rows", "start_time"))
    assert(row.getAs[String]("rows") == "42")
    assert(row.getAs[String]("current_time").matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""))
  }

  test("CSV source applies rename + lenient type maps (BOM-tolerant read)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "﻿User Name,Install Time,Count\nalice,2024-01-02 03:04:05,7\nbob,not-a-time,oops\n")
    val src = Sources.CsvSource(s"$dir/in.csv",
      renames = Map("User Name" -> "user_name", "Install Time" -> "install_time", "Count" -> "cnt"),
      types = Seq(TypeSpec("install_time", "timestamp"), TypeSpec("cnt", "int")))
    val out = Sources.open(spark, src, failOnMissing = true).get.orderBy("user_name").collect()
    assert(out(0).getAs[java.sql.Timestamp]("install_time") != null)
    assert(out(0).getAs[Int]("cnt") == 7)
    assert(out(1).isNullAt(out(1).fieldIndex("install_time")), "lenient coerce -> null")
    assert(out(1).isNullAt(out(1).fieldIndex("cnt")))
  }

  test("events source truncates nanos to µs exactly (integer division)") {
    val ev = Sources.events(spark, sfDir)
    val r = ev.select($"ts_ns", unix_micros($"ts").as("us")).head()
    assert(r.getLong(0) / 1000L == r.getLong(1))
  }

  test("jdbc upsert SQL quotes and escapes config-sourced identifiers") {
    val sql = Sinks.upsertSql(
      table = """sch"ema.orders; DROP TABLE x""",
      cols = Seq("id", """we"ird"""),
      conflictColumns = Seq("id"),
      action = ConflictUpdate)
    // embedded quotes doubled, whole parts wrapped — the ; and " are inert
    assert(sql.contains("""INSERT INTO "sch""ema"."orders; DROP TABLE x" ("id", "we""ird")"""))
    assert(sql.contains("""ON CONFLICT ("id") DO UPDATE SET "we""ird" = EXCLUDED."we""ird""""))
    val nothing = Sinks.upsertSql("t", Seq("id", "v"), Seq("id"), ConflictNothing)
    assert(nothing.contains("""ON CONFLICT ("id") DO NOTHING"""))
    // all-key columns degrade DO UPDATE to DO NOTHING (nothing to set)
    assert(Sinks.upsertSql("t", Seq("id"), Seq("id"), ConflictUpdate).contains("DO NOTHING"))
  }

  test("jdbc_upsert registry entry rejects a non-numeric batchSize at config time") {
    val df = Seq((1, "a")).toDF("id", "v")
    val e = intercept[graft.GraftConfigError] {
      graft.pipeline.PipelineConfig.sink("jdbc_upsert")(df, Map(
        "url" -> "jdbc:postgresql://localhost/x", "table" -> "t",
        "keys" -> "id", "batchSize" -> "lots"))
    }
    assert(e.getMessage.contains("batchSize"))
  }

  // ---- live JDBC coverage against embedded Derby (the in-env database;
  // Postgres's native ON CONFLICT statement stays string-pinned above, the
  // portable UpdateInsertDialect pair runs the same executor-side batching
  // path end-to-end) ----

  private def derby(db: String): String = s"jdbc:derby:memory:$db;create=true"

  private def derbyQuery(db: String, sql: String): Seq[Seq[Any]] = {
    val conn = java.sql.DriverManager.getConnection(derby(db))
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val n = rs.getMetaData.getColumnCount
      val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      while (rs.next()) buf += (1 to n).map(rs.getObject)
      buf.toSeq
    } finally conn.close()
  }

  private def derbyExec(db: String, sql: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(derby(db))
    try { conn.createStatement().executeUpdate(sql); () } finally conn.close()
  }

  test("jdbcWrite appends through executor connections into a live database") {
    val db = "graft_k1"
    // Derby folds unquoted DDL identifiers upper-case; Spark's JDBC writer
    // quotes COLUMN names (so they must be created quoted-lowercase to match
    // the frame) but passes the TABLE name through unquoted
    derbyExec(db, """CREATE TABLE loads ("id" BIGINT, "v" VARCHAR(20))""")
    val df = spark.range(10).select($"id", concat(lit("v"), $"id").as("v")).repartition(4)
    Sinks.jdbcWrite(df, derby(db), "loads")
    Sinks.jdbcWrite(df.filter($"id" < 2), derby(db), "loads") // append, not replace
    val got = derbyQuery(db, """SELECT "id", "v" FROM loads ORDER BY "id", "v"""")
    assert(got.size == 12)
    assert(got.count(_.head == 0L) == 2, "second write must append")
  }

  test("text corpus round-trips one file per doc and rejects newline bodies typed") {
    import graft.sinks.Sinks
    import graft.sources.Sources
    val dir = java.nio.file.Files.createTempDirectory("graft-textc").toString + "/corpus"
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon"))
      .toDF("doc_id", "text")
    Sinks.writeTextCorpus(docs, dir, "doc_id", "text")
    val back = Sources.textCorpus(spark, dir, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(back == Set((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon")))
    // one data file per document (repartition on the id)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val perDoc = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.startsWith("doc_id="))
      .map(d => fs.listStatus(d.getPath).count(st =>
        st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith(".")))
    assert(perDoc.toSeq == Seq(1, 1, 1))
    // a line-break body fails the write with the offending id, never
    // splits — including a LONE CARRIAGE RETURN, which Hadoop's line
    // reader also treats as a row boundary
    Seq("two\nlines" -> "LF", "two\rlines" -> "CR").foreach { case (body, label) =>
      val ex = intercept[Exception] {
        Sinks.writeTextCorpus(Seq((9L, body)).toDF("doc_id", "text"),
          dir + label, "doc_id", "text")
      }
      val msg = Option(ex.getMessage).getOrElse("") +
        Option(ex.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("line break") && msg.contains("9"), s"$label: $ex")
    }
    // NULL text is rejected typed (the text format has no NULL — it would
    // silently round-trip as "")
    val exN = intercept[Exception] {
      Sinks.writeTextCorpus(Seq((8L, null.asInstanceOf[String])).toDF("doc_id", "text"),
        dir + "N", "doc_id", "text")
    }
    val msgN = Option(exN.getMessage).getOrElse("") +
      Option(exN.getCause).map(_.getMessage).getOrElse("")
    assert(msgN.contains("NULL") && msgN.contains("8"), s"null: $exN")
    // string ids round-trip with their discovered type intact (no forced cast)
    val sdir = java.nio.file.Files.createTempDirectory("graft-textcs").toString + "/corpus"
    Sinks.writeTextCorpus(Seq(("abc", "hello"), ("xyz", "world")).toDF("k", "text"),
      sdir, "k", "text")
    assert(Sources.textCorpus(spark, sdir, "k", "text")
      .as[(String, String)].collect().toSet == Set(("abc", "hello"), ("xyz", "world")))
  }

  test("sharded text corpus bounds directories at nShards and round-trips hostile ids") {
    import graft.sinks.{Sinks, TextCorpusLayout}
    import graft.sources.Sources
    val dir = java.nio.file.Files.createTempDirectory("graft-textsh").toString + "/corpus"
    // ids that exercise every branch of the file-name scheme: plain
    // numerics/slugs (verbatim), spaces / slashes / unicode / '%' / '='
    // / a leading dot / the empty string (hex-marker escaping) — '%'
    // matters because Hadoop Path URI-normalizes it, the reason the
    // escaping is NOT percent-encoding. "Doc1"/"doc1" is the
    // case-collision pair: uppercase hex-encodes, so the two ids keep
    // distinct file names even after a copy to a case-INSENSITIVE
    // filesystem (macOS/Windows inspection copies)
    val hostile = Seq("7", "doc-a_b.9", "has space", "a/b\\c", "naïve→é",
      "100%", "k=v", ".hidden", "", "=already", "Doc1", "doc1")
    val docs = hostile.zipWithIndex
      .map { case (id, i) => (id, s"body number $i") }.toDF("k", "text")
    Sinks.writeTextCorpus(docs, dir, "k", "text", nShards = 4)
    // byte-identical round-trip, ids included
    val back = Sources.textCorpus(spark, dir, "k", "text")
      .as[(String, String)].collect().toSet
    assert(back == hostile.zipWithIndex
      .map { case (id, i) => (id, s"body number $i") }.toSet)
    // directory count is bounded by nShards (the whole point: no
    // per-document directories), every data file is a doc's .txt
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val top = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(st => !st.getPath.getName.startsWith("_"))
    assert(top.forall(st => st.isDirectory && st.getPath.getName.startsWith("shard=")))
    assert(top.length <= 4, s"got ${top.length} top-level dirs for 10 docs")
    val files = top.flatMap(d => fs.listStatus(d.getPath)).map(_.getPath.getName)
    assert(files.length == hostile.size && files.forall(_.endsWith(".txt")))
    // safe ids stay human-readable in the listing; hostile ones are marked
    assert(files.contains("7.txt") && files.contains("doc-a_b.9.txt"))
    assert(files.count(_.startsWith("=")) ==
      hostile.count(id => TextCorpusLayout.fileName(id).startsWith("=")))
    // the case pair maps to names distinct even after lowercasing — the
    // injectivity that survives a case-insensitive filesystem
    assert(files.map(_.toLowerCase).distinct.length == files.length,
      s"case-folded collision among $files")
    // deterministic names: a replay overwrites in place, never duplicates
    Sinks.writeTextCorpus(docs, dir, "k", "text", nShards = 4)
    assert(Sources.textCorpus(spark, dir, "k", "text").count() == hostile.size.toLong)
    // the shard assignment is the documented function of the id — a reader
    // can locate one document's file without listing the corpus
    val shardOf = docs.select($"k",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64($"k"),
        org.apache.spark.sql.functions.lit(4L)).as("s"))
      .as[(String, Long)].collect().toMap
    hostile.foreach { id =>
      val p = new org.apache.hadoop.fs.Path(
        dir, s"shard=${shardOf(id)}/${TextCorpusLayout.fileName(id)}")
      assert(fs.exists(p), s"doc '$id' not at its computed shard path $p")
    }
  }

  test("sharded text corpus write is transactional and rejects NULL/duplicate ids typed") {
    import graft.sinks.Sinks
    import graft.sources.Sources
    val dir = java.nio.file.Files.createTempDirectory("graft-texttx").toString + "/corpus"
    val good = Seq(("a", "first"), ("b", "second")).toDF("k", "text")
    Sinks.writeTextCorpus(good, dir, "k", "text", nShards = 4)
    // a FAILED overwrite (line-break body) must leave the previous corpus
    // fully readable — the staging swap publishes nothing on failure
    intercept[Exception] {
      Sinks.writeTextCorpus(Seq(("a", "ok"), ("c", "bad\nbody")).toDF("k", "text"),
        dir, "k", "text", nShards = 4)
    }
    assert(Sources.textCorpus(spark, dir, "k", "text")
      .as[(String, String)].collect().toSet == Set(("a", "first"), ("b", "second")),
      "failed write must not disturb the published corpus")
    // completeness marker for external tools (hidden from Spark readers)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS")))
    // a NULL id has no file name — typed rejection, corpus untouched
    val exNull = intercept[Exception] {
      Sinks.writeTextCorpus(Seq((null.asInstanceOf[String], "x")).toDF("k", "text"),
        dir, "k", "text", nShards = 4)
    }
    assert((Option(exNull.getMessage).getOrElse("") +
      Option(exNull.getCause).map(_.getMessage).getOrElse("")).contains("NULL id"))
    // duplicate ids would silently clobber one file — typed rejection
    val exDup = intercept[Exception] {
      Sinks.writeTextCorpus(Seq(("d", "one"), ("d", "two")).toDF("k", "text"),
        dir, "k", "text", nShards = 4)
    }
    assert((Option(exDup.getMessage).getOrElse("") +
      Option(exDup.getCause).map(_.getMessage).getOrElse("")).contains("duplicate document id"))
    assert(Sources.textCorpus(spark, dir, "k", "text").count() == 2,
      "both rejected writes must leave the published corpus intact")
    // an EMPTY write publishes an empty, readable corpus (not a missing dir)
    Sinks.writeTextCorpus(good.limit(0), dir, "k", "text", nShards = 4)
    val empty = Sources.textCorpus(spark, dir, "k", "text")
    assert(empty.columns.toSeq == Seq("k", "text") && empty.count() == 0)
    // ...but the typed-empty answer is gated on the _SUCCESS marker: a
    // mere existing directory that is NOT a published corpus fails loud
    val bogus = java.nio.file.Files.createTempDirectory("graft-bogus").toString
    intercept[Exception] {
      Sources.textCorpus(spark, bogus, "k", "text").collect()
    }
    // no publish-protocol leftovers beside the corpus after a clean write
    val parent = new org.apache.hadoop.fs.Path(dir).getParent
    val leftovers = fs.listStatus(parent).map(_.getPath.getName)
      .filter(n => n.contains("__staging__") || n.contains("__old__"))
    assert(leftovers.isEmpty, s"publish left $leftovers")
  }

  test("sharded text corpus purge unlinks exactly the tombstoned files, metadata-only") {
    import graft.sinks.{Sinks, TextCorpusLayout}
    import graft.sources.Sources
    val dir = java.nio.file.Files.createTempDirectory("graft-textpurge").toString + "/corpus"
    val ids = Seq("a", "b", "Doc1", "has space", "keep.me", "7")
    val docs = ids.map(id => (id, s"body of $id")).toDF("k", "text")
    Sinks.writeTextCorpus(docs, dir, "k", "text", nShards = 4)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileStats(): Map[String, (Long, Long)] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("shard="))
        .flatMap(d => fs.listStatus(d.getPath))
        .map(st => st.getPath.toString -> (st.getLen, st.getModificationTime)).toMap
    val before = fileStats()
    // tombstone a safe id, a hex-encoded one, and an absent one
    val removed = Sinks.purgeTextCorpus(spark, dir,
      Seq("b", "has space", "ghost").toDF("k"), "k", nShards = 4)
    assert(removed == 2L, s"two of the three tombstones exist: $removed")
    assert(Sources.textCorpus(spark, dir, "k", "text")
      .as[(String, String)].collect().map(_._1).toSet ==
      Set("a", "Doc1", "keep.me", "7"))
    // metadata-only: every surviving file is untouched (same length, mtime)
    val gone = Set("b", "has space").map(TextCorpusLayout.fileName)
    assert(fileStats() == before.filterNot { case (p, _) =>
      gone.exists(p.endsWith) })
    // idempotent replay: nothing left to remove
    assert(Sinks.purgeTextCorpus(spark, dir,
      Seq("b", "ghost").toDF("k"), "k", nShards = 4) == 0L)
  }

  test("corpus publish crash windows roll FORWARD or BACK, never orphan the only copy") {
    import graft.sinks.Sinks
    import graft.sources.Sources
    val base = java.nio.file.Files.createTempDirectory("graft-textcrash").toString
    val dir = base + "/corpus"
    val root = new org.apache.hadoop.fs.Path(dir)
    val staging = new org.apache.hadoop.fs.Path(base, "corpus.__staging__")
    val retired = new org.apache.hadoop.fs.Path(base, "corpus.__old__")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bad = Seq(("x", "bad\nbody")).toDF("k", "text") // always fails pre-swap
    def readBack(): Set[(String, String)] =
      Sources.textCorpus(spark, dir, "k", "text").as[(String, String)].collect().toSet

    // CRASH BETWEEN THE TWO PUBLISH RENAMES, staging complete: root is
    // missing; the set-aside v1 and the finished v2 (with _SUCCESS) are
    // the only copies anywhere. The next run must roll the swap FORWARD —
    // deleting "stale leftovers" here would destroy all data. (v2 is
    // written to a scratch path and renamed into the staging name so the
    // crash state is built without tripping the writer's own recovery.)
    Sinks.writeTextCorpus(Seq(("a", "v1")).toDF("k", "text"), dir, "k", "text", nShards = 2)
    Sinks.writeTextCorpus(Seq(("a", "v2"), ("b", "v2")).toDF("k", "text"),
      base + "/v2", "k", "text", nShards = 2)
    assert(fs.rename(new org.apache.hadoop.fs.Path(base, "v2"), staging))
    assert(fs.rename(root, retired))
    intercept[Exception] { // this run fails pre-swap — only recovery acts
      Sinks.writeTextCorpus(bad, dir, "k", "text", nShards = 2)
    }
    assert(readBack() == Set("a" -> "v2", "b" -> "v2"),
      "complete staging must roll forward, not be deleted")
    assert(!fs.exists(retired), "the superseded v1 is cleaned after recovery")

    // CRASH AFTER THE SET-ASIDE RENAME with an INCOMPLETE staging (no
    // _SUCCESS): the set-aside old corpus is the only complete copy — the
    // next run must roll BACK to it.
    assert(fs.rename(root, retired))
    if (fs.exists(staging)) fs.delete(staging, true) // the failed run's partial tree
    fs.mkdirs(new org.apache.hadoop.fs.Path(staging, "shard=0"))
    intercept[Exception] {
      Sinks.writeTextCorpus(bad, dir, "k", "text", nShards = 2)
    }
    assert(readBack() == Set("a" -> "v2", "b" -> "v2"),
      "incomplete staging must roll back to the set-aside corpus")
    assert(!fs.exists(retired), "the set-aside name is free again after rollback")
  }

  test("jdbcUpsert DO UPDATE round-trips insert+update through a live database") {
    val db = "graft_k2"
    derbyExec(db, """CREATE TABLE "t" ("id" BIGINT PRIMARY KEY, "v" VARCHAR(20), "n" BIGINT)""")
    derbyExec(db, """INSERT INTO "t" VALUES (1, 'old', 10), (2, 'keep', 20)""")
    val batch = Seq((1L, "new", 11L), (3L, "three", 30L)).toDF("id", "v", "n")
      .repartition(3) // several executor connections, some empty
    Sinks.jdbcUpsert(batch, derby(db), "t", Seq("id"), ConflictUpdate,
      dialect = Sinks.UpdateInsertDialect())
    val got = derbyQuery(db, """SELECT "id", "v", "n" FROM "t" ORDER BY "id"""")
    assert(got == Seq(Seq(1L, "new", 11L), Seq(2L, "keep", 20L), Seq(3L, "three", 30L)),
      s"got $got")
  }

  test("jdbcUpsert DO NOTHING keeps existing rows and admits only new keys") {
    val db = "graft_k3"
    derbyExec(db, """CREATE TABLE "t" ("id" BIGINT PRIMARY KEY, "v" VARCHAR(20))""")
    derbyExec(db, """INSERT INTO "t" VALUES (1, 'old')""")
    val batch = Seq((1L, "clobber"), (2L, "two")).toDF("id", "v")
    Sinks.jdbcUpsert(batch, derby(db), "t", Seq("id"), ConflictNothing,
      dialect = Sinks.UpdateInsertDialect())
    val got = derbyQuery(db, """SELECT "id", "v" FROM "t" ORDER BY "id"""")
    assert(got == Seq(Seq(1L, "old"), Seq(2L, "two")), s"got $got")
  }

  test("jdbcUpsert batches flush correctly across the batchSize boundary") {
    val db = "graft_k4"
    derbyExec(db, """CREATE TABLE "t" ("id" BIGINT PRIMARY KEY, "v" VARCHAR(30))""")
    derbyExec(db, """INSERT INTO "t" VALUES (0, 'seed'), (5, 'seed')""")
    // 20 rows through batchSize=7 in one partition: 2 updates + 18 inserts
    // spanning three flushes
    val batch = spark.range(20)
      .select($"id", concat(lit("row"), $"id").as("v")).coalesce(1)
    Sinks.jdbcUpsert(batch, derby(db), "t", Seq("id"), ConflictUpdate,
      batchSize = 7, dialect = Sinks.UpdateInsertDialect())
    val got = derbyQuery(db, """SELECT "id", "v" FROM "t" ORDER BY "id"""")
    assert(got.size == 20)
    assert(got.forall(r => r(1) == s"row${r.head}"), s"got $got")
  }

  test("jdbcUpsert with an upper-cased composite key updates the right row") {
    val db = "graft_k5"
    // Derby folds unquoted DDL identifiers to upper case; the sink quotes
    // every identifier, so the frame's column names must match exactly
    derbyExec(db, """CREATE TABLE "t" ("a" BIGINT, "b" BIGINT, "v" VARCHAR(20), PRIMARY KEY ("a", "b"))""")
    derbyExec(db, """INSERT INTO "t" VALUES (1, 1, 'keep'), (1, 2, 'old')""")
    val batch = Seq((1L, 2L, "new"), (2L, 1L, "ins")).toDF("a", "b", "v")
    Sinks.jdbcUpsert(batch, derby(db), "t", Seq("a", "b"), ConflictUpdate,
      dialect = Sinks.UpdateInsertDialect())
    val got = derbyQuery(db, """SELECT "a", "b", "v" FROM "t" ORDER BY "a", "b"""")
    assert(got == Seq(Seq(1L, 1L, "keep"), Seq(1L, 2L, "new"), Seq(2L, 1L, "ins")), s"got $got")
  }
}
