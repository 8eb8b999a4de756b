package graft

import graft.operators.{Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

/** Smoke over the full driver contract at sf0.001: every query plans and
  * returns rows; entry is non-empty; multimodal/text ops behave sanely.
  */
class QueriesSmokeSpec extends SparkTestBase {
  import spark.implicits._

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns at least one row at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows: $empty")
  }

  test("every oracle key has a matching query") {
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracle entries without queries: $orphan")
  }

  test("langId picks the dominant marker language and und on no hits") {
    val df = Seq(
      "the cat and the dog sat in the house",
      "el perro y el gato en la casa",
      "zzz qqq xxx").toDF("text")
    val out = df.select(TextAnalysis.langId($"text")).as[String].collect().toSeq
    assert(out == Seq("en", "es", "und"))
  }

  test("fingerprint is whitespace-insensitive but order-sensitive") {
    val df = Seq(
      ("a", "hello   world\n"),
      ("b", "hello world"),
      ("c", "world hello")).toDF("id", "text")
    val fps = df.select($"id", TextAnalysis.fingerprint($"text").as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fps("a") == fps("b"))
    assert(fps("a") != fps("c"))
  }

  test("repetitionStats flags looping text and zeroes out short/empty docs") {
    val df = Seq(
      ("loop", "spam spam spam spam spam spam"),   // 4 trigrams, 1 distinct
      ("clean", "every word here is fully unique"),
      ("short", "two words"),                      // < n tokens -> no ngrams
      ("empty", "")).toDF("id", "text")
    val r = df.select($"id", TextAnalysis.repetitionStats($"text", 3).as("r"))
      .select($"id", $"r.n_ngrams", $"r.n_distinct", $"r.dup_frac")
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r("loop") == ((4L, 1L, 0.75)))
    assert(r("clean")._3 == 0.0 && r("clean")._1 == r("clean")._2)
    assert(r("short") == ((0L, 0L, 0.0)))
    assert(r("empty") == ((0L, 0L, 0.0)))

    // the companion rule: share of the single most frequent trigram
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),      // one trigram owns the doc
      (2L, "all words are different here now"))   // 4 distinct trigrams
      .toDF("doc_id", "text")
    val shares = TextAnalysis.topNgramShare(docs, 3).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(shares(1L) == ((4L, 4L, 1.0)))
    assert(shares(2L) == ((1L, 4L, 0.25)))
  }

  test("contaminationCheck counts distinct-shingle overlap against the eval set") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps high"),     // shares "the quick brown", "quick brown fox"
      (2L, "totally separate words appear here"), // zero overlap
      (3L, "x")).toDF("doc_id", "text")           // sub-n doc: 0 shingles, frac 0
    val eval = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val out = TextAnalysis.contaminationCheck(corpus, eval, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((4L, 2L, 0.5)))
    assert(out(2L) == ((3L, 0L, 0.0)), "zero-overlap docs must survive with 0")
    assert(out(3L) == ((0L, 0L, 0.0)))
  }

  test("multimodal feature extraction is deterministic and entropy-bounded") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == media.count())
    assert(feats.forall(f => f.byte_entropy >= 0.0 && f.byte_entropy <= 8.0))
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.content_hash).toSet == again.map(_.content_hash).toSet)
  }

  test("frame sampling emits framesPerClip rows per video") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val nVideos = media.filter($"modality" === "video").count()
    val frames = Multimodal.sampleFrames(media, 4)
    assert(frames.count() == nVideos * 4)
    assert(frames.groupBy("media_id").count().select(max("count")).head().getLong(0) == 4L)
  }

  test("QUERIES.md documents the whole query surface (and nothing stale)") {
    // the contract doc drifted twice (r5, r7); this pins it to the map.
    // Forked tests run from the build base, so the doc is at the cwd root.
    val doc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("QUERIES.md")), "UTF-8")
    val documented = "`([a-z0-9_]+)`".r.findAllMatchIn(doc).map(_.group(1)).toSet
    val surface = SparkEntry.queries.keySet
    val undocumented = surface -- documented
    assert(undocumented.isEmpty,
      s"queries missing from QUERIES.md: ${undocumented.toSeq.sorted.mkString(", ")}")
    val stale = documented.filter(n => n.contains("_") && !surface.contains(n)) --
      Set("oracle_sql") // non-query backticked terms used in prose
    assert(stale.isEmpty,
      s"QUERIES.md names queries that no longer exist: ${stale.toSeq.sorted.mkString(", ")}")
    val header = "All (\\d+) queries".r.findFirstMatchIn(doc).map(_.group(1).toInt)
    assert(header.contains(surface.size),
      s"QUERIES.md header count ${header.getOrElse(-1)} != surface ${surface.size}")
  }
}
