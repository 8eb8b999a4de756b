package graft

import graft.functions.{StringKernels, StringNormalize}
import org.apache.spark.sql.functions._

/** Unicode fold (NFC + strip marks + lowercase). Goldens are DuckDB's
  * `lower(strip_accents(nfc_normalize(x)))` outputs, captured verbatim —
  * the fold must agree with the oracle formulation on non-ASCII input even
  * though the synthetic corpus is pure ASCII (where both trivially agree).
  */
class StringNormalizeSpec extends SparkTestBase {

  // (input, duckdb output). Notable cases: Ð/ß/ǅ/Ĳ/Ł survive (no combining
  // mark), й loses its breve, ligatures ﬁ/ﬂ survive (NFC, not NFKC).
  private val goldens = Seq(
    "Éléphant à Noël" -> "elephant a noel",
    "ÀÇÐÑß" -> "acðnß",
    "naïve façade" -> "naive facade",
    "ĤÊLLO ŴÖRLD" -> "hello world",
    "señor GARÇON" -> "senor garcon",
    "STRASSE ße" -> "strasse ße",
    "été déjà" -> "ete deja",
    "ﬁre ﬂow" -> "ﬁre ﬂow",
    "Ωmega ǅungla" -> "ωmega ǆungla",
    "Ĳsselmeer" -> "ĳsselmeer",
    "crème brûlée" -> "creme brulee",
    "中文 文本" -> "中文 文本",
    "Русский Текст" -> "русскии текст",
    "ŁÓDŹ żółw" -> "łodz zołw"
  )

  test("fold matches DuckDB lower(strip_accents(nfc_normalize(x))) goldens") {
    goldens.foreach { case (in, want) =>
      assert(StringKernels.fold(in) == want, s"input: $in")
    }
  }

  test("decomposed input folds identically to precomposed") {
    val precomposed = "été" // été, NFC
    val decomposed = "été" // e + combining acute
    assert(StringKernels.fold(precomposed) == StringKernels.fold(decomposed))
    assert(StringKernels.fold(decomposed) == "ete")
  }

  test("ASCII fast path agrees with the general path and preserves bytes") {
    val inputs = Seq("Hello, World! 123", "MiXeD CaSe\twith\nctrl", "", "already lower")
    inputs.foreach { in =>
      assert(StringKernels.fold(in) == in.toLowerCase(java.util.Locale.ROOT))
    }
  }

  test("property: fold is idempotent over seeded random unicode strings") {
    // canonicalization must be a projection onto its own image — folding a
    // folded string changes nothing (dedup keys stay stable across passes)
    val rnd = new scala.util.Random(42)
    val pool = goldens.map(_._1).mkString + "abcXYZ 123é́łテ中"
    (1 to 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(24))(pool(rnd.nextInt(pool.length))).mkString
      val once = StringKernels.fold(s)
      assert(StringKernels.fold(once) == once, s"not idempotent for: $s")
    }
  }

  test("expression evaluates in a plan, null-safe, and registered in SQL") {
    import spark.implicits._
    val df = Seq(Some("Éléphant"), None, Some("ABC")).toDF("t")
      .select(StringNormalize.unicodeFold(col("t")).as("f"))
    assert(df.collect().map(_.getAs[String]("f")).toSeq
      == Seq("elephant", null, "abc"))
    graft.plans.GraftExtensions.registerInto(spark)
    assert(spark.sql("SELECT graft_unicode_fold('Crème') AS f").head().getString(0)
      == "creme")
  }

  test("fold stays inside whole-stage codegen (no UDF fallback)") {
    // a local literal relation constant-folds to LocalTableScan, so drive the
    // assertion from a real parquet scan where a codegen stage must exist
    val plan = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(StringNormalize.unicodeFold(col("text")).as("f"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert("""\*\(\d+\) Project \[unicodefold""".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }
}
