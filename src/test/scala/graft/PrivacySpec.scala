package graft

import graft.operators.Privacy
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  test("magnitude boundaries are IEEE-exact scalings of one rounded constant") {
    // the cross-engine contract: boundary(m) must be reproducible from
    // arithmetic alone. alpha = 2^-j is exact; base rounds once; each
    // further boundary scales base by an exact power of two
    val b1 = Privacy.magnitudeBoundaries(1, 4)
    val base1 = 2.0 * 0.5 / 1.5
    assert(b1 == Seq(1.0 - base1, 1.0 - base1 * 0.5, 1.0 - base1 * 0.25,
      1.0 - base1 * 0.125))
    val b2 = Privacy.magnitudeBoundaries(2, 3)
    val base2 = 2.0 * 0.25 / 1.25
    assert(b2 == Seq(1.0 - base2, 1.0 - base2 * 0.25, 1.0 - base2 * 0.0625))
    // boundaries are strictly increasing toward 1 (the CDF is proper)
    assert(b1.zip(b1.tail).forall { case (a, b) => a < b } && b1.forall(_ < 1.0))
  }

  test("geometric noise matches the two-sided geometric law on a dense uniform grid") {
    // drive the inverse CDF with u = (i + 0.5)/2^16 — an exact grid whose
    // empirical masses converge to the law at 2^-16 resolution.
    // P(Z=0) = (1-a)/(1+a); successive magnitudes decay by exactly a
    val grid = 1 << 16
    for (j <- Seq(1, 2)) {
      val alpha = math.pow(0.5, j)
      val freq = spark.range(grid)
        .select(Privacy.geometricNoise(
          ($"id".cast("double") + lit(0.5)) / lit(grid.toDouble), j).as("z"))
        .groupBy($"z").count().as[(Long, Long)].collect().toMap
      def p(z: Long) = freq.getOrElse(z, 0L).toDouble / grid
      val p0 = (1 - alpha) / (1 + alpha)
      assert(math.abs(p(0L) - p0) < 2e-4, s"j=$j P(0)=${p(0L)} want $p0")
      for (m <- 1L to 4L) {
        // symmetry and the alpha decay, both within grid resolution
        assert(math.abs(p(m) - p(-m)) < 2e-4, s"j=$j asymmetric at $m")
        val want = p0 * math.pow(alpha, m.toDouble)
        assert(math.abs(p(m) - want) < 2e-4, s"j=$j P($m)=${p(m)} want $want")
      }
    }
  }

  test("noise is a pure keyed function: replayable, data-blind, sensitivity-1 exposed") {
    // two censuses over NEIGHBORING datasets (one extra row in class 7):
    // every class's noise is identical — the releases differ by exactly 1
    // on the touched class and nowhere else. That is the sensitivity-1
    // calibration: the mechanism never reads the data, so a row's whole
    // influence on the release is the ±1 it contributes to its own count
    val base = (0L until 400L).map(i => (i % 20, i))
    val d1 = base.toDF("cls", "x")
    val d2 = (base :+ ((7L, 9999L))).toDF("cls", "x")
    def release(df: org.apache.spark.sql.DataFrame) =
      Privacy.dpCensus(df, Seq("cls"), col("cls"), salt = 42L)
        .as[(Long, Long)].collect().toMap
    val (r1, r2) = (release(d1), release(d2))
    assert(r1.keySet == r2.keySet)
    r1.foreach { case (c, n) =>
      assert(r2(c) - n == (if (c == 7L) 1L else 0L), s"class $c leaked data into noise")
    }
    // replayable: the identical release on a rerun
    assert(release(d1) == r1)
    // and the noise is genuinely there: some class deviates from its true
    // count (all-zero noise would mean the seeding collapsed)
    val truth = d1.groupBy("cls").count().as[(Long, Long)].collect().toMap
    assert(r1.exists { case (c, n) => n != truth(c) }, "no class drew nonzero noise")
    // a different salt redraws (not a function of class id alone)
    val r3 = Privacy.dpCensus(d1, Seq("cls"), col("cls"), salt = 43L)
      .as[(Long, Long)].collect().toMap
    assert(r3 != r1, "salt must key the draw")
  }

  test("domain-based release keeps the row set data-independent and noises empty classes") {
    val domain = (0L until 25L).toDF("cls") // classes 20..24 never observed
    val d1 = (0L until 400L).map(i => (i % 20, i)).toDF("cls", "x")
    def release(df: org.apache.spark.sql.DataFrame) =
      Privacy.dpCensus(df, Seq("cls"), col("cls"), salt = 42L, domain = Some(domain))
        .as[(Long, Long)].collect().toMap
    val r1 = release(d1)
    assert(r1.keySet == (0L until 25L).toSet,
      "the released classes are exactly the domain — empty ones included")
    // the presence leak the domain closes: remove EVERY row of class 19
    // (the unique-individual scenario) — the row set must not change, and
    // the released count moves by exactly the (noised-identically) delta
    val r2 = release(d1.filter($"cls" =!= 19L))
    assert(r2.keySet == r1.keySet, "membership must not show in the row set")
    assert(r1(19L) - r2(19L) == 20L,
      "same class, same noise draw: the release difference is the count delta")
    (r1 - 19L).foreach { case (c, n) => assert(r2(c) == n, s"class $c moved") }
    // an empty class releases geometric noise around zero — negative
    // counts are a legitimate DP release value, never clamped server-side
    assert((20L until 25L).exists(c => r1(c) != 0L), "empty classes must be noised")
  }

  test("dpSum: one row moves the bucketed release by at most one noise step") {
    // neighboring datasets: one extra row with a HUGE value — the clip
    // caps its sum influence at M = floor(clipHi/unit) = 50 units, and
    // the M-sized sum bucketing turns that into EXACTLY one step of the
    // sensitivity-1 noise scale (that is the eps = j*ln2 accounting; the
    // noise itself, keyed by class alone, must not move)
    val base = (0L until 200L).map(i => (i % 10, (i % 97).toDouble * 3.0))
    val d1 = base.toDF("cls", "v")
    val d2 = (base :+ ((4L, 1e12))).toDF("cls", "v")
    def release(df: org.apache.spark.sql.DataFrame) =
      Privacy.dpSum(df, Seq("cls"), "v", clipHi = 500.0, classIdOf = col("cls"),
        salt = 11L, unit = 10.0).as[(Long, Long)].collect().toMap
    val (r1, r2) = (release(d1), release(d2))
    assert(r1.keySet == r2.keySet)
    r1.foreach { case (c, n) =>
      assert(r2(c) - n == (if (c == 4L) 1L else 0L),
        s"class $c: a max row must move the bucketed release by exactly 1")
    }
    // negative values clip to zero; replayable
    val r3 = release(d1.withColumn("v", -col("v")))
    assert(r3.keySet == r1.keySet)
    assert(release(d1) == r1)
    // the release carries real noise relative to the exact bucketed sums
    val truth = d1.select(col("cls"),
        floor(least(greatest(col("v"), lit(0.0)), lit(500.0)) / lit(10.0))
          .cast("long").as("q"))
      .groupBy("cls").agg(floor(sum("q") / lit(50L)).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(r1.exists { case (c, n) => n != truth(c) }, "no class drew nonzero noise")
  }

  test("dpMedian: exponential-mechanism utility, point-mass certainty, bounded drift") {
    // 1) utility-definition pin on a hand-computed fixture: values 1,2,3
    //    over grid [0,5) bins=5 -> below=[0,0,1,2,3], h=[0,1,1,1,0],
    //    m=|2*below+h-n|=[3,2,0,2,3], weights 2^-m'=[1/8,1/4,1,1/4,1/8],
    //    cum=[.125,.375,1.375,1.625,1.75]; pick = first cum > u*1.75
    val salt = 5L
    val d1 = Seq((0L, 1.0), (0L, 2.0), (0L, 3.0)).toDF("cls", "v")
    val got = Privacy.dpMedian(d1, Seq("cls"), "v", lo = 0.0, hi = 5.0,
      bins = 5, classIdOf = col("cls"), salt = salt)
      .as[(Long, Long, Double)].collect().head
    val u = (((0L % 2147483648L + salt) % 2147483648L) * 2654435761L %
      4294967296L).toDouble / 4294967296.0
    val cum = Seq(0.125, 0.375, 1.375, 1.625, 1.75)
    val wantBin = cum.indexWhere(_ > u * 1.75).toLong
    assert(got == ((0L, wantBin, wantBin + 0.5)), s"got $got want bin $wantBin")
    // 2) a point-mass class releases ITS bin with certainty: every other
    //    bin's weight is 2^-(2*2000) = exact zero (underflow), any salt
    for (s <- Seq(1L, 99L, 12345L)) {
      val pm = (0L until 2000L).map(i => (1L, 7.3)).toDF("cls", "v")
      val r = Privacy.dpMedian(pm, Seq("cls"), "v", 0.0, 10.0, 10,
        col("cls"), salt = s).as[(Long, Long, Double)].collect().head
      assert(r._2 == 7L, s"salt $s: point mass must release its own bin, got $r")
    }
    // 3) bounded drift on a uniform class: 100 values per bin over bins
    //    0..29 (n=3000) -> the two rank-straddling bins carry all the
    //    mass (neighbors are 2^-200 down); any salt lands in {14, 15}
    val uni = (0L until 3000L).map(i => (2L, (i % 30).toDouble + 0.5))
      .toDF("cls", "v")
    for (s <- Seq(1L, 99L, 12345L)) {
      val r = Privacy.dpMedian(uni, Seq("cls"), "v", 0.0, 30.0, 30,
        col("cls"), salt = s).as[(Long, Long, Double)].collect().head
      assert(r._2 == 14L || r._2 == 15L, s"salt $s: drifted to bin ${r._2}")
    }
    // 4) replayable, classes-sized, domain rows for unobserved classes
    val again = Privacy.dpMedian(d1, Seq("cls"), "v", 0.0, 5.0, 5, col("cls"), salt)
      .as[(Long, Long, Double)].collect().head
    assert(again == got)
    val dom = Privacy.dpMedian(d1, Seq("cls"), "v", 0.0, 5.0, 5, col("cls"), salt,
      domain = Some(Seq(0L, 9L).toDF("cls"))).as[(Long, Long, Double)].collect()
    assert(dom.length == 2 && dom.forall(r => r._2 >= 0L && r._2 < 5L),
      "an unobserved domain class must release a (uniform) draw, not vanish")
  }

  test("dpCensus releases only noisy counts, classes-sized, with grouped-column classId") {
    val df = (0L until 300L).map(i => (i % 3, s"seg${i % 2}", i)).toDF("k", "seg", "x")
    val out = Privacy.dpCensus(df, Seq("k", "seg"),
      col("k") * lit(10L) + substring(col("seg"), 4, 1).cast("long"), salt = 7L)
    assert(out.columns.toSeq == Seq("k", "seg", "noisy_count"))
    assert(out.count() == 6L)
  }

  test("a NULL classId fails the release instead of silently zeroing the noise") {
    // a NULL quasi value survives the groupBy as its own class and
    // propagates NULL through the classId arithmetic; a NULL uniform would
    // evaluate every inverse-CDF indicator to its otherwise-branch —
    // noise 0, the EXACT count released. The hardened release throws
    val withNull = Seq(Some(1L), Some(1L), Some(2L), None)
      .zipWithIndex.map { case (c, i) => (c, i.toLong) }.toDF("cls", "x")
    val eCensus = intercept[Exception] {
      Privacy.dpCensus(withNull, Seq("cls"), col("cls"), salt = 3L).collect()
    }
    assert(eCensus.getMessage.contains("NULL"), eCensus.getMessage)
    val eSum = intercept[Exception] {
      Privacy.dpSum(withNull, Seq("cls"), "x", clipHi = 10.0,
        classIdOf = col("cls"), salt = 3L).collect()
    }
    assert(eSum.getMessage.contains("NULL"), eSum.getMessage)
    // dpMedian previously DROPPED the NULL class (the NULL uniform fails
    // the sampling filter for every bin) — equally silent, now equally fatal
    val eMed = intercept[Exception] {
      Privacy.dpMedian(withNull.withColumn("v", col("x").cast("double")),
        Seq("cls"), "v", 0.0, 10.0, 5, col("cls"), salt = 3L).collect()
    }
    assert(eMed.getMessage.contains("NULL"), eMed.getMessage)
  }

  test("a non-injective classIdOf fails the release instead of sharing draws") {
    // two classes mapping to one id would share a noise draw, voiding the
    // parallel-composition argument — and it is an easy bug (this fixture
    // is the spec's own former classId: length('seg0') == length('seg1'))
    val df = (0L until 60L).map(i => (i % 3, s"seg${i % 2}", i)).toDF("k", "seg", "x")
    val collide = col("k") * lit(10L) + length(col("seg"))
    val e = intercept[Exception] {
      Privacy.dpCensus(df, Seq("k", "seg"), collide, salt = 7L).collect()
    }
    assert(e.getMessage.contains("injective"), e.getMessage)
    val eq = intercept[Exception] {
      Privacy.dpQuantile(df.withColumn("v", col("x").cast("double")),
        Seq("k", "seg"), "v", 1, 2, 0.0, 60.0, 6, collide, salt = 7L).collect()
    }
    assert(eq.getMessage.contains("injective"), eq.getMessage)
    // the injective form of the same shape passes
    val ok = Privacy.dpCensus(df, Seq("k", "seg"),
      col("k") * lit(10L) + substring(col("seg"), 4, 1).cast("long"), salt = 7L)
    assert(ok.count() == 6L)
  }

  test("dpQuantile: median at q=1/2, point-mass certainty, rank targeting, lowest terms") {
    // q = 1/2 is BITWISE the median: same integer utilities (2*below+h-n),
    // same weights, same draw
    val d1 = Seq((0L, 1.0), (0L, 2.0), (0L, 3.0)).toDF("cls", "v")
    val med = Privacy.dpMedian(d1, Seq("cls"), "v", 0.0, 5.0, 5, col("cls"), 5L)
      .as[(Long, Long, Double)].collect().head
    val q12 = Privacy.dpQuantile(d1, Seq("cls"), "v", 1, 2, 0.0, 5.0, 5,
      col("cls"), 5L).as[(Long, Long, Double)].collect().head
    assert(q12 == med)
    // a point-mass class releases ITS bin with certainty at ANY q: the
    // containing bin's utility is |a*n - a*n| = 0, every other bin is
    // >= a*n or (b-a)*n rank-error levels down (underflow-exact zero)
    val pm = (0L until 2000L).map(_ => (1L, 7.3)).toDF("cls", "v")
    for ((a, b) <- Seq((1, 4), (9, 10), (1, 2)); s <- Seq(1L, 99L)) {
      val r = Privacy.dpQuantile(pm, Seq("cls"), "v", a, b, 0.0, 10.0, 10,
        col("cls"), salt = s).as[(Long, Long, Double)].collect().head
      assert(r._2 == 7L, s"q=$a/$b salt $s: point mass must release its own bin, got $r")
    }
    // rank targeting on a uniform class: 100 values per bin over bins
    // 0..29 (n=3000), q=9/10 -> target rank 2700; bin 26 scores
    // |10*2600+9*100-9*3000| = 100, every other bin >= 900 -> 2^-800 down,
    // so any salt releases bin 26 (the p90 bin, as it should)
    val uni = (0L until 3000L).map(i => (2L, (i % 30).toDouble + 0.5))
      .toDF("cls", "v")
    for (s <- Seq(1L, 99L, 12345L)) {
      val r = Privacy.dpQuantile(uni, Seq("cls"), "v", 9, 10, 0.0, 30.0, 30,
        col("cls"), salt = s).as[(Long, Long, Double)].collect().head
      assert(r._2 == 26L, s"salt $s: p90 drifted to bin ${r._2}")
    }
    // non-reduced q is a silent epsilon scaling -> rejected, not reduced
    val e = intercept[IllegalArgumentException] {
      Privacy.dpQuantile(d1, Seq("cls"), "v", 2, 4, 0.0, 5.0, 5, col("cls"), 5L)
    }
    assert(e.getMessage.contains("lowest terms"))
  }

  test("dpQuantile: one row moves every bin's utility by at most max(a, b-a)") {
    // the sensitivity pin, stated on the utility itself: recompute the
    // integer m-vector for neighboring datasets (one row added in a middle
    // bin) and check |delta m| <= max(a, b-a) for EVERY bin — the premise
    // the 2*Delta*j*ln2 epsilon accounting rests on
    def mVector(rows: Seq[Double], a: Int, b: Int): Seq[Long] = {
      val bins = 10
      val h = (0 until bins).map(i => rows.count(v => v.toInt == i).toLong)
      val below = h.scanLeft(0L)(_ + _).init
      val n = rows.size.toLong
      (0 until bins).map(i => math.abs(b * below(i) + a * h(i) - a * n))
    }
    val base = (0 until 200).map(i => (i % 10).toDouble + 0.5)
    for ((a, b) <- Seq((1, 2), (9, 10), (1, 4), (3, 5))) {
      val m1 = mVector(base, a, b)
      val m2 = mVector(base :+ 4.5, a, b)
      val deltas = m1.zip(m2).map { case (x, y) => math.abs(x - y) }
      assert(deltas.max <= math.max(a, b - a).toLong,
        s"q=$a/$b: utility moved by ${deltas.max} > Delta=${math.max(a, b - a)}")
    }
  }
}
