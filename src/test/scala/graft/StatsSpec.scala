package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{conv, md5, substring, concat, lit, col, when, sum, explode, sequence}

import graft.llm.Stats

class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("auc: perfect separation = 1, midrank ties credited half, degenerate labels null") {
    import spark.implicits._
    val perfect = Seq((0.9, 1L), (0.8, 1L), (0.3, 0L), (0.1, 0L))
      .toDF("quality_score", "label")
    val p = Stats.auc(perfect).collect().head
    assert(p.getAs[Long]("n_pos") == 2L && p.getAs[Long]("n_neg") == 2L)
    assert(math.abs(p.getAs[Double]("auc") - 1.0) < 1e-15)
    // pos {0.8, 0.5} vs neg {0.5, 0.2}: 3 wins + 1 tie (half credit)
    // out of 4 pairs -> 0.875
    val tied = Seq((0.8, 1L), (0.5, 1L), (0.5, 0L), (0.2, 0L))
      .toDF("quality_score", "label")
    assert(math.abs(Stats.auc(tied).collect().head.getAs[Double]("auc")
      - 0.875) < 1e-15)
    val onlyPos = Seq((0.9, 1L), (0.1, 1L)).toDF("quality_score", "label")
    assert(Stats.auc(onlyPos).collect().head
      .isNullAt(3), "no negatives must emit null auc")
  }

  test("property: rank-sum auc equals the brute-force pairwise count") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    def draw[A](g: Gen[A], seed: Long, n: Int): Seq[A] = {
      var s = Seed(seed)
      (0 until n).map { _ =>
        val v = g.pureApply(Gen.Parameters.default, s); s = s.next; v
      }
    }
    // coarse score grid forces plenty of ties
    val gRow = for {
      p <- Gen.choose(0, 10)
      y <- Gen.oneOf(0L, 1L)
    } yield (p / 10.0, y)
    for (trial <- 0 to 2) {
      val rows = draw(gRow, 4200L + trial, 80)
      val got = Stats.auc(rows.toDF("quality_score", "label"))
        .collect().head.getAs[Double]("auc")
      val pos = rows.filter(_._2 == 1L).map(_._1)
      val neg = rows.filter(_._2 == 0L).map(_._1)
      val credit = (for (a <- pos; b <- neg)
        yield if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum
      val expect = credit / (pos.length.toDouble * neg.length)
      assert(math.abs(got - expect) < 1e-12, s"trial $trial: $got vs $expect")
    }
  }

  test("chiSquare: independence = 0, hand 2x2, unobserved cells contribute expected mass") {
    import spark.implicits._
    val indep = (for (a <- Seq(0L, 1L); b <- Seq("x", "y"); _ <- 1 to 5)
      yield (a, b)).toDF("a", "b")
    val i = Stats.chiSquare(indep, "a", "b").collect().head
    assert(i.getAs[Long]("n") == 20L && i.getAs[Long]("dof") == 1L)
    assert(math.abs(i.getAs[Double]("chi2")) < 1e-12)
    // hand 2x2: o = [[8,2],[2,8]]; marginals 10/10; e = 5 everywhere;
    // chi2 = 4 * (3^2/5) = 7.2
    val dep = (Seq.fill(8)((0L, "x")) ++ Seq.fill(2)((0L, "y")) ++
      Seq.fill(2)((1L, "x")) ++ Seq.fill(8)((1L, "y"))).toDF("a", "b")
    assert(math.abs(Stats.chiSquare(dep, "a", "b").collect().head
      .getAs[Double]("chi2") - 7.2) < 1e-9)
    // (1, y) never observed: spine keeps the cell, its e = 2*4/8 = 1
    // o=[[2,2],[4,0]]: ra=4,4... full hand: cells (0,x)=2 (0,y)=2 (1,x)=4
    // ra0=4 ra1=4 cx=6 cy=2 n=8; e00=3 e01=1 e10=3 e11=1
    // chi2 = (2-3)^2/3 + (2-1)^2/1 + (4-3)^2/3 + (0-1)^2/1 = 1/3+1+1/3+1
    val sparse = (Seq.fill(2)((0L, "x")) ++ Seq.fill(2)((0L, "y")) ++
      Seq.fill(4)((1L, "x"))).toDF("a", "b")
    assert(math.abs(Stats.chiSquare(sparse, "a", "b").collect().head
      .getAs[Double]("chi2") - (2.0 / 3.0 + 2.0)) < 1e-9)
  }

  test("cuped: theta recovers the planted slope, variance shrinks, adjusted-mean identity holds") {
    import spark.implicits._
    // y = 2x + effect(variant) + bounded deterministic noise
    val units = (1 to 200).map { i =>
      val x = (i % 40).toDouble
      val grp = if (i % 2 == 0) "A" else "B"
      val eff = if (grp == "A") 5.0 else 0.0
      val noise = ((i * 7) % 5).toDouble - 2.0
      (grp, x, 2.0 * x + eff + noise)
    }.toDF("variant", "pre", "metric")
    val rows = Stats.cuped(units, "variant", "pre", "metric").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B"))
    val a = rows(0); val b = rows(1)
    val theta = a.getAs[Double]("theta")
    assert(math.abs(theta - 2.0) < 0.05, s"theta $theta should be ~2")
    assert(a.getAs[Double]("theta") == b.getAs[Double]("theta"))
    // adjusted-mean identity: mean_adj = mean_y − θ(mean_x_g − x̄)
    val all = units.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val xbar = all.map(_._2).sum / all.length
    for (r <- rows) {
      val g = all.filter(_._1 == r.getString(0))
      val want = g.map(_._3).sum / g.length -
        theta * (g.map(_._2).sum / g.length - xbar)
      assert(math.abs(r.getAs[Double]("mean_cuped") - want) < 1e-6,
        s"${r.getString(0)}: ${r.getAs[Double]("mean_cuped")} vs $want")
    }
    // the x-explained variance is nearly everything here
    val vr = a.getAs[Double]("var_reduction")
    assert(vr > 0.9 && vr <= 1.0, s"variance reduction $vr")
    assert(a.getAs[Double]("mean_metric") > b.getAs[Double]("mean_metric"))
    // degenerate covariate: constant x → null theta, adjustment = identity
    val const = (1 to 10).map(i =>
      (if (i % 2 == 0) "A" else "B", 3.0, i.toDouble))
      .toDF("variant", "pre", "metric")
    val cr = Stats.cuped(const, "variant", "pre", "metric").collect()
    assert(cr.forall(_.isNullAt(4)), "constant x must yield null theta")
    for (r <- cr)
      assert(r.getAs[Double]("mean_cuped") == r.getAs[Double]("mean_metric"))
  }

  test("diffInDiff: hand 2x2 estimate and SE, trend cancellation, arity contract") {
    import spark.implicits._
    // A: 10 → 12 (trend +2); B: 20 → 25 (+5): did = 3, each cell var 2
    val units = Seq(
      ("A", "1_pre", 9.0), ("A", "1_pre", 11.0),
      ("A", "2_post", 11.0), ("A", "2_post", 13.0),
      ("B", "1_pre", 19.0), ("B", "1_pre", 21.0),
      ("B", "2_post", 24.0), ("B", "2_post", 26.0))
      .toDF("variant", "period", "y")
    val r = Stats.diffInDiff(units, "variant", "period", "y")
      .collect().head
    assert(r.getAs[String]("group_a") == "A" &&
      r.getAs[String]("period_pre") == "1_pre")
    assert(math.abs(r.getAs[Double]("mean_a_pre") - 10.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("mean_b_post") - 25.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("did") - 3.0) < 1e-9)
    // se = sqrt(4 * (2/2)) = 2; t = 1.5 — not significant at 1.96
    assert(math.abs(r.getAs[Double]("se") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("t_stat") - 1.5) < 1e-9)
    assert(!r.getAs[Boolean]("significant"))
    // pure shared trend cancels to did = 0
    val trend = Seq(
      ("A", "1_pre", 10.0), ("A", "1_pre", 12.0),
      ("A", "2_post", 15.0), ("A", "2_post", 17.0),
      ("B", "1_pre", 30.0), ("B", "1_pre", 32.0),
      ("B", "2_post", 35.0), ("B", "2_post", 37.0))
      .toDF("variant", "period", "y")
    assert(math.abs(Stats.diffInDiff(trend, "variant", "period", "y")
      .collect().head.getAs[Double]("did")) < 1e-9)
    // constant cells: se = 0 → null t, never significant
    val const = Seq(("A", "1_pre", 1.0), ("A", "2_post", 1.0),
      ("B", "1_pre", 1.0), ("B", "2_post", 1.0), ("A", "1_pre", 1.0),
      ("A", "2_post", 1.0), ("B", "1_pre", 1.0), ("B", "2_post", 1.0))
      .toDF("variant", "period", "y")
    val cr = Stats.diffInDiff(const, "variant", "period", "y")
      .collect().head
    assert(cr.isNullAt(10) && !cr.getAs[Boolean]("significant"))
    intercept[IllegalArgumentException] {
      Stats.diffInDiff(units.withColumn("variant", lit("A")),
        "variant", "period", "y")
    }
    // 2 distinct groups x 2 distinct periods but only 3 POPULATED
    // cells (B has no pre-period rows) must fail loudly, not emit
    // null did/se with significant=false
    val threeCells = Seq(
      ("A", "1_pre", 9.0), ("A", "1_pre", 11.0),
      ("A", "2_post", 11.0), ("A", "2_post", 13.0),
      ("B", "2_post", 24.0), ("B", "2_post", 26.0))
      .toDF("variant", "period", "y")
    val ex = intercept[IllegalArgumentException] {
      Stats.diffInDiff(threeCells, "variant", "period", "y")
    }
    assert(ex.getMessage.contains("4"), ex.getMessage)
  }

  test("abTest: hand-computed z and Wilson CI, degenerate pooled rate, 2-variant contract") {
    import spark.implicits._
    // A: 40/100, B: 25/100 → pooled 0.325, z ≈ 2.265
    val units = (Seq.fill(40)(("A", 1)) ++ Seq.fill(60)(("A", 0)) ++
      Seq.fill(25)(("B", 1)) ++ Seq.fill(75)(("B", 0)))
      .toDF("variant", "converted")
    val rows = Stats.abTest(units, "variant", "converted").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B"))
    val a = rows(0); val b = rows(1)
    assert(a.getAs[Long]("n") == 100L && a.getAs[Long]("successes") == 40L)
    assert(math.abs(a.getAs[Double]("rate") - 0.4) < 1e-12)
    val pp = 65.0 / 200.0
    val se = math.sqrt(pp * (1 - pp) * (1.0 / 100 + 1.0 / 100))
    val zWant = (0.4 - 0.25) / se
    assert(math.abs(a.getAs[Double]("z") - zWant) < 1e-12)
    assert(a.getAs[Double]("z") == b.getAs[Double]("z"), "z repeated")
    assert(a.getAs[Boolean]("significant") == (math.abs(zWant) > 1.96))
    // Wilson CI: inside [0,1], contains the rate, hand value for A
    for (r <- rows) {
      assert(r.getAs[Double]("ci_lo") >= 0.0 &&
        r.getAs[Double]("ci_hi") <= 1.0)
      assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("rate") &&
        r.getAs[Double]("rate") < r.getAs[Double]("ci_hi"))
    }
    val z2n = 1.96 * 1.96 / 100.0
    val center = (0.4 + z2n / 2) / (1 + z2n)
    val half = 1.96 * math.sqrt(0.4 * 0.6 / 100 + z2n / 400.0) / (1 + z2n)
    assert(math.abs(a.getAs[Double]("ci_lo") - (center - half)) < 1e-12)
    // degenerate: nobody converts anywhere → null z, not significant
    val dead = (Seq.fill(5)(("A", 0)) ++ Seq.fill(5)(("B", 0)))
      .toDF("variant", "converted")
    val dr = Stats.abTest(dead, "variant", "converted").collect()
    assert(dr.forall(r => r.isNullAt(6) && !r.getAs[Boolean]("significant")))
    intercept[IllegalArgumentException] {
      Stats.abTest(Seq(("A", 1), ("B", 0), ("C", 1))
        .toDF("variant", "converted"), "variant", "converted")
    }
  }

  test("benfordTest: exact digit extraction, domain completion, conformity contrast") {
    import spark.implicits._
    // hand-planted digits: 30x 1.xx, 17x 2.xx, 10x 9.xx — others absent
    val vals = (Seq.fill(30)(1.23) ++ Seq.fill(17)(2.5) ++
      Seq.fill(10)(9.99) ++ Seq(-4.0, 0.0)).toDF("v")
    val rows = Stats.benfordTest(vals, "v", scale = 2).collect()
    assert(rows.length == 9, "all nine digits present")
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9), "ordered by digit")
    val byDigit = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit(1) == 30L && byDigit(2) == 17L && byDigit(9) == 10L)
    assert(byDigit(3) == 0L && byDigit(7) == 0L, "absent digits complete to 0")
    assert(rows.map(_.getLong(1)).sum == 57L, "non-positive rows excluded")
    val p1 = rows.head.getDouble(3)
    assert(math.abs(p1 - math.log10(2.0)) < 1e-12, "P(1) = log10 2")
    // scale handles sub-unit magnitudes: 0.071 @ scale 3 → 71 → digit 7
    val small = Seq(0.071).toDF("v")
    val sr = Stats.benfordTest(small, "v", scale = 3).collect()
    assert(sr.find(_.getInt(0) == 7).get.getLong(1) == 1L)
    // conformity contrast: Benford-ish sample scores far below uniform
    val benfordish = (1 to 2000).map(i =>
      math.pow(10.0, (i * 0.618033988749895) % 1.0)).toDF("v")
    val uniform = (1 to 2000).map(i => 1.0 + (i % 9)).toDF("v")
    val chiB = Stats.benfordTest(benfordish, "v", 2).head.getAs[Double]("chi2")
    val chiU = Stats.benfordTest(uniform, "v", 2).head.getAs[Double]("chi2")
    assert(chiB < 20.0, s"log-uniform sample conforms, chi2 = $chiB")
    assert(chiU > 100.0, s"uniform digits reject, chi2 = $chiU")
    assert(chiU > 10 * chiB)
    intercept[IllegalArgumentException] {
      Stats.benfordTest(vals, "v", scale = -1)
    }
  }

  test("poissonBootstrapCi: CI brackets the exact mean, repartition-invariant, draw rate sane") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = (1L to 400L).map(i => (i, (i * 37) % 100)).toDF("doc_id", "x")
    val out = Stats.poissonBootstrapCi(d, "doc_id", "x", b = 200)
      .collect().head
    val exact = (1L to 400L).map(i => (i * 37) % 100).sum.toDouble / 400.0
    assert(math.abs(out.getAs[Double]("mean") - exact) < 1e-12)
    assert(out.getAs[Double]("lo") < out.getAs[Double]("hi"))
    assert(out.getAs[Double]("lo") < exact && exact < out.getAs[Double]("hi"),
      s"95% CI [${out.getAs[Double]("lo")}, ${out.getAs[Double]("hi")}] " +
        s"should bracket $exact on a well-behaved fixture")
    // deterministic under repartition (draws keyed on doc_id, not order)
    val rep = Stats.poissonBootstrapCi(d.repartition(13), "doc_id", "x",
      b = 200).collect().head
    assert(rep.getAs[Double]("lo") == out.getAs[Double]("lo")
      && rep.getAs[Double]("hi") == out.getAs[Double]("hi"))
    // Poisson(1) draws: total replication mass within 5% of n*b
    val reps = d.withColumn("b", explode(sequence(lit(0), lit(199))))
    val u = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":boot:"), col("b").cast("string"))), 1, 6), 16, 10)
      .cast("double") / (1 << 24)
    val mass = reps.select(when(u >= 0.36787944117144233, 1L).otherwise(0L)
      .as("w")).agg(sum("w")).collect().head.getLong(0)
    assert(math.abs(mass.toDouble / (400.0 * 200.0) - (1 - 0.36787944117144233))
      < 0.05 * (1 - 0.36787944117144233))
    intercept[IllegalArgumentException] {
      Stats.poissonBootstrapCi(d, "doc_id", "x", b = 10)
    }
  }

  test("ksTest: disjoint = 1, identical = 0, hand crossing with its location") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def df(a: Seq[Long], bs: Seq[Long]) =
      (a.map((_, "A")) ++ bs.map((_, "B"))).toDF("v", "g")
    val disj = Stats.ksTest(df(Seq(1L, 2L), Seq(10L, 20L)), "v",
      col("g") === "A").collect().head
    assert(disj.getAs[Long]("n1") == 2L && disj.getAs[Long]("n2") == 2L)
    assert(math.abs(disj.getAs[Double]("d_stat") - 1.0) < 1e-15)
    assert(disj.getAs[Long]("at_value") == 2L)
    val same = Stats.ksTest(df(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)), "v",
      col("g") === "A").collect().head
    assert(math.abs(same.getAs[Double]("d_stat")) < 1e-15)
    assert(same.getAs[Long]("at_value") == 1L)
    // interleaved A={1,3} B={2,4}: |F_A - F_B| = .5 at v=1 and v=3;
    // lowest attaining value wins
    val x = Stats.ksTest(df(Seq(1L, 3L), Seq(2L, 4L)), "v",
      col("g") === "A").collect().head
    assert(math.abs(x.getAs[Double]("d_stat") - 0.5) < 1e-15)
    assert(x.getAs[Long]("at_value") == 1L)
    // signed stats raise instead of silently mis-banding
    val e = intercept[Exception] {
      Stats.ksTest(df(Seq(-1L, 3L), Seq(2L, 4L)), "v",
        col("g") === "A").collect()
    }
    assert(e.getMessage.contains("negative value") ||
      Option(e.getCause).exists(_.getMessage.contains("negative value")),
      e.toString)
  }

  test("chiSquare: null categories are excluded (complete-case), n reflects it") {
    import spark.implicits._
    val withNulls = (Seq.fill(5)((Some(0L), Some("x"))) ++
      Seq.fill(5)((Some(0L), Some("y"))) ++
      Seq.fill(5)((Some(1L), Some("x"))) ++
      Seq.fill(5)((Some(1L), Some("y"))) ++
      Seq.fill(4)((Some(0L), None: Option[String])) ++
      Seq.fill(3)((None: Option[Long], Some("x"))))
      .toDF("a", "b")
    val r = Stats.chiSquare(withNulls, "a", "b").collect().head
    // only the 20 complete rows count; they are perfectly independent
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-12)
  }

  test("kendallTauB: monotone = 1, reversed = -1, brute-force pairwise reference with ties") {
    import spark.implicits._
    val mono = (1L to 30L).map(i => (i, i * 3)).toDF("x", "y")
    val m = Stats.kendallTauB(mono, "x", "y").collect().head
    assert(math.abs(m.getAs[Double]("tau_b") - 1.0) < 1e-15)
    assert(m.getAs[Long]("discordant") == 0L && m.getAs[Long]("ties_x") == 0L)
    val rev = (1L to 30L).map(i => (i, -i)).toDF("x", "y")
    assert(math.abs(Stats.kendallTauB(rev, "x", "y").collect().head
      .getAs[Double]("tau_b") + 1.0) < 1e-15)
    // deterministic pseudo-random with heavy ties: brute-force check
    val pts = (1L to 200L).map { i =>
      val x = (i * 2654435761L) % 7
      val y = (i * 40503L) % 5
      (x, y)
    }
    val got = Stats.kendallTauB(pts.toDF("x", "y"), "x", "y").collect().head
    var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val (xi, yi) = pts(i); val (xj, yj) = pts(j)
      val sx = java.lang.Long.compare(xi, xj)
      val sy = java.lang.Long.compare(yi, yj)
      if (sx == 0 && sy == 0) { tx += 1; ty += 1 }
      else if (sx == 0) tx += 1
      else if (sy == 0) ty += 1
      else if (sx == sy) conc += 1
      else disc += 1
    }
    assert(got.getAs[Long]("n") == 200L)
    assert(got.getAs[Long]("concordant") == conc, "concordant")
    assert(got.getAs[Long]("discordant") == disc, "discordant")
    val n0 = 200L * 199 / 2
    // engine tie counts include pairs tied on BOTH (standard tau-b
    // marginal form); brute tx/ty above count the same way
    assert(got.getAs[Long]("ties_x") + got.getAs[Long]("ties_y") >= tx)
    val want = (conc - disc).toDouble /
      (math.sqrt((n0 - got.getAs[Long]("ties_x")).toDouble) *
       math.sqrt((n0 - got.getAs[Long]("ties_y")).toDouble))
    assert(math.abs(got.getAs[Double]("tau_b") - want) < 1e-12)
    // constant column -> null tau
    val const = (1L to 10L).map(i => (i, 1L)).toDF("x", "y")
    assert(Stats.kendallTauB(const, "x", "y").collect().head.isNullAt(5))
  }

  test("cramersV: perfect association = 1, independence = 0, degenerate null") {
    import spark.implicits._
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("u", "v")
    assert(math.abs(Stats.cramersV(perfect, "u", "v").collect().head
      .getAs[Double]("cramers_v") - 1.0) < 1e-12)
    val indep = (for { a <- Seq("a", "b"); b <- Seq("x", "y") }
      yield (a, b)).toDF("u", "v")
    assert(math.abs(Stats.cramersV(indep, "u", "v").collect().head
      .getAs[Double]("cramers_v")) < 1e-12)
    val degen = Seq(("a", "x"), ("a", "y")).toDF("u", "v")
    val d = Stats.cramersV(degen, "u", "v").collect().head
    assert(d.isNullAt(d.fieldIndex("cramers_v")))
  }

  test("uncertaintyCoeff: asymmetric determinism, independence = 0, bijection = 1 both ways") {
    import spark.implicits._
    // a determines b fully (a1,a2 -> x; a3 -> y) but b does not
    // determine a: U(b|a) = 1, U(a|b) < 1
    val asym = Seq(("a1", "x"), ("a2", "x"), ("a3", "y"))
      .toDF("u", "v")
    val r = Stats.uncertaintyCoeff(asym, "u", "v").collect().head
    assert(math.abs(r.getAs[Double]("u_b_given_a") - 1.0) < 1e-12)
    assert(r.getAs[Double]("u_a_given_b") < 1.0 - 1e-9)
    // MI here equals H(b) exactly
    assert(math.abs(r.getAs[Double]("mi") - r.getAs[Double]("h_b")) < 1e-12)
    // independence: every term's ln is exactly 0
    val indep = (for { a <- Seq("a", "b"); b <- Seq("x", "y") }
      yield (a, b)).toDF("u", "v")
    val ri = Stats.uncertaintyCoeff(indep, "u", "v").collect().head
    assert(ri.getAs[Double]("mi") == 0.0 &&
      ri.getAs[Double]("u_a_given_b") == 0.0)
    // bijection: both directions 1
    val bij = Seq(("a", "x"), ("b", "y"), ("c", "z")).toDF("u", "v")
    val rb = Stats.uncertaintyCoeff(bij, "u", "v").collect().head
    assert(math.abs(rb.getAs[Double]("u_a_given_b") - 1.0) < 1e-12)
    assert(math.abs(rb.getAs[Double]("u_b_given_a") - 1.0) < 1e-12)
  }

  test("kendallTauB: marginal tie counts match the brute-force definition") {
    import spark.implicits._
    val pts = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (2L, 2L))
    var tx = 0L; var ty = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      if (pts(i)._1 == pts(j)._1) tx += 1
      if (pts(i)._2 == pts(j)._2) ty += 1
    }
    val got = Stats.kendallTauB(pts.toDF("x", "y"), "x", "y").collect().head
    assert(got.getAs[Long]("ties_x") == tx && got.getAs[Long]("ties_y") == ty)
  }

  test("spearman: monotone = 1, reversed = -1, constant null, midrank ties match direct computation") {
    import spark.implicits._
    val mono = (1L to 20L).map(i => (i, i * 3 + 7)).toDF("x", "y")
    assert(math.abs(Stats.spearman(mono, "x", "y").collect().head
      .getAs[Double]("rho") - 1.0) < 1e-12)
    val rev = (1L to 20L).map(i => (i, 100L - i)).toDF("x", "y")
    assert(math.abs(Stats.spearman(rev, "x", "y").collect().head
      .getAs[Double]("rho") + 1.0) < 1e-12)
    val const = (1L to 10L).map(i => (i, 5L)).toDF("x", "y")
    assert(Stats.spearman(const, "x", "y").collect().head.isNullAt(1))
    // ties: direct midrank Pearson replica
    val tied = Seq((1L, 2L), (1L, 5L), (3L, 5L), (4L, 9L), (4L, 9L))
      .toDF("x", "y")
    def ranks(vs: Seq[Long]): Map[Long, Double] =
      vs.distinct.sorted.foldLeft((0, Map.empty[Long, Double])) {
        case ((before, m), v) =>
          val cnt = vs.count(_ == v)
          (before + cnt, m + (v -> (before + (cnt + 1) / 2.0)))
      }._2
    val xs = Seq(1L, 1L, 3L, 4L, 4L); val ys = Seq(2L, 5L, 5L, 9L, 9L)
    val rx = ranks(xs); val ry = ranks(ys)
    val pairs = xs.zip(ys).map { case (x, y) => (rx(x), ry(y)) }
    val n = pairs.length.toDouble
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val expect = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(Stats.spearman(tied, "x", "y").collect().head
      .getAs[Double]("rho") - expect) < 1e-12)
  }

  test("conformalThreshold: k-th order statistic, ties, and too-small-to-certify groups") {
    import spark.implicits._
    // group a: scores 1..9, alpha=0.1 -> k = ceil(10*0.9) = 9 ->
    // threshold = 9th smallest = 9, coverage 1.0
    // group b: 4 rows -> k = ceil(5*0.9) = 5 > 4 -> NULL threshold
    // group c: 19 rows with ties -> k = ceil(20*0.9) = 18; scores
    // are ten 1s then nine 2s -> cum(1)=10 < 18 <= cum(2)=19 ->
    // threshold 2, coverage 19/19 = 1.0 (tie slack visible when the
    // hit value's cum exceeds k)
    val df = ((1 to 9).map(i => ("a", i.toDouble)) ++
      (1 to 4).map(i => ("b", i.toDouble)) ++
      Seq.fill(10)(("c", 1.0)) ++ Seq.fill(9)(("c", 2.0)))
      .toDF("g", "s")
    val out = Stats.conformalThreshold(df, "g", "s", alpha = 0.1)
      .orderBy("g").collect()
    val a = out(0)
    assert(a.getAs[Long]("n") == 9L && a.getAs[Long]("k") == 9L)
    assert(a.getAs[Double]("threshold") == 9.0)
    assert(a.getAs[Double]("coverage") == 1.0)
    val b = out(1)
    assert(b.getAs[Long]("k") == 5L && b.isNullAt(b.fieldIndex("threshold")))
    assert(b.isNullAt(b.fieldIndex("coverage")))
    val c = out(2)
    assert(c.getAs[Long]("k") == 18L)
    assert(c.getAs[Double]("threshold") == 2.0)
    assert(c.getAs[Double]("coverage") == 1.0)
    // coverage >= 1 - alpha whenever certified (the conformal
    // guarantee, realized on the calibration set)
    Seq(a, c).foreach(r =>
      assert(r.getAs[Double]("coverage") >= 0.9 - 1e-15))
  }

  test("aucByGroup: per-slice equals Stats.auc run on the slice, degenerate slice null") {
    import spark.implicits._
    val df = Seq(
      // slice A: perfect separation -> 1.0
      ("A", 0.9, 1L), ("A", 0.8, 1L), ("A", 0.3, 0L), ("A", 0.1, 0L),
      // slice B: one tie pair -> 0.875
      ("B", 0.8, 1L), ("B", 0.5, 1L), ("B", 0.5, 0L), ("B", 0.2, 0L),
      // slice C: positives only -> null
      ("C", 0.7, 1L), ("C", 0.6, 1L))
      .toDF("src", "quality_score", "label")
    val out = Stats.aucByGroup(df, "src").orderBy("src").collect()
    assert(math.abs(out(0).getAs[Double]("auc") - 1.0) < 1e-15)
    assert(math.abs(out(1).getAs[Double]("auc") - 0.875) < 1e-15)
    assert(out(2).isNullAt(out(2).fieldIndex("auc")))
    // cross-check every slice against the global auc on that slice
    for (g <- Seq("A", "B")) {
      val whole = Stats.auc(df.filter(col("src") === g))
        .collect().head.getAs[Double]("auc")
      val sliced = out(if (g == "A") 0 else 1).getAs[Double]("auc")
      assert(math.abs(whole - sliced) < 1e-15)
    }
  }
}
