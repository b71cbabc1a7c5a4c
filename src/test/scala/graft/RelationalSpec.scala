package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("warehouse").toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and oracle keys all exist") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(s"$name: ") { assert(n >= 0) }
    }
  }

  test("q01 pricing summary: groups and exact totals vs raw recompute") {
    val df = ops.Relational.q01PricingSummary(spark, sf)
    val rows = df.collect()
    assert(rows.length === 6) // 3 returnflags x 2 linestatus
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val filtered = Tables(spark, sf, "lineitem")
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.lit(
          java.sql.Timestamp.valueOf("2000-12-01 00:00:00")))
      .count()
    assert(total === filtered)
  }

  test("q11 window topk: at most 3 per brand, rn dense from 1") {
    val rows = ops.Relational.q11WindowTopK(spark, sf).collect()
    val byBrand = rows.groupBy(_.getAs[String]("p_brand"))
    byBrand.values.foreach { rs =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Int]("rn")).sorted.sameElements(1 to rs.length))
    }
  }

  test("q08 semi vs q09 anti are disjoint and bounded by customer count") {
    val semi = ops.Relational.q08SemiJoin(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val anti = ops.Relational.q09AntiJoin(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    // anti (= customers with NO urgent order) must be disjoint from the
    // customers that do have a 1-URGENT order
    val urgentCust = Tables(spark, sf, "orders")
      .filter(org.apache.spark.sql.functions
        .col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(anti.intersect(urgentCust).isEmpty)
    val nCust = Tables(spark, sf, "customer").count()
    assert(semi.size <= nCust && anti.size <= nCust)
  }

  test("q19/q20 set ops partition the 1995 buyers") {
    val both = ops.Relational.q19Intersect(spark, sf).count()
    val only95 = ops.Relational.q20Except(spark, sf).count()
    val buyers95 = Tables(spark, sf, "orders")
      .filter(org.apache.spark.sql.functions
        .year(org.apache.spark.sql.functions.col("o_orderdate")) === 1995)
      .select("o_custkey").distinct().count()
    assert(both + only95 === buyers95)
  }

  test("q47 percentiles are ordered and bracket the median") {
    val rows = ops.Relational5.q47Percentiles(spark, sf).collect()
    var n = 0L
    rows.foreach { r =>
      val (p25, med, p75) = (r.getAs[Double]("p25"),
        r.getAs[Double]("median"), r.getAs[Double]("p75"))
      assert(p25 <= med && med <= p75)
      n += r.getAs[Long]("n")
    }
    assert(n === Tables(spark, sf, "orders").count())
  }

  test("q74 weighted median equals a driver-side naive computation") {
    val got = ops.Relational7.q74WeightedMedian(spark, sf).collect()
      .map(r => r.getAs[String]("brand") ->
        (r.getAs[Double]("weighted_median_price"),
          r.getAs[Long]("total_qty"))).toMap
    val li = Tables(spark, sf, "lineitem")
    val pt = Tables(spark, sf, "part")
    val rows = li.join(pt, li("l_partkey") === pt("p_partkey"))
      .select("p_brand", "l_extendedprice", "l_quantity",
        "l_orderkey", "l_linenumber").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getAs[Number](4).longValue))
    val want = rows.groupBy(_._1).map { case (brand, g) =>
      val sorted = g.sortBy(t => (t._2, t._4, t._5))
      val total = sorted.map(_._3).sum
      var cum = 0.0
      val med = sorted.find { t => cum += t._3; 2 * cum >= total }.get
      brand -> (med._2, total.toLong)
    }
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q75 MAD equals a driver-side naive computation") {
    val got = ops.Relational7.q75MedianAbsDev(spark, sf).collect()
      .map(r => r.getAs[String]("brand") ->
        (r.getAs[Double]("median_price"), r.getAs[Double]("mad_price")))
      .toMap
    val li = Tables(spark, sf, "lineitem")
    val pt = Tables(spark, sf, "part")
    val rows = li.join(pt, li("l_partkey") === pt("p_partkey"))
      .select("p_brand", "l_extendedprice", "l_orderkey", "l_linenumber")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getAs[Number](3).longValue))
    def lowerMedian(vs: Seq[(Double, Long, Long)]): Double = {
      val s = vs.sortBy(t => (t._1, t._2, t._3))
      s((s.length + 1) / 2 - 1)._1
    }
    val want = rows.groupBy(_._1).map { case (brand, g) =>
      val med = lowerMedian(g.map(t => (t._2, t._3, t._4)).toSeq)
      val mad = lowerMedian(
        g.map(t => (math.abs(t._2 - med), t._3, t._4)).toSeq)
      brand -> (med, mad)
    }
    assert(got == want)
    assert(got.nonEmpty)
    got.values.foreach { case (med, mad) => assert(med > 0 && mad >= 0) }
  }

  test("q72 doubling closure equals the closed-form ancestor chain") {
    // the fixture hierarchy is parent(n) = n >> 1, so node n's true
    // ancestor at distance k is n >> k (down to the root 0) — the
    // engine must reproduce that enumeration while treating the edge
    // table as opaque edges (pointer doubling, O(log depth) rounds)
    val keys = Tables(spark, sf, "supplier")
      .select("s_suppkey").collect().map(_.getLong(0)).filter(_ >= 1)
    // (n, n >> k, k) for k = 1..bitLength(n): the last shift reaches 0,
    // the root, and deeper shifts stay 0 (no more edges)
    val closed = keys.flatMap { n =>
      (1 to (64 - java.lang.Long.numberOfLeadingZeros(n)))
        .map(k => (n, n >> k, k.toLong))
    }.toSet
    val got = ops.Relational7.q72Ancestors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == closed,
      s"closure mismatch: extra=${(got -- closed).take(5)} " +
        s"missing=${(closed -- got).take(5)}")
  }

  test("p14 corpus card: volumes reconcile and rates are probabilities") {
    val cards = llm.Pipeline.p14CorpusCard(spark, sf).collect()
    val docs = Tables(spark, sf, "documents")
    assert(cards.length == docs.select("source").distinct().count())
    assert(cards.map(_.getAs[Long]("n_docs")).sum == docs.count())
    cards.foreach { r =>
      val rate = r.getAs[Double]("quality_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_langs") >= 1)
      assert(r.getAs[Long]("n_head_dups") >= 0)
    }
  }

  test("p15 k-anon release: every cell clears k, rollups absorb small cells") {
    val docs = Tables(spark, sf, "documents")
    val out = llm.Pipeline.p15KAnonRelease(spark, sf).collect()
    // the k-anonymity invariant: nothing below threshold is ever released
    out.foreach(r => assert(r.getAs[Long]("n_docs") >= llm.Pipeline.KAnonThreshold))
    // raw small cells never leak through under their own source name
    val rawSmall = docs.groupBy("lang", "source").count()
      .filter(s"count < ${llm.Pipeline.KAnonThreshold}")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val released = out.map(r => (r.getAs[String]("lang"), r.getAs[String]("source"))).toSet
    assert(rawSmall.intersect(released).isEmpty)
    // fixture property (checked at sf0.001 + sf0.01): every language's
    // rollup clears k, so released volume reconciles to the full corpus
    assert(out.exists(_.getAs[String]("source") == "<other>"))
    assert(out.exists(_.getAs[String]("source") != "<other>"))
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }

  test("q48 salted join equals the plain join") {
    val salted = ops.Relational5.q48SaltedJoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("s_nationkey"), r.getAs[Double]("revenue"),
        r.getAs[Long]("n_items")))
    val li = Tables(spark, sf, "lineitem")
    val sup = Tables(spark, sf, "supplier")
    val plain = li.join(sup,
        org.apache.spark.sql.functions.col("l_suppkey") ===
          org.apache.spark.sql.functions.col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("l_extendedprice")
            .cast("decimal(12,2)") *
          (org.apache.spark.sql.functions.lit(1) -
            org.apache.spark.sql.functions.col("l_discount")
              .cast("decimal(3,2)")))
          .cast("double").as("revenue"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_items"))
      .orderBy("s_nationkey")
      .collect()
      .map(r => (r.getAs[Long]("s_nationkey"), r.getAs[Double]("revenue"),
        r.getAs[Long]("n_items")))
    assert(salted.sameElements(plain))
  }

  test("q76 min-cost supplier: every kept supplier achieves the regional minimum") {
    val got = ops.Relational8.q76MinCostSupplier(spark, sf).collect()
      .map(r => (r.getAs[Long]("partkey"), r.getAs[String]("supp_name"),
        r.getAs[Double]("min_cost")))
    assert(got.nonEmpty)
    // naive recompute: min unit cost per (part, supplier), EUROPE only
    val li = Tables(spark, sf, "lineitem").collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey"),
        r.getAs[Double]("l_extendedprice") / r.getAs[Double]("l_quantity")))
    val supNation = Tables(spark, sf, "supplier").collect()
      .map(r => r.getAs[Long]("s_suppkey") ->
        (r.getAs[String]("s_name"), r.getAs[Int]("s_nationkey"))).toMap
    val natRegion = Tables(spark, sf, "nation").collect()
      .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[Int]("n_regionkey"))
      .toMap
    val euRegion = Tables(spark, sf, "region").collect()
      .find(_.getAs[String]("r_name") == "EUROPE").get
      .getAs[Int]("r_regionkey")
    val smallParts = Tables(spark, sf, "part").collect()
      .filter(_.getAs[Int]("p_size") <= 25).map(_.getAs[Long]("p_partkey"))
      .toSet
    val euSupply = li
      .filter(t => natRegion(supNation(t._2)._2) == euRegion)
      .groupBy(t => (t._1, t._2))
      .map { case ((pk, sk), g) => (pk, sk, g.map(_._3).min) }
      .toSeq
    val want = euSupply.groupBy(_._1)
      .filter { case (pk, _) => smallParts.contains(pk) }
      .flatMap { case (pk, g) =>
        val min = g.map(_._3).min
        g.filter(_._3 == min).map(t => (pk, supNation(t._2)._1, min))
      }.toSet
    assert(got.toSet == want)
  }

  test("q77 rolling distinct suppliers equals a naive window recompute") {
    val got = ops.Relational8.q77RollingDistinct(spark, sf).collect()
      .map(r => (r.getAs[Long]("partkey"), r.getAs[Long]("d")) ->
        r.getAs[Long]("supp_7d")).toMap
    assert(got.nonEmpty)
    val epoch = java.time.LocalDate.parse("1992-01-01")
    val daily = Tables(spark, sf, "lineitem").collect()
      .map { r =>
        val day = r.getAs[java.time.LocalDateTime]("l_shipdate").toLocalDate
        (r.getAs[Long]("l_partkey"),
          java.time.temporal.ChronoUnit.DAYS.between(epoch, day),
          r.getAs[Long]("l_suppkey"))
      }.distinct
    val want = daily.map { case (pk, d, _) =>
      (pk, d) -> daily.filter(t => t._1 == pk && t._2 >= d - 6 && t._2 <= d)
        .map(_._3).distinct.length.toLong
    }.toMap
    assert(got == want)
    assert(got.values.max >= 2) // the frame actually accumulates
  }

  test("q79 quantile sketch: bound booleans hold, estimate brackets the exact percentile") {
    // the verify-mode shape carries the exact companions the booleans
    // are defined over; the production shape must agree on the
    // estimates it shares (same summary algebra, minus the companion)
    val r = ops.Relational8.q79Verified(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    for (b <- Seq("b50_reached", "b50_sample_err", "b50_not_below",
        "b90_reached", "b90_sample_err", "b90_not_below"))
      assert(row.getAs[Boolean](b), s"$b is false")
    // the estimate sits at/above the exact percentile, and the pick's
    // estimated rank reached its target (the selection invariant)
    assert(row.getAs[Long]("est_p50") >= row.getAs[Long]("exact_p50"))
    assert(row.getAs[Long]("er50") >= row.getAs[Long]("t50"))
    assert(row.getAs[Long]("er90") >= row.getAs[Long]("t90"))
    // err_bound is the fixed-size-summary promise: ~33 points per month
    assert(row.getAs[Long]("err_bound") * 16 < row.getAs[Long]("n_total"),
      "summaries should bound rank error well under n/16")
    val prod = ops.Relational8.q79QuantileSketch(spark, sf).collect()(0)
    for (c <- Seq("n_total", "err_bound", "t50", "t90", "est_p50",
        "er50", "est_p90", "er90"))
      assert(prod.getAs[Long](c) == row.getAs[Long](c),
        s"production and verified shapes disagree on $c")
  }

  test("q80 grouped quantile rollup: every brand's bounds hold") {
    val rows = ops.Relational8.q80Verified(spark, sf).collect()
    val brands = Tables(spark, sf, "part").select("p_brand").distinct()
      .count()
    assert(rows.length == brands)
    rows.foreach { r =>
      val brand = r.getAs[String]("brand")
      for (b <- Seq("b_reached", "b_sample_err", "b_not_below"))
        withClue(s"$brand $b: ") { assert(r.getAs[Boolean](b)) }
      assert(r.getAs[Long]("er50") >= r.getAs[Long]("t50"))
      assert(r.getAs[Long]("est_p50") >= r.getAs[Long]("exact_p50"))
    }
    // the rank-error bound stays under the group size (at sf0.001 the
    // per-month groups are tiny so the 16-point summaries are nearly
    // exact per month but the bound is Σ steps ≈ #months; the 4×
    // compression shows at real SF — the sf0.01 oracle run covers it)
    assert(rows.forall(r =>
      r.getAs[Long]("err_bound") < r.getAs[Long]("n_total")))
  }

  test("q79 bound booleans hold on random heavy-tailed, tie-heavy price data") {
    import spark.implicits._
    for (seed <- Seq(7, 42, 99)) {
      val rnd = new scala.util.Random(seed)
      val tmp = java.nio.file.Files.createTempDirectory(s"q79-rand-$seed")
      // the SQL entry registers every fixture table; stage the tiny
      // sf0.001 set, then replace lineitem with random data
      for (f <- new java.io.File(sf).listFiles
          if f.getName.endsWith(".parquet") && f.getName != "lineitem.parquet")
        java.nio.file.Files.copy(f.toPath, tmp.resolve(f.getName))
      val n = 3000 + rnd.nextInt(3000)
      val rows = (1 to n).map { i =>
        val month = rnd.nextInt(12) + 1
        val day = rnd.nextInt(28) + 1
        val ts = java.sql.Timestamp.valueOf(
          f"1993-$month%02d-$day%02d 00:00:00")
        // cents-exact, heavy ties (50-cent grid), occasional heavy tail
        val cents =
          if (rnd.nextInt(10) == 0) 5000000L + rnd.nextInt(1000000)
          else (rnd.nextInt(2000) + 1) * 50L
        (i.toLong, (i % 7) + 1, cents / 100.0, ts)
      }
      rows.toDF("l_orderkey", "l_linenumber", "l_extendedprice",
          "l_shipdate")
        .coalesce(1).write.mode("overwrite")
        .parquet(tmp.resolve("lineitem.parquet").toString)
      val r = ops.Relational8.q79Verified(spark, tmp.toString)
        .collect()(0)
      for (b <- Seq("b50_reached", "b50_sample_err", "b50_not_below",
          "b90_reached", "b90_sample_err", "b90_not_below"))
        withClue(s"seed $seed, $b: ") { assert(r.getAs[Boolean](b)) }
      assert(r.getAs[Long]("n_total") == n)
    }
  }

  test("q78 peak concurrency on random interval sets equals the naive count") {
    import spark.implicits._
    for (seed <- Seq(3, 1234)) {
      val rnd = new scala.util.Random(seed)
      val tmp = java.nio.file.Files.createTempDirectory(s"q78-rand-$seed")
      for (f <- new java.io.File(sf).listFiles
          if f.getName.endsWith(".parquet") &&
            f.getName != "orders.parquet" && f.getName != "lineitem.parquet")
        java.nio.file.Files.copy(f.toPath, tmp.resolve(f.getName))
      val custKeys = Tables(spark, sf, "customer")
        .select("c_custkey").collect().map(_.getLong(0))
      // random orders: dense day range so intervals overlap heavily,
      // including same-day and inverted (ship-before-order) cases
      val n = 800
      val orders = (1 to n).map { i =>
        val d0 = rnd.nextInt(60)
        (i.toLong, custKeys(rnd.nextInt(custKeys.length)), "O", 1.0,
          java.sql.Timestamp.valueOf(f"1992-01-01 00:00:00")
            .toLocalDateTime.plusDays(d0),
          "1-URGENT")
      }
      val lines = orders.flatMap { o =>
        (1 to (rnd.nextInt(3) + 1)).map { ln =>
          // shipment anywhere from 5 days BEFORE to 30 after ordering
          (o._1, 1L, 1L, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
            o._5.plusDays(rnd.nextInt(36) - 5))
        }
      }
      orders.toDF("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        .coalesce(1).write.mode("overwrite")
        .parquet(tmp.resolve("orders.parquet").toString)
      lines.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate")
        .coalesce(1).write.mode("overwrite")
        .parquet(tmp.resolve("lineitem.parquet").toString)
      val got = ops.Relational8.q78PeakConcurrent(spark, tmp.toString)
        .collect()
        .map(r => r.getAs[String]("nation") ->
          (r.getAs[Long]("peak_open"), r.getAs[Long]("first_peak_d")))
        .toMap
      // naive: per nation, count open orders on every day
      val custNation = Tables(spark, sf, "customer").collect()
        .map(r => r.getAs[Long]("c_custkey") -> r.getAs[Int]("c_nationkey"))
        .toMap
      val natName = Tables(spark, sf, "nation").collect()
        .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[String]("n_name"))
        .toMap
      val epoch = java.time.LocalDate.parse("1992-01-01")
      def day(t: java.time.LocalDateTime): Long =
        java.time.temporal.ChronoUnit.DAYS.between(epoch, t.toLocalDate)
      val endByOrder = lines.groupBy(_._1)
        .map { case (ok, g) => ok -> g.map(l => day(l._11)).max }
      val ivs = orders.map(o => (custNation(o._2), day(o._5),
        math.max(endByOrder(o._1), day(o._5))))
      val want = ivs.groupBy(_._1).map { case (nk, g) =>
        val days = g.flatMap(iv => Seq(iv._2, iv._3 + 1)).distinct.sorted
        val conc = days.map(d =>
          d -> g.count(iv => iv._2 <= d && d <= iv._3).toLong)
        val peak = conc.map(_._2).max
        natName(nk) -> (peak, conc.find(_._2 == peak).get._1)
      }
      withClue(s"seed $seed: ") { assert(got == want) }
    }
  }

  test("q78 peak concurrency equals a naive per-day sweep") {
    val got = ops.Relational8.q78PeakConcurrent(spark, sf).collect()
      .map(r => r.getAs[String]("nation") ->
        (r.getAs[Long]("peak_open"), r.getAs[Long]("first_peak_d"))).toMap
    assert(got.nonEmpty)
    val epoch = java.time.LocalDate.parse("1992-01-01")
    def day(ts: java.time.LocalDateTime): Long =
      java.time.temporal.ChronoUnit.DAYS.between(epoch, ts.toLocalDate)
    val custNation = Tables(spark, sf, "customer").collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[Int]("c_nationkey"))
      .toMap
    val natName = Tables(spark, sf, "nation").collect()
      .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[String]("n_name"))
      .toMap
    val orderStart = Tables(spark, sf, "orders").collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        (custNation(r.getAs[Long]("o_custkey")),
          day(r.getAs[java.time.LocalDateTime]("o_orderdate")))).toMap
    val orderEnd = Tables(spark, sf, "lineitem").collect()
      .filter(r => orderStart.contains(r.getAs[Long]("l_orderkey")))
      .groupBy(_.getAs[Long]("l_orderkey"))
      .map { case (ok, g) =>
        ok -> g.map(r => day(r.getAs[java.time.LocalDateTime]("l_shipdate"))).max
      }
    val want = orderEnd.keys.toSeq
      .map(ok => (orderStart(ok)._1, orderStart(ok)._2,
        math.max(orderEnd(ok), orderStart(ok)._2)))
      .groupBy(_._1)
      .map { case (nk, ivs) =>
        val days = ivs.flatMap(iv => Seq(iv._2, iv._3 + 1)).distinct.sorted
        val conc = days.map(d =>
          d -> ivs.count(iv => iv._2 <= d && d <= iv._3).toLong)
        val peak = conc.map(_._2).max
        natName(nk) -> (peak, conc.find(_._2 == peak).get._1)
      }
    assert(got == want)
  }
}
