package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextClean
import graft.ops.Relational6

class TextCleanSpec extends AnyFunSuite {
  import SparkTestSession._

  test("t11 strips a chunk shared by >=3 docs, keeps pairwise repeats, preserves order") {
    import spark.implicits._
    // template = exactly one 8-token chunk, planted in docs 1-3;
    // pairTail = one chunk shared by only docs 4-5 (below the df
    // threshold, must survive); doc bodies are 8-token chunks too so
    // chunk boundaries are exact.
    val template = "terms of service apply all rights reserved worldwide"
    val pairTail = "shared by just two docs not a template"
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta eta theta $template"),
      (2L, s"$template iota kappa lambda mu nu xi omicron pi"),
      (3L, s"rho sigma tau upsilon phi chi psi omega $template"),
      (4L, s"one two three four five six seven eight $pairTail"),
      (5L, s"nine ten eleven twelve thirteen fourteen fifteen sixteen $pairTail"),
    ).toDF("doc_id", "text")
    val out = TextClean.boilerplateCleaned(docs)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_chunks")).toSeq == Seq(2L, 2L, 2L, 2L, 2L))
    assert(out.map(_.getAs[Long]("n_kept")).toSeq == Seq(1L, 1L, 1L, 2L, 2L))
    val cleaned = out.map(_.getAs[String]("clean_text"))
    assert(cleaned(0) == "alpha beta gamma delta epsilon zeta eta theta")
    // doc 2 had the template FIRST — the kept tail must keep its order
    assert(cleaned(1) == "iota kappa lambda mu nu xi omicron pi")
    assert(cleaned(3) == s"one two three four five six seven eight $pairTail")
    cleaned.foreach(t => assert(!t.contains("terms of service")))
  }

  test("t11 drops a doc that is ALL boilerplate to an empty row, not a missing row") {
    import spark.implicits._
    val t = "terms of service apply all rights reserved now"
    val docs = Seq(
      (1L, s"$t"), (2L, s"$t"), (3L, s"$t"),
      (4L, "unique body text that stays around here fine"),
    ).toDF("doc_id", "text")
    val out = TextClean.boilerplateCleaned(docs).orderBy("doc_id").collect()
    assert(out.length == 4)
    assert(out(0).getAs[Long]("n_kept") == 0L)
    assert(out(0).getAs[String]("clean_text") == "")
    assert(out(3).getAs[Long]("n_kept") == 1L)
  }

  test("t12 redactor catches real-shaped PII and leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      "reach me at jane.doe+spam@mail.example.org thanks",
      "server 192.168.1.254 timed out",
      "call 555-0147 after five",
      "no pii here at all",
      "multi: a@b.co and 10.0.0.1 and 555-9999",
    ).toDF("s")
    val got = rows.select(TextClean.redact(col("s")).as("r")).as[String].collect()
    assert(got(0) == "reach me at <EMAIL> thanks")
    assert(got(1) == "server <IP> timed out")
    assert(got(2) == "call <PHONE> after five")
    assert(got(3) == "no pii here at all")
    assert(got(4) == "multi: <EMAIL> and <IP> and <PHONE>")
  }

  test("t12 over the fixture plants and redacts exactly one of each PII class per doc") {
    val out = TextClean.t12PiiRedact(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_email") == 1L)
      assert(r.getAs[Long]("n_ip") == 1L)
      assert(r.getAs[Long]("n_phone") == 1L)
      val red = r.getAs[String]("redacted")
      assert(red.contains("<EMAIL>") && red.contains("<IP>") && red.contains("<PHONE>"))
      assert(!red.contains("@example.com"))
    }
  }

  test("q63 opens a new session strictly past the 12h gap, not at it") {
    import spark.implicits._
    // three events: +12h exactly (same session), then +12h1us (new)
    val base = 1700000000000000L // micros
    val gap = Relational6.SessionGapUs
    val ev = Seq(
      (1L, base), (2L, base + gap), (3L, base + 2 * gap + 1))
      .toDF("event_id", "us")
      .select(col("event_id"), lit(7L).as("user_id"),
        expr("timestamp_micros(us)").as("ts"))
    ev.createOrReplaceTempView("q63_fixture_events")
    // run the same island logic inline on the fixture frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = ev.withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_s", when(col("prev_us").isNull ||
        col("us") - col("prev_us") > gap, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("event_id"), col("session_id")).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
    assert(sess(1L) == 1L && sess(2L) == 1L && sess(3L) == 2L)
  }

  test("t13 drift: disjoint vocabularies give TV=1, identical give TV=0") {
    import spark.implicits._
    val disjoint = Seq(
      ("s1", "apple banana cherry apple"),
      ("s2", "dog elephant fox dog dog")).toDF("source", "text")
    val dj = graft.llm.TextStats.corpusDrift(disjoint)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("tv")).toMap
    assert(dj("s1") == 1.0 && dj("s2") == 1.0)
    val same = Seq(
      ("s1", "alpha beta alpha beta"),
      ("s2", "alpha beta alpha beta")).toDF("source", "text")
    val sm = graft.llm.TextStats.corpusDrift(same)
      .collect().map(r => r.getAs[Double]("tv"))
    assert(sm.forall(_ == 0.0))
    // fixture: every slice's TV strictly inside (0, 1)
    val fx = graft.llm.TextStats.corpusDrift(
      Tables(spark, sf, "documents")).collect()
    assert(fx.nonEmpty)
    fx.foreach { r =>
      val tv = r.getAs[Double]("tv")
      assert(tv > 0.0 && tv < 1.0)
    }
  }

  test("t13 drift is symmetric on any two-source corpus") {
    import spark.implicits._
    // with exactly two sources, each slice's "rest" IS the other slice,
    // so TV(s1‖s2) must equal TV(s2‖s1) — numerator and all
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    (1 to 3).foreach { _ =>
      val docsSeq = for {
        src <- Seq("s1", "s2"); _ <- 1 to 5
      } yield (src,
        Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      val out = graft.llm.TextStats.corpusDrift(docsSeq.toDF("source", "text"))
        .collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("tv_num"), r.getAs[Double]("tv"))).toMap
      assert(out("s1")._1 == out("s2")._1)
      assert(out("s1")._2 == out("s2")._2)
    }
  }

  test("q63 sessions partition the events: counts sum to the table size") {
    val out = Relational6.q63Sessionize(spark, sf)
    val total = out.agg(sum(col("n_events"))).collect()(0).getLong(0)
    val n = Tables(spark, sf, "events").count()
    assert(total == n)
    // and every session respects the gap invariant on its bounds
    val bad = out.filter(col("duration_us") < 0).count()
    assert(bad == 0L)
  }

  test("t15 strips within-doc repeats only, keeps first occurrences in order") {
    val out = TextClean.t15RepeatStrip(spark, sf).collect()
    assert(out.length == Tables(spark, sf, "documents").count())
    // the fixture's ~40-word vocabulary with 8-token chunks repeats
    // within at least some docs; and no doc may LOSE non-repeat chunks
    assert(out.exists(_.getAs[Long]("n_stripped") > 0),
      "fixture planted no intra-doc repeats — threshold or chunking drifted")
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_stripped") ==
        r.getAs[Long]("n_chunks"))
      // reassembled text has exactly n_kept chunks' worth of structure:
      // distinct chunks of the cleaned text == chunks of the cleaned text
      val cleaned = r.getAs[String]("clean_text").split(" ")
        .grouped(TextClean.ChunkTokens).map(_.mkString(" ")).toSeq
      assert(cleaned.distinct.length == cleaned.length,
        s"doc ${r.get(0)}: repeats survived the strip")
    }
  }

  test("q70 forward fill: holes take the last earlier value, leading holes stay null") {
    val out = ops.Relational6.q70ForwardFill(spark, sf).collect()
    // replay per user in output order with a driver-side LOCF reference
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      var lastSeen: Option[Double] = None
      rows.foreach { r =>
        if (!r.getAs[Boolean]("was_missing"))
          lastSeen = Some(r.getAs[Double]("filled"))
        lastSeen match {
          case Some(v) => assert(r.getAs[Double]("filled") == v)
          case None => assert(r.isNullAt(r.fieldIndex("filled")),
            "leading hole must stay null")
        }
      }
    }
    assert(out.exists(_.getAs[Boolean]("was_missing")))
  }

  test("t14 hard gates discriminate on the fixture and keep is their conjunction") {
    val out = TextClean.t14RuleFilter(spark, sf).collect()
    assert(out.length == Tables(spark, sf, "documents").count())
    // the gates that must cut both ways on this fixture: short docs
    // exist (r_len), stopword-free docs exist (r_stop), and the ~40-word
    // vocabulary forces long docs under TTR 1/2 (r_diverse)
    for (rule <- Seq("r_len", "r_stop", "r_diverse")) {
      val passed = out.count(_.getAs[Boolean](rule))
      assert(passed > 0 && passed < out.length,
        s"$rule does not discriminate: $passed/${out.length} pass")
    }
    // all-lowercase-word fixture: the wordlen band and symbol gate must
    // pass everywhere — a failure means the integer cross-multiplication
    // drifted from the documented ratio semantics
    assert(out.forall(_.getAs[Boolean]("r_wordlen")))
    assert(out.forall(_.getAs[Boolean]("r_symbol")))
    out.foreach { r =>
      val conj = Seq("r_len", "r_wordlen", "r_stop", "r_symbol", "r_diverse")
        .forall(r.getAs[Boolean])
      assert(r.getAs[Boolean]("keep") == conj,
        s"doc ${r.get(0)}: keep != conjunction of rule columns")
    }
    val kept = out.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < out.length)
  }
}
