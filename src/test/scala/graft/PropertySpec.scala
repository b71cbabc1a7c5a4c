package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.io.Manifest
import graft.udf.{DerivedColumn, PmmlSerializer}

/** Property-based checks from the SURVEY §5 test plan (pure-function
  * surface: escaping, PMML emission, hash kernels, the top-k buffer). */
object PropertySpec extends Properties("graft") {

  property("escape/unescape inverse") =
    forAll(Gen.asciiPrintableStr) { s0 =>
      val s = s0.replace("`", "")
      Manifest.unescapeQuotes(Manifest.escapeQuotes(s)) == s &&
        !Manifest.escapeQuotes(s).contains("\"")
    }

  private val colsGen: Gen[List[String]] = Gen.nonEmptyListOf(
    Gen.identifier.suchThat(_.nonEmpty).map(_.take(30))).map(_.distinct)

  property("PMML well-formed, one FieldRef per column") =
    forAll(colsGen) { cols =>
      val dc = DerivedColumn("out", "float", cols, "f(x) <- x & \"y\" < 2")
      val pmml = PmmlSerializer.serialize(dc, cols.map(_ => "double"),
        timestamp = java.time.Instant.EPOCH)
      val xml = scala.xml.XML.loadString(pmml)
      (xml \\ "FieldRef").map(_ \@ "field") == cols &&
        (xml \\ "DataField").length == cols.length
    }

  property("rolling min-hash: appending never raises the min") =
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      (a.length >= 16) ==> {
        val ha = graft.functions.TextHash.rollingMin(a.getBytes("UTF-8"))
        val hab = graft.functions.TextHash.rollingMin(
          (a + b).getBytes("UTF-8"))
        hab <= ha
      }
    }

  property("TopKAggregator equals sort-take under any merge split") = {
    val pairsGen = Gen.listOf(Gen.zip(
      Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 50L))).map(_.distinct)
    forAll(pairsGen, Gen.chooseNum(1, 8), Gen.chooseNum(0, 100)) {
      (pairs, k, cut) =>
        val agg = new graft.functions.TopKAggregator(k)
        val expected = pairs.sortBy { case (s, id) => (-s, id) }.take(k)
        val direct = agg.finish(pairs.foldLeft(agg.zero)(agg.reduce))
        val (l, r) = pairs.splitAt(cut % (pairs.length + 1))
        val merged = agg.finish(agg.merge(
          l.foldLeft(agg.zero)(agg.reduce),
          r.foldLeft(agg.zero)(agg.reduce)))
        direct == expected && merged == expected
    }
  }

  property("rolling min-hash equals naive per-window recompute") =
    forAll(Gen.asciiPrintableStr) { s =>
      val bytes = s.getBytes("UTF-8")
      val B = BigInt(graft.functions.RollingMinHashKernel.Base)
      val M = BigInt(1) << 64
      def poly(bs: Seq[Byte]): Long =
        bs.foldLeft(BigInt(0))((h, b) => (h * B + (b & 0xff)) mod M).toLong
      val naive =
        if (bytes.isEmpty) 0L
        else if (bytes.length <= 16) poly(bytes.toSeq)
        else bytes.toSeq.sliding(16).map(poly).min
      graft.functions.TextHash.rollingMin(bytes) == naive
    }

  property("word shingles equal naive sliding distinct n-grams") = {
    val text = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "d", ""))
      .map(_.mkString(" "))
    forAll(text, Gen.chooseNum(2, 3)) { (t, n) =>
      import org.apache.spark.unsafe.types.UTF8String
      val words = t.split(" ", -1)
      val naive = words.sliding(n).filter(_.length == n)
        .map(_.mkString("_")).toSeq.distinct
      val got = graft.functions.TextHash
        .wordShingles(UTF8String.fromString(t), n)
        .toArray[UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      (words.length >= n) ==> (got == naive)
    }
  }

  property("jaccard prefix+positional filter is complete (d08 rule)") = {
    // random token-set "documents" over a small vocab so overlaps and
    // high-jaccard pairs actually occur; sizes cover the multiples of
    // 5 (prefix-length boundary) and sums hit multiples of 9
    // (positional-bound boundary) where double arithmetic was lossy
    val doc = Gen.chooseNum(1, 15).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 17).map(i => s"w$i")).map(_.distinct))
    forAll(Gen.listOfN(8, doc)) { docs =>
      val t = 0.8
      // global rarest-first order: (document frequency, token)
      val df = docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
      // EXACT replicas of the three d08 join predicates (t = 4/5):
      // prefix length n - ceil(4n/5) + 1 with ceil(4n/5) = (4n+4) div 5
      def prefix(d: List[String]): List[(String, Int)] = {
        val ranked = d.sortBy(w => (df(w), w)).zipWithIndex
          .map { case (w, i) => (w, i + 1) } // 1-based rank, as row_number
        ranked.take(d.size - (4 * d.size + 4) / 5 + 1)
      }
      docs.combinations(2).forall { case Seq(a, b) =>
        val inter = a.toSet.intersect(b.toSet).size
        val j = inter.toDouble / (a.size + b.size - inter)
        val (na, nb) = (a.size, b.size)
        val (pa, pb) = (prefix(a).toMap, prefix(b).toMap)
        val lengthOk = 5L * nb >= 4L * na && 5L * na >= 4L * nb
        // candidate iff SOME shared prefix token's row passes the
        // positional bound 9·(1 + min(na−rka, nb−rkb)) ≥ 4·(na+nb)
        val posOk = pa.keySet.intersect(pb.keySet).exists { w =>
          9L * (1 + math.min(na - pa(w), nb - pb(w))) >= 4L * (na + nb)
        }
        // completeness: every pair at or above threshold must survive
        j < t || (lengthOk && posOk)
      }
    }
  }

  property("minhash signature: superset token sets only lower slots") = {
    val toks = Gen.nonEmptyListOf(Gen.identifier.map(_.take(10)))
    forAll(toks, toks) { (a, b) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.unsafe.types.UTF8String
      def sig(xs: List[String]) = graft.functions.TextHash
        .minhashSig(new GenericArrayData(
          xs.map(s => UTF8String.fromString(s)).toArray))
        .toLongArray()
      val sa = sig(a)
      val sab = sig(a ++ b)
      sa.zip(sab).forall { case (x, y) => y <= x }
    }
  }

  property("resolvePath strips exactly its own authority, boundary-safe") = {
    val seg = Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
    val port = Gen.chooseNum(1, 65535).map(_.toString)
    forAll(seg, port, Gen.listOf(seg), Gen.numStr) { (host, p, segs, junk) =>
      val cfg = graft.GraftConfig(hadoopHost = host, hdfsPort = p)
      val rel = segs.map("/" + _).mkString
      val own = cfg.hdfsUri + rel
      // own authority strips to the path (or root); a LONGER authority
      // that merely extends the port digits must pass through untouched
      val longer = s"hdfs://$host:$p${junk.take(3)}1$rel"
      cfg.resolvePath(own) == (if (rel.isEmpty) "/" else rel) &&
        cfg.resolvePath(longer) == longer &&
        cfg.resolvePath(rel.isEmpty.toString + rel) ==
          rel.isEmpty.toString + rel
    }
  }

  property("BM25 integer kernels: Long == BigInt at full scale, bounds hold") = {
    // the s10 scoring arithmetic (Retrieval.scala) under its documented
    // preconditions (N <= 1e12 docs, T <= 9e15 tokens, dl <= 1e8,
    // tf <= 1e6): every Long intermediate must equal the same formula
    // in BigInt (no silent overflow anywhere), idf_e4 must be positive
    // and monotone-decreasing in df, tfn_e6 must stay in (0, 2.2e6)
    // and be monotone-nondecreasing in tf. (This property caught the
    // original multiply-through tfn form, which overflowed once
    // T·tf passed ~4e11 — i.e. at the target corpus sizes.)
    def kernelLong(n: Long, df: Long, tf: Long, dl: Long, t: Long) = {
      val idfE4 = (2 * n - 2 * df + 1) * 10000L / (2 * df + 1)
      val avgdlE3 = 1000L * t / n
      val relE3 = 1000000L * dl / avgdlE3
      val tfnE6 = 22000L * tf * 1000000L /
        (10000L * tf + 3000L + 9L * relE3)
      (idfE4, tfnE6)
    }
    def kernelBig(n: BigInt, df: BigInt, tf: BigInt, dl: BigInt, t: BigInt) = {
      val idfE4 = (2 * n - 2 * df + 1) * 10000 / (2 * df + 1)
      val avgdlE3 = 1000 * t / n
      val relE3 = 1000000 * dl / avgdlE3
      val tfnE6 = 22000 * tf * 1000000 /
        (10000 * tf + 3000 + 9 * relE3)
      (idfE4, tfnE6)
    }
    val nGen = Gen.chooseNum(1L, 1000000000000L) // up to 1e12 docs
    val tfGen = Gen.chooseNum(1L, 1000000L)
    val dlGen = Gen.chooseNum(1L, 100000000L)
    forAll(nGen, tfGen, dlGen, Gen.chooseNum(1L, 9000L)) {
      (n, tf, dl0, tScale) =>
        // corpus tokens: at least one per doc and at least dl, at most 9e15
        val t = math.min(9000000000000000L,
          math.max(math.max(n, dl0), n / 1000 * tScale + dl0))
        val dl = math.min(dl0, t)
        val dfGen = Gen.chooseNum(1L, n)
        // shrinking ignores generator bounds — discard out-of-domain cases
        forAll(dfGen) { df =>
          (n >= 1 && tf >= 1 && dl >= 1 && df >= 1 && df <= n &&
            tScale >= 1) ==> {
          val (idfE4, tfnE6) = kernelLong(n, df, tf, dl, t)
          val (bIdf, bTfn) = kernelBig(
            BigInt(n), BigInt(df), BigInt(tf), BigInt(dl), BigInt(t))
          val idfNext =
            if (df < n) kernelLong(n, df + 1, tf, dl, t)._1 else idfE4
          val tfnPrev =
            if (tf > 1) kernelLong(n, df, tf - 1, dl, t)._2 else tfnE6
          // the scoring hot path's split-product quotient must equal the
          // exact wide product: (q*t) div 1e4 with q = qH*1e8 + qL and
          // the qH addend divisible by 1e4 decomposes with no carry
          val split = (idfE4 / 100000000L) * 10000L * tfnE6 +
            ((idfE4 % 100000000L) * tfnE6) / 10000L
          val wide = (BigInt(idfE4) * tfnE6) / 10000
          (BigInt(idfE4) == bIdf && BigInt(tfnE6) == bTfn) :|
            s"Long == BigInt (idf $idfE4 vs $bIdf, tfn $tfnE6 vs $bTfn)" &&
            (BigInt(split) == wide) :|
            s"split-product == wide product ($split vs $wide)" &&
            // floors to 0 when df ≈ N (a ubiquitous term carries no
            // signal — the Lucene-style non-negative clamp), never below
            (idfE4 >= 0) :| s"idf nonnegative: $idfE4" &&
            (idfNext <= idfE4) :| "idf monotone in df" &&
            (tfnE6 >= 0 && tfnE6 < 2200000L) :| s"tfn in [0, 2.2e6): $tfnE6" &&
            (tfnPrev <= tfnE6) :| "tfn monotone in tf"
          }
        }
    }
  }

  property("HITS integer renorm: monotone, max lands exactly at 1e6") = {
    // g03's half-step rescale s -> s*1e6 DIV max(s): order can only be
    // preserved or tied (never inverted), the max maps to exactly 1e6,
    // and the BigInt product (what DECIMAL/HUGEINT computes) equals the
    // Long result for any raw sums a degree-bounded graph can produce
    val rawGen = Gen.nonEmptyListOf(Gen.chooseNum(1L, 1000000000000000L))
    forAll(rawGen) { raw0 =>
      val raw = raw0.filter(_ >= 1)
      (raw.nonEmpty) ==> {
        val mx = raw.max
        val re = raw.map(s => ((BigInt(s) * 1000000) / mx).toLong)
        val pairsOk = raw.zip(re).combinations(2).forall {
          case Seq((s1, r1), (s2, r2)) =>
            if (s1 < s2) r1 <= r2 else if (s1 > s2) r1 >= r2 else r1 == r2
          case _ => true
        }
        pairsOk :| "renorm is monotone" &&
          (re.max == 1000000L) :| s"max renorm = ${re.max}" &&
          re.forall(r => r >= 0 && r <= 1000000L) :| "range [0, 1e6]"
      }
    }
  }

  property("count_in_set equals naive membership count") = {
    val word = Gen.oneOf("a", "b", "cc", "dd", "e", "")
    forAll(Gen.listOf(word), Gen.nonEmptyListOf(word)) { (tokens, set0) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.unsafe.types.UTF8String
      val set = set0.filter(_.nonEmpty).distinct
      (set.nonEmpty) ==> {
        val arr = new GenericArrayData(
          tokens.map(s => UTF8String.fromString(s)).toArray[Any])
        val got = graft.functions.TextHash.countInSet(arr,
          graft.functions.TextHash.buildSet(set.mkString(",")))
        got == tokens.count(set.contains)
      }
    }
  }
}
