package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Tokenizer

/** The batched BPE trainer ([[Tokenizer.bpeRoundsBatched]]): at batch
  * width 1 it IS the sequential contract the shipped artifact and the
  * DuckDB oracle pin (t19/t20/t21 hash-green through the same body);
  * at width K it learns the same-size table in measurably fewer
  * driver-dispatched rounds — the property that makes a 32k-merge
  * production vocabulary trainable (32k sequential Spark jobs is a
  * driver bottleneck, not a data one). */
class BpeTrainerSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("batch width 1 reproduces the shipped sequential merge table") {
    val seq = rows(SparkEntry.queries("t19_bpe_merges")(spark, sf))
    assert(seq.size == Tokenizer.BpeMerges, "fixture must feed all merges")
    val (merges, vocab) = Tokenizer.bpeRoundsBatched(
      spark, sf, Tokenizer.BpeMerges, 1)
    assert(rows(merges.orderBy("merge_rank")) == seq,
      "K=1 must be bit-identical to the sequential contract")
    assert(Tokenizer.lastTrainRounds.get() == Tokenizer.BpeMerges,
      "sequential width pays one round per merge")
    graft.Checkpoints.release(vocab)
  }

  test("batch width 4 learns a full table in sublinear rounds") {
    val seq = rows(SparkEntry.queries("t19_bpe_merges")(spark, sf))
    val (merges, vocab) = Tokenizer.bpeRoundsBatched(
      spark, sf, Tokenizer.BpeMerges, 4)
    val got = rows(merges.orderBy("merge_rank"))
    assert(got.size == Tokenizer.BpeMerges,
      s"the fixture feeds ${Tokenizer.BpeMerges} merges, got ${got.size}")
    val roundsUsed = Tokenizer.lastTrainRounds.get()
    assert(roundsUsed < Tokenizer.BpeMerges,
      s"width 4 must beat one-round-per-merge (used $roundsUsed)")
    // the batched table is a valid BPE table: ranks are 1..K, every
    // merged token is its pair's concatenation, counts are positive
    got.zipWithIndex.foreach { case ((rank, pair, merged, cnt), i) =>
      assert(rank == i + 1)
      assert(merged == pair.replace(" ", ""))
      assert(cnt > 0)
    }
    // and it shares the sequential table's FIRST pick (rank-1 is
    // selected from identical statistics at any width)
    assert(got.head == seq.head,
      "rank-1 must match the sequential winner")
    // the final vocabulary is consistent with the learned table:
    // every type's symbol string re-derives by replaying the merges
    // in rank order under the pass contract
    import org.apache.spark.sql.functions._
    val symCol = concat(lit(" "),
      array_join(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"), " "),
      lit(" "))
    val replayed = got.foldLeft(symCol: org.apache.spark.sql.Column) {
      case (s, (_, pair, merged, _)) =>
        (1 to Tokenizer.BpePasses).foldLeft(s)((t, _) =>
          replace(t, lit(s" $pair "), lit(s" $merged ")))
    }
    val mismatches = vocab
      .withColumn("replay", replayed)
      .filter(col("replay") =!= col("sym"))
      .count()
    assert(mismatches == 0,
      "the trained vocabulary must equal a rank-order replay of its " +
        "own merge table (commuting-batch property)")
    graft.Checkpoints.release(vocab)
  }
}
