package graft

import org.apache.spark.sql.functions._

/** NULL-text robustness: real web corpora carry null text fields, and none
  * of the pipeline entry points may crash on them. The per-operator
  * semantics documented here are deliberate: a null doc contributes no
  * shingles (dedup skips it), normalizes to an empty rewrite in the trim
  * path, fails the Gopher gate (a corpus filter SHOULD drop it), and
  * contributes no tokens to a budget.
  */
class NullTextSpec extends SparkSpec {
  import spark.implicits._

  test("null text rows flow through the pipeline entry points without crashing") {
    val good = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq((1L, good), (2L, null.asInstanceOf[String]), (3L, good))
      .toDF("doc_id", "text")
    val withChars = docs.withColumn("n_chars", length(col("text")))

    // dedup: the null doc has no shingles — the (1, 3) exact pair is still found
    val pairs = graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 3L)))

    // substring trim: null normalizes to an empty rewrite, nothing is cut
    val trim = graft.operators.Dedup.substringTrimApply(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(trim == Seq((1L, good, 0L), (2L, "", 0L), (3L, good, 0L)))

    // quality: the null doc FAILS the Gopher gate — exactly what a corpus
    // filter should do with it
    val gopher = graft.operators.TextAnalysis.gopherRules(withChars)
      .select("doc_id", "quality_pass")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(gopher == Seq((1L, true), (2L, false), (3L, true)))

    // token budget: the null doc contributes no tokens and is not selected
    val tb = graft.operators.Sampling.tokenBudgetPerSource(
        docs.withColumn("source", lit("s")), "doc_id", "source", "text", 100L)
      .collect().map(_.getLong(0)).toSet
    assert(tb == Set(1L, 3L))

    // BPE training sees only the non-null word mass
    assert(graft.operators.TextAnalysis.bpeTrain(docs, 3).count() == 3)
  }

  test("round-12 text operators tolerate null text") {
    val good = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, good, "en", "s1"), (2L, null.asInstanceOf[String], "en", "s1"),
      (3L, good, "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", coalesce(length(col("text")), lit(0L)))

    // bigram LM: null text has no bigrams and drops, like empty docs
    val bg = graft.operators.TextAnalysis.bigramLogprob(docs)
      .collect().map(_.getLong(0)).toSet
    assert(bg == Set(1L, 3L), s"bigram docs: $bg")

    // quality budget: a null doc contributes no tokens and is never
    // selected — the same documented semantics as tokenBudgetPerSource
    val qb = graft.operators.Sampling.qualityTokenBudget(docs, budget = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(qb.keySet == Set(1L, 3L), s"quality budget: $qb")

    // quality histogram: the null doc lands in decile 0 with 0 tokens
    val qh = graft.operators.TextAnalysis.qualityHistogram(docs)
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(qh.values.map(_._1).sum == 3, s"histogram covers all docs: $qh")

    // chunk reassembly: the null doc has no chunks and drops; others round-trip
    val ra = graft.operators.TextAnalysis.reassembleChunks(docs)
      .collect().map(r => (r.getLong(0), r.getBoolean(3)))
    assert(ra.map(_._1).toSet == Set(1L, 3L) && ra.forall(_._2), s"reassembly: ${ra.toSeq}")

    // NB mislabel report: the null doc takes the prior-only argmax and still
    // counts in its source's denominator
    val mr = graft.operators.TextAnalysis.mislabelRate(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mr == Map("s1" -> 2L, "s2" -> 1L), s"mislabel rate: $mr")

    // quality-aware dedup apply: the (1, 3) near-dup pair resolves by
    // quality (tie -> lower id since texts are identical); the null doc
    // survives untouched
    val adq = graft.operators.Dedup.applyDedupQuality(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(adq == Set(1L, 2L), s"quality dedup kept: $adq")
  }

  test("late round-12 text/embedding operators tolerate null text") {
    val good = "alpha beta alpha beta gamma"
    val docs = Seq(
      (1L, good, "en", "s1"), (2L, null.asInstanceOf[String], "en", "s1"),
      (3L, good, "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")

    // PMI: a null doc contributes no tokens and no bigrams — counts and
    // totals come from the real docs only
    val pmi = graft.operators.TextAnalysis.pmiBigrams(docs, minCount = 1)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(pmi(("alpha", "beta")) == 4L, s"pmi counts: $pmi")

    // coverage curve: totals exclude the null doc's (nonexistent) tokens
    val cov = graft.operators.TextAnalysis.coverageCurve(docs, ks = Seq(10))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(cov.toSeq == Seq((10, 3, 1000000L)), s"coverage: ${cov.toSeq}") // 3 types

    // duplication mass: null doc contributes no shingles
    val dm = graft.operators.TextAnalysis.dupNgramMass(docs, k = 3, thresholds = Seq(1))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(dm.toSeq == Seq((6L, 6L)), s"dup mass: ${dm.toSeq}") // all 3 shingles appear twice

    // lang confusion: the null doc predicts 'und' and still counts in its
    // declared language's row denominator
    val lc = graft.operators.TextAnalysis.langConfusion(spark, docs)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(lc(("en", "und")) == 2L && lc(("de", "und")) == 1L,
      s"confusion: $lc") // 'alpha beta...' hits no stopword profile either
  }
}
