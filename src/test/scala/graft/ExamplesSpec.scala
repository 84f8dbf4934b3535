package graft

import graft.examples.PretrainPipeline

/** The end-to-end pretraining pipeline composes and behaves sanely. */
class ExamplesSpec extends SparkSpec {

  test("PretrainPipeline: monotone filtering, disjoint folds, sane packing") {
    val stats = PretrainPipeline.run(spark, sf).toMap
    // every stage produced rows (the quarantine and the drift-audit
    // flag counts are rightly zero on a clean uniform corpus — the
    // poison test below drives the former; the audit keys are asserted
    // present explicitly)
    val zeroOk = Set("quarantined", "audit_ks_flagged", "audit_jsd_flagged")
    assert(stats.filter(kv => !zeroOk(kv._1)).values.forall(_ > 0),
      s"empty stage in $stats")
    assert(stats("quarantined") == 0, s"clean corpus quarantined rows: $stats")
    // uniform synthetic sources: no source should trip the drift gates
    assert(stats("audit_ks_flagged") == 0 && stats("audit_jsd_flagged") == 0,
      s"drift audit flagged a uniform corpus: $stats")
    assert(stats("validated") == stats("raw"))
    // filters only remove
    assert(stats("quality") <= stats("raw"))
    assert(stats("lm_quality") <= stats("quality"))
    assert(stats("trimmed") <= stats("lm_quality"))
    assert(stats("deduped") <= stats("trimmed"))
    assert(stats("decontaminated") <= stats("deduped"))
    assert(stats("decontaminated_fuzzy") <= stats("decontaminated"))
    assert(stats("capped") <= stats("decontaminated_fuzzy"))
    assert(stats("mixed") <= stats("capped"))
    // folds partition the mixed corpus
    assert(stats("train") + stats("val") + stats("test") == stats("mixed"))
    // packing covers every training doc and derives a sane sequence count:
    // ceil(tokens/128) sequences means seqs <= tokens, docs <= packed rows
    assert(stats("packed_docs") == stats("train"))
    assert(stats("sequences") > 0 && stats("boundary_docs") < stats("packed_docs"))
    assert(stats("shard_files") >= 1)
  }

  test("TemporalCdcDemo: streamed dimension, as-was enrichment, funnel, compaction") {
    val stats = graft.examples.TemporalCdcDemo.run(spark, sf).toMap
    // versions compress the change stream; exactly one open version per user
    assert(stats("versions") > stats("current") && stats("current") > 0)
    // left-join contract: every purchase enriched (possibly with 'none')
    assert(stats("enriched") == stats("purchases"))
    // ordered funnel can only narrow
    assert(stats("funnel_first") >= stats("funnel_last"))
    assert(stats("cohort_cells") > 0)
    // compaction preserves the table
    assert(stats("versions_after_compact") == stats("versions"))
  }

  test("PretrainPipeline: malformed rows land in the dead-letter, not the job") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf, "documents")
    // three poison rows: null text, empty text, negative id — each
    // would RAISE inside the curation mixers if it got past the gate
    val poison = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(9000001L, null, "srcX", "en", 0L),
        org.apache.spark.sql.Row(9000002L, "", "srcX", "en", 0L),
        org.apache.spark.sql.Row(-1L, "negative id doc", "srcX", "en", 15L))),
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("text", "string")
        .add("source", "string").add("lang", "string").add("n_chars", "long"))
    val poisoned = docs.select("doc_id", "text", "source", "lang", "n_chars")
      .unionByName(poison)
    val clean = PretrainPipeline.runOn(spark,
      docs.select("doc_id", "text", "source", "lang", "n_chars")).toMap
    val dl = java.nio.file.Files.createTempDirectory("examples_deadletter").toString
    val stats = PretrainPipeline.runOn(spark, poisoned, deadLetterDir = Some(dl)).toMap
    assert(stats("quarantined") == 3, s"expected 3 quarantined rows: $stats")
    // the dead-letter sink is where the caller SAID, with the violation
    // names attached — quarantined rows must be findable and diagnosable
    val quarantined = spark.read.parquet(dl)
      .select("doc_id", "violations").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(quarantined.keySet == Set(9000001L, 9000002L, -1L), s"$quarantined")
    assert(quarantined(9000001L).contains("not_null_text"))
    assert(quarantined(9000002L).contains("nonempty_text"))
    assert(quarantined(-1L).contains("nonneg_doc_id"))
    // the gate isolates the poison: downstream stages are unchanged
    assert(stats("validated") == clean("validated"))
    assert(stats("train") == clean("train"))
  }
}
