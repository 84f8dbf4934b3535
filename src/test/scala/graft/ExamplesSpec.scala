package graft

import graft.examples.PretrainPipeline

/** The end-to-end pretraining pipeline composes and behaves sanely. */
class ExamplesSpec extends SparkSpec {

  test("PretrainPipeline: monotone filtering, disjoint folds, sane packing") {
    val stats = PretrainPipeline.run(spark, sf).toMap
    // every stage produced rows
    assert(stats.values.forall(_ > 0), s"empty stage in $stats")
    // filters only remove
    assert(stats("quality") <= stats("raw"))
    assert(stats("trimmed") <= stats("quality"))
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
}
