package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount matches manual count; subwordCount splits punctuation") {
    val df = Seq("one two three", "hello, world! 42").toDF("text")
      .select(
        TextAnalysis.tokenCount(col("text")).as("tc"),
        TextAnalysis.subwordCount(col("text")).as("sc"))
    val rows = df.collect()
    assert(rows(0).getInt(0) == 3)
    // "hello" "," "world" "!" "42" = 5 subwords vs 3 whitespace tokens
    assert(rows(1).getInt(0) == 3 && rows(1).getInt(1) == 5)
  }

  test("quality score stays in [0,1] over the corpus") {
    val docs = Tables.load(spark, sf, "documents")
    val bad = docs.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .filter(col("q") < 0 || col("q") > 1).count()
    assert(bad == 0)
  }

  test("fingerprint: equal texts equal, reorder differs, deterministic") {
    val df = Seq(
      ("a", "alpha beta gamma"),
      ("b", "alpha beta gamma"),
      ("c", "gamma beta alpha")).toDF("id", "text")
      .select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c"))
    val again = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == again)
  }

  test("langId returns a known code and favors stopword-matched language") {
    val df = Seq(
      "the cat and the dog is happy",
      "el perro y la casa de que",
      "der hund und die katze ist").toDF("text")
      .select(TextAnalysis.langId(col("text")).as("lang"))
    val langs = df.collect().map(_.getString(0))
    assert(langs(0) == "en" && langs(1) == "es" && langs(2) == "de")
  }

  test("topTokens exact counts; count-min sketch bounds them (never under)") {
    val docs = Tables.load(spark, sf, "documents")
    val top = TextAnalysis.topTokens(docs, "text", 10).collect()
    assert(top.length == 10)
    // descending counts with token tie-break
    assert(top.sliding(2).forall { case Array(a, b) =>
      a.getLong(1) > b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) && a.getString(0) < b.getString(0))
    })
    val exact = top.map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTokens = docs.select(sum(TextAnalysis.tokenCount(col("text")))).head.getLong(0)
    val est = TextAnalysis.approxTokenCounts(docs, "text", exact.keys.toSeq, eps = 0.001)
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"CMS underestimated '$t'")
      assert(est(t) <= c + (0.001 * nTokens).toLong + 1,
        s"'$t': est=${est(t)} exact=$c beyond eps bound")
    }
  }

  test("fuzzyPairs banded candidates equal the naive cross join") {
    val docs = Tables.load(spark, sf, "documents").limit(120)
      .select(col("doc_id"), substring(col("text"), 1, 30).as("t"))
    val banded = TextAnalysis.fuzzyPairs(docs, "doc_id", "t", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val naive = docs.select(col("doc_id").as("id_a"), col("t").as("t_a"))
      .crossJoin(docs.select(col("doc_id").as("id_b"), col("t").as("t_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("t_a"), col("t_b")))
      .filter(col("dist") <= 3)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == naive,
      s"banding lost ${naive -- banded} / invented ${banded -- naive}")
  }

  test("scrub masks emails and digit runs, leaves clean text alone") {
    val rows = Seq(
      "contact bob@example.com or 12345678 now",
      "clean words only").toDF("text")
      .select(TextAnalysis.scrub(col("text")).as("t")).collect().map(_.getString(0))
    assert(rows(0) == "contact <EMAIL> or <NUM> now")
    assert(rows(1) == "clean words only")
  }

  test("stopword/punct/digit ratios bounded and consistent") {
    val r = Seq("the 42 cats!!").toDF("text").select(
      TextAnalysis.stopwordRatio(col("text")).as("sw"),
      TextAnalysis.punctRatio(col("text")).as("p"),
      TextAnalysis.digitRatio(col("text")).as("d")).collect().head
    assert(r.getDouble(0) > 0 && r.getDouble(0) <= 1)
    assert(r.getDouble(1) > 0 && r.getDouble(1) < 1)
    assert(r.getDouble(2) > 0 && r.getDouble(2) < 1)
  }

  test("repetitionRatio: repeated n-grams score high, unique text scores 0") {
    val rows = Seq(
      (1L, "a b a b a b"),          // 2-grams: ab ba ab ba ab -> 2/5 distinct
      (2L, "all words here unique"),
      (3L, "x")                      // shorter than n -> 0 by definition
    ).toDF("doc_id", "text")
    val rep = rows.select(col("doc_id"),
        TextAnalysis.repetitionRatioOfTokens(split(col("text"), " "), 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(rep(1L) - 0.6) < 1e-12, s"got ${rep(1L)}")
    assert(rep(2L) == 0.0)
    assert(rep(3L) == 0.0)
  }

  test("spanTable: distinct spans per doc, short docs emit nothing") {
    val docs = Seq(
      (1L, "a b c d e f g h i"),       // 9 tokens -> spans at offsets 1,2
      (2L, "too short"),               // 2 tokens -> nothing
      (3L, "x x x x x x x x x x")      // repeated-token doc: spans dedup within doc
    ).toDF("doc_id", "text")
    val spans = TextAnalysis.spanTable(docs, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(spans.count(_._1 == 1L) == 2)
    assert(!spans.exists(_._1 == 2L))
    // all 3 raw spans of doc 3 are "x x x x x x x x" -> one distinct
    assert(spans.count(_._1 == 3L) == 1)
  }

  test("duplicatedSpans finds cross-doc repeated passages only") {
    val shared = "the quick brown fox jumps over the lazy"
    val docs = Seq(
      (1L, s"intro words $shared tail one"),
      (2L, s"$shared completely different ending here"),
      (3L, "nothing in common with any other document at all")
    ).toDF("doc_id", "text")
    val dup = TextAnalysis.duplicatedSpans(docs, "doc_id", "text", spanLen = 8)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(dup.contains((shared, 2L)), s"shared span missing from $dup")
    // no span from doc 3 is duplicated
    assert(dup.forall(_._1.split(" ").forall(t => !t.startsWith("nothing"))))
  }

  test("chunkTokens: coverage, overlap, tail chunk, degenerate docs") {
    // 10 tokens, size 5, overlap 2 -> starts 1,4,7: [t1..t5][t4..t8][t7..t10]
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (2L, "a"),   // 1 token <= overlap -> exactly one chunk
      (3L, "")     // empty text -> split gives [""] -> one 1-token chunk
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, "doc_id", "text", chunkSize = 5, overlap = 2)
      .select(col("doc_id"), col("chunk_idx"), col("chunk"))
      .as[(Long, Int, Seq[String])].collect().sortBy(r => (r._1, r._2))
    val d1 = out.filter(_._1 == 1L).map(_._3)
    assert(d1.toSeq == Seq(
      Seq("t1", "t2", "t3", "t4", "t5"),
      Seq("t4", "t5", "t6", "t7", "t8"),
      Seq("t7", "t8", "t9", "t10")))
    // consecutive chunks share exactly `overlap` tokens
    assert(d1(0).takeRight(2) == d1(1).take(2))
    // every token covered
    assert(d1.flatten.toSet == (1 to 10).map(i => s"t$i").toSet)
    assert(out.count(_._1 == 2L) == 1 && out.count(_._1 == 3L) == 1)
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokens(docs, "doc_id", "text", chunkSize = 4, overlap = 4)
    }
  }

  test("scrub masks emails and long digit runs; normalize canonicalizes") {
    val rows = Seq(
      "Email a.b+c@ex.co or call 5551234567 now",
      "short 123 is kept",
      "  Hello,   World!! 42  ").toDF("text")
      .select(
        TextAnalysis.scrub(col("text")).as("s"),
        TextAnalysis.normalize(col("text")).as("n"))
      .as[(String, String)].collect()
    assert(rows(0)._1 == "Email <EMAIL> or call <NUM> now")
    assert(rows(1)._1 == "short 123 is kept", "short digit runs must survive")
    assert(rows(2)._2 == "hello world 42", s"got '${rows(2)._2}'")
    // scrub-then-normalize folds sentinels into plain tokens
    val both = Seq("Ping x@y.io!").toDF("text")
      .select(TextAnalysis.normalize(TextAnalysis.scrub(col("text"))))
      .as[String].head()
    assert(both == "ping email", s"got '$both'")
  }

  test("fuzzyHistogram (dedup-first) equals the id-level fuzzyPairs histogram") {
    // duplicate-heavy fixture: multiplicities 3/2/1 over near-by texts
    val rows = Seq("cat", "cat", "cat", "bat", "bat", "hat", "cart", "dog")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("id", "t")
    val fast = TextAnalysis.fuzzyHistogram(df, "t", 2)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val slow = TextAnalysis.fuzzyPairs(df, "id", "t", 2)
      .groupBy(col("dist")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(fast == slow, s"fast=$fast slow=$slow")
    assert(fast(0) == 3 + 1) // C(3,2) cats + C(2,2) bats
  }
}
