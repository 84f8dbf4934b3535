package graft.ops

/** DuckDB oracle SQL for the SQL-expressible subset of [[Curation]].
  *
  * q24 pairs over the md5-derived [[graft.text.Dedup.simhashMd5]]
  * signature, which this oracle recomputes FROM SCRATCH (md5 hex is
  * engine-independent) and pairs by exact all-pairs
  * `bit_count(xor) <= 3` — Spark's banded form is provably equal by
  * the 4-band pigeonhole. q31 renders the implementation-specific HLL
  * estimate as a within-bound boolean next to the exact count, which
  * the oracle reproduces exactly.
  *
  * q23/q28/q29 ARE oracle-checked even though the operators are
  * hash/LSH-based, because on fixed data with fixed seeds their output
  * provably coincides with an exact, SQL-expressible set:
  *  - q23: MinHash only GENERATES candidates; the exact-Jaccard verify
  *    filter makes output ⊆ {pairs with J ≥ 0.8}. Equality (recall = 1)
  *    is deterministic for this corpus+seeds and replayed by
  *    `tools/check.py` at sf0.001/0.01/0.1.
  *  - q28: fingerprints are deterministic, equal texts ⇒ equal fps, and
  *    the corpus has zero 64-bit collisions (verified all sfs), so
  *    distinct-fp count = distinct-text count.
  *  - q29: the LSH candidate set contains the true top-5 at these sfs
  *    (fixed hyperplane seed), and exact cosine re-ranks candidates, so
  *    output = exact brute-force top-5.
  */
object CurationOracle {

  val all: Seq[(String, String)] = Seq(
    "q21_doc_tokens" ->
      """SELECT lang, count(*) n_docs, CAST(sum(len(string_split(text,' '))) AS BIGINT) total_tokens,
        |       round(avg(len(string_split(text,' '))),4) avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q22_doc_quality" ->
      """SELECT source, round(avg(CAST(length(text) AS DOUBLE)),4) avg_len,
        |       round(avg(CAST(len(list_filter(string_split(lower(text),' '), x -> x IN ('the','of','and','a','to','in','is','it','that','for'))) AS DOUBLE) / greatest(len(string_split(text,' ')),1)),6) stop_ratio
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // simhash twin: recompute the md5-derived 60-bit signature from
    // scratch (token MULTISET vote; first 15 hex chars of md5(token)
    // parsed big-endian; tie bits = 0), then pair via the same 4×15-bit
    // banding Spark uses. The banding is NOT an approximation here:
    // hamming ≤ 3 pairs differ in ≤ 3 of 4 bands, so ≥ 1 band matches
    // exactly (pigeonhole) — band-join + verify ≡ all-pairs, and the
    // equi-join keeps DuckDB off the O(n²) inequality nested loop that
    // an `ON a.doc_id < b.doc_id` all-pairs form costs at sf0.1+
    "q24_dedup_simhash" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') toks FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(toks, tok -> CAST(list_sum(list_transform(range(1, 16),
        |      i -> CAST(strpos('0123456789abcdef', md5(tok)[i]) - 1 AS BIGINT)
        |           * (CAST(1 AS BIGINT) << (4 * (15 - i))))) AS BIGINT)) hs
        |  FROM t),
        |s AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 60), j ->
        |      CASE WHEN 2 * len(list_filter(hs, hv -> (hv >> j) & 1 = 1)) > len(hs)
        |           THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) sig
        |  FROM h),
        |bands AS (
        |  SELECT doc_id, sig, b, (sig >> (b * 15)) & 32767 ck
        |  FROM s CROSS JOIN (SELECT unnest([0, 1, 2, 3]) b) bi),
        |cand AS (
        |  SELECT DISTINCT x.doc_id id_a, y.doc_id id_b, x.sig sa, y.sig sb
        |  FROM bands x JOIN bands y ON x.b = y.b AND x.ck = y.ck
        |  WHERE x.doc_id < y.doc_id)
        |SELECT id_a, id_b, bit_count(xor(sa, sb)) hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // q23/q25 twins: inverted-index EQUI-join form, not the quadratic
    // `ON a.doc_id < b.doc_id` all-pairs nested loop (multi-minute-to-
    // hour at sf0.1 — ROUND4.md measures it). EXACTLY equivalent, not
    // an approximation: any pair with Jaccard ≥ τ > 0 shares ≥ 1
    // shingle, so the shingle join generates every qualifying pair, and
    // |A∪B| = |A| + |B| − |A∩B| recovers the same Jaccard from the
    // per-pair intersection count (shingle lists are list_distinct'd).
    // Verified equal to the all-pairs form at sf0.001/sf0.01 both
    // thresholds; this form runs sf0.1 in seconds, making the full
    // inventory sf0.1-sweepable.
    "q25_dedup_ngram" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM documents),
        |e AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM t),
        |p AS (
        |  SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |         any_value(a.n) na, any_value(b.n) nb
        |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, round(CAST(inter AS DOUBLE)/(na + nb - inter),4) jaccard
        |FROM p WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "q23_dedup_minhash" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM documents),
        |e AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM t),
        |p AS (
        |  SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |         any_value(a.n) na, any_value(b.n) nb
        |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, round(CAST(inter AS DOUBLE)/(na + nb - inter),4) jaccard
        |FROM p WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "q26_embed_neardup" ->
      """SELECT a.vec_id id_a, b.vec_id id_b,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])),6) sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin,

    "q27_lang_id" ->
      """WITH s AS (
        |  SELECT len(list_filter(string_split(lower(text),' '), x -> x IN ('the','and','of','to','is'))) s_en,
        |         len(list_filter(string_split(lower(text),' '), x -> x IN ('el','la','de','que','y'))) s_es,
        |         len(list_filter(string_split(lower(text),' '), x -> x IN ('le','la','les','et','des'))) s_fr,
        |         len(list_filter(string_split(lower(text),' '), x -> x IN ('der','die','und','das','ist'))) s_de,
        |         len(list_filter(string_split(lower(text),' '), x -> x IN ('的','是','了','在','我'))) s_zh
        |  FROM documents),
        | p AS (SELECT CASE
        |   WHEN s_zh >= greatest(s_en,s_es,s_fr,s_de) THEN 'zh'
        |   WHEN s_fr >= greatest(s_en,s_es,s_de) THEN 'fr'
        |   WHEN s_es >= greatest(s_en,s_de) THEN 'es'
        |   WHEN s_en >= s_de THEN 'en' ELSE 'de' END pred_lang FROM s)
        |SELECT pred_lang, count(*) n FROM p GROUP BY pred_lang ORDER BY pred_lang""".stripMargin,

    "q28_fingerprint" ->
      """SELECT count(*) n_docs, count(DISTINCT text) n_distinct_fp FROM documents""".stripMargin,

    "q29_ann_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) e FROM embeddings WHERE vec_id=0)
        |SELECT 0 query_id, vec_id id,
        |       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT e FROM q)),6) sim,
        |       CAST(row_number() OVER (ORDER BY round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT e FROM q)),6) DESC, vec_id) AS INT) rk
        |FROM embeddings WHERE vec_id<>0 ORDER BY rk LIMIT 5""".stripMargin,

    "q30_mm_meta" ->
      """SELECT source, count(*) n, CAST(sum(octet_length(encode(text))) AS BIGINT) total_bytes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // HLL twin: the oracle reproduces the exact distinct count; the
    // boolean contract "estimate within 4×rsd (20%) of exact" holds for
    // a correct HLL++ at rsd 0.05 with ~1e-4 residual risk per group
    // on a REGENERATED corpus (the sketch is deterministic on fixed
    // data, so on any given corpus the boolean is stable either way)
    "q31_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) exact_u, true approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q37_top_tokens" ->
      """SELECT token, count(*) cnt FROM (
        |  SELECT unnest(string_split(text,' ')) token FROM documents) t
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 10""".stripMargin,

    "q40_frame_stats" ->
      """WITH f AS (
        |  SELECT doc_id, source,
        |         greatest(CAST(floor(octet_length(encode(text)) / 128) AS INT) - 1, 0) + 1 n_frames
        |  FROM documents)
        |SELECT source, CAST(sum(n_frames) AS BIGINT) total_frames,
        |       round(avg(n_frames),4) avg_frames
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    "q41_fuzzy_hist" ->
      """SELECT dist, count(*) c FROM (
        |  SELECT levenshtein(a.p_name, b.p_name) dist
        |  FROM part a JOIN part b
        |    ON a.p_partkey < b.p_partkey
        |    AND abs(length(a.p_name) - length(b.p_name)) <= 2
        |  ) t WHERE dist <= 2 GROUP BY dist ORDER BY dist""".stripMargin,

    // connected components as a recursive transitive closure: reach(id,r)
    // = every node reachable from id; cluster = min(id, reachable ids).
    // Exact twin of the Spark min-label-propagation fixpoint.
    // MATERIALIZED is load-bearing: DuckDB inlines CTEs by default, and
    // the recursive term would otherwise re-evaluate the shingle pair
    // join on every iteration (observed: sf0.1 ran >30 min plain,
    // seconds materialized). The edge CTE uses the q23/q25 inverted-
    // index equi-join form (exactly equivalent — see that comment):
    // the old `ON a.doc_id < b.doc_id` all-pairs list_intersect scan
    // was 930 s at sf0.1; this is seconds.
    "q42_dedup_clusters" ->
      """WITH RECURSIVE
        |sh AS MATERIALIZED (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM documents),
        |ex AS MATERIALIZED (SELECT doc_id, len(sh) n, unnest(sh) s FROM sh),
        |edges AS MATERIALIZED (
        |  SELECT id_a ea, id_b eb FROM (
        |    SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |           any_value(a.n) na, any_value(b.n) nb
        |    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2) p
        |  WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.5),
        |sym AS MATERIALIZED (SELECT ea a, eb b FROM edges UNION SELECT eb, ea FROM edges),
        |reach AS (
        |  SELECT a AS id, b AS r FROM sym
        |  UNION
        |  SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a WHERE sym.b <> reach.id),
        |labels AS (SELECT id, least(id, min(r)) cluster_id FROM reach GROUP BY id),
        |members AS (
        |  SELECT l.cluster_id, d.doc_id, d.n_chars,
        |         row_number() OVER (PARTITION BY l.cluster_id ORDER BY d.n_chars DESC, d.doc_id) rn
        |  FROM labels l JOIN documents d ON l.id = d.doc_id)
        |SELECT cluster_id, count(*) n_docs, CAST(sum(CASE WHEN rn=1 THEN doc_id END) AS BIGINT) keep_id
        |FROM members GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    // overlap-coefficient twin in the q23/q25 inverted-index equi-join
    // form (exactly equivalent: overlap ≥ 0.8 > 0 ⇒ ≥ 1 shared shingle,
    // and |A∩B| = per-pair match count over distinct shingles). The old
    // all-pairs list_intersect form was 290 s at sf0.1; this is seconds.
    "q44_overlap_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM documents),
        |e AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM t),
        |p AS (
        |  SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |         any_value(a.n) na, any_value(b.n) nb
        |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, round(CAST(inter AS DOUBLE)/least(na, nb),4) overlap
        |FROM p WHERE CAST(inter AS DOUBLE)/least(na, nb) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // q262–q266 (r9): the representative-grain class-pair twins of the
    // raw enumerators — same pair SQL as q23/q24/q25/q44/q26 but over
    // one representative per exact-duplicate class (min id per text /
    // per embedding), with class multiplicities and the implied
    // doc-pair mass joined back on the representative ids.
    "q262_minhash_classes" ->
      """WITH cls AS (
        |  SELECT min(doc_id) doc_id, CAST(count(*) AS BIGINT) m, text
        |  FROM documents GROUP BY text),
        |t AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM cls),
        |e AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM t),
        |p AS (
        |  SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |         any_value(a.n) na, any_value(b.n) nb
        |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |q AS (
        |  SELECT id_a, id_b, round(CAST(inter AS DOUBLE)/(na + nb - inter),4) jaccard
        |  FROM p WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.8)
        |SELECT q.id_a, q.id_b, q.jaccard, ca.m m_a, cb.m m_b,
        |       CAST(ca.m * cb.m AS BIGINT) n_doc_pairs
        |FROM q JOIN cls ca ON ca.doc_id = q.id_a
        |       JOIN cls cb ON cb.doc_id = q.id_b
        |ORDER BY q.id_a, q.id_b""".stripMargin,

    "q263_simhash_classes" ->
      """WITH cls AS (
        |  SELECT min(doc_id) doc_id, CAST(count(*) AS BIGINT) m, text
        |  FROM documents GROUP BY text),
        |t AS (
        |  SELECT doc_id, string_split(text, ' ') toks FROM cls),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(toks, tok -> CAST(list_sum(list_transform(range(1, 16),
        |      i -> CAST(strpos('0123456789abcdef', md5(tok)[i]) - 1 AS BIGINT)
        |           * (CAST(1 AS BIGINT) << (4 * (15 - i))))) AS BIGINT)) hs
        |  FROM t),
        |s AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 60), j ->
        |      CASE WHEN 2 * len(list_filter(hs, hv -> (hv >> j) & 1 = 1)) > len(hs)
        |           THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) sig
        |  FROM h),
        |bands AS (
        |  SELECT doc_id, sig, b, (sig >> (b * 15)) & 32767 ck
        |  FROM s CROSS JOIN (SELECT unnest([0, 1, 2, 3]) b) bi),
        |cand AS (
        |  SELECT DISTINCT x.doc_id id_a, y.doc_id id_b, x.sig sa, y.sig sb
        |  FROM bands x JOIN bands y ON x.b = y.b AND x.ck = y.ck
        |  WHERE x.doc_id < y.doc_id),
        |q AS (
        |  SELECT id_a, id_b, bit_count(xor(sa, sb)) hamming
        |  FROM cand WHERE bit_count(xor(sa, sb)) <= 3)
        |SELECT q.id_a, q.id_b, q.hamming, ca.m m_a, cb.m m_b,
        |       CAST(ca.m * cb.m AS BIGINT) n_doc_pairs
        |FROM q JOIN cls ca ON ca.doc_id = q.id_a
        |       JOIN cls cb ON cb.doc_id = q.id_b
        |ORDER BY q.id_a, q.id_b""".stripMargin,

    "q264_ngram_classes" ->
      """WITH cls AS (
        |  SELECT min(doc_id) doc_id, CAST(count(*) AS BIGINT) m, text
        |  FROM documents GROUP BY text),
        |t AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM cls),
        |e AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM t),
        |p AS (
        |  SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |         any_value(a.n) na, any_value(b.n) nb
        |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |q AS (
        |  SELECT id_a, id_b, round(CAST(inter AS DOUBLE)/(na + nb - inter),4) jaccard
        |  FROM p WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.5)
        |SELECT q.id_a, q.id_b, q.jaccard, ca.m m_a, cb.m m_b,
        |       CAST(ca.m * cb.m AS BIGINT) n_doc_pairs
        |FROM q JOIN cls ca ON ca.doc_id = q.id_a
        |       JOIN cls cb ON cb.doc_id = q.id_b
        |ORDER BY q.id_a, q.id_b""".stripMargin,

    "q265_overlap_classes" ->
      """WITH cls AS (
        |  SELECT min(doc_id) doc_id, CAST(count(*) AS BIGINT) m, text
        |  FROM documents GROUP BY text),
        |t AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM cls),
        |e AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM t),
        |p AS (
        |  SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |         any_value(a.n) na, any_value(b.n) nb
        |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |q AS (
        |  SELECT id_a, id_b, round(CAST(inter AS DOUBLE)/least(na, nb),4) overlap
        |  FROM p WHERE CAST(inter AS DOUBLE)/least(na, nb) >= 0.8)
        |SELECT q.id_a, q.id_b, q.overlap, ca.m m_a, cb.m m_b,
        |       CAST(ca.m * cb.m AS BIGINT) n_doc_pairs
        |FROM q JOIN cls ca ON ca.doc_id = q.id_a
        |       JOIN cls cb ON cb.doc_id = q.id_b
        |ORDER BY q.id_a, q.id_b""".stripMargin,

    "q266_embed_classes" ->
      """WITH cls AS (
        |  SELECT min(vec_id) vec_id, CAST(count(*) AS BIGINT) m, embedding
        |  FROM embeddings GROUP BY embedding),
        |q AS (
        |  SELECT a.vec_id id_a, b.vec_id id_b,
        |         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])),6) sim
        |  FROM cls a JOIN cls b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.35)
        |SELECT q.id_a, q.id_b, q.sim, ca.m m_a, cb.m m_b,
        |       CAST(ca.m * cb.m AS BIGINT) n_doc_pairs
        |FROM q JOIN cls ca ON ca.vec_id = q.id_a
        |       JOIN cls cb ON cb.vec_id = q.id_b
        |ORDER BY q.id_a, q.id_b""".stripMargin,

    // q268 (r10): SemDeDup within-cell pairs at the class grain under a
    // deterministic cell tiling — per-label floor(S/N) centroids on the
    // q152 integer grid (every dot/norm exact in double, sqrt correctly
    // rounded, so assignment AND pair cosines are bit-identical to the
    // Spark side); argmax tie → larger cell index (CellArgMax's rule).
    "q268_semantic_classes" ->
      """WITH qi AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) ql
        |  FROM embeddings),
        |cpos0 AS (
        |  SELECT label, unnest(list_transform(ql, (x, i) -> {'pos': i, 'v': x}),
        |                       recursive := true)
        |  FROM qi),
        |cent AS (
        |  SELECT label, list(CAST(floor(CAST(s AS DOUBLE) / n) AS DOUBLE)
        |                     ORDER BY pos) c
        |  FROM (SELECT label, pos, CAST(sum(v) AS BIGINT) s, count(*) n
        |        FROM cpos0 GROUP BY 1, 2)
        |  GROUP BY label),
        |cells AS (
        |  SELECT c, CAST(row_number() OVER (ORDER BY label) - 1 AS INT) cell
        |  FROM cent),
        |cls AS (
        |  SELECT min(vec_id) vec_id, CAST(count(*) AS BIGINT) m, embedding
        |  FROM embeddings GROUP BY embedding),
        |clsq AS (
        |  SELECT vec_id, m, qv FROM (
        |    SELECT vec_id, m,
        |           list_transform(embedding,
        |             x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE)) qv
        |    FROM cls)
        |  -- zero-quantizing reps excluded on BOTH sides (the Spark
        |  -- query filters them identically): zero-norm cosine is
        |  -- engine-defined, so neither engine's convention may reach
        |  -- the tau filter or the assignment argmax
        |  WHERE len(list_filter(qv, x -> x <> 0.0)) > 0),
        |assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT clsq.vec_id, cells.cell,
        |           row_number() OVER (PARTITION BY clsq.vec_id
        |             ORDER BY list_cosine_similarity(clsq.qv, cells.c) DESC,
        |                      cells.cell DESC) rn
        |    FROM clsq CROSS JOIN cells) WHERE rn = 1),
        |base AS (
        |  SELECT clsq.vec_id, clsq.m, clsq.qv, a.cell
        |  FROM clsq JOIN assign a USING (vec_id)),
        |p AS (
        |  SELECT a.vec_id id_a, b.vec_id id_b,
        |         round(list_cosine_similarity(a.qv, b.qv), 6) sim,
        |         a.m m_a, b.m m_b
        |  FROM base a JOIN base b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.qv, b.qv) >= 0.35)
        |SELECT id_a, id_b, sim, m_a, m_b, CAST(m_a * m_b AS BIGINT) n_doc_pairs
        |FROM p ORDER BY id_a, id_b""".stripMargin,

    // q269/q270 (r11): product quantization under the q268 recipe —
    // codebooks are the HALVES of the per-label floor(S/N) grid
    // centroids (m=2 subspaces, ksub=|labels| codewords), so encode
    // distances, ADC dots, reconstruction norms and query norms are all
    // sums of products of <=6.4e5-magnitude integers over <=64 terms:
    // exact in double in any order on both engines. Encode ties ->
    // smaller codeword index (PqEncode's strict-< rule, mirrored in
    // ORDER BY dist, code); squared-L2 via the inner-product identity
    // |a-b|^2 = a.a + b.b - 2 a.b (every term exact).
    "q269_pq_distortion" ->
      """WITH qi AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) ql
        |  FROM embeddings),
        |cpos0 AS (
        |  SELECT label, unnest(list_transform(ql, (x, i) -> {'pos': i, 'v': x}),
        |                       recursive := true)
        |  FROM qi),
        |cent AS (
        |  SELECT label, list(CAST(floor(CAST(s AS DOUBLE) / n) AS DOUBLE)
        |                     ORDER BY pos) c
        |  FROM (SELECT label, pos, CAST(sum(v) AS BIGINT) s, count(*) n
        |        FROM cpos0 GROUP BY 1, 2)
        |  GROUP BY label),
        |cells AS (
        |  SELECT c, CAST(row_number() OVER (ORDER BY label) - 1 AS INT) code
        |  FROM cent),
        |dims AS (SELECT len(c) dim, len(c) // 2 dsub FROM cells LIMIT 1),
        |book AS (
        |  SELECT code, 0 sub, c[1:(SELECT dsub FROM dims)] cw FROM cells
        |  UNION ALL
        |  SELECT code, 1 sub, c[(SELECT dsub FROM dims)+1:(SELECT dim FROM dims)] cw
        |  FROM cells),
        |cls AS (
        |  SELECT min(vec_id) vec_id, min(label) AS label, count(*) m, embedding
        |  FROM embeddings GROUP BY embedding),
        |reps AS (
        |  SELECT vec_id, label, m,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE)) qv
        |  FROM cls),
        |rsub AS (
        |  SELECT vec_id, 0 sub, qv[1:(SELECT dsub FROM dims)] sv FROM reps
        |  UNION ALL
        |  SELECT vec_id, 1 sub, qv[(SELECT dsub FROM dims)+1:(SELECT dim FROM dims)] sv
        |  FROM reps),
        |enc AS (
        |  SELECT vec_id, sub, dist FROM (
        |    SELECT r.vec_id, r.sub,
        |           list_inner_product(r.sv, r.sv) + list_inner_product(b.cw, b.cw)
        |             - 2 * list_inner_product(r.sv, b.cw) dist,
        |           row_number() OVER (PARTITION BY r.vec_id, r.sub
        |             ORDER BY list_inner_product(r.sv, r.sv)
        |                      + list_inner_product(b.cw, b.cw)
        |                      - 2 * list_inner_product(r.sv, b.cw),
        |                      b.code) rn
        |    FROM rsub r JOIN book b ON b.sub = r.sub) WHERE rn = 1),
        |errs AS (
        |  SELECT vec_id, CAST(sum(dist) AS BIGINT) sq_err
        |  FROM enc GROUP BY vec_id)
        |SELECT r.label, count(*) n_classes, CAST(sum(r.m) AS BIGINT) n_docs,
        |       CAST(sum(e.sq_err) AS BIGINT) sum_sq_err
        |FROM reps r JOIN errs e USING (vec_id)
        |GROUP BY r.label ORDER BY r.label""".stripMargin,

    "q270_pq_adc" ->
      """WITH qi AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) ql
        |  FROM embeddings),
        |cpos0 AS (
        |  SELECT label, unnest(list_transform(ql, (x, i) -> {'pos': i, 'v': x}),
        |                       recursive := true)
        |  FROM qi),
        |cent AS (
        |  SELECT label, list(CAST(floor(CAST(s AS DOUBLE) / n) AS DOUBLE)
        |                     ORDER BY pos) c
        |  FROM (SELECT label, pos, CAST(sum(v) AS BIGINT) s, count(*) n
        |        FROM cpos0 GROUP BY 1, 2)
        |  GROUP BY label),
        |cells AS (
        |  SELECT c, CAST(row_number() OVER (ORDER BY label) - 1 AS INT) code
        |  FROM cent),
        |dims AS (SELECT len(c) dim, len(c) // 2 dsub FROM cells LIMIT 1),
        |book AS (
        |  SELECT code, 0 sub, c[1:(SELECT dsub FROM dims)] cw FROM cells
        |  UNION ALL
        |  SELECT code, 1 sub, c[(SELECT dsub FROM dims)+1:(SELECT dim FROM dims)] cw
        |  FROM cells),
        |reps AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE)) qv
        |  FROM (SELECT min(vec_id) vec_id, embedding
        |        FROM embeddings GROUP BY embedding)),
        |rsub AS (
        |  SELECT vec_id, 0 sub, qv[1:(SELECT dsub FROM dims)] sv FROM reps
        |  UNION ALL
        |  SELECT vec_id, 1 sub, qv[(SELECT dsub FROM dims)+1:(SELECT dim FROM dims)] sv
        |  FROM reps),
        |enc AS (
        |  SELECT vec_id, sub, cw FROM (
        |    SELECT r.vec_id, r.sub, b.cw,
        |           row_number() OVER (PARTITION BY r.vec_id, r.sub
        |             ORDER BY list_inner_product(r.sv, r.sv)
        |                      + list_inner_product(b.cw, b.cw)
        |                      - 2 * list_inner_product(r.sv, b.cw),
        |                      b.code) rn
        |    FROM rsub r JOIN book b ON b.sub = r.sub) WHERE rn = 1),
        |rnorm AS (
        |  SELECT vec_id id, sqrt(sum(list_inner_product(cw, cw))) rn
        |  FROM enc GROUP BY vec_id),
        |q AS (SELECT vec_id, qv FROM reps WHERE vec_id % 97 = 0),
        |qn AS (SELECT vec_id, sqrt(list_inner_product(qv, qv)) qn FROM q),
        |qsub AS (
        |  SELECT vec_id, 0 sub, qv[1:(SELECT dsub FROM dims)] sv FROM q
        |  UNION ALL
        |  SELECT vec_id, 1 sub, qv[(SELECT dsub FROM dims)+1:(SELECT dim FROM dims)] sv
        |  FROM q),
        |dots AS (
        |  SELECT qs.vec_id query_id, e.vec_id id,
        |         sum(list_inner_product(qs.sv, e.cw)) dot
        |  FROM qsub qs JOIN enc e ON e.sub = qs.sub AND e.vec_id <> qs.vec_id
        |  GROUP BY 1, 2),
        |sims AS (
        |  SELECT d.query_id, d.id,
        |         round(CASE WHEN qn.qn * r.rn = 0 THEN 0.0
        |                    ELSE d.dot / (qn.qn * r.rn) END, 6) sim
        |  FROM dots d
        |  JOIN qn ON qn.vec_id = d.query_id
        |  JOIN rnorm r ON r.id = d.id),
        |ranked AS (
        |  SELECT query_id, id, sim,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |           ORDER BY sim DESC, id) AS INT) rk
        |  FROM sims)
        |SELECT query_id, id, sim, rk FROM ranked WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin,

    "q45_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
        |spans AS (
        |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+7],' ') s
        |  FROM t, unnest(range(1, greatest(len(toks)-7,0)+1)) AS u(i)
        |  WHERE len(toks) >= 8)
        |SELECT count(*) n_dup_spans, CAST(coalesce(sum(nd),0) AS BIGINT) n_occurrences
        |FROM (SELECT s, count(DISTINCT doc_id) nd FROM spans GROUP BY s HAVING count(DISTINCT doc_id) > 1) x""".stripMargin,

    "q46_idf_terms" ->
      """WITH df AS (
        |  SELECT s token, count(DISTINCT doc_id) dfreq
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) s FROM documents) t
        |  GROUP BY s),
        |n AS (SELECT count(*) nd FROM documents)
        |SELECT token, dfreq, round(ln(CAST(nd AS DOUBLE)/dfreq), 4) idf
        |FROM df, n ORDER BY dfreq DESC, token LIMIT 10""".stripMargin,

    "q48_quantile_band" ->
      """WITH b AS (SELECT quantile_cont(n_chars, 0.10) lo, quantile_cont(n_chars, 0.90) hi FROM documents)
        |SELECT source, count(*) n_kept, round(avg(CAST(n_chars AS DOUBLE)),4) avg_chars
        |FROM documents, b WHERE n_chars >= lo AND n_chars <= hi
        |GROUP BY source ORDER BY source""".stripMargin,

    "q49_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text,' ') toks FROM documents),
        |r AS (
        |  SELECT source,
        |         1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks)-2+1),
        |             i -> array_to_string(toks[i:i+2],' ')))) AS DOUBLE) / (len(toks)-2) rep
        |  FROM t WHERE len(toks) >= 3)
        |SELECT source, round(avg(rep),6) avg_rep, count(*) n_docs
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q50_quality_filter" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text,' ') toks,
        |         CAST(len(list_filter(string_split(lower(text),' '),
        |           x -> x IN ('the','of','and','a','to','in','is','it','that','for'))) AS DOUBLE) stop_hits
        |  FROM documents),
        |f AS (
        |  SELECT lang,
        |         (len(toks) BETWEEN 10 AND 1000) AND (stop_hits / len(toks) >= 0.05) AND
        |         (1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks)-2+1),
        |             i -> array_to_string(toks[i:i+2],' ')))) AS DOUBLE) / greatest(len(toks)-2,1) <= 0.2) pass
        |  FROM t WHERE len(toks) >= 3)
        |SELECT lang, count(*) n_docs, count(*) FILTER (WHERE pass) n_pass,
        |       round(CAST(count(*) FILTER (WHERE pass) AS DOUBLE)/count(*),4) pass_rate
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin,

    // decontamination twin: same 8-gram shingle semantics as Spark's
    // shingleTable (short docs shingle to the whole doc), benchmark =
    // doc_id % 7 = 0 slice, corpus = the rest minus n-gram collisions
    "q51_decontaminate" ->
      """WITH sh AS MATERIALIZED (
        |  SELECT doc_id, doc_id % 7 = 0 is_bench,
        |         list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-7,1)+1),
        |             i -> array_to_string(string_split(text,' ')[i:i+7], ' '))) sh
        |  FROM documents),
        |bench AS MATERIALIZED (
        |  SELECT DISTINCT unnest(sh) s FROM sh WHERE is_bench),
        |cont AS (
        |  SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, unnest(sh) s FROM sh WHERE NOT is_bench) c
        |  JOIN bench USING (s))
        |SELECT source, count(*) n_kept, round(avg(CAST(n_chars AS DOUBLE)),4) avg_chars
        |FROM documents d
        |WHERE d.doc_id % 7 <> 0
        |  AND NOT EXISTS (SELECT 1 FROM cont WHERE cont.doc_id = d.doc_id)
        |GROUP BY source ORDER BY source""".stripMargin,

    // packing twin: one global running token sum in doc_id order, then
    // the same floor-division chunk arithmetic (nt >= 1 always, so the
    // cum-1 term never goes negative)
    "q52_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, source, CAST(len(string_split(text,' ')) AS BIGINT) nt
        |  FROM documents),
        |c AS (
        |  SELECT source, nt,
        |         sum(nt) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum
        |  FROM t)
        |SELECT source, CAST((cum-1)//128 - (cum-nt)//128 + 1 AS BIGINT) n_seqs,
        |       count(*) n_docs, CAST(sum(nt) AS BIGINT) tokens
        |FROM c GROUP BY source, n_seqs ORDER BY source, n_seqs""".stripMargin,

    // no-split bin-packing twin: next-fit is a running-fill recurrence
    // (not prefix-sum decomposable), replayed exactly by a recursive
    // CTE stepping rank-by-rank within each 64-doc bucket — all buckets
    // advance in parallel per recursion step, depth = bucket size
    "q74_pack_bins" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) nt,
        |         CAST(floor(doc_id / 64.0) AS BIGINT) b,
        |         row_number() OVER (PARTITION BY CAST(floor(doc_id / 64.0) AS BIGINT)
        |                            ORDER BY doc_id) rk
        |  FROM documents),
        |-- state carried per step mirrors packBins exactly: `assigned` is the
        |-- doc's bin, `bin`/`fill`/`occ` the post-doc open-bin state. occ is
        |-- the EXPLICIT occupancy flag (packBins' nonEmpty) — inferring it
        |-- from fill > 0 would co-bin an oversize doc with zero-token
        |-- predecessors where packBins isolates it.
        |s AS (
        |  SELECT b, rk, doc_id, nt,
        |         CAST(0 AS BIGINT) assigned,
        |         CAST(CASE WHEN nt > 64 THEN 1 ELSE 0 END AS BIGINT) bin,
        |         CASE WHEN nt > 64 THEN CAST(0 AS BIGINT) ELSE greatest(nt, 0) END fill,
        |         nt <= 64 occ
        |  FROM d WHERE rk = 1
        |  UNION ALL
        |  SELECT d.b, d.rk, d.doc_id, d.nt,
        |         s.bin + CASE WHEN s.occ AND (d.nt > 64 OR s.fill + greatest(d.nt, 0) > 64)
        |                      THEN 1 ELSE 0 END,
        |         s.bin + CASE WHEN s.occ AND (d.nt > 64 OR s.fill + greatest(d.nt, 0) > 64)
        |                      THEN 1 ELSE 0 END
        |               + CASE WHEN d.nt > 64 THEN 1 ELSE 0 END,
        |         CASE WHEN d.nt > 64 THEN CAST(0 AS BIGINT)
        |              WHEN s.occ AND s.fill + greatest(d.nt, 0) > 64 THEN greatest(d.nt, 0)
        |              ELSE s.fill + greatest(d.nt, 0) END,
        |         d.nt <= 64
        |  FROM s JOIN d ON d.b = s.b AND d.rk = s.rk + 1),
        |bins AS (
        |  SELECT b * 128 + assigned bin_id, sum(nt) fill, count(*) nd,
        |         max(CASE WHEN nt > 64 THEN 1 ELSE 0 END) ov
        |  FROM s GROUP BY 1)
        |SELECT count(*) n_bins, CAST(sum(nd) AS BIGINT) n_docs,
        |       CAST(sum(fill) AS BIGINT) total_tokens,
        |       CAST(sum(ov) AS BIGINT) n_oversize,
        |       round(avg(CAST(fill AS DOUBLE)), 4) avg_fill
        |FROM bins""".stripMargin,

    // mixture twin: identical double arithmetic (w::DOUBLE keeps DuckDB
    // off decimal math) and the same Knuth-mixer integer sampler
    "q53_source_mix" ->
      """WITH t AS (
        |  SELECT doc_id, source, CAST(len(string_split(text,' ')) AS BIGINT) nt
        |  FROM documents WHERE source IN ('src0','src1','src2','src7')),
        |tot AS (
        |  SELECT source, CAST(sum(nt) AS BIGINT) tok,
        |         CASE source WHEN 'src0' THEN 0.4::DOUBLE WHEN 'src1' THEN 0.3::DOUBLE
        |                     WHEN 'src2' THEN 0.2::DOUBLE ELSE 0.1::DOUBLE END w
        |  FROM t GROUP BY source),
        |bgt AS (SELECT min(tok / w) budget FROM tot),
        |thr AS (SELECT source, CAST(round(w * budget / tok * 1000000) AS BIGINT) thr
        |        FROM tot, bgt),
        |kept AS (
        |  SELECT t.* FROM t JOIN thr USING (source)
        |  WHERE (doc_id * 2654435761) % 1000000 < thr)
        |SELECT source, count(*) n_docs, CAST(sum(nt) AS BIGINT) n_tokens,
        |       round(CAST(sum(nt) AS DOUBLE) / sum(sum(nt)) OVER (), 4) AS share
        |FROM kept GROUP BY source ORDER BY source""".stripMargin,

    // epoch-shuffle twin: identical integer mixer (pre-mod keeps the
    // product in int64 range in both engines), same (key, id) total order
    "q54_epoch_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id, source,
        |         ((doc_id + 3 * 10007) % 1000003) * 2654435761 % 1000000007 AS shuf_key
        |  FROM documents)
        |SELECT doc_id, source, shuf_key,
        |       CAST(row_number() OVER (ORDER BY shuf_key, doc_id) AS INT) rk
        |FROM k ORDER BY shuf_key, doc_id LIMIT 10""".stripMargin,

    // 64-token chunks, 16-token overlap ⇒ starts 1, 49, 97, … while
    // start <= max(n-16, 1); list slice clamps, so the tail chunk is short
    "q57_chunk_stats" ->
      """WITH t AS (SELECT source, string_split(text,' ') toks FROM documents),
        |c AS (
        |  SELECT source, len(list_slice(toks, s, s + 63)) ct
        |  FROM (SELECT source, toks,
        |               unnest(range(1, greatest(len(toks) - 16, 1) + 1, 48)) s
        |        FROM t))
        |SELECT source, count(*) n_chunks, CAST(sum(ct) AS BIGINT) chunk_tokens,
        |       count(*) FILTER (WHERE ct = 64) full_chunks
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    // the same low-residue ⊕ high-bits mixer as Curation.bernoulliSample
    // (salt 7, 10%) — the proof the sample is engine-independent
    "q58_det_sample" ->
      """SELECT source, count(*) n_docs,
        |       CAST(sum(len(string_split(text,' '))) AS BIGINT) tokens
        |FROM documents
        |WHERE ((doc_id % 1000003) * 2654435761 + (doc_id >> 16) * 7919 + 7 * 10007)
        |      % 1000000007 * 2654435761 % 1000000007 % 1000000 < 100000
        |GROUP BY source ORDER BY source""".stripMargin,

    // moments from EXACT integer power sums; x^1.5 written v*sqrt(v)
    // (sqrt is IEEE-exact, pow is not) — bit-identical arithmetic to Spark
    "q59_moments" ->
      """WITH a AS (
        |  SELECT source, count(*) n,
        |         CAST(sum(n_chars) AS BIGINT) s1,
        |         CAST(sum(n_chars*n_chars) AS BIGINT) s2,
        |         CAST(sum(n_chars*n_chars*n_chars) AS BIGINT) s3
        |  FROM documents GROUP BY source),
        |m AS (SELECT source, n, s1/n m1, s2/n m2, s3/n m3 FROM a)
        |SELECT source, n, round(m1, 6) mean,
        |       round(m2 - m1*m1, 6) pvar,
        |       round(CASE WHEN m2 - m1*m1 > 0 THEN
        |         (m3 - 3*m1*m2 + 2*m1*m1*m1) / ((m2 - m1*m1) * sqrt(m2 - m1*m1))
        |       END, 6) skew
        |FROM m ORDER BY source""".stripMargin,

    // scrub/normalize twin: same injected PII, same regex chain — NOTE
    // the 'g' flag (DuckDB replaces first match only without it; Spark
    // replaces all), and the double-escaped \d inside the Scala string
    "q73_scrub_normalize" ->
      """WITH b AS (
        |  SELECT source,
        |         CASE WHEN doc_id % 3 = 0
        |              THEN text || ' reach me: john.doe+spam@mail.example.org or 12345678901'
        |              ELSE text END s0
        |  FROM documents),
        |r AS (
        |  SELECT source, s0,
        |         regexp_replace(regexp_replace(s0,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |           '\d{7,}', '<NUM>', 'g') s1
        |  FROM b)
        |SELECT source, count(*) n_docs,
        |       count(CASE WHEN s1 <> s0 THEN 1 END) n_redacted,
        |       CAST(sum(length(s1)) AS BIGINT) scrubbed_len,
        |       CAST(sum(length(trim(regexp_replace(regexp_replace(lower(s1),
        |         '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))) AS BIGINT) normalized_len
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    // cap ordering replays the two-term mixer (low residue + high bits)
    // so residue classes never tie as a block — mirrors Curation.mixedKey
    "q66_source_cap" ->
      """WITH r AS (
        |  SELECT source, text, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY ((doc_id % 1000003) * 2654435761 + (doc_id >> 16) * 7919)
        |             % 1000000007 * 2654435761 % 1000000007, doc_id) rk
        |  FROM documents)
        |SELECT source, count(*) n_docs,
        |       CAST(sum(len(string_split(text,' '))) AS BIGINT) tokens
        |FROM r WHERE rk <= 40 GROUP BY source ORDER BY source""".stripMargin,

    // per-benchmark-item leak counts — same 8-gram shingle semantics as
    // q51's purge, LIMIT is deterministic via (n_docs DESC, bench_id)
    "q68_contamination_report" ->
      """WITH bench AS (SELECT doc_id, string_split(text,' ') toks FROM documents WHERE doc_id % 7 = 0),
        |corpus AS (SELECT doc_id, string_split(text,' ') toks FROM documents WHERE doc_id % 7 <> 0),
        |bsh AS (SELECT doc_id bench_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks)-7,1)+1),
        |        i -> array_to_string(toks[i:i+7], ' ')))) s FROM bench),
        |csh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks)-7,1)+1),
        |        i -> array_to_string(toks[i:i+7], ' ')))) s FROM corpus)
        |SELECT bench_id, count(DISTINCT doc_id) n_docs
        |FROM bsh JOIN csh USING (s)
        |GROUP BY bench_id ORDER BY n_docs DESC, bench_id LIMIT 20""".stripMargin,

    // unigram NLL: ln over the SAME double division in both engines;
    // round(4) absorbs summation-order ulps
    "q69_unigram_nll" ->
      """WITH tok AS (SELECT doc_id, source, unnest(string_split(text,' ')) t FROM documents),
        |freq AS (SELECT t, count(*) c FROM tok GROUP BY t),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) n FROM freq),
        |scored AS (
        |  SELECT doc_id, source, avg(-ln(c / n)) nll
        |  FROM tok JOIN freq USING (t), tot
        |  GROUP BY doc_id, source)
        |SELECT source, count(*) n_docs, round(avg(nll), 4) avg_nll
        |FROM scored GROUP BY source ORDER BY source""".stripMargin,

    // boilerplate twin: 3-grams rebuilt positionally from string_split
    // (1-based list indexing), doc frequency over DISTINCT doc ids,
    // integer heavy-doc compare (hits*3 > npos) — no float boundary
    "q75_boilerplate" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split(text,' ') arr FROM documents),
        |pos AS (
        |  SELECT doc_id, source, arr, unnest(range(len(arr)-2)) i
        |  FROM toks WHERE len(arr) >= 3),
        |ng AS (
        |  SELECT doc_id, source, arr[i+1]||' '||arr[i+2]||' '||arr[i+3] ng FROM pos),
        |bp AS (
        |  SELECT ng FROM (SELECT ng, count(DISTINCT doc_id) dfc FROM ng GROUP BY ng)
        |  WHERE dfc >= 3),
        |cov AS (
        |  SELECT n.doc_id, any_value(n.source) src, count(*) npos, count(b.ng) hits
        |  FROM ng n LEFT JOIN bp b USING (ng) GROUP BY n.doc_id)
        |SELECT src source, count(*) n_docs, CAST(sum(npos) AS BIGINT) positions,
        |       CAST(sum(hits) AS BIGINT) bp_positions,
        |       round(avg(hits*1.0/npos), 6) avg_cov,
        |       count(CASE WHEN hits*3 > npos THEN 1 END) heavy_docs
        |FROM cov GROUP BY src ORDER BY source""".stripMargin,

    // heavy-hitter twin: exact counts + the CMS guarantees as literal
    // trues (q31's reshape); integer threshold cnt*10000 > total*335
    "q76_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text,' ')) tok FROM documents),
        |c AS (SELECT tok token, count(*) cnt FROM t GROUP BY tok),
        |n AS (SELECT CAST(sum(cnt) AS BIGINT) total FROM c)
        |SELECT token, cnt, true est_ge, true est_within
        |FROM c, n WHERE cnt*10000 > total*335
        |ORDER BY cnt DESC, token""".stripMargin,

    // priority-sampling twin: the same two-term id mixer as q58/q66,
    // then the fixed-point priority ((u+1)*1e6) // n_chars — selection
    // replayed entirely in integer arithmetic
    "q77_weighted_sample" ->
      """WITH k AS (
        |  SELECT doc_id, source, n_chars,
        |    ((((doc_id % 1000003) * 2654435761 + (doc_id >> 16) * 7919 + 11 * 10007)
        |       % 1000000007 * 2654435761) % 1000000007) % 1000000 AS u
        |  FROM documents)
        |SELECT doc_id, source, n_chars, ((u + 1) * 1000000) // n_chars AS pkey
        |FROM k ORDER BY pkey, doc_id LIMIT 25""".stripMargin,

    // quantile twin: exact interpolated median (quantile_cont ==
    // Spark's percentile definition, rounded 4 dp) + the sketch's
    // rank-bound as a literal true
    "q78_quantile_sketch" ->
      """SELECT event_type, count(value) n, round(quantile_cont(value, 0.5), 4) p50,
        |       true approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // SCD2 twin: lag-compress consecutive duplicate states, then
    // version + validity windows; durations in whole seconds via
    // integer µs arithmetic (epoch_us // 1000000 — no float)
    "q79_scd2" ->
      """WITH base AS (
        |  SELECT user_id, ts, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) prev
        |  FROM events),
        |chg AS (
        |  SELECT user_id, ts, event_type FROM base
        |  WHERE prev IS NULL OR prev <> event_type),
        |ver AS (
        |  SELECT user_id, event_type, ts vf,
        |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts) vt,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts) ver_no
        |  FROM chg)
        |SELECT event_type, count(*) n_versions,
        |       count(CASE WHEN vt IS NULL THEN 1 END) n_current,
        |       CAST(sum(CASE WHEN vt IS NOT NULL
        |                THEN (epoch_us(vt) - epoch_us(vf)) // 1000000 END) AS BIGINT)
        |         closed_seconds,
        |       max(ver_no) max_version
        |FROM ver GROUP BY event_type ORDER BY event_type""".stripMargin,

    // funnel twin: the relational min-chain — first step-i match
    // strictly after the step-(i-1) match — provably equal to the
    // greedy earliest-completion scan (taking the first occurrence of
    // each step is optimal)
    "q80_funnel" ->
      """WITH t1 AS (SELECT user_id, min(ts) ts FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.ts) ts FROM events e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'view' AND e.ts > t1.ts GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(e.ts) ts FROM events e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'click' AND e.ts > t2.ts GROUP BY e.user_id),
        |t4 AS (SELECT e.user_id, min(e.ts) ts FROM events e
        |       JOIN t3 ON e.user_id = t3.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > t3.ts GROUP BY e.user_id),
        |counts AS (
        |  SELECT 1 step_idx, 'signup' step, count(*) n_users FROM t1
        |  UNION ALL SELECT 2, 'view', count(*) FROM t2
        |  UNION ALL SELECT 3, 'click', count(*) FROM t3
        |  UNION ALL SELECT 4, 'purchase', count(*) FROM t4)
        |SELECT step_idx, step, n_users,
        |       round(CAST(n_users AS DOUBLE) /
        |         NULLIF((SELECT n_users FROM counts WHERE step_idx = 1), 0), 6) conv
        |FROM counts ORDER BY step_idx""".stripMargin,

    // cohort twin: window-min first-seen per user, Monday week
    // truncation on both stamps, integer day difference // 7
    "q81_cohort_retention" ->
      """WITH a AS (
        |  SELECT user_id,
        |         CAST(date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS DATE) cohort_week,
        |         CAST(date_trunc('week', ts) AS DATE) wk
        |  FROM events),
        |d AS (SELECT DISTINCT user_id, cohort_week, (wk - cohort_week) // 7 week_offset FROM a)
        |SELECT cohort_week, week_offset, count(*) n_users
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // point-in-time twin: the tiling range join (vf <= ts < vt) over the
    // lag-compressed non-purchase state dimension — provably equal to
    // the engine's single as-of join because SCD2 versions tile each
    // key's timeline
    "q83_pit_enrichment" ->
      """WITH base AS (
        |  SELECT user_id, ts, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) prev
        |  FROM events WHERE event_type <> 'purchase'),
        |ver AS (
        |  SELECT user_id, event_type, ts vf,
        |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts) vt
        |  FROM base WHERE prev IS NULL OR prev <> event_type),
        |p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT p.value, v.event_type st FROM p
        |      LEFT JOIN ver v ON p.user_id = v.user_id
        |        AND v.vf <= p.ts AND (v.vt IS NULL OR p.ts < v.vt))
        |SELECT coalesce(st, 'none') state, count(*) n, round(sum(value), 2) sum_v
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    // robust-outlier twin: two median passes (median, then MAD), then
    // the 3-MAD screen — both engines interpolate the even-count median
    "q89_robust_outliers" ->
      """WITH med AS (
        |  SELECT event_type, median(value) m FROM events GROUP BY event_type),
        |dev AS (
        |  SELECT e.event_type, e.value, med.m, abs(e.value - med.m) ad
        |  FROM events e JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type, median(ad) md FROM dev GROUP BY event_type)
        |SELECT d.event_type, round(any_value(d.m), 4) AS med,
        |       round(any_value(mad.md), 4) AS mad,
        |       count(CASE WHEN d.ad > 3*mad.md THEN 1 END) AS n_outliers,
        |       count(*) AS n
        |FROM dev d JOIN mad USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    // tf-idf pair twin: the same postings algebra (tf, ln(N/df)+1 idf,
    // L2 norms, term-join dot product) written relationally
    "q90_tfidf_pairs" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE source = 'src0'),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) term FROM d),
        |tf AS (SELECT doc_id, term, count(*) tf FROM tok
        |       WHERE length(term) > 0 GROUP BY 1, 2),
        |idf AS (SELECT term, ln((SELECT count(*) FROM d)*1.0/count(*)) + 1 AS idf
        |        FROM tf GROUP BY term),
        |w AS (SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS w
        |      FROM tf JOIN idf USING (term)),
        |nrm AS (SELECT doc_id, sqrt(sum(w*w)) AS nn FROM w GROUP BY doc_id),
        |p AS (SELECT a.doc_id d1, b.doc_id d2, sum(a.w*b.w) dot
        |      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT d1, d2, round(dot/(x.nn*y.nn), 6) AS cosine
        |FROM p JOIN nrm x ON p.d1 = x.doc_id JOIN nrm y ON p.d2 = y.doc_id
        |ORDER BY cosine DESC, d1, d2 LIMIT 10""".stripMargin,

    // q25's exact 3-gram Jaccard pairs rolled up to unordered source
    // cells; possible-pair denominators are exact integers
    "q140_source_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM documents),
        |e AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM t),
        |p AS (
        |  SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |         any_value(a.n) na, any_value(b.n) nb
        |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM p
        |  WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.5),
        |nsrc AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY source),
        |tagged AS (
        |  SELECT least(da.source, db.source) AS src_a,
        |         greatest(da.source, db.source) AS src_b
        |  FROM pairs
        |  JOIN documents da ON da.doc_id = pairs.id_a
        |  JOIN documents db ON db.doc_id = pairs.id_b),
        |m AS (
        |  SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM tagged GROUP BY src_a, src_b)
        |SELECT m.src_a, m.src_b, m.n_pairs,
        |       a.n AS n_docs_a, b.n AS n_docs_b,
        |       round(m.n_pairs / CAST(
        |         CASE WHEN m.src_a = m.src_b THEN a.n * (a.n - 1) // 2
        |              ELSE a.n * b.n END AS DOUBLE), 6) AS dup_rate
        |FROM m JOIN nsrc a ON a.source = m.src_a
        |       JOIN nsrc b ON b.source = m.src_b
        |ORDER BY m.src_a, m.src_b""".stripMargin,

    // q25's pairs + the q58/q66 mixer (salt 42) folded 90/5/5; a pair
    // straddling folds is evaluation leakage
    "q143_split_leakage" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM documents),
        |e AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM t),
        |p AS (
        |  SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |         any_value(a.n) na, any_value(b.n) nb
        |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM p
        |  WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.5),
        |folds AS (
        |  SELECT doc_id,
        |         CASE WHEN u < 900000 THEN 'train'
        |              WHEN u < 950000 THEN 'val'
        |              ELSE 'test' END AS fold
        |  FROM (SELECT doc_id,
        |          ((doc_id % 1000003) * 2654435761 + (doc_id >> 16) * 7919
        |           + 42 * 10007)
        |          % 1000000007 * 2654435761 % 1000000007 % 1000000 AS u
        |        FROM documents)),
        |tagged AS (
        |  SELECT least(fa.fold, fb.fold) AS fold_a,
        |         greatest(fa.fold, fb.fold) AS fold_b
        |  FROM pairs
        |  JOIN folds fa ON fa.doc_id = pairs.id_a
        |  JOIN folds fb ON fb.doc_id = pairs.id_b),
        |cells AS (
        |  SELECT fold_a, fold_b, CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM tagged GROUP BY fold_a, fold_b),
        |tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS t FROM cells)
        |SELECT fold_a, fold_b, n_pairs,
        |       fold_a <> fold_b AS is_leak,
        |       round(n_pairs / CAST(tot.t AS DOUBLE), 6) AS share
        |FROM cells CROSS JOIN tot
        |ORDER BY fold_a, fold_b""".stripMargin,

    // windowed-funnel twin: the q80 min-chain anchored at t1 with the
    // 24 h bound carried from the anchor (interval add ≡ integer-µs
    // add under the pinned UTC session)
    "q148_window_funnel" ->
      """WITH t1 AS (SELECT user_id, min(ts) ts FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.ts) ts, t1.ts ats FROM events e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'view' AND e.ts > t1.ts
        |         AND e.ts <= t1.ts + INTERVAL 24 HOUR
        |       GROUP BY e.user_id, t1.ts),
        |t3 AS (SELECT e.user_id, min(e.ts) ts, t2.ats FROM events e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'click' AND e.ts > t2.ts
        |         AND e.ts <= t2.ats + INTERVAL 24 HOUR
        |       GROUP BY e.user_id, t2.ats),
        |t4 AS (SELECT e.user_id, min(e.ts) ts FROM events e
        |       JOIN t3 ON e.user_id = t3.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > t3.ts
        |         AND e.ts <= t3.ats + INTERVAL 24 HOUR
        |       GROUP BY e.user_id),
        |counts AS (
        |  SELECT 1 step_idx, 'signup' step, count(*) n_users FROM t1
        |  UNION ALL SELECT 2, 'view', count(*) FROM t2
        |  UNION ALL SELECT 3, 'click', count(*) FROM t3
        |  UNION ALL SELECT 4, 'purchase', count(*) FROM t4)
        |SELECT step_idx, step, n_users,
        |       round(CAST(n_users AS DOUBLE) /
        |         NULLIF((SELECT n_users FROM counts WHERE step_idx = 1), 0), 6) conv
        |FROM counts ORDER BY step_idx""".stripMargin,

    // md5 hex agrees byte-for-byte across engines; spectrum = histogram
    // of exact-content cluster sizes
    "q149_dup_spectrum" ->
      """WITH cl AS (
        |  SELECT md5(text) AS h, count(*) AS k
        |  FROM documents GROUP BY md5(text)),
        |sp AS (
        |  SELECT k AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
        |         CAST(sum(k) AS BIGINT) AS n_docs
        |  FROM cl GROUP BY k),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM sp)
        |SELECT cluster_size, n_clusters, n_docs,
        |       round(n_docs / CAST(tot.t AS DOUBLE), 6) AS doc_share
        |FROM sp CROSS JOIN tot ORDER BY cluster_size""".stripMargin,

    // same 1e6 integer grid (float32→double exact), order-free integer
    // centroid sums, one closed-form double cosine; argmax tie-breaks
    // label asc in both engines
    "q152_centroid_audit" ->
      """WITH q AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))
        |           AS qv
        |  FROM embeddings),
        |v AS (
        |  SELECT vec_id, label, qv,
        |         list_sum(list_transform(qv, x -> x * x)) AS n2v
        |  FROM q),
        |cpos0 AS (
        |  SELECT label, unnest(list_transform(qv, (x, i) -> {'pos': i, 'v': x}),
        |                       recursive := true)
        |  FROM q),
        |cpos AS (
        |  SELECT label AS cl, pos, CAST(sum(v) AS BIGINT) AS s
        |  FROM cpos0 GROUP BY label, pos),
        |cent AS (
        |  SELECT cl, list(s ORDER BY pos) AS c
        |  FROM cpos GROUP BY cl),
        |cent2 AS (
        |  SELECT cl, c,
        |         list_sum(list_transform(c,
        |           x -> CAST(x AS HUGEINT) * CAST(x AS HUGEINT))) AS n2c
        |  FROM cent),
        |scored AS (
        |  SELECT v.vec_id, v.label, cent2.cl,
        |         CAST(list_sum(list_transform(v.qv, (x, i) -> x * cent2.c[i]))
        |              AS DOUBLE) /
        |           nullif(sqrt(CAST(v.n2v AS DOUBLE)) *
        |                  sqrt(CAST(cent2.n2c AS DOUBLE)), 0.0) AS cos
        |  FROM v CROSS JOIN cent2),
        |per AS (
        |  SELECT vec_id, label,
        |         first(cl ORDER BY cos DESC, cl) AS pred,
        |         max(CASE WHEN cl = label THEN cos END) AS own
        |  FROM scored GROUP BY vec_id, label)
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_correct,
        |       round(sum(CASE WHEN pred = label THEN 1 ELSE 0 END) /
        |             CAST(count(*) AS DOUBLE), 6) AS accuracy,
        |       round(min(own), 6) AS min_own_cos,
        |       round(max(own), 6) AS max_own_cos
        |FROM per GROUP BY label ORDER BY label""".stripMargin,

    // same exact integer tf/df/len/N/Σlen; per-term closed-form double
    // score; per-doc total added in the SAME fixed literal order via
    // the conditional-aggregation pivot; rank on the rounded score
    "q153_bm25" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents),
        |stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(len(toks)) AS BIGINT) AS sl FROM d),
        |l AS (
        |  SELECT doc_id, len(toks) AS ln, unnest(toks) AS tok FROM d),
        |tf AS (
        |  SELECT doc_id, ln, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM l WHERE tok IN ('hash', 'join', 'filter', 'scan')
        |  GROUP BY doc_id, ln, tok),
        |dft AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
        |sc AS (
        |  SELECT t.doc_id, t.tok,
        |         ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0) *
        |           (t.tf * 2.2) /
        |           (t.tf + 1.2 * (0.25 + 0.75 *
        |             (t.ln / (CAST(s.sl AS DOUBLE) / CAST(s.n AS DOUBLE)))))
        |           AS sco
        |  FROM tf t JOIN dft f USING (tok) CROSS JOIN stats s),
        |per AS (
        |  SELECT doc_id,
        |         max(CASE WHEN tok = 'hash' THEN sco END) AS c0,
        |         max(CASE WHEN tok = 'join' THEN sco END) AS c1,
        |         max(CASE WHEN tok = 'filter' THEN sco END) AS c2,
        |         max(CASE WHEN tok = 'scan' THEN sco END) AS c3
        |  FROM sc GROUP BY doc_id)
        |SELECT doc_id,
        |       round(coalesce(c0, 0.0) + coalesce(c1, 0.0) +
        |             coalesce(c2, 0.0) + coalesce(c3, 0.0), 6) AS bm25
        |FROM per
        |ORDER BY round(coalesce(c0, 0.0) + coalesce(c1, 0.0) +
        |               coalesce(c2, 0.0) + coalesce(c3, 0.0), 6) DESC, doc_id
        |LIMIT 20""".stripMargin,

    // q25's inverted-index equi-join with multiplicities: Σmin over
    // shared shingles, Σmax derived as |A|+|B|−Σmin
    "q154_weighted_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' ')) sh
        |  FROM documents),
        |e AS (SELECT doc_id, len(sh) tot, unnest(sh) s FROM t),
        |c AS (SELECT doc_id, tot, s, CAST(count(*) AS BIGINT) c
        |      FROM e GROUP BY doc_id, tot, s),
        |p AS (
        |  SELECT a.doc_id id_a, b.doc_id id_b,
        |         any_value(a.tot) ta, any_value(b.tot) tb,
        |         CAST(sum(least(a.c, b.c)) AS BIGINT) wmin
        |  FROM c a JOIN c b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |       round(CAST(wmin AS DOUBLE) / (ta + tb - wmin), 4) wjaccard
        |FROM p WHERE CAST(wmin AS DOUBLE) / (ta + tb - wmin) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // same exact unigram/bigram counts; pmi is one ln over the same
    // fixed-order double ratio; rank on the rounded score
    "q156_collocations" ->
      """WITH d AS (
        |  SELECT string_split(lower(text), ' ') AS toks FROM documents),
        |uni AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS ca
        |  FROM (SELECT unnest(toks) AS t FROM d) GROUP BY t),
        |nu AS (SELECT CAST(sum(ca) AS BIGINT) AS n FROM uni),
        |bi AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS cab
        |  FROM (SELECT unnest(list_transform(range(1, len(toks)),
        |                 i -> {'a': toks[i], 'b': toks[i + 1]}),
        |               recursive := true)
        |        FROM d WHERE len(toks) >= 2)
        |  GROUP BY a, b),
        |nb AS (SELECT CAST(sum(cab) AS BIGINT) AS n FROM bi),
        |sc AS (
        |  SELECT bi.a, bi.b, bi.cab,
        |         ln((CAST(bi.cab AS DOUBLE) * nu.n * nu.n) /
        |            (CAST(nb.n AS DOUBLE) * ua.ca * ub.ca)) AS pmi
        |  FROM bi
        |  JOIN uni ua ON ua.t = bi.a
        |  JOIN uni ub ON ub.t = bi.b
        |  CROSS JOIN nu CROSS JOIN nb
        |  WHERE bi.cab >= 20)
        |SELECT a AS token_a, b AS token_b, cab AS c_ab,
        |       round(pmi, 6) AS pmi
        |FROM sc ORDER BY round(pmi, 6) DESC, a, b LIMIT 20""".stripMargin,

    // VERBATIM the q25 oracle: the prefix-filtered engine path must
    // emit exactly the unfiltered inverted-index pair set — the
    // PPJoin losslessness theorem under the gate
    "q177_prefix_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM documents),
        |e AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM t),
        |p AS (
        |  SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |         any_value(a.n) na, any_value(b.n) nb
        |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, round(CAST(inter AS DOUBLE)/(na + nb - inter),4) jaccard
        |FROM p WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // same md5 lower-64 seeded draw (the q94 digest recipe); DuckDB's
    // md5_number_lower is UNSIGNED, so re-interpret as the signed
    // 64-bit value (− 2^64 above 2^63) before the positive modulo to
    // match Spark's long exactly
    "q188_negative_samples" ->
      """WITH np AS (SELECT count(*) AS n FROM part),
        |h AS (
        |  SELECT c.c_custkey, c.c_mktsegment,
        |         CASE WHEN md5_number_lower(c.c_custkey || ':' || i.i)
        |                   >= 9223372036854775808
        |              THEN CAST(md5_number_lower(c.c_custkey || ':' || i.i)
        |                        AS HUGEINT) - 18446744073709551616
        |              ELSE CAST(md5_number_lower(c.c_custkey || ':' || i.i)
        |                        AS HUGEINT) END AS hv
        |  FROM customer c, (SELECT unnest([0, 1, 2]) AS i) i),
        |cand AS (
        |  SELECT c_custkey, c_mktsegment,
        |         CAST(((hv % (SELECT n FROM np)) + (SELECT n FROM np))
        |           % (SELECT n FROM np) + 1 AS BIGINT) AS cand_part
        |  FROM h),
        |pos AS (
        |  SELECT DISTINCT o.o_custkey, l.l_partkey
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
        |SELECT cand.c_mktsegment,
        |       CAST(count(DISTINCT cand.c_custkey) AS BIGINT) AS n_customers,
        |       CAST(count(*) AS BIGINT) AS n_candidates,
        |       CAST(count(pos.l_partkey) AS BIGINT) AS n_rejected,
        |       CAST(count(*) - count(pos.l_partkey) AS BIGINT) AS n_kept,
        |       round(count(pos.l_partkey) / CAST(count(*) AS DOUBLE), 6)
        |         AS reject_rate
        |FROM cand LEFT JOIN pos
        |  ON pos.o_custkey = cand.c_custkey
        | AND pos.l_partkey = cand.cand_part
        |GROUP BY cand.c_mktsegment ORDER BY cand.c_mktsegment""".stripMargin,

    // same prefix-total normalization, same per-term ln AST
    "q215_cond_entropy" ->
      """WITH toks AS (
        |  SELECT source, string_split(lower(text), ' ') AS t
        |  FROM documents WHERE len(string_split(lower(text), ' ')) >= 2),
        |bi AS (
        |  SELECT source, t[i] AS a, t[i + 1] AS b, count(*) AS c_ab
        |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
        |  GROUP BY source, t[i], t[i + 1]),
        |w AS (
        |  SELECT *, sum(c_ab) OVER (PARTITION BY source, a) AS ca
        |  FROM bi),
        |g AS (
        |  SELECT source, CAST(sum(c_ab) AS BIGINT) AS n_bigrams,
        |         CAST(count(DISTINCT a) AS BIGINT) AS n_prefixes,
        |         sum(c_ab * ln(CAST(ca AS DOUBLE) / c_ab)) AS h
        |  FROM w GROUP BY source)
        |SELECT source, n_bigrams, n_prefixes,
        |       round(h / n_bigrams, 4) AS cond_entropy,
        |       round(exp(h / n_bigrams), 4) AS perplexity
        |FROM g ORDER BY source""".stripMargin,

    // same dense sources x top-50 grid, same z and delta ASTs
    "q217_burrows_delta" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(lower(text), ' ')) AS t
        |  FROM documents),
        |freq AS (
        |  SELECT source, t, count(*) AS f FROM toks GROUP BY source, t),
        |totals AS (
        |  SELECT source, CAST(sum(f) AS BIGINT) AS n
        |  FROM freq GROUP BY source),
        |top AS (
        |  SELECT t FROM (
        |    SELECT t, sum(f) AS cf FROM freq GROUP BY t
        |    ORDER BY cf DESC, t LIMIT 50)),
        |grid AS (
        |  SELECT totals.source, top.t,
        |         CAST(coalesce(freq.f, 0) AS DOUBLE) / totals.n AS r
        |  FROM totals CROSS JOIN top
        |  LEFT JOIN freq ON freq.source = totals.source AND freq.t = top.t),
        |z AS (
        |  SELECT source, t,
        |         (r - m / k) / sd AS z
        |  FROM (
        |    SELECT *,
        |           count(*) OVER (PARTITION BY t) AS k,
        |           sum(r) OVER (PARTITION BY t) AS m,
        |           sqrt(sum(r * r) OVER (PARTITION BY t)
        |                / count(*) OVER (PARTITION BY t)
        |              - (sum(r) OVER (PARTITION BY t)
        |                 / count(*) OVER (PARTITION BY t))
        |              * (sum(r) OVER (PARTITION BY t)
        |                 / count(*) OVER (PARTITION BY t))) AS sd
        |    FROM grid)
        |  WHERE sd > 0)
        |SELECT a.source AS source_a, b.source AS source_b,
        |       count(*) AS n_words,
        |       round(avg(abs(a.z - b.z)), 4) AS delta
        |FROM z a JOIN z b ON a.t = b.t AND a.source < b.source
        |GROUP BY a.source, b.source
        |ORDER BY source_a, source_b""".stripMargin,

    // same md5-prefix bucket labels, same exact counts
    "q221_feature_hash" ->
      """WITH tok AS (
        |  SELECT DISTINCT source, t FROM (
        |    SELECT source, unnest(string_split(lower(text), ' ')) AS t
        |    FROM documents)),
        |pb AS (
        |  SELECT source, substring(md5(t), 1, 4) AS bucket,
        |         count(*) AS types
        |  FROM tok GROUP BY source, substring(md5(t), 1, 4))
        |SELECT source, CAST(sum(types) AS BIGINT) AS n_tokens,
        |       count(*) AS n_buckets,
        |       CAST(max(types) AS BIGINT) AS max_bucket_types,
        |       round(1.0 - CAST(count(*) AS DOUBLE) / sum(types), 6)
        |         AS collision_rate
        |FROM pb GROUP BY source ORDER BY source""".stripMargin,

    // same q73 normalization, same (n_chars desc, doc_id) keeper rule
    "q227_canonical_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, source, n_chars,
        |         md5(trim(regexp_replace(regexp_replace(lower(text),
        |           '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS ck
        |  FROM documents),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY ck
        |    ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM d)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_kept,
        |       CAST(sum(CASE WHEN rn <> 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_dropped,
        |       CAST(sum(CASE WHEN rn = 1 THEN n_chars ELSE 0 END) AS BIGINT)
        |         AS kept_chars,
        |       CAST(sum(CASE WHEN rn <> 1 THEN n_chars ELSE 0 END) AS BIGINT)
        |         AS dropped_chars
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    // same exact token mass, same closed-form KL terms
    "q228_mixture_drift" ->
      """WITH ps AS (
        |  SELECT source,
        |         CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT)
        |           AS tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt,
        |             count(*) AS k FROM ps)
        |SELECT ps.source, ps.tokens,
        |       round(CAST(ps.tokens AS DOUBLE) / t.tt, 6) AS share,
        |       round(1.0 / t.k, 6) AS target_share,
        |       round((CAST(ps.tokens AS DOUBLE) / t.tt) *
        |             ln((CAST(ps.tokens AS DOUBLE) / t.tt) / (1.0 / t.k)), 6)
        |         AS kl_term
        |FROM ps, t ORDER BY ps.source""".stripMargin,

    // truth = the q25 SQL, prediction = the q24 SQL, composed; the
    // P/R/F1 algebra is single divisions of exact counts
    "q231_detector_audit" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM documents),
        |e AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM t),
        |truthp AS (
        |  SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |         any_value(a.n) na, any_value(b.n) nb
        |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |truth AS (
        |  SELECT id_a, id_b FROM truthp
        |  WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.5),
        |tk AS (
        |  SELECT doc_id, string_split(text, ' ') toks FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(toks, tok -> CAST(list_sum(list_transform(range(1, 16),
        |      i -> CAST(strpos('0123456789abcdef', md5(tok)[i]) - 1 AS BIGINT)
        |           * (CAST(1 AS BIGINT) << (4 * (15 - i))))) AS BIGINT)) hs
        |  FROM tk),
        |sg AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 60), j ->
        |      CASE WHEN 2 * len(list_filter(hs, hv -> (hv >> j) & 1 = 1)) > len(hs)
        |           THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) sig
        |  FROM h),
        |bands AS (
        |  SELECT doc_id, sig, b, (sig >> (b * 15)) & 32767 ck
        |  FROM sg CROSS JOIN (SELECT unnest([0, 1, 2, 3]) b) bi),
        |pred AS (
        |  SELECT DISTINCT x.doc_id id_a, y.doc_id id_b
        |  FROM bands x JOIN bands y ON x.b = y.b AND x.ck = y.ck
        |  WHERE x.doc_id < y.doc_id
        |    AND bit_count(xor(x.sig, y.sig)) <= 3),
        |j AS (
        |  SELECT coalesce(truth.id_a, pred.id_a) id_a,
        |         CASE WHEN truth.id_a IS NOT NULL THEN 1 ELSE 0 END t,
        |         CASE WHEN pred.id_a IS NOT NULL THEN 1 ELSE 0 END p
        |  FROM truth FULL OUTER JOIN pred
        |    ON truth.id_a = pred.id_a AND truth.id_b = pred.id_b),
        |c AS (
        |  SELECT CAST(sum(t) AS BIGINT) n_truth,
        |         CAST(sum(p) AS BIGINT) n_pred,
        |         CAST(sum(CASE WHEN t = 1 AND p = 1 THEN 1 ELSE 0 END)
        |           AS BIGINT) tp,
        |         CAST(sum(CASE WHEN t = 0 AND p = 1 THEN 1 ELSE 0 END)
        |           AS BIGINT) fp,
        |         CAST(sum(CASE WHEN t = 1 AND p = 0 THEN 1 ELSE 0 END)
        |           AS BIGINT) fn
        |  FROM j)
        |SELECT n_truth, n_pred, tp, fp, fn,
        |       CASE WHEN n_pred > 0
        |            THEN round(CAST(tp AS DOUBLE) / n_pred, 6) END
        |         AS precision,
        |       CASE WHEN n_truth > 0
        |            THEN round(CAST(tp AS DOUBLE) / n_truth, 6) END
        |         AS recall,
        |       CASE WHEN tp + fp + fn > 0
        |            THEN round(2.0 * tp / (2 * tp + fp + fn), 6) END AS f1
        |FROM c""".stripMargin,

    // same exact counts, same decimal-product ln arguments
    "q233_unigram_kl" ->
      """WITH st AS (
        |  SELECT source, t, count(*) AS cs
        |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS t
        |        FROM documents)
        |  GROUP BY source, t),
        |corpus AS (
        |  SELECT t, CAST(sum(cs) AS BIGINT) AS c FROM st GROUP BY t),
        |ns AS (
        |  SELECT source, CAST(sum(cs) AS BIGINT) AS ns
        |  FROM st GROUP BY source),
        |nt AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM corpus)
        |SELECT st.source, CAST(max(ns.ns) AS BIGINT) AS n_tokens,
        |       count(*) AS vocab,
        |       round(sum((CAST(st.cs AS DOUBLE) / ns.ns) *
        |             ln(CAST(CAST(st.cs AS DECIMAL(38,0)) * nt.nt AS DOUBLE) /
        |                CAST(CAST(corpus.c AS DECIMAL(38,0)) * ns.ns
        |                     AS DOUBLE))), 4) AS kl_to_corpus
        |FROM st JOIN corpus ON corpus.t = st.t
        |        JOIN ns ON ns.source = st.source
        |        CROSS JOIN nt
        |GROUP BY st.source ORDER BY st.source""".stripMargin,

    // same median cut, same corpus-mix weights, same weighted fold
    "q240_standardized_rate" ->
      """WITH med AS (
        |  SELECT quantile_cont(n_chars, 0.5) AS m FROM documents),
        |fl AS (
        |  SELECT source, lang,
        |         CASE WHEN n_chars > med.m THEN 1 ELSE 0 END AS lng
        |  FROM documents, med),
        |cell AS (
        |  SELECT source, lang, count(*) AS n,
        |         CAST(sum(lng) AS BIGINT) AS l
        |  FROM fl GROUP BY source, lang),
        |w AS (
        |  SELECT lang, CAST(sum(n) AS BIGINT) AS wl FROM cell GROUP BY lang),
        |wt AS (SELECT CAST(sum(wl) AS BIGINT) AS wt FROM w),
        |std AS (
        |  SELECT cell.source,
        |         round(sum((CAST(w.wl AS DOUBLE) / wt.wt) *
        |               (CAST(cell.l AS DOUBLE) / cell.n)), 6)
        |           AS standardized_rate,
        |         count(*) AS n_langs
        |  FROM cell JOIN w ON w.lang = cell.lang CROSS JOIN wt
        |  GROUP BY cell.source),
        |crude AS (
        |  SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
        |         CAST(sum(l) AS BIGINT) AS lng
        |  FROM cell GROUP BY source)
        |SELECT c.source, c.n_docs, s.n_langs,
        |       round(CAST(c.lng AS DOUBLE) / c.n_docs, 6) AS crude_rate,
        |       s.standardized_rate
        |FROM crude c JOIN std s ON s.source = c.source
        |ORDER BY c.source""".stripMargin,

    // truth-free agreement: q25/q24 doc-level flags, closed kappa
    "q243_detector_kappa" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM documents),
        |e AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM t),
        |np AS (
        |  SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |         any_value(a.n) na, any_value(b.n) nb
        |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |ngd AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT id_a AS doc_id FROM np
        |    WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.5
        |    UNION ALL
        |    SELECT id_b FROM np
        |    WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.5)),
        |tk AS (
        |  SELECT doc_id, string_split(text, ' ') toks FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(toks, tok -> CAST(list_sum(list_transform(range(1, 16),
        |      i -> CAST(strpos('0123456789abcdef', md5(tok)[i]) - 1 AS BIGINT)
        |           * (CAST(1 AS BIGINT) << (4 * (15 - i))))) AS BIGINT)) hs
        |  FROM tk),
        |sg AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 60), j ->
        |      CASE WHEN 2 * len(list_filter(hs, hv -> (hv >> j) & 1 = 1)) > len(hs)
        |           THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) sig
        |  FROM h),
        |bands AS (
        |  SELECT doc_id, sig, b, (sig >> (b * 15)) & 32767 ck
        |  FROM sg CROSS JOIN (SELECT unnest([0, 1, 2, 3]) b) bi),
        |shp AS (
        |  SELECT DISTINCT x.doc_id id_a, y.doc_id id_b
        |  FROM bands x JOIN bands y ON x.b = y.b AND x.ck = y.ck
        |  WHERE x.doc_id < y.doc_id
        |    AND bit_count(xor(x.sig, y.sig)) <= 3),
        |shd AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT id_a AS doc_id FROM shp
        |    UNION ALL SELECT id_b FROM shp)),
        |j AS (
        |  SELECT CASE WHEN ngd.doc_id IS NOT NULL THEN 1 ELSE 0 END g,
        |         CASE WHEN shd.doc_id IS NOT NULL THEN 1 ELSE 0 END s
        |  FROM documents d
        |  LEFT JOIN ngd ON ngd.doc_id = d.doc_id
        |  LEFT JOIN shd ON shd.doc_id = d.doc_id),
        |c AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN g = 1 AND s = 1 THEN 1 ELSE 0 END) AS BIGINT) a,
        |    CAST(sum(CASE WHEN g = 1 AND s = 0 THEN 1 ELSE 0 END) AS BIGINT) b,
        |    CAST(sum(CASE WHEN g = 0 AND s = 1 THEN 1 ELSE 0 END) AS BIGINT) c,
        |    CAST(sum(CASE WHEN g = 0 AND s = 0 THEN 1 ELSE 0 END) AS BIGINT) d
        |  FROM j)
        |SELECT n AS n_docs, a AS both_dup, b AS ngram_only,
        |       c AS simhash_only, d AS neither,
        |       round(CAST(a + d AS DOUBLE) / n, 6) AS agreement,
        |       round((CAST(a + d AS DOUBLE) / n
        |              - CAST(CAST(a + b AS DECIMAL(38,0)) * (a + c)
        |                   + CAST(c + d AS DECIMAL(38,0)) * (b + d) AS DOUBLE)
        |                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |             / nullif(1.0 - CAST(CAST(a + b AS DECIMAL(38,0)) * (a + c)
        |                   + CAST(c + d AS DECIMAL(38,0)) * (b + d) AS DOUBLE)
        |                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 0.0), 6)
        |         AS kappa
        |FROM c""".stripMargin,

    // same distinct 3-gram shingle algebra as q25; log2 bucket via
    // length(bin(df))-1 (integer/string, the q128 trick); C(df,2) in
    // exact integer division
    "q244_dedup_cost_model" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM documents),
        |e AS (SELECT doc_id, unnest(sh) s FROM t),
        |d AS (SELECT s, count(*) AS df FROM e GROUP BY s),
        |b AS (
        |  SELECT length(bin(df)) - 1 AS df_bucket,
        |         CAST(count(*) AS BIGINT) AS n_shingles,
        |         CAST(sum(df) AS BIGINT) AS postings,
        |         CAST(sum(df * (df - 1) // 2) AS BIGINT) AS cand_pairs
        |  FROM d GROUP BY 1),
        |tot AS (SELECT sum(cand_pairs) AS t FROM b)
        |SELECT df_bucket, n_shingles, postings, cand_pairs,
        |       round(cand_pairs / CAST((SELECT t FROM tot) AS DOUBLE), 6)
        |         AS cand_share
        |FROM b ORDER BY df_bucket""".stripMargin,

    "q245_twin_compression" ->
      """WITH cls AS (
        |  SELECT source, count(*) AS m, length(text) AS len
        |  FROM documents GROUP BY source, text)
        |SELECT source,
        |       CAST(sum(m) AS BIGINT) AS n_docs,
        |       CAST(count(*) AS BIGINT) AS n_classes,
        |       round(sum(m) / CAST(count(*) AS DOUBLE), 4) AS dup_factor,
        |       CAST(sum(m * len) AS BIGINT) AS total_chars,
        |       CAST(sum((m - 1) * len) AS BIGINT) AS redundant_chars,
        |       round(sum((m - 1) * len) / CAST(sum(m * len) AS DOUBLE), 6)
        |         AS redundant_share
        |FROM cls GROUP BY source ORDER BY source""".stripMargin,

    // q25's pair algebra verbatim (filter on the UNROUNDED jaccard,
    // round to 4 after); decile and mean run on the exact e4 integer
    "q246_threshold_sweep" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2,1)+1),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) sh
        |  FROM documents),
        |e AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM t),
        |p AS (
        |  SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter,
        |         any_value(a.n) na, any_value(b.n) nb
        |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT CAST(round(round(CAST(inter AS DOUBLE)/(na + nb - inter), 4)
        |              * 10000) AS BIGINT) AS e4
        |  FROM p WHERE CAST(inter AS DOUBLE)/(na + nb - inter) >= 0.5)
        |SELECT (e4 // 1000) / 10.0 AS j_decile,
        |       CAST(count(*) AS BIGINT) AS n_pairs,
        |       round((sum(e4) / count(*)) / 10000.0, 4) AS mean_jaccard
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // q27's stopword-profile argmax verbatim, kept per ground-truth lang
    "q247_langid_confusion" ->
      """WITH s AS (
        |  SELECT lang,
        |         len(list_filter(string_split(lower(text),' '), x -> x IN ('the','and','of','to','is'))) s_en,
        |         len(list_filter(string_split(lower(text),' '), x -> x IN ('el','la','de','que','y'))) s_es,
        |         len(list_filter(string_split(lower(text),' '), x -> x IN ('le','la','les','et','des'))) s_fr,
        |         len(list_filter(string_split(lower(text),' '), x -> x IN ('der','die','und','das','ist'))) s_de,
        |         len(list_filter(string_split(lower(text),' '), x -> x IN ('的','是','了','在','我'))) s_zh
        |  FROM documents),
        |p AS (SELECT lang, CASE
        |  WHEN s_zh >= greatest(s_en,s_es,s_fr,s_de) THEN 'zh'
        |  WHEN s_fr >= greatest(s_en,s_es,s_de) THEN 'fr'
        |  WHEN s_es >= greatest(s_en,s_de) THEN 'es'
        |  WHEN s_en >= s_de THEN 'en' ELSE 'de' END pred_lang FROM s),
        |c AS (SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2)
        |SELECT lang, pred_lang, CAST(n AS BIGINT) AS n,
        |       round(n / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE), 6)
        |         AS share
        |FROM c ORDER BY lang, pred_lang""".stripMargin,

    // q248: decile boundary doc_ids at ranks max(⌊N·b/10⌋,1) of the
    // doc_id order; prefix token/doc counts and first-occurrence type
    // counts at each boundary; β = least-squares slope of ln V on ln T
    // over the 10 points (regr_slope ≡ the Spark closed form).
    "q248_heaps_law" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) nt,
        |         string_split(text,' ') toks
        |  FROM documents),
        |r AS (SELECT doc_id, nt,
        |             row_number() OVER (ORDER BY doc_id) rn,
        |             count(*) OVER () n
        |      FROM d),
        |bd AS (SELECT t.b, r.doc_id bdid
        |       FROM range(1, 11) t(b)
        |       JOIN r ON r.rn = greatest((r.n * t.b) // 10, 1)),
        |agg AS (SELECT bd.b, CAST(count(*) AS BIGINT) cum_docs,
        |               CAST(sum(d.nt) AS BIGINT) cum_tokens
        |        FROM d JOIN bd ON d.doc_id <= bd.bdid GROUP BY bd.b),
        |fo AS (SELECT tok, min(doc_id) fd
        |       FROM (SELECT doc_id, unnest(toks) tok FROM d)
        |       GROUP BY tok),
        |ty AS (SELECT bd.b, CAST(count(*) AS BIGINT) cum_types
        |       FROM fo JOIN bd ON fo.fd <= bd.bdid GROUP BY bd.b),
        |pts AS (SELECT agg.b, cum_docs, cum_tokens, cum_types
        |        FROM agg JOIN ty ON agg.b = ty.b),
        |fit AS (SELECT regr_slope(ln(cum_types), ln(cum_tokens)) s FROM pts)
        |SELECT CAST(b AS BIGINT) decile, cum_docs, cum_tokens, cum_types,
        |       round((SELECT s FROM fit), 6) + 0.0 heaps_beta
        |FROM pts ORDER BY decile""".stripMargin,

    // q249: inclusive running token total per source in (nt DESC,
    // doc_id ASC) order; budget = ⌊source total / 2⌋; keep while the
    // running total fits.
    "q249_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text,' ')) AS BIGINT) nt
        |  FROM documents),
        |c AS (SELECT source, doc_id, nt,
        |             sum(nt) OVER (PARTITION BY source
        |               ORDER BY nt DESC, doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               cumw,
        |             sum(nt) OVER (PARTITION BY source) tot
        |      FROM d)
        |SELECT source,
        |       CAST(max(tot) // 2 AS BIGINT) budget_tokens,
        |       CAST(sum(CASE WHEN cumw <= tot // 2 THEN 1 ELSE 0 END)
        |            AS BIGINT) n_kept,
        |       CAST(sum(CASE WHEN cumw <= tot // 2 THEN nt ELSE 0 END)
        |            AS BIGINT) tokens_kept,
        |       round(sum(CASE WHEN cumw <= tot // 2 THEN nt ELSE 0 END) /
        |             CAST(max(tot) // 2 AS DOUBLE), 6) utilization
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    // q250: q152's ×1e6 long quantization; per-vector EXACT integer
    // squared norm ‖n·v − S‖² (centroid = S/n held divisionless);
    // p95 = the num value at rank ⌈0.95·n⌉ of the per-label order
    // (row_number over ties ≡ cumulative-count rank at the value);
    // distances are single closed-form doubles √num/(n·1e6).
    "q250_embed_outliers" ->
      """WITH q AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))
        |           qv
        |  FROM embeddings),
        |s0 AS (SELECT label,
        |              unnest(list_transform(qv, (x, i) -> {'pos': i, 'v': x}),
        |                     recursive := true)
        |       FROM q),
        |s AS (SELECT label, pos, CAST(sum(v) AS BIGINT) sv
        |      FROM s0 GROUP BY label, pos),
        |cent AS (SELECT label, list(sv ORDER BY pos) c FROM s GROUP BY label),
        |n AS (SELECT label, count(*) n FROM q GROUP BY label),
        |num AS (SELECT q.vec_id, q.label, n.n,
        |               list_sum(list_transform(q.qv,
        |                 (x, i) -> CAST(n.n * x - cent.c[i] AS HUGEINT) *
        |                           CAST(n.n * x - cent.c[i] AS HUGEINT))) num
        |        FROM q JOIN cent ON q.label = cent.label
        |               JOIN n ON q.label = n.label),
        |r AS (SELECT label, n, num,
        |             row_number() OVER (PARTITION BY label ORDER BY num) rn
        |      FROM num),
        |thr AS (SELECT label,
        |               min(CASE WHEN rn >= (19 * n + 19) // 20 THEN num END)
        |                 thr
        |        FROM r GROUP BY label)
        |SELECT num.label, CAST(max(num.n) AS BIGINT) n,
        |       CAST(sum(CASE WHEN num.num > thr.thr THEN 1 ELSE 0 END)
        |            AS BIGINT) n_outliers,
        |       round(sqrt(CAST(sum(num.num) AS DOUBLE) / max(num.n)) /
        |             (max(num.n) * 1000000.0), 6) rms_dist,
        |       round(sqrt(CAST(max(thr.thr) AS DOUBLE)) /
        |             (max(num.n) * 1000000.0), 6) p95_dist
        |FROM num JOIN thr ON num.label = thr.label
        |GROUP BY num.label ORDER BY num.label""".stripMargin,

    // q251: ntile(B) over the token-length order for B in {1,2,4,8,16}
    // (explicit remainder-rule bucket arithmetic so the CROSS JOIN can
    // vary B); pad target per bucket = its max length.
    "q251_pad_waste" ->
      """WITH d AS (
        |  SELECT CAST(len(string_split(text,' ')) AS BIGINT) len
        |  FROM documents),
        |r AS (SELECT len, row_number() OVER (ORDER BY len) rn,
        |             count(*) OVER () n
        |      FROM d),
        |x AS (SELECT b, len, rn, n, n // b AS q, n % b AS m
        |      FROM r CROSS JOIN (SELECT unnest([1, 2, 4, 8, 16]) b) t),
        |bk AS (SELECT b, len,
        |              CASE WHEN rn <= (q + 1) * m
        |                   THEN (rn - 1) // (q + 1) + 1
        |                   ELSE m + (rn - (q + 1) * m - 1) //
        |                            greatest(q, 1) + 1 END bucket
        |       FROM x),
        |g AS (SELECT b, bucket, max(len) hi, count(*) sz, sum(len) s
        |      FROM bk GROUP BY b, bucket)
        |SELECT CAST(b AS BIGINT) n_buckets,
        |       CAST(sum(hi * sz) AS BIGINT) padded_tokens,
        |       CAST(sum(s) AS BIGINT) real_tokens,
        |       CAST(sum(hi * sz) - sum(s) AS BIGINT) pad_tokens,
        |       round((sum(hi * sz) - sum(s)) /
        |             CAST(sum(hi * sz) AS DOUBLE), 6) pad_share
        |FROM g GROUP BY b ORDER BY n_buckets""".stripMargin)
}
