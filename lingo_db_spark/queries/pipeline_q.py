"""LLM-data-pipeline queries over documents.parquet / embeddings.parquet:
dedup (exact, fingerprint, MinHash+LSH, SimHash), text analysis, and
similarity search.  Oracle SQL mirrors the operator semantics in DuckDB
(list comprehensions + list_intersect/list_distinct give exact shingle
Jaccard; list_cosine_similarity gives exact cosine), so even the
"custom" operators are value-checked, not just row-counted — except the
SimHash and LSH-ANN variants whose algorithms are engine-internal
(rows-only here, behavior pinned in tests/test_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lingo_db_spark import operators as ops
from lingo_db_spark import pipeline as pl
from lingo_db_spark.catalog import load_table
from lingo_db_spark.queries import ordered_result, register, sorted_result

# DuckDB rendering of the shared text normalization/token/trigram pipeline.
_SQL_TOKS = ("string_split_regex(trim(regexp_replace(lower(text), "
             "'[^a-z0-9]+', ' ', 'g')), ' ')")
_SQL_TRIGRAMS = (f"list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] "
                 f"for i in range(1, len(t) - 1)])")


@register("pipeline_dedup_exact", """
SELECT doc_id, lang, source, n_chars FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents)
WHERE rn = 1
ORDER BY doc_id
""")
def pipeline_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the raw text, keep the lowest doc_id.  One hash
    shuffle on the dedup key; keep-first via per-partition row_number (no
    global sort, no collect) — the shape that survives 100TB."""
    docs = load_table(spark, sf_dir, "documents")
    return (pl.dedup_exact(docs, ["text"], "doc_id")
            .select("doc_id", "lang", "source", "n_chars")
            .orderBy("doc_id"))


@register("pipeline_dedup_fingerprint", """
SELECT doc_id, fp FROM (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
         ROW_NUMBER() OVER (
           PARTITION BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
           ORDER BY doc_id) AS rn
  FROM documents)
WHERE rn = 1
ORDER BY doc_id
""")
def pipeline_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-invariant dedup: md5 fingerprint of the normalized
    text (md5, not xxhash, so external systems reproduce it).  Catches
    case/punctuation/whitespace-only edits that exact dedup misses."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", pl.fingerprint("text").alias("fp"))
    return pl.dedup_exact(fp, ["fp"], "doc_id").orderBy("doc_id")


@register("pipeline_minhash_neardup", f"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
tri AS (
  SELECT doc_id, {_SQL_TRIGRAMS} AS tris FROM tok WHERE len(t) >= 3)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(len(list_intersect(a.tris, b.tris)) AS DOUBLE)
             / len(list_distinct(a.tris || b.tris)), 4) AS jaccard
FROM tri a JOIN tri b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.tris, b.tris)) AS DOUBLE)
      / len(list_distinct(a.tris || b.tris)) >= 0.8
ORDER BY id_a, id_b
""")
def pipeline_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs at trigram-Jaccard >= 0.8 via MinHash + LSH
    banding (64 hashes, 16 bands x 4 rows => recall ~0.9998 at 0.8), exact
    Jaccard re-scored on candidates only.  The oracle computes the
    all-pairs ground truth in DuckDB — the LSH path must reproduce it
    while only ever joining within signature-band buckets (O(n·bucket),
    no crossJoin; see tests/test_pipeline.py for the plan assertion)."""
    docs = load_table(spark, sf_dir, "documents")
    return ordered_result(
        pl.neardup_minhash(docs, "doc_id", "text", threshold=0.8),
        "id_a", "id_b")


@register("pipeline_neardup_clusters", f"""
WITH RECURSIVE tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
tri AS (
  SELECT doc_id, {_SQL_TRIGRAMS} AS tris FROM tok WHERE len(t) >= 3),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM tri a JOIN tri b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.tris, b.tris)) AS DOUBLE)
        / len(list_distinct(a.tris || b.tris)) >= 0.8),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION ALL SELECT id_b, id_a FROM p),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
SELECT a AS doc_id, MIN(b) AS cluster_id, (a = MIN(b)) AS is_canonical
FROM reach GROUP BY a ORDER BY doc_id
""")
def pipeline_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER assignment: MinHash+LSH pairs -> connected
    components (iterative min-label propagation, plans.iterate) -> every
    document labeled with its cluster's min doc_id; `is_canonical` marks
    the one row to keep per cluster.  The oracle recomputes ground truth
    in DuckDB with all-pairs Jaccard + a recursive-CTE transitive closure
    — the distributed label propagation must reproduce it exactly."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = (pl.neardup_minhash(docs, "doc_id", "text", threshold=0.8)
             .select("id_a", "id_b"))
    out = pl.neardup_clusters(docs.select("doc_id"), pairs)
    return ordered_result(out, "doc_id")


@register("pipeline_winnow_overlap", f"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
g AS (
  SELECT doc_id,
         [md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])
          for i in range(1, len(t) - 1)] AS h
  FROM tok WHERE len(t) >= 6),
wins AS (
  SELECT doc_id,
         list_distinct([list_min(h[i:i+3])
                        for i in range(1, len(h) - 2)]) AS fps
  FROM g WHERE len(h) >= 4),
f AS (SELECT doc_id, unnest(fps) AS fp FROM wins),
keep AS (SELECT fp FROM f GROUP BY fp HAVING COUNT(*) <= 1000),
pruned AS (SELECT f.doc_id, f.fp FROM f JOIN keep USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       COUNT(*) AS shared
FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 8
ORDER BY id_a, id_b
""")
def pipeline_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap detection via WINNOWING fingerprints
    (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS algorithm): k-gram
    rolling hashes, per-window minimum selection, bucket self-join on
    shared fingerprints.  Catches a copied paragraph inside an otherwise
    new document — the case whole-document dedup misses.  The oracle
    re-derives the exact fingerprint selection (md5-ordered window mins)
    and the pair counts in DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    fps = pl.winnow_fingerprints(docs, "doc_id", "text",
                                 shingle_k=3, window=4)
    out = pl.overlap_pairs(fps, "doc_id", min_shared=8, max_fp_freq=1000)
    return ordered_result(out, "id_a", "id_b")


@register("pipeline_simhash_neardup", f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS t FROM documents),
tc AS (  -- collapse repeated tokens, weight the bit votes by count
  SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t),
tb AS (  -- bit i of md5[:8] big-endian: hex char 16 - i//4, bit i%4
  SELECT doc_id, i,
         SUM(CASE WHEN ((strpos('0123456789abcdef',
                                substr(md5(t), 16 - i // 4, 1)) - 1)
                        >> (i % 4)) & 1 = 1
             THEN c ELSE -c END) AS v
  FROM tc CROSS JOIN (SELECT unnest(range(0, 64)) AS i) bits
  GROUP BY doc_id, i),
sig AS (  -- signed-i64 signature; bit 63 lands on the sign bit
  SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN
           CASE WHEN i = 63 THEN -9223372036854775808
                ELSE (CAST(1 AS BIGINT) << CAST(i AS INT)) END
           ELSE 0 END) AS BIGINT) AS sh
  FROM tb GROUP BY doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE (((a.sh >> 0) & 65535) = ((b.sh >> 0) & 65535)
    OR ((a.sh >> 16) & 65535) = ((b.sh >> 16) & 65535)
    OR ((a.sh >> 32) & 65535) = ((b.sh >> 32) & 65535)
    OR ((a.sh >> 48) & 65535) = ((b.sh >> 48) & 65535))
  AND bit_count(xor(a.sh, b.sh)) <= 10
ORDER BY id_a, id_b
""")
def pipeline_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming distance <= 10 over 64-bit
    signatures; pigeonhole 16-bit-chunk equi-join generates candidates
    (4 chunks guarantee recall for distance <= 3; larger distances are
    best-effort, the standard SimHash trade).  The token hash is md5[:8]
    so the ORACLE recomputes the exact signature with SQL bit ops and
    replays the same chunk-collision candidate rule — the output is
    value-checked pair-for-pair, including the hamming distances."""
    docs = load_table(spark, sf_dir, "documents")
    return ordered_result(
        pl.neardup_simhash(docs, "doc_id", "text", max_hamming=10),
        "id_a", "id_b")


@register("text_quality_stats", f"""
WITH tok AS (
  SELECT doc_id, text, {_SQL_TOKS} AS t FROM documents)
SELECT doc_id,
       len(t) AS n_tokens,
       CAST(ceil(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) / 4.0)
            + len(regexp_replace(text, '[^0-9]', '', 'g'))
            + len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
            AS BIGINT) AS bpe_est,
       ROUND(CAST(len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE)
             / greatest(len(text), 1), 6) AS punct_r,
       ROUND(CAST(len(list_filter(t, x -> x IN
             ('the','a','of','and','to','in','is','it','on','for'))) AS DOUBLE)
             / greatest(len(t), 1), 6) AS stopword_r,
       ROUND(CAST(
             CASE WHEN len(text) BETWEEN 50 AND 20000 THEN 0.25 ELSE 0.0 END
           + CASE WHEN len(t) >= 10 THEN 0.25 ELSE 0.0 END
           + CASE WHEN CAST(len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
                        AS DOUBLE) / greatest(len(text), 1) <= 0.10
                  THEN 0.25 ELSE 0.0 END
           + CASE WHEN CAST(len(list_filter(t, x -> x IN
                   ('the','a','of','and','to','in','is','it','on','for')))
                   AS DOUBLE) / greatest(len(t), 1) >= 0.01
                  THEN 0.25 ELSE 0.0 END AS DOUBLE), 2) AS quality
FROM tok
ORDER BY doc_id
""")
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality statistics: token count, BPE-ish token
    estimate, punctuation ratio, stopword ratio, composite quality score —
    C4-style heuristics, all JVM-side expressions, tokenized exactly once
    per row (pipeline.text.quality_stats)."""
    docs = load_table(spark, sf_dir, "documents")
    return ordered_result(pl.quality_stats(docs, "doc_id", "text"), "doc_id")


@register("pipeline_prepare_corpus", f"""
WITH tok AS (
  SELECT doc_id, lang, text, {_SQL_TOKS} AS t FROM documents),
scored AS (
  SELECT doc_id, lang, text, len(t) AS n_tokens,
         CASE WHEN len(text) BETWEEN 50 AND 20000 THEN 0.25 ELSE 0.0 END
       + CASE WHEN len(t) >= 10 THEN 0.25 ELSE 0.0 END
       + CASE WHEN CAST(len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
                    AS DOUBLE) / greatest(len(text), 1) <= 0.10
              THEN 0.25 ELSE 0.0 END
       + CASE WHEN CAST(len(list_filter(t, x -> x IN
               ('the','a','of','and','to','in','is','it','on','for')))
               AS DOUBLE) / greatest(len(t), 1) >= 0.01
              THEN 0.25 ELSE 0.0 END AS q
  FROM tok),
kept AS (SELECT * FROM scored WHERE q >= 0.75 AND lang = 'en')
SELECT doc_id, lang, n_tokens FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
    ORDER BY doc_id) AS rn
  FROM kept)
WHERE rn = 1
ORDER BY doc_id
""")
def pipeline_prepare_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus preparation — the composition a training-data
    run actually executes: quality gate (C4-style composite >= 0.75) ->
    language gate -> normalization-invariant dedup (md5 fingerprint,
    keep-lowest-id) -> token accounting.  Each stage is one of the
    engine's pipeline operators; the whole chain is narrow ops + ONE hash
    shuffle (the dedup), which is the shape that survives 100TB."""
    docs = load_table(spark, sf_dir, "documents")
    kept = (pl.spread(docs.select("doc_id", "lang", "text"), "doc_id")
            .filter((pl.quality_score("text") >= 0.75)
                    & (F.col("lang") == "en")))
    fp = kept.select(
        "doc_id", "lang",
        pl.token_count("text").cast("long").alias("n_tokens"),
        pl.fingerprint("text").alias("__fp"))
    out = pl.dedup_exact(fp, ["__fp"], "doc_id").drop("__fp")
    return ordered_result(out, "doc_id")


@register("pipeline_stratified_sample", """
SELECT doc_id, lang
FROM documents
WHERE CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296
      < CASE lang WHEN 'en' THEN 0.25 WHEN 'de' THEN 0.5 ELSE 1.0 END
ORDER BY doc_id
""")
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (cap English at 25%, German at
    50%, keep the rest) — keep/drop is a multiplicative hash of doc_id,
    so the sample is a pure function of the data: identical under
    re-runs, re-partitioning, and in the DuckDB oracle (which re-derives
    the exact row set with the same integer arithmetic).  sampleBy would
    be seeded-random and unverifiable."""
    docs = load_table(spark, sf_dir, "documents")
    out = pl.stratified_sample(docs.select("doc_id", "lang"), "lang",
                               {"en": 0.25, "de": 0.5}, "doc_id",
                               default_fraction=1.0)
    return out.orderBy("doc_id")


@register("pipeline_token_budget", f"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
counted AS (
  SELECT doc_id, len(t) AS n_tokens FROM tok),
running AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS BIGINT)
           AS cum_tokens
  FROM counted)
SELECT doc_id, n_tokens, cum_tokens
FROM running WHERE cum_tokens <= 100000
ORDER BY doc_id
""")
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing — select a deterministic prefix of the corpus
    whose cumulative token count fits a training budget (the "cut a 100B
    -token dataset" operator).  The GLOBAL running sum is a two-phase
    distributed prefix scan (pipeline/packing.py): range-partitioned
    per-shard cumulative sums, then an exclusive prefix over the
    shard-count-sized subtotal frame broadcast back — no data-sized
    single-partition window anywhere in the plan (asserted by
    tests/test_plans.py)."""
    docs = load_table(spark, sf_dir, "documents")
    counted = pl.spread(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", pl.token_count("text").cast("long").alias("n_tokens"))
    return sorted_result(
        pl.pack_to_budget(counted, "doc_id", "n_tokens", 100_000),
        "doc_id")


@register("pipeline_dedup_rollup", """
SELECT COALESCE(source, '<all>') AS source,
       COALESCE(lang, '<all>') AS lang,
       CAST(GROUPING(source) AS BIGINT) AS g_source,
       CAST(GROUPING(lang) AS BIGINT) AS g_lang,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+',
                                              ' ', 'g')))) AS n_unique,
       ROUND(1.0 - CAST(COUNT(DISTINCT md5(trim(regexp_replace(lower(text),
                        '[^a-z0-9]+', ' ', 'g')))) AS DOUBLE) / COUNT(*), 4)
         AS dup_rate
FROM documents
GROUP BY ROLLUP(source, lang)
ORDER BY g_source, g_lang, source, lang
""")
def pipeline_dedup_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation reporting: duplication rate per (source, lang) with
    ROLLUP subtotals — DISTINCT fingerprint counting under grouping sets
    in one Expand-based pass (corpus-health dashboards at 100TB run
    exactly this shape)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = pl.fingerprint("text")
    uniq = F.countDistinct(fp)
    return (docs.rollup("source", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 uniq.alias("n_unique"),
                 F.round(F.lit(1.0) - uniq.cast("double")
                         / F.count(F.lit(1)), 4).alias("dup_rate"),
                 F.grouping("source").cast("long").alias("g_source"),
                 F.grouping("lang").cast("long").alias("g_lang"))
            .select(F.coalesce("source", F.lit("<all>")).alias("source"),
                    F.coalesce("lang", F.lit("<all>")).alias("lang"),
                    "g_source", "g_lang", "n_docs", "n_unique", "dup_rate")
            .orderBy("g_source", "g_lang", "source", "lang"))


@register("text_langid_counts", f"""
WITH tok AS (
  SELECT doc_id, text, list_distinct({_SQL_TOKS}) AS t FROM documents),
scored AS (
  SELECT doc_id, text,
    len(list_filter(t, x -> x IN ('the','and','of','to','is','in','that','it'))) AS s_en,
    len(list_filter(t, x -> x IN ('der','die','das','und','ist','nicht','ein','mit'))) AS s_de,
    len(list_filter(t, x -> x IN ('le','la','les','et','est','pas','une','dans'))) AS s_fr,
    len(list_filter(t, x -> x IN ('el','los','las','es','una','que','por','con'))) AS s_es
  FROM tok),
best AS (
  SELECT doc_id, text,
         list_max([format('{{:02d}}|en', s_en), format('{{:02d}}|de', s_de),
                   format('{{:02d}}|fr', s_fr), format('{{:02d}}|es', s_es)])
           AS b
  FROM scored)
SELECT CASE WHEN 2 * len(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g'))
                 >= len(text) THEN 'zh'
            WHEN CAST(substr(b, 1, 2) AS INT) = 0 THEN 'und'
            ELSE substr(b, 4) END AS pred_lang,
       COUNT(*) AS n_docs
FROM best GROUP BY 1 ORDER BY 1
""")
def text_langid_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of predicted languages over the corpus (stopword-
    marker heuristic + CJK codepoint ratio).  The oracle re-encodes the
    whole heuristic in DuckDB SQL — marker hit counts, argmax with the
    same lexicographic-max tie-break (zero-padded 'score|lang' strings),
    CJK codepoint ratio — so the prediction itself is value-checked, not
    just row counts."""
    docs = load_table(spark, sf_dir, "documents")
    docs = pl.spread(docs.select("doc_id", "text"), "doc_id")
    return (docs.select(pl.lang_id("text").alias("pred_lang"))
            .groupBy("pred_lang").agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("pred_lang"))


# --- similarity search -----------------------------------------------------

def _query_vectors(emb: DataFrame, n: int = 5) -> DataFrame:
    return (emb.filter(F.col("vec_id") < n)
            .select(F.col("vec_id").alias("q_id"),
                    F.col("embedding").alias("q_vec")))


@register("ann_topk_bruteforce", """
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
           WHERE vec_id < 5),
base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q.q_id, base.vec_id,
         CAST(list_cosine_similarity(base.embedding, q.q_vec) AS DOUBLE)
           AS cos_raw
  FROM base, q)
SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 10
ORDER BY q_id, rank
""")
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors — the ANN correctness
    baseline (O(n·q), q broadcast).  Dot products via zip_with/aggregate,
    fully JVM-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    out = ops.brute_force_topk(base, _query_vectors(emb), k=10)
    return sorted_result(
        out.select("q_id", "vec_id", F.round("cos", 4).alias("cos"), "rank"),
        "q_id", "rank")


def _ann_invariants(approx: DataFrame, exact: DataFrame,
                    min_hits: int, k: int = 10) -> DataFrame:
    """Per-query INVARIANTS of an approximate top-k against the exact
    in-plan brute force — the same oracle pattern as ann_topk_ivf_full:
    an approximate result can't be value-compared row-by-row, but these
    booleans are deterministic by construction (seeded hyperplanes /
    quantizer, deterministic tie-breaks):

    - n_ret:         the approximate search returned exactly k rows;
    - recall_ok:     >= min_hits of them are true top-k members.
                     ENFORCED bounds: LSH min_hits=6, IVF(6/16
                     probes) min_hits=4, PQ(rerank=64) min_hits=6,
                     IVFPQ(6/16, rerank=64, residual) min_hits=4.
                     MEASURED worst-query at sf0.01: LSH 7, IVF 5,
                     PQ 9, IVFPQ 5 (pinned in tests/test_pipeline.py
                     test_ann_recall_margins) — each enforced bound
                     sits one hit below measured AT THE WORST DRIVER
                     SF so the gate has margin without being vacuous.
                     PQ's binding scale is sf0.1 (worst query 7/10
                     there, r14 full-gate sweep: the fixed rerank=64
                     cut admits a smaller top-10 fraction as the
                     corpus grows; pinned in
                     test_pq_recall_margin_sf01);
    - rescore_exact: every returned pair that IS a true member carries
                     the SAME cosine as the brute-force path (the exact
                     re-score is exact, not approximate — strict float
                     equality, both sides computed by cosine_batch).
    """
    ex = exact.select("q_id", "vec_id", F.col("cos").alias("cos_exact"))
    j = approx.join(ex, ["q_id", "vec_id"], "left")
    return (j.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_ret"),
        (F.sum(F.when(F.col("cos_exact").isNotNull(), 1).otherwise(0))
         >= min_hits).alias("recall_ok"),
        F.bool_and(F.coalesce(F.col("cos") == F.col("cos_exact"),
                              F.lit(True))).alias("rescore_exact")))


_ANN_INVARIANT_ORACLE = """
SELECT vec_id AS q_id, CAST(10 AS BIGINT) AS n_ret,
       true AS recall_ok, true AS rescore_exact
FROM embeddings WHERE vec_id < 5 ORDER BY q_id
"""

_IDX_DIRS: dict[str, str] = {}


def _index_dir(prefix: str) -> str:
    """One scratch directory per prefix per process, removed at
    interpreter exit (r13, ADVICE: a bare mkdtemp per call leaked a
    directory per driver run).  Re-running a query overwrites the same
    path (every write here uses mode("overwrite")), so repeat bench
    iterations don't accumulate files either."""
    if prefix not in _IDX_DIRS:
        import atexit
        import shutil
        import tempfile
        d = tempfile.mkdtemp(prefix=prefix)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _IDX_DIRS[prefix] = d
    return _IDX_DIRS[prefix]


def _write_index(frame: DataFrame, path: str, n_cells: int) -> None:
    """Write an at-rest index tree with one TASK (and so one file) per
    cell (r14 opt round, guide §6 file layout): the journeys' encode
    input here is a single-row-group scan, so a direct partitionBy
    write drives every cell's parquet writer from ONE serial task
    (~40 ms of open/commit each — 0.65 s of the indexed journey's
    wall); repartition(n_cells, "cell") first makes the writers
    parallel AND pins the file count to one per non-empty cell at any
    input parallelism — the standard repartition-before-partitionBy
    file-sizing recipe.  The explicit numPartitions keeps AQE from
    coalescing the tiny shuffle back to one task.  Quiet-phase A/B
    (tools/ivfpq_write_ab_probe.py): 0.65–0.70 → 0.52–0.53 s per
    write, row sets identical.  A hash repartition only MOVES rows,
    and every downstream read is order-independent (top-k by
    (score, id) with deterministic tie-breaks; the maintenance tests'
    byte-identity pins compare files across operations on one written
    tree, never across independent builds).  LDB_IDX_WRITE=direct
    restores the serial write (A/B arm)."""
    import os as _os
    if _os.environ.get("LDB_IDX_WRITE", "repart") == "direct":
        frame.write.mode("overwrite").partitionBy("cell").parquet(path)
        return
    (frame.repartition(n_cells, "cell")
     .write.mode("overwrite").partitionBy("cell").parquet(path))


@register("ann_topk_lsh", _ANN_INVARIANT_ORACLE)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10 (random-hyperplane buckets,
    16 tables x 4 bits): the scale path — candidates come only from
    bucket collisions, exact cosine re-ranks them.  No crossJoin in the
    plan (asserted in tests/test_pipeline.py).  Output is the per-query
    invariant form (_ann_invariants) so the approximate result is
    oracle-checkable: k rows returned, recall >= 6/10 (enforced; 7/10
    measured at sf0.01, margin pinned in tests) vs the in-plan brute
    force, and exact re-scoring — the oracle is the constant truth
    table those invariants must equal."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    qs = _query_vectors(emb)
    out = ops.lsh_topk(base, qs, k=10, dim=64, n_planes=4, n_tables=16)
    exact = ops.brute_force_topk(base, qs, k=10)
    return sorted_result(_ann_invariants(out, exact, min_hits=6), "q_id")


_EMBED_NEARDUP_ORACLE = """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
jit AS (SELECT vec_id + 100000 AS vec_id, [e[1] + 0.1] || e[2:] AS e
        FROM base WHERE vec_id < 50),
aug AS (SELECT * FROM base UNION ALL SELECT * FROM jit)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.e, b.e), 4) AS cos
FROM aug a JOIN aug b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.99
ORDER BY id_a, id_b
"""


@register("pipeline_embed_neardup", _EMBED_NEARDUP_ORACLE)
def pipeline_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.99) via
    random-hyperplane LSH candidates + exact re-score.  The synthetic
    embeddings are near-orthogonal (max pairwise cos ~0.51), so the query
    plants 50 deterministic jittered copies (first coordinate +0.1 -> cos
    ~0.995) with the SAME construction in the oracle: the LSH path must
    recover exactly the planted pairs, value-checked against DuckDB's
    all-pairs ground truth.  Recall at cos 0.995 with 16x4-bit tables is
    1-4e-15 — the oracle equality is not luck.  No crossJoin in the plan
    (asserted in tests/test_pipeline.py)."""
    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("embedding")))
    jit = (emb.filter(F.col("vec_id") < 50)
           .select((F.col("vec_id") + 100000).alias("vec_id"),
                   F.concat(F.array(F.col("embedding").getItem(0) + 0.1),
                            F.slice("embedding", 2, 63)).alias("embedding")))
    aug = emb.unionAll(jit)
    out = ops.embed_neardup(aug, dim=64, threshold=0.99)
    return sorted_result(
        out.select("id_a", "id_b", F.round("cos", 4).alias("cos")),
        "id_a", "id_b")


@register("ann_topk_ivf", _ANN_INVARIANT_ORACLE)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10: coarse k-means quantizer (16 cells, trained
    driver-side on a deterministic sample), queries probe their 6 nearest
    cells, exact cosine re-ranks candidates — the partition-pruned ANN
    path (at scale `cell` is a partitioning column, so a probe reads 6/16
    of the corpus instead of all of it).  Output is the per-query
    invariant form (_ann_invariants): k rows, recall >= 4/10
    (enforced; 5/10 measured at sf0.01, margin pinned in tests) vs
    the in-plan brute force (probe pruning trades recall for 6/16 of
    the I/O; ann_topk_ivf_full pins the n_probe=n_cells exact case),
    exact re-scoring."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    qs = _query_vectors(emb)
    out = ops.ivf_topk(base, qs, k=10, dim=64, n_cells=16, n_probe=6)
    exact = ops.brute_force_topk(base, qs, k=10)
    return sorted_result(_ann_invariants(out, exact, min_hits=4), "q_id")


@register("ann_topk_ivf_full", """
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
           WHERE vec_id < 5),
base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q.q_id, base.vec_id,
         CAST(list_cosine_similarity(base.embedding, q.q_vec) AS DOUBLE)
           AS cos_raw
  FROM base, q)
SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 10
ORDER BY q_id, rank
""")
def ann_topk_ivf_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with exhaustive probing (n_probe = n_cells): candidates cover
    the whole corpus, so the result is EXACT and value-checked against
    the brute-force oracle — this pins the IVF machinery itself
    (quantizer assignment, cell routing, re-ranking) rather than just
    row counts; ann_topk_ivf then only adds the probe-pruning knob."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    out = ops.ivf_topk(base, _query_vectors(emb), k=10, dim=64,
                       n_cells=16, n_probe=16)
    return sorted_result(
        out.select("q_id", "vec_id", F.round("cos", 4).alias("cos"), "rank"),
        "q_id", "rank")


@register("ann_topk_pq", _ANN_INVARIANT_ORACLE)
def ann_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-10 (Jégou et al. PAMI'11):
    the corpus is scanned as 16-byte PQ codes (16 subspaces x 32 codes,
    codebooks Lloyd-trained on a deterministic sample) against per-query
    ADC lookup tables — no float vector is read until the top-64 ADC
    candidates per query fetch theirs for the exact cosine re-rank.  The
    compressed-domain ANN path: at 100 TB the ADC scan reads ~6% of the
    embedding bytes, and composes with IVF's partition pruning
    (IVF-PQ).  Output is the per-query invariant form (_ann_invariants):
    k rows, recall >= 6/10 (enforced), exact re-scoring.  The enforced
    bound sits one hit below the measured worst query at the WORST of
    the three driver SFs (r14: sf0.001/sf0.01 worst 9, sf0.1 worst 7 —
    PQ-only ranking must surface the true top-10 inside a fixed
    rerank=64 ADC cut, so recall decays as the corpus grows past the
    candidate budget; the r13 bound of 8 was margined against sf0.01
    alone and an sf0.1 full-gate sweep caught queries 0/4 at 7/10).
    Margins pinned at sf0.01 AND sf0.1 in tests/test_pipeline.py.
    Two-level candidate cut — no corpus-proportional reducer (see
    pq_topk's docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    qs = _query_vectors(emb)
    out = ops.pq_topk(base, qs, k=10, dim=64, m=16, n_codes=32, rerank=64)
    exact = ops.brute_force_topk(base, qs, k=10)
    return sorted_result(_ann_invariants(out, exact, min_hits=6), "q_id")


@register("ann_topk_ivfpq", _ANN_INVARIANT_ORACLE)
def ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed index (the billion-scale ANN recipe): queries probe
    their 6/16 nearest coarse cells AND scan only 16-byte PQ codes inside
    them — partition pruning x compression, so the 100 TB candidate scan
    is (6/16) x ~6% of the embedding bytes — then exact cosine re-ranks
    the top-64 ADC candidates.  Codes quantize residuals (IVFADC — see
    ivfpq_topk's docstring); worst-query recall measured 5/10 at sf0.01
    under the r11 k-means++ init (margin pinned in
    tests/test_pipeline.py; enforced >= 4/10).  The exhaustive
    configuration is pinned exactly equal to brute force in
    test_ivfpq_exhaustive_equals_brute_force."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    qs = _query_vectors(emb)
    out = ops.ivfpq_topk(base, qs, k=10, dim=64, n_cells=16, n_probe=6,
                         m=16, n_codes=32, rerank=64)
    exact = ops.brute_force_topk(base, qs, k=10)
    return sorted_result(_ann_invariants(out, exact, min_hits=4), "q_id")


@register("ann_topk_ivf_indexed", _ANN_INVARIANT_ORACLE)
def ann_topk_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF AT-REST index journey — the deployment shape end-to-end:
    ivf_build trains the coarse quantizer and assigns cells, the (id,
    vec, cell) frame is WRITTEN partitionBy("cell") to parquet (the
    reorganized corpus — the reference's persisted-index analogue,
    LingoDBHashIndex.cpp/.h: the at-rest structure IS the point), read
    back, and queried through ``ivf_topk(index=...)``.  The probe join
    dynamically prunes the cell partitions (Spark DPP: the broadcast
    probe side filters the scan at runtime — plan-asserted with the
    static-vs-dynamic story in tests/test_plans.py), so a 6/16-probe
    query reads 6/16 of the index files, the claim that carries 100 TB.
    Same seeds as ann_topk_ivf => same quantizer => same invariant
    bounds (min_hits=4 enforced; 5 measured, pinned in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    qs = _query_vectors(emb)
    cents, cells = ops.ivf_build(base, dim=64, n_cells=16)
    path = _index_dir("ldb_ivf_idx_") + "/ivf"
    _write_index(cells, path, n_cells=16)
    out = ops.ivf_topk(base, qs, k=10, dim=64, n_cells=16, n_probe=6,
                       index=(cents, spark.read.parquet(path)))
    exact = ops.brute_force_topk(base, qs, k=10)
    return sorted_result(_ann_invariants(out, exact, min_hits=4), "q_id")


@register("ann_topk_ivfpq_indexed", _ANN_INVARIANT_ORACLE)
def ann_topk_ivfpq_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF-PQ AT-REST index journey: ivfpq_build encodes the corpus
    to (id, cell, 16-byte residual PQ codes), written partitionBy
    ("cell") to parquet, read back, queried through ``ivfpq_topk
    (index=...)``.  The probed cells are driver-side literals, so the
    codes scan carries a STATIC PartitionFilters [cell IN (...)] — the
    scan's I/O is exactly the probed cells' code files, (n_probe /
    n_cells) x ~6% of the embedding bytes (plan-asserted in
    tests/test_plans.py: the IN-list equals the probe routing's cell
    set).  Same seeds as ann_topk_ivfpq => same index => same invariant
    bounds (min_hits=4 enforced; 5 measured, pinned in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    qs = _query_vectors(emb)
    cents, books, codes = ops.ivfpq_build(base, dim=64, n_cells=16,
                                          m=16, n_codes=32)
    path = _index_dir("ldb_ivfpq_idx_") + "/ivfpq"
    _write_index(codes, path, n_cells=16)
    out = ops.ivfpq_topk(base, qs, k=10, dim=64, n_cells=16, n_probe=6,
                         m=16, n_codes=32, rerank=64,
                         index=(cents, books, spark.read.parquet(path)))
    exact = ops.brute_force_topk(base, qs, k=10)
    return sorted_result(_ann_invariants(out, exact, min_hits=4), "q_id")


_IVFPQ_PREBUILT: dict[str, tuple] = {}


@register("ann_topk_ivfpq_query_only", _ANN_INVARIANT_ORACLE)
def ann_topk_ivfpq_query_only(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """The AMORTIZED at-rest query path (r13, verdict item 5):
    ``ann_topk_ivfpq_indexed``'s wall time is dominated by the one-time
    build+write, which the build-once/query-many API exists to
    amortize (similarity.py ivfpq_build/ivfpq_topk(index=...); the
    reference's persisted index is likewise built once,
    LingoDBHashIndex.cpp).  Here the index is built and written on the
    FIRST call per process and every subsequent call — bench warm
    iterations, repeat driver runs — only routes probes and scans the
    prebuilt partitioned codes, so the bench median reflects the
    steady-state query cost.  Same seeds/knobs as
    ann_topk_ivfpq_indexed => identical quantizers => the same measured
    recall (min_hits=4 enforced; 5 measured, pinned in tests), and the
    static PartitionFilters plan assert
    (test_ivfpq_at_rest_index_scan_statically_prunes_probed_cells)
    covers this scan shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    qs = _query_vectors(emb)
    got = _IVFPQ_PREBUILT.get(sf_dir)
    if got is None:
        cents, books, codes = ops.ivfpq_build(base, dim=64, n_cells=16,
                                              m=16, n_codes=32)
        path = _index_dir("ldb_ivfpq_qidx_") + "/ivfpq"
        _write_index(codes, path, n_cells=16)
        got = _IVFPQ_PREBUILT[sf_dir] = (cents, books, path)
    cents, books, path = got
    out = ops.ivfpq_topk(base, qs, k=10, dim=64, n_cells=16, n_probe=6,
                         m=16, n_codes=32, rerank=64,
                         index=(cents, books, spark.read.parquet(path)))
    exact = ops.brute_force_topk(base, qs, k=10)
    return sorted_result(_ann_invariants(out, exact, min_hits=4), "q_id")


@register("ann_topk_ivfpq_append", """
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
           WHERE vec_id < 5),
base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q.q_id, base.vec_id,
         CAST(list_cosine_similarity(base.embedding, q.q_vec) AS DOUBLE)
           AS cos_raw
  FROM base, q)
SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 10
ORDER BY q_id, rank
""")
def ann_topk_ivfpq_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEX MAINTENANCE journey: the IVF-PQ index is built on only the
    odd half of the corpus, the even half is APPENDED with the frozen
    quantizers (ivfpq_append — one encode pass, no retrain, the way a
    100 TB at-rest index absorbs a daily delta), and the queries run
    against the union codes frame under exhaustive knobs (probe all
    cells, rerank >= corpus) — so the result is EXACT and value-checked
    against the brute-force oracle over the WHOLE corpus: appended
    vectors are first-class index citizens, not a degraded side path.
    The approximate-knob recall story is unchanged (appending cannot
    widen the machinery's error; only distribution drift vs the frozen
    training sample can — the documented maintenance contract)."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    odd = base.filter(F.col("vec_id") % 2 == 1)
    even = base.filter(F.col("vec_id") % 2 == 0)
    cents, books, codes_odd = ops.ivfpq_build(odd, dim=64, n_cells=16,
                                              m=16, n_codes=32)
    codes_all = codes_odd.unionAll(ops.ivfpq_append(cents, books, even))
    out = ops.ivfpq_topk(base, _query_vectors(emb), k=10, dim=64,
                         n_cells=16, n_probe=16, m=16, n_codes=32,
                         rerank=1_000_000,
                         index=(cents, books, codes_all))
    return sorted_result(
        out.select("q_id", "vec_id", F.round("cos", 4).alias("cos"), "rank"),
        "q_id", "rank")


@register("ann_topk_ivfpq_deleted", """
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
           WHERE vec_id < 5),
base AS (SELECT vec_id, embedding FROM embeddings
         WHERE vec_id >= 5 AND vec_id % 2 = 1),
scored AS (
  SELECT q.q_id, base.vec_id,
         CAST(list_cosine_similarity(base.embedding, q.q_vec) AS DOUBLE)
           AS cos_raw
  FROM base, q)
SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 10
ORDER BY q_id, rank
""")
def ann_topk_ivfpq_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEX MAINTENANCE, the delete half (r13; append landed r11):
    the at-rest IVF-PQ index is built over the whole corpus, the EVEN
    ids are tombstone-deleted (ops.index_delete — a broadcast anti
    join on the read-back codes, zero index files touched), and the
    queries run over the surviving codes under exhaustive knobs — so
    the result is EXACT and value-checked against brute force over the
    remaining (odd) corpus: a deleted vector can never surface, with
    no rebuild and no loss of the cell partition pruning.  Physical
    compaction of the touched cells (ops.compact_index_cells — dynamic
    partition overwrite, untouched cells byte-identical) is pinned in
    tests/test_pipeline.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    cents, books, codes = ops.ivfpq_build(base, dim=64, n_cells=16,
                                          m=16, n_codes=32)
    path = _index_dir("ldb_ivfpq_didx_") + "/ivfpq"
    _write_index(codes, path, n_cells=16)
    deleted = base.filter(F.col("vec_id") % 2 == 0).select("vec_id")
    live = ops.index_delete(spark.read.parquet(path), deleted)
    out = ops.ivfpq_topk(base, _query_vectors(emb), k=10, dim=64,
                         n_cells=16, n_probe=16, m=16, n_codes=32,
                         rerank=1_000_000, index=(cents, books, live))
    return sorted_result(
        out.select("q_id", "vec_id", F.round("cos", 4).alias("cos"),
                   "rank"),
        "q_id", "rank")


@register("ann_topk_ivfpq_compacted", """
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
           WHERE vec_id < 5),
base AS (SELECT vec_id, embedding FROM embeddings
         WHERE vec_id >= 5 AND vec_id % 2 = 1),
scored AS (
  SELECT q.q_id, base.vec_id,
         CAST(list_cosine_similarity(base.embedding, q.q_vec) AS DOUBLE)
           AS cos_raw
  FROM base, q)
SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 10
ORDER BY q_id, rank
""")
def ann_topk_ivfpq_compacted(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    """INDEX MAINTENANCE, the compaction half (r14; tombstones landed
    r13): after the even ids are deleted, ops.compact_index_cells
    physically rewrites ONLY the cell partitions holding deleted ids
    (dynamic partition overwrite through staging; untouched cells stay
    byte-identical — the 1M-vector probe measured a 0.07 % delete
    rewriting 1.78 % of index bytes, tools/ann_delete_probe.py), and
    the queries here run over the COMPACTED at-rest files with NO
    tombstone join at all — the steady state after maintenance.
    Exhaustive knobs make the result EXACT vs brute force over the
    remaining (odd) corpus: identical oracle to ann_topk_ivfpq_deleted,
    so the driver record proves tombstone view == compacted files.
    Byte-identity of untouched cells is pinned in
    tests/test_pipeline.py::test_index_delete_and_cell_compaction."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    cents, books, codes = ops.ivfpq_build(base, dim=64, n_cells=16,
                                          m=16, n_codes=32)
    path = _index_dir("ldb_ivfpq_cidx_") + "/ivfpq"
    _write_index(codes, path, n_cells=16)
    deleted = base.filter(F.col("vec_id") % 2 == 0).select("vec_id")
    ops.compact_index_cells(spark, path, deleted)
    compacted = spark.read.parquet(path)
    out = ops.ivfpq_topk(base, _query_vectors(emb), k=10, dim=64,
                         n_cells=16, n_probe=16, m=16, n_codes=32,
                         rerank=1_000_000, index=(cents, books, compacted))
    return sorted_result(
        out.select("q_id", "vec_id", F.round("cos", 4).alias("cos"),
                   "rank"),
        "q_id", "rank")


@register("ann_topk_ivfpq_filtered", """
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
           WHERE vec_id < 5),
base AS (SELECT vec_id, embedding FROM embeddings
         WHERE vec_id >= 5 AND label = 1),
scored AS (
  SELECT q.q_id, base.vec_id,
         CAST(list_cosine_similarity(base.embedding, q.q_vec) AS DOUBLE)
           AS cos_raw
  FROM base, q)
SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 10
ORDER BY q_id, rank
""")
def ann_topk_ivfpq_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED search over the AT-REST IVF-PQ index (r12; the last ANN
    claim promoted from pytest composition into the driver record):
    top-k among vectors passing a metadata predicate (label = 1) is
    the same ivfpq_topk call with the read-back codes frame pre-joined
    to the allowed-id set — the filter applies BEFORE the candidate
    cut, so the k results are k FILTERED vectors, and at rest the id
    join prunes row-groups after the cell pruning.  Exhaustive knobs
    (probe all cells, rerank >= corpus) make the result EXACT: value-
    checked against brute force over the filtered corpus (the DuckDB
    oracle).  Composition pinned in
    tests/test_pipeline.py::test_ivfpq_filtered_search_by_composition."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select(
        "vec_id", "embedding", "label")
    cents, books, codes = ops.ivfpq_build(
        base.select("vec_id", "embedding"), dim=64, n_cells=16,
        m=16, n_codes=32)
    path = _index_dir("ldb_ivfpq_fidx_") + "/ivfpq"
    _write_index(codes, path, n_cells=16)
    allowed = base.filter(F.col("label") == 1).select("vec_id")
    filtered_codes = spark.read.parquet(path).join(allowed, "vec_id")
    out = ops.ivfpq_topk(base.select("vec_id", "embedding"),
                         _query_vectors(emb), k=10, dim=64, n_cells=16,
                         n_probe=16, m=16, n_codes=32, rerank=1_000_000,
                         index=(cents, books, filtered_codes))
    return sorted_result(
        out.select("q_id", "vec_id", F.round("cos", 4).alias("cos"), "rank"),
        "q_id", "rank")


@register("ann_topk_pq_full", """
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
           WHERE vec_id < 5),
base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q.q_id, base.vec_id,
         CAST(list_cosine_similarity(base.embedding, q.q_vec) AS DOUBLE)
           AS cos_raw
  FROM base, q)
SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 10
ORDER BY q_id, rank
""")
def ann_topk_pq_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ with an exhaustive re-rank window (rerank >= corpus): every
    vector survives the ADC cut, so the result is EXACT and value-checked
    against the brute-force oracle — pinning the PQ machinery itself
    (normalization, per-subspace encoding, LUT routing, the two-level
    candidate cut, re-rank joins) rather than just row counts;
    ann_topk_pq then only adds the rerank-pruning knob."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    out = ops.pq_topk(base, _query_vectors(emb), k=10, dim=64,
                      m=16, n_codes=32, rerank=1_000_000)
    return sorted_result(
        out.select("q_id", "vec_id", F.round("cos", 4).alias("cos"), "rank"),
        "q_id", "rank")


@register("embedding_norms", """
SELECT label,
       COUNT(*) AS n,
       ROUND(AVG(sqrt(list_sum(list_transform(embedding, x -> x * x)))), 4)
         AS avg_norm,
       ROUND(MIN(sqrt(list_sum(list_transform(embedding, x -> x * x)))), 4)
         AS min_norm,
       ROUND(MAX(sqrt(list_sum(list_transform(embedding, x -> x * x)))), 4)
         AS max_norm
FROM embeddings
GROUP BY label
ORDER BY label
""")
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-norm statistics per label: array math (higher-order
    functions) flowing into a grouped aggregation."""
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = ops.norm(F.col("embedding"))
    return (emb.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg(nrm), 4).alias("avg_norm"),
                 F.round(F.min(nrm), 4).alias("min_norm"),
                 F.round(F.max(nrm), 4).alias("max_norm"))
            .orderBy("label"))


@register("pipeline_pack_sequences", f"""
WITH RECURSIVE tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
counted AS (
  SELECT doc_id, doc_id % 8 AS shard, CAST(len(t) AS BIGINT) AS n_tokens
  FROM tok),
s AS (
  SELECT doc_id, shard, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM counted),
fold(shard, rn, doc_id, n_tokens, bin, off) AS (
  SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM s WHERE rn = 1
  UNION ALL
  SELECT s.shard, s.rn, s.doc_id, s.n_tokens,
         CASE WHEN f.off + f.n_tokens > 0
                   AND f.off + f.n_tokens + s.n_tokens > 2048
              THEN f.bin + 1 ELSE f.bin END,
         CASE WHEN f.off + f.n_tokens > 0
                   AND f.off + f.n_tokens + s.n_tokens > 2048
              THEN 0 ELSE f.off + f.n_tokens END
  FROM fold f JOIN s ON s.shard = f.shard AND s.rn = f.rn + 1)
SELECT doc_id, n_tokens,
       CAST(shard * 4294967296 + bin AS BIGINT) AS bin_id,
       off AS bin_offset
FROM fold
ORDER BY doc_id
""")
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — NEXT-FIT bin packing of documents into
    fixed 2048-token training context windows
    (pipeline.packing.pack_sequences_next_fit).  Packing is a sequential
    fold, so the engine shards the corpus (deterministic doc_id % 8 here
    so the result is a pure function of the data) and folds each shard
    inside one Arrow-batched applyInPandas pass — shards pack in
    parallel, bin ids are globally unique by construction (shard << 32 |
    local bin).  The oracle replays the identical fold as a DuckDB
    recursive CTE, making this a VALUE-checked custom operator, not a
    rows-only one."""
    docs = load_table(spark, sf_dir, "documents")
    counted = pl.spread(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", pl.token_count("text").cast("long").alias("n_tokens"))
    out = pl.pack_sequences_next_fit(
        counted, "doc_id", "n_tokens", capacity=2048,
        shard_of=F.pmod(F.col("doc_id"), F.lit(8)))
    return ordered_result(out, "doc_id")


_SQL_FP = "md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))"


@register("pipeline_approx_distinct", f"""
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT {_SQL_FP}) AS exact_ndv,
       TRUE AS approx_ok
FROM documents
GROUP BY source
ORDER BY source
""")
def pipeline_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct counting — the user-facing form of the
    reference's HyperLogLog machinery (src/utility/HyperLogLog.cpp,
    per-column ndv stats LingoDBTable.cpp:237; tested
    TestHyperLogLog.cpp): per-source approx fingerprint ndv at 2% target
    rsd next to the exact count.  approx_count_distinct is mergeable
    (partial sketches combine map-side), so at 100 TB it replaces the
    exact two-shuffle COUNT(DISTINCT) dashboard query at a fraction of
    the cost.  The sketch VALUE is engine-specific, so the gated output
    carries the invariant instead: `approx_ok` asserts |approx - exact|
    <= 5*rsd*exact (a bound the HLL++ guarantee puts at >> 5 sigma),
    which the oracle pins as literal TRUE next to DuckDB's own exact
    count; the observed error is additionally pinned in
    tests/test_pipeline.py."""
    docs = load_table(spark, sf_dir, "documents")
    fp = pl.fingerprint("text")
    return (docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct(fp).alias("exact_ndv"),
                 F.approx_count_distinct(fp, rsd=0.02).alias("approx_ndv"))
            .select("source", "n_docs", "exact_ndv",
                    (F.abs(F.col("approx_ndv") - F.col("exact_ndv"))
                     <= 0.10 * F.col("exact_ndv")).alias("approx_ok"))
            .orderBy("source"))


@register("pipeline_ngram_jaccard", f"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
tri AS (
  SELECT doc_id, {_SQL_TRIGRAMS} AS tris FROM tok WHERE len(t) >= 3)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(len(list_intersect(a.tris, b.tris)) AS DOUBLE)
             / len(list_distinct(a.tris || b.tris)), 4) AS jaccard
FROM tri a JOIN tri b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.tris, b.tris)) AS DOUBLE)
      / len(list_distinct(a.tris || b.tris)) >= 0.6
ORDER BY id_a, id_b
""")
def pipeline_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trigram-Jaccard near-dup pairs at >= 0.6 — the
    signature-free member of the dedup family (vs MinHash's sketch):
    shared-shingle bucket join counts |A∩B| exactly, frequency prune
    keeps candidates bucket-local.  The DuckDB oracle computes the same
    all-pairs ground truth; at the lower 0.6 threshold this catches
    pairs MinHash@0.8 ignores, and the match must be EXACT against the
    unpruned ground truth — which holds while every near-pair keeps at
    least one shared shingle under max_shingle_freq (true at the gate's
    scale; see the recall caveat on neardup_ngram_jaccard)."""
    docs = load_table(spark, sf_dir, "documents")
    return ordered_result(
        pl.neardup_ngram_jaccard(docs, "doc_id", "text", threshold=0.6),
        "id_a", "id_b")


@register("pipeline_chunk_documents", f"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents WHERE doc_id < 300),
sized AS (
  SELECT doc_id, t, len(t) AS n,
         GREATEST(1, CAST(CEIL((len(t) - 16) / 48.0) AS INT)) AS n_chunks
  FROM tok WHERE len(t) > 0)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(len(t[i*48+1 : LEAST(i*48+64, n)]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(t[i*48+1 : LEAST(i*48+64, n)], ' ') AS chunk_text
FROM (SELECT doc_id, t, n, unnest(range(0, n_chunks)) AS i FROM sized)
ORDER BY doc_id, chunk_idx
""")
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking (64-token chunks, 16-token
    overlap) — the step in front of embedding/training jobs.  One
    tokenize + JVM array slices + one narrow explode; the oracle
    re-derives the exact chunk grid with list slicing, so window starts,
    tail handling, and chunk text are all value-checked."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    out = pl.chunk_documents(docs, "doc_id", "text",
                             chunk_tokens=64, overlap=16)
    return ordered_result(out, "doc_id", "chunk_idx")


@register("ann_topk_quantized", """
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
           WHERE vec_id < 5),
base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
mm AS (
  SELECT vec_id, embedding,
         CAST(list_min(embedding) AS DOUBLE) AS mn,
         CAST(list_max(embedding) AS DOUBLE) AS mx
  FROM base),
deq AS (
  -- int8 quantize/dequantize replayed exactly: code = floor(x' + 0.5)
  -- (half-away on the non-negative domain, same double arithmetic as the
  -- Spark-side numpy), value = code * scale + min, stored as float32
  SELECT vec_id,
         CAST(list_transform(embedding, x ->
              floor((CAST(x AS DOUBLE) - mn) / sc + 0.5) * sc + mn)
           AS FLOAT[]) AS demb
  FROM (SELECT vec_id, embedding, mn,
               CASE WHEN mx = mn THEN 1.0 ELSE (mx - mn) / 255.0 END AS sc
        FROM mm)),
scored AS (
  SELECT q.q_id, d.vec_id,
         CAST(list_cosine_similarity(d.demb, q.q_vec) AS DOUBLE) AS cos_raw
  FROM deq d, q)
SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 10
ORDER BY q_id, rank
""")
def ann_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine search over INT8-QUANTIZED vectors: embeddings are
    stored as per-vector (codes BINARY, min, scale) — 4x less
    storage/shuffle than float32, the standard first step for
    billion-vector corpora — dequantized on the fly and scored exactly.
    tests/test_pipeline.py pins reconstruction error (<= scale/2 per
    dim) and recall vs the float brute-force baseline; here the whole
    quantize -> shuffle -> dequantize -> score path runs as one plan.
    The oracle replays the deterministic quantize/dequantize integer math
    in SQL (floor(x+0.5) codes, code*scale+min, float32 storage), making
    this a VALUE-checked query, not rows-only."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    q = ops.quantize_embeddings(base)
    deq = ops.dequantize_embeddings(q).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    out = ops.brute_force_topk(deq, _query_vectors(emb), k=10)
    return sorted_result(
        out.select("q_id", "vec_id", F.round("cos", 4).alias("cos"), "rank"),
        "q_id", "rank")


@register("pipeline_repetition_stats", f"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents WHERE doc_id < 300),
g AS (
  SELECT doc_id, t, len(t) AS n,
         [t[i] || ' ' || t[i+1] for i in range(1, len(t))] AS grams
  FROM tok)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       ROUND(CASE WHEN n > 0
                  THEN 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / n
                  ELSE 0.0 END, 6) AS dup_token_frac,
       ROUND(CASE WHEN n >= 2 THEN
               CAST(list_max([len(list_filter(grams, x -> x = gg))
                              for gg in list_distinct(grams)]) AS DOUBLE)
               / (n - 1)
             ELSE 0.0 END, 6) AS top_bigram_share
FROM g
ORDER BY doc_id
""")
def pipeline_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signals (Gopher/C4 repetition filters):
    duplicate-token fraction and most-frequent-bigram share, JVM
    higher-order expressions only.  The oracle recomputes both with
    DuckDB list comprehensions — exact value check."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return ordered_result(
        pl.repetition_stats(docs, "doc_id", "text"), "doc_id")


@register("pipeline_redact_pii", """
SELECT doc_id,
       regexp_replace(
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '[0-9][0-9 \\-]{5,}[0-9]', '<NUMBER>', 'g') AS redacted
FROM documents
WHERE doc_id < 300
ORDER BY doc_id
""")
def pipeline_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass for training corpora: emails then long digit
    runs replaced with typed placeholders (pipeline.redact_pii).  Spark
    regexp_replace is replace-all by default; the oracle needs the 'g'
    flag — same automaton, same output, value-checked."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return (docs.select("doc_id",
                        pl.redact_pii("text").alias("redacted"))
            .orderBy("doc_id"))


@register("pipeline_mix_proportions", """
WITH c AS (
  SELECT source, COUNT(*) AS n FROM documents
  WHERE source IN ('src0', 'src1', 'src2') GROUP BY source),
s AS (
  SELECT source, n,
         CAST(CASE source WHEN 'src0' THEN 0.5
                          WHEN 'src1' THEN 0.3
                          ELSE 0.2 END AS DOUBLE) AS share
  FROM c),
t AS (SELECT MIN(CAST(n AS DOUBLE) / share) AS t FROM s),
plan AS (
  SELECT source, LEAST(1.0, share * t.t / CAST(n AS DOUBLE)) AS frac
  FROM s, t)
SELECT d.doc_id, d.source
FROM documents d JOIN plan USING (source)
WHERE CAST((d.doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296
      < plan.frac
ORDER BY d.doc_id
""")
def pipeline_mix_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix composition (pipeline.mix_to_proportions): hit
    target source shares 50/30/20 by downsampling over-represented
    strata — the binding stratum stays whole, the rest keep
    share*T/count of their rows via the deterministic per-id hash.
    One tiny aggregate + broadcast plan join + narrow filter; the
    oracle re-derives the identical plan arithmetic and row set."""
    docs = load_table(spark, sf_dir, "documents")
    out = pl.mix_to_proportions(
        docs.select("doc_id", "source"), "source", "doc_id",
        {"src0": 0.5, "src1": 0.3, "src2": 0.2})
    return out.select("doc_id", "source").orderBy("doc_id")


@register("pipeline_oversample", """
WITH w AS (
  SELECT doc_id, lang, source,
         CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.5 ELSE 1.0 END
           AS wt
  FROM documents),
c AS (
  SELECT doc_id, lang, source,
         CAST(FLOOR(wt) AS INT)
         + CASE WHEN CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE)
                     / 4294967296 < wt - FLOOR(wt) THEN 1 ELSE 0 END
           AS copies
  FROM w)
SELECT doc_id, source, CAST(e AS BIGINT) AS __epoch
FROM (SELECT doc_id, source, copies,
             unnest(range(0, copies)) AS e FROM c WHERE copies > 0)
ORDER BY doc_id, __epoch
""")
def pipeline_oversample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic oversampling (pipeline.oversample): src0 at 2.5
    epochs, src1 at 1.5, everything else once — integer copies via a
    sequence explode, the fractional remainder chosen by the per-id
    hash.  The oracle re-derives the exact copy counts and epoch
    indices."""
    docs = load_table(spark, sf_dir, "documents")
    out = pl.oversample(docs.select("doc_id", "lang", "source"),
                        "source", "doc_id", {"src0": 2.5, "src1": 1.5})
    return (out.select("doc_id", "source", F.col("__epoch").cast("long")
                       .alias("__epoch"))
            .orderBy("doc_id", "__epoch"))


@register("pipeline_fuzzy_pairs", """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE a.c_custkey < 400 AND b.c_custkey < 400
  AND levenshtein(a.c_name, b.c_name) <= 1
ORDER BY id_a, id_b
""")
def pipeline_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join (operators.fuzzy_pairs): customer-name pairs
    within Levenshtein distance 1 via positional banding — <= 1 edit
    leaves >= 3 of 4 bands identical, so the band equi-join has exact
    recall for aligned edits while never forming the all-pairs product
    (ubiquitous bands like the constant name prefix are frequency-
    pruned).  The oracle brute-forces the subset's true pair set: the
    banded path must reproduce it exactly."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < 400)
    out = ops.fuzzy_pairs(cust, "c_custkey", "c_name",
                          max_dist=1, n_bands=4)
    return ordered_result(out, "id_a", "id_b")


@register("pipeline_lm_likelihood", f"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
pairs0 AS (
  SELECT doc_id,
         unnest([struct_pack(w1 := t[i], w2 := t[i+1])
                 for i in range(1, len(t))]) AS p
  FROM tok WHERE len(t) >= 2),
pairs AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM pairs0),
vocab AS (
  SELECT COUNT(DISTINCT w) AS v
  FROM (SELECT unnest(t) AS w FROM tok)),
uni AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1),
bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY w1, w2),
scored AS (
  SELECT pr.doc_id,
         CAST(ROUND((bi.c2 + 1) / (uni.c1 + vocab.v) * 1000000000.0)
              AS BIGINT) AS p_nano
  FROM pairs pr
  JOIN bi ON pr.w1 = bi.w1 AND pr.w2 = bi.w2
  JOIN uni ON pr.w1 = uni.w1
  CROSS JOIN vocab)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(p_nano) AS BIGINT) AS sum_nano,
       CAST(FLOOR((CAST(SUM(p_nano) AS BIGINT) * 2 + COUNT(*))
                  / (COUNT(*) * 2)) AS DOUBLE) / 1000000000.0 AS mean_prob
FROM scored
GROUP BY doc_id
ORDER BY doc_id
""")
def pipeline_lm_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram-LM likelihood scoring — the perplexity-filter
    stage of an LLM training-data pipeline (C4/CCNet filter on LM
    likelihood).  Two aggregation phases over one tokenization: the
    corpus-level model (vocab size, prefix counts, bigram counts) and
    the per-doc mean of add-one-smoothed bigram probabilities.  Every
    probability is one double division of exact int64 counts rounded
    once to nano-units; the per-doc mean divides two exact int64s via
    the half-up FLOOR rendering — summation order cannot flip the
    hash.  See pipeline.text.lm_likelihood for the 100 TB posture
    (model stays a distributed table; bigram-key hash joins)."""
    docs = load_table(spark, sf_dir, "documents")
    return ordered_result(
        pl.lm_likelihood(docs, "doc_id", "text"), "doc_id")


_SQL_4GRAMS = ("list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' "
               "|| t[i+3] for i in range(1, len(t) - 2)])")


@register("pipeline_decontaminate", f"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
sh AS (
  SELECT doc_id, unnest({_SQL_4GRAMS}) AS s
  FROM tok WHERE len(t) >= 4),
train AS (SELECT * FROM sh WHERE doc_id % 20 <> 0),
eval_sh AS (SELECT doc_id AS eid, s FROM sh WHERE doc_id % 20 = 0)
SELECT t.doc_id,
       COUNT(*) AS n_collisions,
       COUNT(DISTINCT e.eid) AS n_eval_docs,
       MIN(e.eid) AS example_eval_id
FROM train t JOIN eval_sh e ON t.s = e.s
GROUP BY t.doc_id
ORDER BY t.doc_id
""")
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination (GPT-3/PaLM-style benchmark-leakage
    filter): flag training documents sharing any 4-token shingle with
    the held-out set (doc_id % 20 = 0 standing in for a benchmark
    suite), with exact collision counts and a witness eval id.
    Asymmetric containment — a train doc embedding one benchmark
    sentence flags at ~0 Jaccard, which the symmetric near-dup family
    would never surface.  Exact oracle: the identical shingle equi-join
    in DuckDB.  See pipeline.dedup.decontaminate for the 100 TB shape
    (eval shingles are the small build side; no pairwise work)."""
    docs = load_table(spark, sf_dir, "documents")
    evalset = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    return sorted_result(
        pl.decontaminate(train, evalset, "doc_id", "text", shingle_k=4),
        "doc_id")


# ---------------------------------------------------------------------------
# Exact-substring duplicate spans (Lee et al. 2022 primitive): the one
# dedup mode the family lacked — character-range-level duplication, for
# cutting repeated boilerplate rather than dropping whole documents.
# A deterministic boilerplate sentence is planted on doc_id % 7 = 0 (in
# BOTH engines) so the operator has substantial guaranteed spans on the
# word-salad synthetic text; natural 30-gram repeats are detected too
# and the oracle computes the identical set.
# ---------------------------------------------------------------------------

_PLANT = " <planted boilerplate sentence shared across documents 42>"
_SUBDUP_L = 30
# The DuckDB oracles enumerate gram positions from a STATIC series
# (generate_series refuses subquery bounds), capping duplicate
# detection at this many chars per document; the Spark side is
# unbounded.  Rather than silently diverge past the cap, the Spark
# fixture raises loudly on any over-cap document.
_SUBDUP_SERIES_CAP = 65536


def _capped_text(col: str = "text"):
    return F.expr(
        f"CASE WHEN length({col}) > {_SUBDUP_SERIES_CAP} THEN "
        f"raise_error('document exceeds the {_SUBDUP_SERIES_CAP}-char "
        f"substring-oracle series cap — widen the oracle series') "
        f"ELSE {col} END")

_AUG_CTE = f"""
aug AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || '{_PLANT}'
                            ELSE text END AS text
        FROM documents WHERE doc_id < 200)"""


def _spans_cte(src: str) -> str:
    """The exact-substring span chain (gram positions, duplicate grams,
    gaps-and-islands merge) over the given source CTE."""
    return f"""
ser AS (SELECT CAST(g AS INTEGER) AS i FROM generate_series(1, 65536) t(g)),
grams AS (SELECT doc_id, i AS pos, substr(text, i, {_SUBDUP_L}) AS g
          FROM {src} JOIN ser ON i <= length(text) - {_SUBDUP_L - 1}),
dups AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) > 1),
marked AS (SELECT m.doc_id, m.pos FROM grams m JOIN dups USING (g)),
isl AS (SELECT doc_id, pos,
        SUM(CASE WHEN prev_max IS NULL OR pos > prev_max + {_SUBDUP_L}
                 THEN 1 ELSE 0 END)
          OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM (SELECT doc_id, pos,
                     MAX(pos) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_max
              FROM marked)),
spans AS (SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
                 CAST(MAX(pos) + {_SUBDUP_L - 1} AS BIGINT) AS span_end
          FROM isl GROUP BY doc_id, island)
"""


_SUBDUP_AUG = _AUG_CTE + "," + _spans_cte("aug")


def _subdup_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents") \
        .filter(F.col("doc_id") < 200)
    aug = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(_PLANT)))
        .otherwise(F.col("text")).alias("text"))
    return aug.select("doc_id", _capped_text().alias("text"))


@register("pipeline_exact_substring_spans", f"""
WITH {_SUBDUP_AUG}
SELECT doc_id, span_start, span_end FROM spans
ORDER BY doc_id, span_start
""")
def pipeline_exact_substring_spans(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Maximal duplicated character spans (>= 30-char content occurring
    more than once anywhere in the corpus), merged per document — the
    exact-substring dedup primitive of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), whose output ranges a
    cut pass removes.  All-JVM plan: sliding-window gram explode, one
    exact hash shuffle on the gram string, equi-join back, per-document
    gaps-and-islands window (pipeline/dedup.exact_substring_spans —
    scale notes there: winnow-fingerprint prefilter bounds the gram
    blowup at 100 TB).  Exact oracle: the identical algorithm in DuckDB
    SQL over the identically planted corpus."""
    out = pl.exact_substring_spans(
        _subdup_aug(spark, sf_dir), "doc_id", "text", _SUBDUP_L)
    return sorted_result(out, "doc_id", "span_start")


@register("pipeline_substring_spans_prefiltered", f"""
WITH {_AUG_CTE},
tok AS (SELECT doc_id, {_SQL_TOKS} AS t FROM aug),
g AS (SELECT doc_id,
             [md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])
              for i in range(1, len(t) - 1)] AS h
      FROM tok WHERE len(t) >= 6),
wins AS (SELECT doc_id,
                list_distinct([list_min(h[i:i+3])
                               for i in range(1, len(h) - 2)]) AS fps
         FROM g WHERE len(h) >= 4),
f AS (SELECT doc_id, unnest(fps) AS fp FROM wins),
shared AS (SELECT fp FROM f GROUP BY fp HAVING COUNT(*) > 1),
cand AS (SELECT DISTINCT doc_id FROM f JOIN shared USING (fp)),
base AS (SELECT a.doc_id, a.text FROM aug a JOIN cand USING (doc_id)),
{_spans_cte("base")}
SELECT doc_id, span_start, span_end FROM spans
ORDER BY doc_id, span_start
""")
def pipeline_substring_spans_prefiltered(spark: SparkSession,
                                         sf_dir: str) -> DataFrame:
    """The 100 TB composition of exact-substring dedup: winnowing
    fingerprints (MOSS) prune the corpus to documents sharing at least
    one fingerprint BEFORE the per-character gram pass runs — on a
    duplication-sparse corpus the L x gram blowup is paid only on that
    sliver (measured in SCALE.md; tools/substring_sparse_probe.py).
    Recall: every duplicated run of >= window+k-1 tokens survives the
    prefilter (winnowing's guarantee); the span detection inside the
    candidate set is the exact hash-prefilter+verify pass.  The oracle
    recomputes the identical composition in DuckDB — the md5 window-min
    fingerprint selection, the shared-fp candidate set, and the span
    chain over it."""
    out = pl.exact_substring_spans_prefiltered(
        _subdup_aug(spark, sf_dir), "doc_id", "text", _SUBDUP_L,
        shingle_k=3, window=4)
    return sorted_result(out, "doc_id", "span_start")


@register("pipeline_substring_dup_stats", f"""
WITH {_SUBDUP_AUG},
per_doc AS (SELECT doc_id,
                   SUM(span_end - span_start + 1) AS dup_chars
            FROM spans GROUP BY doc_id)
SELECT a.doc_id, CAST(length(a.text) AS BIGINT) AS n_chars,
       CAST(COALESCE(p.dup_chars, 0) AS BIGINT) AS dup_chars
FROM aug a LEFT JOIN per_doc p USING (doc_id)
ORDER BY a.doc_id
""")
def pipeline_substring_dup_stats(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Per-document duplicated-character budget over the exact spans —
    the drop-heavy-duplication policy input (integer outputs only, so
    the cross-engine compare is exact; a pipeline filters with
    dup_chars * 100 > n_chars * pct)."""
    out = pl.substring_dup_stats(
        _subdup_aug(spark, sf_dir), "doc_id", "text", _SUBDUP_L)
    return sorted_result(out, "doc_id")


@register("pipeline_cut_spans", f"""
WITH {_SUBDUP_AUG},
seg AS (
  SELECT doc_id,
         COALESCE(LAG(span_end) OVER (PARTITION BY doc_id
                                      ORDER BY span_start), 0) + 1
             AS seg_start,
         span_start - 1 AS seg_end
  FROM spans
  UNION ALL
  SELECT a.doc_id, COALESCE(mx.last_end, 0) + 1, length(a.text)
  FROM aug a LEFT JOIN (SELECT doc_id, MAX(span_end) AS last_end
                        FROM spans GROUP BY doc_id) mx USING (doc_id)),
pieces AS (
  SELECT s.doc_id, s.seg_start,
         substr(a.text, CAST(s.seg_start AS INTEGER),
                CAST(s.seg_end - s.seg_start + 1 AS INTEGER)) AS piece
  FROM seg s JOIN aug a USING (doc_id)
  WHERE s.seg_end >= s.seg_start)
SELECT a.doc_id,
       COALESCE(p.text, '') AS text
FROM aug a LEFT JOIN (
  SELECT doc_id, string_agg(piece, '' ORDER BY seg_start) AS text
  FROM pieces GROUP BY doc_id) p USING (doc_id)
ORDER BY a.doc_id
""")
def pipeline_cut_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT pass completing exact-substring dedup (Lee et al. 2022):
    splice every duplicated span out of each document and return the
    cleaned text — compared STRING-EXACT against a DuckDB oracle that
    rebuilds the kept segments relationally (complement intervals +
    ordered string_agg).  Spark side folds a cursor over the per-doc
    sorted span array in one aggregate() lambda
    (pipeline.dedup.cut_substring_spans) — a co-partitioned
    groupBy+join on the doc id, no extra wide shuffle."""
    aug = _subdup_aug(spark, sf_dir)
    spans = pl.exact_substring_spans(aug, "doc_id", "text", _SUBDUP_L)
    out = pl.cut_substring_spans(aug, spans, "doc_id", "text")
    return sorted_result(
        out.select("doc_id", F.coalesce(F.col("text"), F.lit(""))
                   .alias("text")), "doc_id")


# ---------------------------------------------------------------------------
# End-to-end training-mix journey: the four cleaning stages composed the
# way a real data pipeline chains them, with every document attributed
# to its FIRST failing stage and the survivors' token budget reported
# per (lang, source).  Each stage's semantics are the already-attested
# operator's; the composition is what this query adds — and the oracle
# recomposes the identical stages from the same verified SQL fragments.
# ---------------------------------------------------------------------------

_MIX_ORACLE = f"""
WITH train AS (SELECT doc_id, lang, source, text FROM documents
               WHERE doc_id % 20 <> 0),
evalset AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
kept1 AS (SELECT doc_id FROM (
    SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY text
                                      ORDER BY doc_id) AS rn
    FROM train) WHERE rn = 1),
tok AS (SELECT doc_id, {_SQL_TOKS} AS t FROM train),
qual AS (SELECT doc_id FROM tok
         WHERE len(t) >= 15 AND len(list_distinct(t)) * 10 >= len(t) * 3),
tr_sh AS (SELECT DISTINCT doc_id, unnest({_SQL_4GRAMS}) AS s
          FROM tok WHERE len(t) >= 4),
ev_tok AS (SELECT doc_id, {_SQL_TOKS} AS t FROM evalset),
ev_sh AS (SELECT DISTINCT unnest({_SQL_4GRAMS}) AS s
          FROM ev_tok WHERE len(t) >= 4),
contam AS (SELECT DISTINCT t.doc_id FROM tr_sh t JOIN ev_sh e USING (s)),
surv3 AS (SELECT tr.* FROM train tr
          JOIN kept1 USING (doc_id) JOIN qual USING (doc_id)
          WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
ser AS (SELECT CAST(g AS INTEGER) AS i FROM generate_series(1, 65536) t(g)),
grams AS (SELECT doc_id, i AS pos, substr(text, i, 30) AS g
          FROM surv3 JOIN ser ON i <= length(text) - 29),
dups AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) > 1),
marked AS (SELECT m.doc_id, m.pos FROM grams m JOIN dups USING (g)),
isl AS (SELECT doc_id, pos,
        SUM(CASE WHEN prev_max IS NULL OR pos > prev_max + 30
                 THEN 1 ELSE 0 END)
          OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM (SELECT doc_id, pos,
                     MAX(pos) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_max
              FROM marked)),
spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 29 AS e
          FROM isl GROUP BY doc_id, island),
heavy AS (SELECT sv.doc_id FROM surv3 sv
          JOIN (SELECT doc_id, SUM(e - s + 1) AS dup_chars
                FROM spans GROUP BY doc_id) d USING (doc_id)
          WHERE d.dup_chars * 10 > length(sv.text) * 3),
status AS (
  SELECT tr.doc_id, tr.lang, tr.source,
         CASE WHEN k.doc_id IS NULL THEN 'dup'
              WHEN q.doc_id IS NULL THEN 'quality'
              WHEN c.doc_id IS NOT NULL THEN 'contaminated'
              WHEN h.doc_id IS NOT NULL THEN 'heavy_dup'
              ELSE 'kept' END AS st,
         len(t.t) AS n_toks
  FROM train tr
  LEFT JOIN kept1 k USING (doc_id)
  LEFT JOIN qual q USING (doc_id)
  LEFT JOIN contam c USING (doc_id)
  LEFT JOIN heavy h USING (doc_id)
  JOIN tok t USING (doc_id))
SELECT lang, source,
       CAST(SUM(CASE WHEN st = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(SUM(CASE WHEN st = 'dup' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup,
       CAST(SUM(CASE WHEN st = 'quality' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_quality,
       CAST(SUM(CASE WHEN st = 'contaminated' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated,
       CAST(SUM(CASE WHEN st = 'heavy_dup' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_heavy_dup,
       CAST(SUM(CASE WHEN st = 'kept' THEN n_toks ELSE 0 END) AS BIGINT)
           AS tokens_kept
FROM status GROUP BY lang, source ORDER BY lang, source
"""


@register("pipeline_training_mix_journey", _MIX_ORACLE)
def pipeline_training_mix_journey(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The four cleaning stages of a training-data pipeline COMPOSED:
    exact dedup (keep lowest id) -> quality gate (>= 15 tokens, >= 30%
    distinct) -> eval decontamination (shares any 4-token shingle with
    the doc_id % 20 = 0 holdout) -> exact-substring heavy-duplication
    gate (> 30% duplicated chars among stage-3 survivors).  Every doc
    is attributed to its FIRST failing stage; output is the per
    (lang, source) mix report with the survivors' token budget —
    integer-only columns, so the cross-engine compare is exact.  The
    per-stage plans are the attested operators' (dedup_exact,
    decontaminate, exact_substring_spans); this query attests that they
    compose — one pass per stage, each a hash shuffle or bucketed join,
    no driver materialization anywhere."""
    from pyspark.storagelevel import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 20 != 0) \
        .select("doc_id", "lang", "source", "text")
    evalset = docs.filter(F.col("doc_id") % 20 == 0)

    # every stage output below feeds at least two consumers (the next
    # stage's input and the final status attribution) — persist each
    # (all are doc-count-bounded id lists) so the text/shingle passes
    # run once per stage, not once per consumer
    mem = StorageLevel.MEMORY_AND_DISK
    kept1 = pl.dedup_exact(train, ["text"], "doc_id").select("doc_id") \
        .withColumn("__k", F.lit(1)).persist(mem)
    toks = train.select("doc_id", F.size(pl.tokens("text")).alias("__n"),
                        F.size(F.array_distinct(pl.tokens("text")))
                        .alias("__d")).persist(mem)
    qual = (toks.filter((F.col("__n") >= 15)
                        & (F.col("__d") * 10 >= F.col("__n") * 3))
            .select("doc_id").withColumn("__q", F.lit(1)))
    contam = (pl.decontaminate(train, evalset, "doc_id", "text",
                               shingle_k=4)
              .select("doc_id").withColumn("__c", F.lit(1)).persist(mem))
    surv3 = (train.join(kept1.drop("__k"), "doc_id")
             .join(qual.drop("__q"), "doc_id")
             .join(contam.drop("__c"), "doc_id", "left_anti")
             .persist(mem))
    heavy = (pl.substring_dup_stats(
                 surv3.withColumn("text", _capped_text()),
                 "doc_id", "text", 30)
             .filter(F.col("dup_chars") * 10 > F.col("n_chars") * 3)
             .select("doc_id").withColumn("__h", F.lit(1)))

    status = (train
              .join(kept1, "doc_id", "left")
              .join(qual, "doc_id", "left")
              .join(contam, "doc_id", "left")
              .join(heavy, "doc_id", "left")
              .join(toks.select("doc_id", "__n"), "doc_id")
              .withColumn("__st", F.when(F.col("__k").isNull(), "dup")
                          .when(F.col("__q").isNull(), "quality")
                          .when(F.col("__c").isNotNull(), "contaminated")
                          .when(F.col("__h").isNotNull(), "heavy_dup")
                          .otherwise("kept")))
    kept = F.col("__st") == "kept"
    out = (status.groupBy("lang", "source").agg(
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("__st") == "dup", 1).otherwise(0))
        .cast("long").alias("n_dup"),
        F.sum(F.when(F.col("__st") == "quality", 1).otherwise(0))
        .cast("long").alias("n_quality"),
        F.sum(F.when(F.col("__st") == "contaminated", 1).otherwise(0))
        .cast("long").alias("n_contaminated"),
        F.sum(F.when(F.col("__st") == "heavy_dup", 1).otherwise(0))
        .cast("long").alias("n_heavy_dup"),
        F.sum(F.when(kept, F.col("__n")).otherwise(0))
        .cast("long").alias("tokens_kept")))
    return sorted_result(out, "lang", "source")
