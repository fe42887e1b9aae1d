"""Text-analysis operators for large-scale training-data pipelines:
tokenization, shingling, fingerprinting, quality scoring, token-count
estimation, and a stopword-based language-ID heuristic.

These have no reference counterpart (lingo-db is a pure OLAP engine); they
are the pipeline extensions SURVEY.md §7 Phase 4 calls for.  Everything
here is JVM-side (built-in functions + higher-order array functions) so it
stays inside whole-stage codegen — no Python in the hot path — and every
operator is a narrow (per-row) transformation: no shuffle, scales linearly
with input splits at any data size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from lingo_db_spark.pipeline.barrier import barrier

# Normalization: lowercase, collapse any non-alphanumeric run to one space.
_NON_ALNUM = "[^a-z0-9]+"


def normalized_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), _NON_ALNUM, " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.filter(F.split(normalized_text(col), " "), lambda t: t != "")


def shingles(tokens_col: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (array<string>); empty array when the
    document has fewer than k tokens."""
    n = F.size(tokens_col)
    made = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.array_join(F.slice(tokens_col, i, k), " "))
    return F.when(n >= k, F.array_distinct(made)).otherwise(
        F.array().cast("array<string>"))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    md5 (not xxhash64) so external systems — and the DuckDB oracle — can
    reproduce it bit-for-bit."""
    return F.md5(normalized_text(col))


# --- quality statistics ----------------------------------------------------

_STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_token_estimate(col: Column | str) -> Column:
    """BPE-ish token-count estimate without a tokenizer model: alphabetic
    runs count ~1 token per 4 chars (ceil), every digit and every other
    non-space symbol counts 1 — a cheap, deterministic stand-in with the
    right order of magnitude for budget accounting."""
    c = F.col(col) if isinstance(col, str) else col
    alpha_chars = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(c, "[^0-9]", ""))
    symbols = F.length(F.regexp_replace(c, "[A-Za-z0-9\\s]", ""))
    return (F.ceil(alpha_chars / F.lit(4.0)) + digits + symbols).cast("long")


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.greatest(F.length(c), F.lit(1))
    return F.length(F.regexp_replace(c, "[^.,;:!?'\"()-]", "")) / n


def digit_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.greatest(F.length(c), F.lit(1))
    return F.length(F.regexp_replace(c, "[^0-9]", "")) / n


def stopword_ratio(col: Column | str, stopwords=_STOPWORDS_EN) -> Column:
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length in a sane band, enough
    tokens, low punctuation/digit noise, some stopword mass (fluent prose).
    Mirrors the hand-rolled quality filters of public web-scale pipeline
    recipes (C4-style heuristics)."""
    c = F.col(col) if isinstance(col, str) else col
    ln = F.length(c)
    score = (
        F.when((ln >= 50) & (ln <= 20000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(token_count(c) >= 10, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio(c) <= 0.10, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stopword_ratio(c) >= 0.01, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return score


def quality_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """(id, n_tokens, bpe_est, punct_r, stopword_r, quality) in ONE pass:
    the token array and the punctuation count are materialized in a first
    projection so the regex+split normalization runs once per row, not once
    per statistic (Catalyst keeps non-cheap expressions in their own
    project; verified in the physical plan).  The input is spread to the
    cluster's parallelism first — a single-file source must not pin this
    CPU-bound scan to one task (no-op at scale, where scans already
    produce >= cores splits)."""
    from lingo_db_spark.pipeline.dedup import spread

    c = F.col(text_col)
    sw = F.array(*[F.lit(w) for w in _STOPWORDS_EN])
    toked = spread(df.select(id_col, text_col), id_col).select(
        id_col, text_col,
        tokens(c).alias("__toks"),
        F.length(F.regexp_replace(c, "[^.,;:!?'\"()-]", "")).alias("__np"))
    nt = F.size(F.col("__toks"))
    ln = F.length(c)
    punct = F.col("__np") / F.greatest(ln, F.lit(1))
    swr = (F.size(F.filter(F.col("__toks"),
                           lambda t: F.array_contains(sw, t)))
           / F.greatest(nt, F.lit(1)))
    quality = (
        F.when((ln >= 50) & (ln <= 20000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(nt >= 10, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct <= 0.10, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(swr >= 0.01, F.lit(0.25)).otherwise(F.lit(0.0)))
    return toked.select(
        id_col,
        nt.cast("long").alias("n_tokens"),
        bpe_token_estimate(c).alias("bpe_est"),
        F.round(punct, 6).alias("punct_r"),
        F.round(swr, 6).alias("stopword_r"),
        F.round(quality, 2).alias("quality"))


# --- language identification ----------------------------------------------

# Tiny high-frequency marker lexicons; enough to separate the major
# European languages and CJK on real prose (unit-tested on constructed
# snippets — the driver's synthetic `documents.lang` labels are metadata,
# not derivable from the word-soup text).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr": ("le", "la", "les", "et", "est", "pas", "une", "dans"),
    "es": ("el", "los", "las", "es", "una", "que", "por", "con"),
}


def lang_id(col: Column | str) -> Column:
    """Best-guess language code by marker-token hits; 'zh' when CJK
    codepoints dominate; 'und' when nothing matches.  Pure JVM expression:
    per-language hit counts -> argmax via array_max over (score, lang)
    structs (deterministic tie-break: lexicographically greatest lang at
    equal score, pinned by tests)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(tokens(c))
    scored = []
    for lang, markers in LANG_MARKERS.items():
        lex = F.array(*[F.lit(w) for w in markers])
        score = F.size(F.filter(toks, lambda t: F.array_contains(lex, t)))
        scored.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scored))
    cjk = F.length(F.regexp_replace(c, "[^\\u4e00-\\u9fff]", ""))
    return (F.when(cjk * 2 >= F.length(c), F.lit("zh"))
            .when(best.getField("score") > 0, best.getField("lang"))
            .otherwise(F.lit("und")))


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int = 64, overlap: int = 16) -> DataFrame:
    """Split documents into overlapping token windows — the
    context-window chunking step in front of embedding/training
    pipelines.  Chunk starts advance by (chunk_tokens - overlap); the
    final chunk is the possibly-short tail.  Pure JVM higher-order
    expressions over the token array (one tokenize, a sequence of
    slices, one explode) — no UDF, no shuffle; output grows by
    ~1/(1-overlap_ratio) and the explode is narrow.
    Returns (id, chunk_idx, n_chunk_tokens, chunk_text).

    Materialization contract: the token array is pinned behind
    pipeline.barrier (recompute-safe lazy persist by default; the
    opt-in localCheckpoint strategy makes this function run a job
    EAGERLY at plan-construction time — see barrier's docstring)."""
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    # barrier: the chunk lambda slices __t per chunk — without it the
    # tokenization re-evaluates per chunk (lambda-body references
    # re-evaluate per element; projection boundaries don't stop it)
    toked = barrier(df.select(F.col(id_col), tokens(text_col).alias("__t")))
    n = F.size("__t")
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)).cast("double") / step).cast("int"))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.slice("__t", i * step + 1, chunk_tokens).alias("toks")))
    return (toked.filter(n > 0)
            .select(F.col(id_col), F.explode(chunks).alias("c"))
            .select(F.col(id_col),
                    F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
                    F.size("c.toks").cast("long").alias("n_chunk_tokens"),
                    F.array_join("c.toks", " ").alias("chunk_text")))


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Intra-document repetition signals (the Gopher/C4 repetition
    filters): fraction of duplicated tokens (1 - distinct/total) and the
    share of the most frequent token bigram.  High values mark
    boilerplate/spam documents for the quality gate.

    Bigram counting is RELATIONAL (bigram zip -> explode -> per-(doc,
    gram) hash aggregate -> per-doc max), not a nested array filter:
    the old `transform(distinct, g -> size(filter(grams, = g)))` was
    O(n^2) PER DOCUMENT — and because expressions inside lambda bodies
    re-evaluate per element, each of those gram-list evaluations
    re-tokenized the document (measured 5.3 s -> 0.6 s at sf0.1, and
    the shuffle-keyed aggregate is the shape that survives 100 TB where
    a quadratic per-row expression cannot).

    Materialization contract: tokenization is pinned behind
    pipeline.barrier (lazy recompute-safe persist by default; eager
    under the opt-in localCheckpoint strategy)."""
    toked = barrier(df.select(F.col(id_col), tokens(text_col).alias("__t")))
    n = F.size("__t")
    dup_frac = F.when(
        n > 0,
        F.lit(1.0) - F.size(F.array_distinct("__t")).cast("double") / n
    ).otherwise(F.lit(0.0))
    base = toked.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(dup_frac, 6).alias("dup_token_frac"))
    # bigrams once per row via zip_with of the shifted copy (arguments
    # evaluate once per row; the trailing NULL pair drops in the join)
    grams = F.zip_with(F.col("__t"),
                       F.slice(F.col("__t"), 2, F.greatest(n - 1, F.lit(0))),
                       lambda a, b: F.concat(a, F.lit(" "), b))
    top = (toked.select(F.col(id_col), F.explode(grams).alias("__g"))
           .filter(F.col("__g").isNotNull())
           .groupBy(id_col, "__g").agg(F.count(F.lit(1)).alias("__c"))
           .groupBy(id_col).agg(F.max("__c").alias("__top")))
    return (base.join(top, id_col, "left")
            .select(
                F.col(id_col), F.col("n_tokens"), F.col("dup_token_frac"),
                F.round(
                    F.when(F.col("n_tokens") >= 2,
                           F.col("__top").cast("double")
                           / (F.col("n_tokens") - 1))
                    .otherwise(F.lit(0.0)), 6).alias("top_bigram_share")))


def redact_pii(col: Column | str) -> Column:
    """Deterministic PII scrubbing for training corpora: emails, then
    long digit runs (7+, phone/account numbers), replaced with typed
    placeholders.  Order matters (emails contain digits); pure
    regexp_replace chain, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(
        c, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>")
    return F.regexp_replace(c, r"[0-9][0-9 \-]{5,}[0-9]", "<NUMBER>")


def lm_likelihood(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Corpus bigram-LM likelihood scoring — the perplexity-filter stage
    of an LLM data pipeline (C4/CCNet filter documents on language-model
    likelihood; the reference's analogue surface is its runtime string/
    aggregation kernels composed the same way).

    Two aggregation phases over one tokenization:
      1. MODEL: corpus-level counts — vocabulary size V, bigram-prefix
         counts c(w1), bigram counts c(w1,w2).
      2. SCORE: every doc bigram joined to the model; add-one-smoothed
         probability p = (c(w1,w2)+1)/(c(w1)+V); per-doc mean.

    Exactness contract (oracle-hash-stable): each p is one double
    division of exact int64 counts (bit-identical cross-engine), scaled
    to nano-units and rounded ONCE to int64; the per-doc mean divides
    two exact int64s with the half-up FLOOR rendering — float summation
    order can never flip a hash.

    Scale posture: the model is itself a distributed table (vocab^2
    worst case, corpus-bounded in practice) — doc bigrams hash-join to
    it on (w1,w2), then on w1; no driver-side model, no broadcast of a
    corpus-sized side; both joins reuse the bigram shuffle key family.

    Materialization contract: tokenization is pinned behind
    pipeline.barrier (lazy recompute-safe persist by default; eager
    under the opt-in localCheckpoint strategy).
    """
    # barrier: the bigram lambda reads element_at(t, i) per position —
    # without a materialization the tokenization re-evaluates per
    # bigram (lambda-body references re-evaluate per element); toks
    # also feeds both the model aggregates and the scoring pass
    toks = barrier(df.select(F.col(id_col), tokens(text_col).alias("t")))
    bigrams = (toks
               .where(F.size("t") >= 2)
               .select(id_col, F.explode(F.transform(
                   F.sequence(F.lit(1), F.size("t") - 1),
                   lambda i: F.struct(
                       F.element_at("t", i).alias("w1"),
                       F.element_at("t", i + 1).alias("w2")))).alias("bg"))
               .select(id_col, "bg.w1", "bg.w2"))
    vocab = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").alias("v"))
    bi = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    # r14 opt round: the prefix counts are DERIVED from the bigram
    # counts — c(w1) = sum_w2 c(w1, w2), an exact integer identity — so
    # the model builds from the (vocab-sized) bi table instead of a
    # second corpus-scale aggregation over every bigram occurrence, and
    # the enriched model joins the occurrences ONCE on (w1, w2) instead
    # of a second corpus-sized re-join on w1 (two corpus-scale
    # exchanges removed; the (w1, w2) shuffle is shared between the bi
    # aggregate and the join probe).
    uni = bi.groupBy("w1").agg(F.sum("c2").alias("c1"))
    model = bi.join(uni, "w1")
    scored = (bigrams
              .join(model, ["w1", "w2"])
              .crossJoin(F.broadcast(vocab))   # 1-row corpus constant
              .select(id_col,
                      F.round((F.col("c2") + 1)
                              / (F.col("c1") + F.col("v")) * 1e9)
                      .cast("long").alias("p_nano")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("p_nano").alias("sum_nano"))
            .select(id_col,
                    "n_bigrams",
                    F.col("sum_nano").cast("long").alias("sum_nano"),
                    (F.floor((F.col("sum_nano") * 2 + F.col("n_bigrams"))
                             / (F.col("n_bigrams") * 2)).cast("double")
                     / 1e9).alias("mean_prob")))
