"""LLM-data-pipeline operators: dedup, text analysis, similarity,
multimodal plumbing — the Phase-4 extensions from SURVEY.md §7."""

from lingo_db_spark.pipeline.barrier import (  # noqa: F401
    BARRIER_CONF,
    barrier,
    release_barriers,
    truncate_lineage,
)
from lingo_db_spark.pipeline.dedup import (  # noqa: F401
    cut_substring_spans,
    decontaminate,
    exact_substring_spans,
    exact_substring_spans_prefiltered,
    substring_dup_stats,
    dedup_exact,
    hamming64,
    jaccard,
    lsh_candidate_pairs,
    minhash_signature,
    neardup_clusters,
    neardup_minhash,
    neardup_ngram_jaccard,
    neardup_simhash,
    overlap_pairs,
    simhash,
    spread,
    winnow_fingerprints,
)
from lingo_db_spark.pipeline.packing import (  # noqa: F401
    global_running_sum,
    pack_sequences_next_fit,
    pack_to_budget,
)
from lingo_db_spark.pipeline.sampling import (  # noqa: F401
    hash_fraction,
    mix_to_proportions,
    oversample,
    stratified_sample,
)
from lingo_db_spark.pipeline.text import (  # noqa: F401
    bpe_token_estimate,
    chunk_documents,
    digit_ratio,
    fingerprint,
    lang_id,
    lm_likelihood,
    normalized_text,
    punct_ratio,
    quality_score,
    quality_stats,
    redact_pii,
    repetition_stats,
    shingles,
    stopword_ratio,
    token_count,
    tokens,
)
