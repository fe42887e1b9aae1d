"""Custom operators beyond plain relational algebra (similarity search,
and the composition helpers that back them)."""

from lingo_db_spark.operators.groupjoin import group_join  # noqa: F401
from lingo_db_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    cosine,
    dequantize_embeddings,
    dot,
    embed_neardup,
    ivf_topk,
    lsh_buckets,
    lsh_topk,
    norm,
    quantize_embeddings,
)
