"""Reusable Column-expression helpers (JVM-side, no Python UDFs).

One import point for the engine's scalar/array expression functions —
the Spark-facing analog of the reference's static helper surface
(``TimeSeriesExtractor.CreateJsonPointerMatchDelegate`` etc. in
``/root/reference/src/JsonTimeSeriesExtractor/TimeSeriesExtractor.cs``).
Implementations live next to their operators; this module is the stable
re-export surface.
"""

from json_time_series_extractor_spark.operators.dedup import (
    simhash64,
    word_shingles,
)
from json_time_series_extractor_spark.operators.sampling import (
    hash_rank,
)
from json_time_series_extractor_spark.operators.similarity import (
    cosine,
    cosine_flat,
    dot_flat,
    hyperplane_signature,
)
from json_time_series_extractor_spark.operators.textstats import (
    bpe_ish_token_count,
    normalized_fingerprint,
    rolling_shingle_fingerprint,
    token_count,
    tokens,
)
from json_time_series_extractor_spark.operators.urltools import (
    canonical_url,
)
from json_time_series_extractor_spark.sources.pages import (
    html_payload_text,
)

__all__ = [
    "bpe_ish_token_count",
    "canonical_url",
    "cosine",
    "cosine_flat",
    "dot_flat",
    "hash_rank",
    "html_payload_text",
    "hyperplane_signature",
    "normalized_fingerprint",
    "rolling_shingle_fingerprint",
    "simhash64",
    "token_count",
    "tokens",
    "word_shingles",
]
