"""JSONL (newline-delimited JSON) page source with a corrupt-record
policy.

Real crawl dumps arrive as JSONL long before anyone lands them in a
table format, and real dumps contain garbage lines (truncated writes,
interleaved logs, encoding accidents). A source that silently drops or
— worse — dies on them is unusable at 10^12 documents, so this reader
makes the policy explicit, using Spark's native JSON datasource modes:

- ``mode='permissive'`` (default): malformed lines land in a
  ``_corrupt`` column (every schema field NULL, the raw line
  preserved) so the pipeline can COUNT and QUARANTINE them — the
  operational metric that tells you a shard upstream is broken;
- ``mode='dropmalformed'``: malformed lines vanish (the count is the
  reader's, not yours);
- ``mode='failfast'``: any malformed line fails the job.

Fidelity contract: JSON string escaping round-trips UTF-8 text
byte-exactly, so ``text`` read back here hashes identically to the
table it was exported from — asserted end-to-end by the
``jsonl_roundtrip`` driver query. Scale shape: the JSON datasource is
a splittable line-based scan (JSONL, not multi-line JSON) — schema is
REQUIRED here precisely so Spark never runs its sample-the-file
inference pass over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Schema of a JSONL page dump (input_hint shape minus the binary
#: column — JSON has no binary type; html ships base64 in ``text``-like
#: exports or sidecar files).
PAGES_JSONL_SCHEMA = (
    "url string, warc_ts timestamp, text string, lang string"
)

_MODES = ("permissive", "dropmalformed", "failfast")


def read_jsonl(spark: SparkSession, path, schema: str, *,
               mode: str = "permissive",
               corrupt_col: str = "_corrupt") -> DataFrame:
    """Read newline-delimited JSON with an explicit schema and corrupt
    policy. ``path`` is a glob string or a list of paths. In
    permissive mode the result carries ``corrupt_col`` (NULL for
    well-formed rows); a row is malformed iff that column is non-NULL.
    Field-level TYPE mismatches are flagged corrupt by permissive
    mode; their treatment under dropmalformed is version-dependent
    upstream and deliberately not part of this contract."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    reader = (spark.read
              .schema(schema + (f", {corrupt_col} string"
                                if mode == "permissive" else ""))
              .option("mode", mode.upper()))
    if mode == "permissive":
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.json(path)


def read_pages_jsonl(spark: SparkSession, path: str, *,
                     mode: str = "permissive") -> DataFrame:
    """:func:`read_jsonl` pinned to the page-dump schema."""
    return read_jsonl(spark, path, PAGES_JSONL_SCHEMA, mode=mode)
