"""Chunk compression operator: samples -> binary Gorilla chunks and back.

Spark has no native Gorilla codec, so this is the engine's second (and
last) Python boundary: ``applyInPandas`` per (series_key, chunk_start)
group — numpy arrays in, two small ``BinaryType`` blobs out. Chunking is
by tumbling window on the timestamp (default 1 hour, mirroring Gorilla's
2h blocks), so chunk size is bounded and group state fits memory at any
table scale.

Scale notes: the groupBy shuffles once on (series_key, chunk_start) — the
same key domain as the rollup, so co-partitioning with rollup outputs is
possible. Chunks are idempotent (same input -> byte-identical blob),
making the write MERGE/resume-safe.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from json_time_series_extractor_spark.core import chimp, gorilla

#: value-stream codecs (timestamps always use gorilla delta-of-delta —
#: Chimp, per its paper, only redefines the VALUE encoding)
_VALUE_CODECS = {"gorilla": gorilla, "chimp": chimp}


def _value_codec(codec: str):
    try:
        return _VALUE_CODECS[codec]
    except KeyError:
        raise ValueError(f"unknown chunk value codec {codec!r}; "
                         f"one of {sorted(_VALUE_CODECS)}")

CHUNK_SCHEMA = (
    "series_key string, chunk_start timestamp, n int, "
    "ts_min timestamp, ts_max timestamp, v_min double, v_max double, "
    "ts_blob binary, val_blob binary"
)

DECODED_SCHEMA = "series_key string, ts timestamp, value_double double"


def _encode_group(pdf: pd.DataFrame, codec: str = "gorilla") -> pd.DataFrame:
    pdf = pdf.sort_values("ts", kind="mergesort")  # stable: ties keep order
    ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    values = pdf["value_double"].to_numpy(dtype="float64")
    ts_blob = gorilla.encode_timestamps(ts_us)
    val_blob = _value_codec(codec).encode_values(values)
    return pd.DataFrame({
        "series_key": [pdf["series_key"].iloc[0]],
        "chunk_start": [pdf["chunk_start"].iloc[0]],
        "n": [len(pdf)],
        "ts_min": [pdf["ts"].iloc[0]],
        "ts_max": [pdf["ts"].iloc[-1]],
        "v_min": [float(values.min())],
        "v_max": [float(values.max())],
        "ts_blob": [ts_blob],
        "val_blob": [val_blob],
    })


def compress_chunks(samples: DataFrame, chunk_interval: str = "1 hour",
                    *, key_col: str = "series_key", ts_col: str = "ts",
                    value_col: str = "value_double",
                    codec: str = "gorilla") -> DataFrame:
    """Pack numeric samples into per-(series, window) compressed chunks.

    ``codec`` picks the VALUE encoding: ``gorilla`` (XOR, VLDB'15) or
    ``chimp`` (flagged XOR with rounded lead classes, PVLDB'22 — smaller
    on noisy/random-walk values, slightly larger on constant runs);
    timestamps always use delta-of-delta. The codec is a table-level
    choice recorded by the caller (the blob layout is self-framing per
    codec but not self-identifying)."""
    prepared = (samples
                .where(F.col(value_col).isNotNull())
                .select(F.col(key_col).alias("series_key"),
                        F.col(ts_col).alias("ts"),
                        F.col(value_col).alias("value_double"),
                        F.window(ts_col, chunk_interval)["start"]
                        .alias("chunk_start")))
    _value_codec(codec)  # validate eagerly, not in the executor closure

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_group(pdf, codec)

    return (prepared
            .groupBy("series_key", "chunk_start")
            .applyInPandas(encode, CHUNK_SCHEMA))


def _decode_batch(pdf: pd.DataFrame, codec: str = "gorilla") -> pd.DataFrame:
    vcodec = _value_codec(codec)
    keys, tss, vals = [], [], []
    for row in pdf.itertuples(index=False):
        ts_us = gorilla.decode_timestamps(bytes(row.ts_blob))
        values = vcodec.decode_values(bytes(row.val_blob))
        keys.append(pd.Series([row.series_key]).repeat(len(ts_us)))
        tss.append(ts_us)
        vals.append(values)
    if not keys:
        return pd.DataFrame({"series_key": pd.Series(dtype="object"),
                             "ts": pd.Series(dtype="datetime64[us]"),
                             "value_double": pd.Series(dtype="float64")})
    import numpy as np
    return pd.DataFrame({
        "series_key": pd.concat(keys, ignore_index=True),
        "ts": pd.Series(np.concatenate(tss)).astype("datetime64[us]"),
        "value_double": np.concatenate(vals),
    })


def scan_chunks_pruned(chunks: DataFrame, *,
                       value_lo: float | None = None,
                       value_hi: float | None = None,
                       ts_lo=None, ts_hi=None,
                       codec: str = "gorilla") -> DataFrame:
    """Zone-map-pruned chunk scan: decode only the chunks whose
    [v_min, v_max] × [ts_min, ts_max] envelope can intersect the
    requested value/time range, then apply the exact residual filter
    to the decoded samples (zone maps admit false positives, never
    false negatives). Bounds are inclusive; a ``None`` bound is open.

    Scale shape: the zone-map predicate is a plain Column filter on the
    chunk table's stats columns, so it sits BEFORE the Python decode in
    the plan — pruned chunks never cross the Arrow boundary — and on a
    parquet/Iceberg chunk table it also pushes down to the scan
    (PushedFilters on ts_min/ts_max/v_min/v_max + partition pruning on
    chunk_start), so pruned chunks are never even read. This is the
    TSDB page-index trick (Gorilla §4.2's block index, parquet column
    stats) applied to the engine's own chunk format.
    """
    pruned = chunks
    if value_lo is not None:
        pruned = pruned.where(F.col("v_max") >= value_lo)
    if value_hi is not None:
        pruned = pruned.where(F.col("v_min") <= value_hi)
    if ts_lo is not None:
        pruned = pruned.where(F.col("ts_max") >= ts_lo)
    if ts_hi is not None:
        pruned = pruned.where(F.col("ts_min") <= ts_hi)
    out = decompress_chunks(pruned, codec=codec)
    v, t = F.col("value_double"), F.col("ts")
    if value_lo is not None:
        out = out.where(v >= value_lo)
    if value_hi is not None:
        out = out.where(v <= value_hi)
    if ts_lo is not None:
        out = out.where(t >= ts_lo)
    if ts_hi is not None:
        out = out.where(t <= ts_hi)
    return out


def decompress_chunks(chunks: DataFrame, *,
                      codec: str = "gorilla") -> DataFrame:
    """Inverse of :func:`compress_chunks`: chunks -> (series_key, ts, value).

    Map-only: every chunk row decodes independently, so this is a
    ``mapInPandas`` — no shuffle, unlike a grouped decode."""
    _value_codec(codec)  # validate eagerly, not in the executor closure

    def run(batches):
        for pdf in batches:
            yield _decode_batch(pdf, codec)

    return chunks.select("series_key", "ts_blob", "val_blob").mapInPandas(
        run, DECODED_SCHEMA)
