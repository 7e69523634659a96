"""Spark DataFrame operators (extraction, rollup, gap-fill, compression,
dedup, similarity, text analysis)."""
