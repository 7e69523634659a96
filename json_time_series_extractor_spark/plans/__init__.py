"""Plan-level helpers: session building, lineage/checkpointing, skew salting."""
