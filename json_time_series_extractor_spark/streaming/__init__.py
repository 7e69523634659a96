"""Structured Streaming shell over the batch stage functions."""
