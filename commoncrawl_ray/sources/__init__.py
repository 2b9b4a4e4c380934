"""Deterministic synthetic page universe + parquet readers."""
