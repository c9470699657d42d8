"""Scan/sink layer beyond parquet (SURVEY §2.1)."""
