"""Sinks: CSV / snappy parquet / partitioned writes; JDBC gated."""
