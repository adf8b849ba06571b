"""Data sources: schema'd readers and the distributed synthetic
air-quality generator."""
