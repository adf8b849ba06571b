"""Distributed operators: cleaning, features, aggregates, analytics,
dedup, text, ANN, multimodal, general analytics."""
