"""Spark operators: signature computation, banded bucketing, candidate
pair generation/verification, substring pass, connected components, and
the training-data-pipeline extras (dedup variants, ANN, text analysis)."""
