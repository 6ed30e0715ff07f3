"""Training-data pipeline operators: dedup.py, similarity.py, text.py,
multimodal.py (the north-star extensions; see COVERAGE.md)."""
