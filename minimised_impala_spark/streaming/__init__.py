"""Structured Streaming operators: windowed aggregation with watermarks
(windows.py) and custom stateful sessionization (stateful.py)."""
