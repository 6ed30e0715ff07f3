"""Scalar-function parity layer (SURVEY §2.8) — see functions/parity.py."""
