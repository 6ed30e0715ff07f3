"""Custom relational operators beyond Catalyst built-ins: skew-salted
join and aggregation (skew.py)."""
