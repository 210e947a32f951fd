"""Real-data quality-parity staging (BASELINE.md quality-parity plan)."""
