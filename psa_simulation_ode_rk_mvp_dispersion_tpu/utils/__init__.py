"""Cross-cutting utilities: precision policy, unit boundaries, trace-aware
validation."""
