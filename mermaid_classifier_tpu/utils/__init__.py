"""Cross-cutting utilities: logging, profiling."""
