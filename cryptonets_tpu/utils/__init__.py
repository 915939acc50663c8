"""Cross-cutting utilities: op counters, timing, tracing."""
