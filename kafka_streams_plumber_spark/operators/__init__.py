"""Dataflow operators: pipeline algebra, schema conform, and the
large-scale extensions (dedup, similarity, text analysis, multimodal)."""
