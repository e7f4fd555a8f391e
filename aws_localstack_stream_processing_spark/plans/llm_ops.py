"""LLM-data-pipeline operator queries (dedup, similarity, text, multimodal) — filled in incrementally."""
