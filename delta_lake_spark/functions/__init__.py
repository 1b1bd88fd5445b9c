"""Column-level function library: text analysis, dedup, similarity, multimodal."""
