"""Reusable composite operators (gap fill, as-of join, incremental patterns)."""
