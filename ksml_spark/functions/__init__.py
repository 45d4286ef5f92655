"""Scalar/table function library extensions (dedup, text, similarity, multimodal)."""
