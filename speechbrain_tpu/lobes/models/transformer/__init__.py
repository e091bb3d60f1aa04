"""Transformer/Conformer model family."""
