"""Tokenizers: BPE/char subword models."""
