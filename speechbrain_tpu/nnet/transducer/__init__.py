"""Transducer-specific network pieces."""
