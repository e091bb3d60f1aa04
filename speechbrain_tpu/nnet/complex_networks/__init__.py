"""Complex-valued neural networks (channels = [real | imag] halves)."""
