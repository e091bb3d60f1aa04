"""n-gram language modelling: counting, ARPA I/O, backoff LM."""
