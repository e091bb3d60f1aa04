"""Decoding/search: CTC, seq2seq beam search, transducer search."""

from speechbrain_tpu.decoders import ctc, seq2seq, transducer  # noqa: F401
