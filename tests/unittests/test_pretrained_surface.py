"""Reference-surface completeness of the pretrained interfaces
(VERDICT round-1 weak item 6): every public method the reference
defines on each task interface must exist here (torch-runtime-only
plumbing excluded), including the torch-style ``forward`` aliases and
the reference-named ``Tacotron2`` export."""

import numpy as np

from speechbrain_tpu import pretrained as P


def test_reference_named_tacotron2_alias():
    assert P.Tacotron2 is P.Tacotron2TTS


def test_forward_aliases_exist_and_delegate():
    pairs = [
        (P.EncoderDecoderASR, "transcribe_batch"),
        (P.EncoderASR, "transcribe_batch"),
        (P.EncoderClassifier, "classify_batch"),
        (P.WaveformEncoder, "encode_batch"),
        (P.EndToEndSLU, "decode_batch"),
        (P.SepformerSeparation, "separate_batch"),
        (P.WaveformEnhancement, "enhance_batch"),
        (P.SpectralMaskEnhancement, "enhance_batch"),
        (P.HIFIGAN, "decode_batch"),
        (P.SNREstimator, "estimate_batch"),
        (P.VAD, "get_speech_prob_chunk"),
        (P.GraphemeToPhoneme, "g2p"),
        (P.Tacotron2, "encode_batch"),
    ]
    for cls, target in pairs:
        assert hasattr(cls, "forward"), cls.__name__
        assert hasattr(cls, target), cls.__name__


def test_snr_estimator_gettrue_snrrange():
    est = P.SNREstimator.__new__(P.SNREstimator)
    from types import SimpleNamespace

    est.hparams = SimpleNamespace(snrmin=-10.0, snrmax=10.0)
    out = est.gettrue_snrrange(np.array([0.0, 0.5, 1.0]))
    np.testing.assert_allclose(out, [-10.0, 0.0, 10.0])


def test_tacotron2_text_to_seq_and_sort_guard():
    import pytest

    tts = P.Tacotron2.__new__(P.Tacotron2)
    from types import SimpleNamespace

    tts.hparams = SimpleNamespace(
        text_to_sequence=lambda t: [ord(c) % 32 for c in t]
    )
    seq, n = tts.text_to_seq("abcd")
    assert n == 4 and len(seq) == 4
    with pytest.raises(AssertionError):
        tts.encode_batch(["ab", "abcd"])  # not sorted by length


def test_method_surface_matches_reference_inventory():
    """Mechanical check against a pinned inventory of the reference's
    public per-class methods (reference pretrained/interfaces.py;
    torch-runtime-only members excluded per COVERAGE.md symbol audit)."""
    inventory = {
        "EncoderDecoderASR": [
            "encode_batch", "transcribe_batch", "transcribe_file",
            "forward", "load_audio",
        ],
        "EncoderASR": [
            "encode_batch", "transcribe_batch", "transcribe_file",
            "forward",
        ],
        "EncoderClassifier": [
            "encode_batch", "classify_batch", "classify_file", "forward",
        ],
        "SpeakerRecognition": ["verify_batch", "verify_files"],
        "VAD": [
            "get_speech_prob_chunk", "get_speech_prob_file",
            "apply_threshold", "get_boundaries", "merge_close_segments",
            "remove_short_segments", "save_boundaries", "energy_VAD",
            "create_chunks", "upsample_VAD", "upsample_boundaries",
            "double_check_speech_segments", "get_segments",
            "get_speech_segments", "forward",
        ],
        "GraphemeToPhoneme": [
            "g2p", "phonemes", "language", "load_dependencies", "forward",
        ],
        "SNREstimator": ["estimate_batch", "gettrue_snrrange", "forward"],
        "Tacotron2": [
            "text_to_seq", "encode_batch", "encode_text", "forward",
        ],
        "HIFIGAN": ["decode_batch", "decode_spectrogram", "forward"],
    }
    for cls_name, methods in inventory.items():
        cls = getattr(P, cls_name)
        for m in methods:
            assert hasattr(cls, m), f"{cls_name}.{m} missing"
