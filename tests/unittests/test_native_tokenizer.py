"""Native (C++) tokenizer: parity with the pure-Python implementation.

The native library fills the role sentencepiece's C++ core plays in the
reference (``tokenizers/SentencePiece.py:279,395``); these tests pin
the contract between the two train/encode paths.
"""

import random

import pytest

from speechbrain_tpu.tokenizers.SentencePiece import BPEModel


def _corpus(n_sentences=400, seed=0):
    random.seed(seed)
    words = [
        "".join(random.choices("abcdefghijklmnop", k=random.randint(2, 8)))
        for _ in range(150)
    ]
    return [
        " ".join(random.choices(words, k=random.randint(3, 10)))
        for _ in range(n_sentences)
    ]


@pytest.fixture(scope="module")
def native_available():
    from speechbrain_tpu import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    return True


@pytest.mark.parametrize("model_type", ["bpe", "unigram"])
def test_native_roundtrip_and_overlap(native_available, model_type):
    corpus = _corpus()
    m_nat = BPEModel(vocab_size=120, model_type=model_type).train(corpus)
    m_py = BPEModel(
        vocab_size=120, model_type=model_type, use_native=False
    ).train(corpus)
    assert 110 <= m_nat.get_piece_size() <= 120
    for text in corpus[:40]:
        assert m_nat.decode_ids(m_nat.encode_as_ids(text)) == text
        assert m_py.decode_ids(m_py.encode_as_ids(text)) == text
    overlap = len(set(m_nat.pieces) & set(m_py.pieces)) / len(m_py.pieces)
    assert overlap > 0.75


def test_native_save_load_consistent(native_available, tmp_path):
    corpus = _corpus(200, seed=3)
    m = BPEModel(vocab_size=90, model_type="bpe").train(corpus)
    path = str(tmp_path / "tok.model.json")
    m.save(path)
    m2 = BPEModel.load(path)
    for text in corpus[:30]:
        assert m2.encode_as_ids(text) == m.encode_as_ids(text)
        assert m2.encode_as_pieces(text) == m.encode_as_pieces(text)


def test_native_unicode(native_available):
    corpus = ["héllo wörld käse", "wörld käse süß", "héllo süß"] * 5
    m = BPEModel(vocab_size=60, model_type="bpe").train(corpus)
    for text in corpus[:3]:
        assert m.decode_ids(m.encode_as_ids(text)) == text


def test_native_encoder_matches_ids_and_pieces(native_available):
    corpus = _corpus(150, seed=7)
    m = BPEModel(vocab_size=80, model_type="unigram").train(corpus)
    for text in corpus[:20]:
        ids = m.encode_as_ids(text)
        pieces = m.encode_as_pieces(text)
        assert [m.pieces[i] for i in ids] == pieces
