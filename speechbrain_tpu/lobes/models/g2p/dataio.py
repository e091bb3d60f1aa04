"""Data pipeline elements for the G2P pipeline.

TPU-native counterpart of the reference ``lobes/models/g2p/dataio.py``:
host-side dynamic items (plain functions / generators registered with
``DataPipeline``) that clean text, encode graphemes/phonemes, run
tokenizers, and decode beam-search output.  Arrays are numpy (the
host representation in this framework); devices only see the padded
batches the loader produces.
"""

import re
from functools import reduce

import numpy as np

RE_MULTI_SPACE = re.compile(r"\s{2,}")


def clean_pipeline(txt, graphemes):
    """Removes characters not in the accepted grapheme list and
    uppercases (reference ``g2p/dataio.py:19``).

    Example
    -------
    >>> clean_pipeline("hello,  world!", list("HELO WRD"))
    'HELLO WORLD'
    """
    result = txt.upper()
    result = "".join(char for char in result if char in graphemes)
    return RE_MULTI_SPACE.sub(" ", result)


def grapheme_pipeline(char, grapheme_encoder=None, uppercase=True):
    """Encodes a grapheme sequence (reference ``g2p/dataio.py:42``).

    Yields the raw grapheme list, the encoded list, and the encoded
    numpy array (generator dynamic item: three ``provides``).
    """
    if uppercase:
        char = char.upper()
    grapheme_list = [
        g for g in char if g in grapheme_encoder.lab2ind
    ]
    yield grapheme_list
    grapheme_encoded_list = grapheme_encoder.encode_sequence(grapheme_list)
    yield grapheme_encoded_list
    yield np.asarray(grapheme_encoded_list, dtype=np.int64)


def tokenizer_encode_pipeline(
    seq,
    tokenizer,
    tokens,
    wordwise=True,
    word_separator=" ",
    token_space_index=512,
    char_map=None,
):
    """Pipeline element using a pretrained tokenizer (reference
    ``g2p/dataio.py:77``).  ``char_map`` maps multi-character phoneme
    labels onto single characters so they can be tokenized."""
    token_list = [token for token in seq if token in tokens]
    yield token_list
    tokenizer_input = "".join(
        _map_tokens_item(token_list, char_map)
        if char_map is not None
        else token_list
    )
    if wordwise:
        encoded_list = _wordwise_tokenize(
            tokenizer(), tokenizer_input, word_separator, token_space_index
        )
    else:
        encoded_list = tokenizer().sp.encode_as_ids(tokenizer_input)
    yield encoded_list
    yield np.asarray(encoded_list, dtype=np.int64)


def _wordwise_tokenize(tokenizer, sequence, input_separator, token_separator):
    """Tokenizes one word at a time, joining with ``token_separator``
    so tokens never span word boundaries."""
    if input_separator not in sequence:
        return tokenizer.sp.encode_as_ids(sequence)
    words = list(_split_list(sequence, input_separator))
    encoded_words = [tokenizer.sp.encode_as_ids(word) for word in words]
    sep_list = [token_separator]
    return reduce(lambda left, right: left + sep_list + right, encoded_words)


def _wordwise_detokenize(tokenizer, sequence, output_separator, token_separator):
    """Inverse of ``_wordwise_tokenize``."""
    if isinstance(sequence, str) and sequence == "":
        return ""
    if token_separator not in sequence:
        sequence_list = (
            sequence if isinstance(sequence, list) else list(sequence)
        )
        return tokenizer.sp.decode_ids(sequence_list)
    words = list(_split_list(sequence, token_separator))
    decoded_words = [tokenizer.sp.decode_ids(list(w)) for w in words]
    return output_separator.join(decoded_words)


def _split_list(items, separator):
    """Splits an indexable sequence by a separator value."""
    if items is not None:
        last_idx = -1
        idx = -1
        for idx, item in enumerate(items):
            if item == separator:
                yield items[last_idx + 1 : idx]
                last_idx = idx
        if last_idx < idx - 1:
            yield items[last_idx + 1 :]


def enable_eos_bos(tokens, encoder, bos_index, eos_index):
    """Initializes a phoneme encoder with BOS/EOS and UNK entries
    (reference ``g2p/dataio.py:228``)."""
    from speechbrain_tpu.dataio.encoder import TextEncoder

    if encoder is None:
        encoder = TextEncoder()
    if bos_index == eos_index:
        if "<eos-bos>" not in encoder.lab2ind:
            encoder.insert_bos_eos(
                bos_label="<eos-bos>",
                eos_label="<eos-bos>",
                bos_index=bos_index,
            )
    else:
        if "<bos>" not in encoder.lab2ind:
            encoder.insert_bos_eos(
                bos_label="<bos>",
                eos_label="<eos>",
                bos_index=bos_index,
                eos_index=eos_index,
            )
    if "<unk>" not in encoder.lab2ind:
        encoder.add_unk()
    encoder.update_from_iterable(tokens, sequence_input=False)
    return encoder


def phoneme_pipeline(phn, phoneme_encoder=None):
    """Encodes a phoneme sequence (reference ``g2p/dataio.py:273``)."""
    yield phn
    phn_encoded_list = phoneme_encoder.encode_sequence(phn)
    yield phn_encoded_list
    yield np.asarray(phn_encoded_list, dtype=np.int64)


def add_bos_eos(seq=None, encoder=None):
    """Adds BOS and EOS to a sequence; yields (bos seq, bos len, eos
    seq, eos len) (reference ``g2p/dataio.py:301``)."""
    seq_bos = np.asarray(encoder.prepend_bos_index(seq), dtype=np.int64)
    yield seq_bos
    yield np.int64(len(seq_bos))
    seq_eos = np.asarray(encoder.append_eos_index(seq), dtype=np.int64)
    yield seq_eos
    yield np.int64(len(seq_eos))


def beam_search_pipeline(char_lens, encoder_out, beam_searcher):
    """Runs beam search as a decoding-pipeline component (reference
    ``g2p/dataio.py:332``)."""
    return beam_searcher(encoder_out, char_lens)


def phoneme_decoder_pipeline(hyps, phoneme_encoder):
    """Decodes phoneme index hypotheses to labels (reference
    ``g2p/dataio.py:357``)."""
    return phoneme_encoder.decode_ndim(hyps)


def char_range(start_char, end_char):
    """Consecutive characters, inclusive (reference
    ``g2p/dataio.py:374``).

    Example
    -------
    >>> char_range('A', 'E')
    ['A', 'B', 'C', 'D', 'E']
    """
    return [chr(idx) for idx in range(ord(start_char), ord(end_char) + 1)]


def build_token_char_map(tokens):
    """Maps arbitrary (multi-char) tokens to single characters so
    SentencePiece can tokenize them (reference ``g2p/dataio.py:391``).

    Example
    -------
    >>> m = build_token_char_map(["AA", "B", " ", "ZH"])
    >>> [m["AA"], m["B"], m["ZH"], m[" "]]
    ['A', 'B', 'C', ' ']
    """
    chars = char_range("A", "Z") + char_range("a", "z")
    values = [t for t in tokens if t != " "]
    token_map = dict(zip(values, chars[: len(values)]))
    token_map[" "] = " "
    return token_map


def flip_map(map_dict):
    """Exchanges keys and values (reference ``g2p/dataio.py:412``).

    Example
    -------
    >>> flip_map({'a': 1})
    {1: 'a'}
    """
    return {value: key for key, value in map_dict.items()}


def text_decode(seq, encoder):
    """Decodes a sequence with a text encoder; for hparams files
    (reference ``g2p/dataio.py:427``)."""
    return encoder.decode_ndim(seq)


def char_map_detokenize(
    char_map, tokenizer, token_space_index=None, wordwise=True
):
    """Returns a function recovering the original label sequence from
    char-map tokenized output (reference ``g2p/dataio.py:446``)."""

    def detokenize_wordwise(item):
        return _wordwise_detokenize(tokenizer(), item, " ", token_space_index)

    def detokenize_regular(item):
        return tokenizer().sp.decode_ids(list(item))

    detokenize = detokenize_wordwise if wordwise else detokenize_regular

    def f(tokens):
        decoded_tokens = [detokenize(item) for item in tokens]
        return _map_tokens_batch(decoded_tokens, char_map)

    return f


def _map_tokens_batch(tokens, char_map):
    """Token→character mapping over a batch of sequences."""
    return [[char_map[char] for char in item] for item in tokens]


def _map_tokens_item(tokens, char_map):
    """Token→character mapping for one sequence."""
    return [char_map[char] for char in tokens]


def lazy_init(init):
    """Wraps a constructor so the object is built once on first call
    (reference ``g2p/dataio.py:529``).

    Example
    -------
    >>> calls = []
    >>> f = lazy_init(lambda: calls.append(1) or "obj")
    >>> f(), f(), len(calls)
    ('obj', 'obj', 1)
    """
    instance = None

    def f():
        nonlocal instance
        if instance is None:
            instance = init()
        return instance

    return f


def get_sequence_key(key, mode):
    """Key naming convention for raw/bos/eos sequence variants
    (reference ``g2p/dataio.py:555``).

    Example
    -------
    >>> get_sequence_key("phn", "raw"), get_sequence_key("phn", "eos")
    ('phn', 'phn_eos')
    """
    return key if mode == "raw" else f"{key}_{mode}"


def phonemes_to_label(phns, decoder):
    """Batch of phoneme index sequences → space-separated label strings
    without special tokens (reference ``g2p/dataio.py:568``)."""
    phn_decoded = decoder(phns)
    return [" ".join(remove_special(item)) for item in phn_decoded]


def remove_special(phn):
    """Drops ``<...>`` special tokens (reference ``g2p/dataio.py:587``).

    Example
    -------
    >>> remove_special(["T", "AY", "<eos>"])
    ['T', 'AY']
    """
    return [token for token in phn if "<" not in token]


def word_emb_pipeline(
    txt,
    grapheme_encoded,
    grapheme_encoded_len,
    grapheme_encoder=None,
    word_emb=None,
    use_word_emb=None,
):
    """Computes word embeddings expanded to the character dimension
    (reference ``g2p/dataio.py:603``)."""
    from speechbrain_tpu.wordemb.util import expand_to_chars

    char_word_emb = None
    if use_word_emb:
        raw_word_emb = word_emb().embeddings(txt)
        word_separator_idx = grapheme_encoder.lab2ind[" "]
        char_word_emb = np.asarray(
            expand_to_chars(
                emb=np.asarray(raw_word_emb)[None],
                seq=np.asarray(grapheme_encoded)[None],
                seq_len=np.asarray(grapheme_encoded_len)[None],
                word_separator=word_separator_idx,
            )
        )[0]
    return char_word_emb
