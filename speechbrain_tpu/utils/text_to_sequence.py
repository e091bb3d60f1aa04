"""TTS text frontend: cleaners + symbol-table encoding.

TPU-native counterpart of the reference ``utils/text_to_sequence.py``
(the keithito/tacotron text pipeline): maps raw text — optionally with
``{ARPAbet}`` spans in curly braces — to integer symbol IDs consumed by
Tacotron2-style models.  The symbol inventory and ID ordering match the
standard Tacotron table (pad, '-', punctuation, letters, @ARPAbet) so
sequences are interchangeable with checkpoints trained against it.
"""

import re

# CMUdict phone inventory: vowels carry stress variants (bare, 0, 1, 2),
# consonants do not.
_ARPA_VOWELS = [
    "AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY", "IH", "IY",
    "OW", "OY", "UH", "UW",
]
_ARPA_CONSONANTS = [
    "B", "CH", "D", "DH", "F", "G", "HH", "JH", "K", "L", "M", "N",
    "NG", "P", "R", "S", "SH", "T", "TH", "V", "W", "Y", "Z", "ZH",
]

valid_symbols = sorted(
    [v + s for v in _ARPA_VOWELS for s in ("", "0", "1", "2")]
    + _ARPA_CONSONANTS
)

_pad = "_"
_punctuation = "!'(),.:;? "
_special = "-"
_letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

# "@" prefix keeps ARPAbet symbols distinct from uppercase letters.
_arpabet = ["@" + s for s in valid_symbols]

symbols = (
    [_pad] + list(_special) + list(_punctuation) + list(_letters) + _arpabet
)

_symbol_to_id = {s: i for i, s in enumerate(symbols)}
_id_to_symbol = {i: s for i, s in enumerate(symbols)}

_curly_re = re.compile(r"(.*?)\{(.+?)\}(.*)")
_whitespace_re = re.compile(r"\s+")

_abbreviations = [
    (re.compile(r"\b%s\." % abbr, re.IGNORECASE), expansion)
    for abbr, expansion in [
        ("mrs", "misess"),
        ("mr", "mister"),
        ("dr", "doctor"),
        ("st", "saint"),
        ("co", "company"),
        ("jr", "junior"),
        ("maj", "major"),
        ("gen", "general"),
        ("drs", "doctors"),
        ("rev", "reverend"),
        ("lt", "lieutenant"),
        ("hon", "honorable"),
        ("sgt", "sergeant"),
        ("capt", "captain"),
        ("esq", "esquire"),
        ("ltd", "limited"),
        ("col", "colonel"),
        ("ft", "fort"),
    ]
]


def expand_abbreviations(text):
    """Expand the predefined abbreviation list.

    Example
    -------
    >>> expand_abbreviations("Dr. Smith")
    'doctor Smith'
    """
    for regex, replacement in _abbreviations:
        text = re.sub(regex, replacement, text)
    return text


def lowercase(text):
    """Lowercase the text."""
    return text.lower()


def collapse_whitespace(text):
    """Collapse any whitespace run to a single space.

    Example
    -------
    >>> collapse_whitespace("a  b\\tc")
    'a b c'
    """
    return re.sub(_whitespace_re, " ", text)


def convert_to_ascii(text):
    """Drop non-ASCII characters.

    Example
    -------
    >>> convert_to_ascii("café")
    'caf'
    """
    return text.encode("ascii", "ignore").decode()


def basic_cleaners(text):
    """Lowercase + collapse whitespace (no transliteration)."""
    return collapse_whitespace(lowercase(text))


def german_cleaners(text):
    """Collapse whitespace only (case kept for German)."""
    return collapse_whitespace(text)


def transliteration_cleaners(text):
    """ASCII-fold, lowercase, collapse whitespace."""
    return collapse_whitespace(lowercase(convert_to_ascii(text)))


def english_cleaners(text):
    """English pipeline: ASCII, lowercase, abbreviations, whitespace.

    Example
    -------
    >>> english_cleaners("Mr.  Brown")
    'mister brown'
    """
    text = convert_to_ascii(text)
    text = lowercase(text)
    text = expand_abbreviations(text)
    return collapse_whitespace(text)


_CLEANERS = {
    "english_cleaners": english_cleaners,
    "transliteration_cleaners": transliteration_cleaners,
    "basic_cleaners": basic_cleaners,
    "german_cleaners": german_cleaners,
}


def text_to_sequence(text, cleaner_names):
    """Convert text (with optional ``{ARPAbet}`` spans) to symbol IDs.

    Example
    -------
    >>> seq = text_to_sequence("hi", ["english_cleaners"])
    >>> sequence_to_text(seq)
    'hi'
    >>> sequence_to_text(text_to_sequence(
    ...     "Turn {L EH1 F T}.", ["english_cleaners"]))
    'turn {L EH1 F T}.'
    """
    sequence = []
    while len(text):
        m = _curly_re.match(text)
        if not m:
            sequence += _symbols_to_sequence(
                _clean_text(text, cleaner_names)
            )
            break
        sequence += _symbols_to_sequence(
            _clean_text(m.group(1), cleaner_names)
        )
        sequence += _arpabet_to_sequence(m.group(2))
        text = m.group(3)
    return sequence


def sequence_to_text(sequence):
    """Inverse of :func:`text_to_sequence` (ARPAbet re-braced)."""
    result = ""
    for symbol_id in sequence:
        if symbol_id in _id_to_symbol:
            s = _id_to_symbol[symbol_id]
            if len(s) > 1 and s[0] == "@":
                s = "{%s}" % s[1:]
            result += s
    return result.replace("}{", " ")


def _clean_text(text, cleaner_names):
    for name in cleaner_names:
        cleaner = _CLEANERS.get(name)
        if cleaner is None:
            raise ValueError("Unknown cleaner: %s" % name)
        text = cleaner(text)
    return text


def _symbols_to_sequence(syms):
    return [_symbol_to_id[s] for s in syms if _should_keep_symbol(s)]


def _arpabet_to_sequence(text):
    return _symbols_to_sequence(["@" + s for s in text.split()])


def _should_keep_symbol(s):
    return s in _symbol_to_id and s != "_" and s != "~"
