"""Audio & manifest I/O plus on-device mask/token utilities.

Host side: audio decode to numpy (no torchaudio; WAV via the stdlib /
scipy, optional soundfile if present).  Device side: ``length_to_mask``
and BOS/EOS token ops in jnp.

Parity targets: reference ``dataio/dataio.py:162`` (read_audio), ``:329``
(write_audio), ``:30,90`` (load_data_json/csv), ``:699``
(length_to_mask), ``:914,946`` (prepend_bos/append_eos).
"""

import csv
import json
import logging
import os
import re

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "load_data_json",
    "load_data_csv",
    "read_audio",
    "read_audio_multichannel",
    "write_audio",
    "length_to_mask",
    "relative_time_to_absolute",
    "prepend_bos_token",
    "append_eos_token",
    "merge_char",
    "merge_csvs",
    "split_word",
    "read_kaldi_lab",
    "load_pickle",
    "save_pkl",
    "load_pkl",
    "convert_index_to_lab",
    "write_txt_file",
    "write_stdout",
    "get_md5",
    "save_md5",
    "IterativeCSVWriter",
]


# ---------------------------------------------------------------------------
# Manifests
# ---------------------------------------------------------------------------

def load_data_json(json_path, replacements={}):
    """Load a JSON manifest of the form {id: {key: value...}}.

    String values get ``$key`` substrings replaced via ``replacements``
    (e.g. ``{"data_root": "/corpora/LibriSpeech"}``).

    Example
    -------
    >>> import tempfile, json as J
    >>> f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
    >>> _ = f.write(J.dumps({"u1": {"wav": "$root/a.wav", "length": 1.0}}))
    >>> f.close()
    >>> load_data_json(f.name, {"root": "/data"})["u1"]["wav"]
    '/data/a.wav'
    """
    with open(json_path) as f:
        out_json = json.load(f)
    for data_key in out_json:
        for field in out_json[data_key]:
            value = out_json[data_key][field]
            if isinstance(value, str):
                for repl_key, repl_value in replacements.items():
                    value = value.replace("$" + repl_key, repl_value)
                out_json[data_key][field] = value
    return out_json


def load_data_csv(csv_path, replacements={}):
    """Load a CSV manifest (must have an ID column) into a dict-of-dicts.

    Supports ``$key`` replacements and converts a ``duration`` column to
    float.
    """
    with open(csv_path, newline="") as csvfile:
        result = {}
        reader = csv.DictReader(csvfile, skipinitialspace=True)
        variable_finder = re.compile(r"\$([\w.]+)")
        for row in reader:
            try:
                data_id = row["ID"]
                del row["ID"]
            except KeyError:
                raise KeyError(
                    "CSV has to have an 'ID' field, with unique ids for all data points"
                )
            if data_id in result:
                raise ValueError(f"Duplicate id: {data_id}")
            for key, value in row.items():
                if isinstance(value, str):
                    row[key] = variable_finder.sub(
                        lambda match: str(replacements.get(match[1], match[0])),
                        value,
                    )
            if "duration" in row:
                row["duration"] = float(row["duration"])
            result[data_id] = row
    return result


def merge_csvs(data_folder, csv_lst, merged_csv):
    """Concatenate CSV manifests (same header) into one file."""
    write_path = os.path.join(data_folder, merged_csv)
    if os.path.isfile(write_path):
        logger.info("Skipping merging. Completed in previous run.")
        return
    with open(os.path.join(data_folder, csv_lst[0])) as f:
        header = f.readline()
    lines = [header]
    for csv_file in csv_lst:
        with open(os.path.join(data_folder, csv_file)) as f:
            for i, line in enumerate(f):
                if i == 0:
                    if line != header:
                        raise ValueError(
                            "Different header for " f"{csv_lst[0]} and {csv_file}."
                        )
                    continue
                lines.append(line)
    with open(write_path, "w") as f:
        for line in lines:
            f.write(line)
    logger.info(f"{write_path} is created.")


# ---------------------------------------------------------------------------
# Audio
# ---------------------------------------------------------------------------

def _read_wav(path, start=0, stop=None):
    """Decode a WAV file to float32 numpy in [-1, 1]; returns (audio, sr).

    Handles PCM 16/24/32-bit and IEEE float WAVs without torchaudio.
    """
    import wave

    try:
        with wave.open(path, "rb") as w:
            sr = w.getframerate()
            n_channels = w.getnchannels()
            sampwidth = w.getsampwidth()
            n_frames = w.getnframes()
            if stop is None:
                stop = n_frames
            start = max(0, int(start))
            stop = min(n_frames, int(stop))
            w.setpos(start)
            raw = w.readframes(stop - start)
        if sampwidth == 2:
            audio = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif sampwidth == 4:
            audio = (
                np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
            )
        elif sampwidth == 3:
            a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            signed = (
                a[:, 0].astype(np.int32)
                | (a[:, 1].astype(np.int32) << 8)
                | (a[:, 2].astype(np.int32) << 16)
            )
            signed = np.where(signed >= 2 ** 23, signed - 2 ** 24, signed)
            audio = signed.astype(np.float32) / 8388608.0
        else:
            raise ValueError(f"Unsupported WAV sample width: {sampwidth}")
        if n_channels > 1:
            audio = audio.reshape(-1, n_channels)
        return audio, sr
    except wave.Error:
        # IEEE-float or otherwise non-PCM wav: fall back to scipy.
        from scipy.io import wavfile

        sr, audio = wavfile.read(path)
        if audio.dtype == np.int16:
            audio = audio.astype(np.float32) / 32768.0
        elif audio.dtype == np.int32:
            audio = audio.astype(np.float32) / 2147483648.0
        elif audio.dtype == np.uint8:
            audio = (audio.astype(np.float32) - 128.0) / 128.0
        else:
            audio = audio.astype(np.float32)
        if stop is None:
            stop = len(audio)
        return audio[start:stop], sr


def read_audio(waveforms_obj):
    """Read audio to a float32 numpy array (time,) or (time, channels).

    Accepts a path string, or a dict ``{"file": path, "start": s,
    "stop": e}`` for segment reads (sample offsets).
    """
    if isinstance(waveforms_obj, str):
        audio, _ = _load_audio_any(waveforms_obj)
        return audio
    path = waveforms_obj["file"]
    start = int(waveforms_obj.get("start", 0))
    stop = waveforms_obj.get("stop", None)
    audio, _ = _load_audio_any(path, start, stop)
    return audio


def _read_sphere(path, start=0, stop=None):
    """Decode a NIST SPHERE file (TIMIT's .WAV container) to float32.

    The header is ASCII ``key -type value`` lines in a fixed-size
    block; samples follow as PCM (optionally ulaw).  Replaces the
    reference's torchaudio/sox sphere backend
    (``timit_prepare.py`` read path) with a pure-numpy decoder.
    """
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"NIST_1A"):
            raise ValueError(f"Not a NIST SPHERE file: {path}")
        header_size = int(f.readline().strip())
        f.seek(0)
        header = f.read(header_size).decode("ascii", errors="replace")
        fields = {}
        for line in header.splitlines()[2:]:
            parts = line.split()
            if len(parts) >= 3 and parts[1].startswith("-"):
                fields[parts[0]] = parts[2]
            elif line.strip() == "end_head":
                break
        sr = int(fields.get("sample_rate", 16000))
        n_bytes = int(fields.get("sample_n_bytes", 2))
        n_channels = int(fields.get("channel_count", 1))
        n_samples = int(fields.get("sample_count", -1))
        coding = fields.get("sample_coding", "pcm")
        byte_fmt = fields.get("sample_byte_format", "01")
        f.seek(header_size)
        raw = f.read()
    if coding.startswith("ulaw"):
        u = ~np.frombuffer(raw, dtype=np.uint8).astype(np.int32) & 0xFF
        sign = u & 0x80
        exponent = (u >> 4) & 0x07
        mantissa = u & 0x0F
        mag = ((mantissa << 3) + 0x84) << exponent
        pcm = np.where(sign, 0x84 - mag, mag - 0x84).astype(np.float32)
        audio = pcm / 32768.0
    elif n_bytes == 2:
        dt = "<i2" if byte_fmt == "01" else ">i2"
        audio = np.frombuffer(raw, dtype=dt).astype(np.float32) / 32768.0
    elif n_bytes == 1:
        audio = (
            np.frombuffer(raw, dtype=np.int8).astype(np.float32) / 128.0
        )
    else:
        raise ValueError(f"Unsupported SPHERE sample width: {n_bytes}")
    if n_samples > 0:
        audio = audio[: n_samples * n_channels]
    if n_channels > 1:
        audio = audio.reshape(-1, n_channels)
    if stop is None:
        stop = len(audio)
    return audio[int(start):int(stop)], sr


def _load_audio_any(path, start=0, stop=None):
    ext = os.path.splitext(path)[1].lower()
    if ext in (".wav", ".wave", ""):
        # TIMIT ships SPHERE files with a .WAV extension: sniff magic.
        with open(path, "rb") as f:
            magic = f.read(4)
        if magic == b"NIST":
            return _read_sphere(path, start, stop)
        return _read_wav(path, start, stop)
    if ext == ".sph":
        return _read_sphere(path, start, stop)
    if ext in (".mp3", ".ogg", ".opus", ".m4a"):
        return _read_via_ffmpeg(path, start, stop)
    if ext == ".npy":
        audio = np.load(path).astype(np.float32)
        return audio[start:stop], 16000
    if ext == ".flac":
        # Native C++ decoder first (no external deps; covers
        # LibriSpeech); soundfile as fallback when available.
        try:
            from speechbrain_tpu import native

            result = native.flac_decode(path)
        except ValueError:
            raise
        except Exception:
            result = None
        if result is not None:
            audio, sr = result
            return audio[start:stop], sr
        try:
            import soundfile as sf

            audio, sr = sf.read(path, start=start, stop=stop, dtype="float32")
            return audio, sr
        except ImportError:
            raise ImportError(
                "FLAC decode needs the native toolchain (g++) or the "
                "soundfile package; convert to WAV otherwise."
            )
    raise ValueError(f"Unsupported audio format: {ext}")


def audio_info(path):
    """Return ``(sample_rate, num_frames)`` for an audio file.

    Header-only for WAV/SPHERE (the torchaudio.info role in the
    reference, e.g. VAD ``_get_audio_info``,
    ``pretrained/interfaces.py:1732``); falls back to a full decode
    for formats without a cheap header path (flac/mp3/...).
    """
    ext = os.path.splitext(path)[1].lower()
    if ext in (".wav", ".wave", ""):
        with open(path, "rb") as f:
            magic = f.read(4)
        if magic != b"NIST":
            import wave

            try:
                with wave.open(path, "rb") as w:
                    return w.getframerate(), w.getnframes()
            except wave.Error:
                pass
        else:
            with open(path, "rb") as f:
                f.readline()
                header_size = int(f.readline().strip())
                f.seek(0)
                header = f.read(header_size).decode(
                    "ascii", errors="replace"
                )
            fields = {}
            for line in header.splitlines()[2:]:
                parts = line.split()
                if len(parts) >= 3 and parts[1].startswith("-"):
                    fields[parts[0]] = parts[2]
            return (
                int(fields.get("sample_rate", 16000)),
                int(fields.get("sample_count", 0)),
            )
    audio, sr = _load_audio_any(path)
    return sr, len(audio)


def read_audio_multichannel(waveforms_obj):
    """Read and stack multiple files as channels: {"files": [...], ...}."""
    if isinstance(waveforms_obj, str):
        return read_audio(waveforms_obj)
    files = waveforms_obj.get("files", [waveforms_obj.get("file")])
    start = int(waveforms_obj.get("start", 0))
    stop = waveforms_obj.get("stop", None)
    waveforms = []
    for f in files:
        audio, _ = _load_audio_any(f, start, stop)
        if audio.ndim == 1:
            audio = audio[:, None]
        waveforms.append(audio)
    return np.concatenate(waveforms, axis=-1)


def write_audio(filepath, audio, samplerate):
    """Write float (time,) or (time, channels) audio as 16-bit PCM WAV."""
    from scipy.io import wavfile

    audio = np.asarray(audio)
    if audio.ndim == 2 and audio.shape[0] < audio.shape[1]:
        # Accept (channels, time) too; store time-major.
        audio = audio.T
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    wavfile.write(filepath, samplerate, pcm)


# ---------------------------------------------------------------------------
# Device-side helpers (jnp)
# ---------------------------------------------------------------------------

def length_to_mask(length, max_len=None, dtype=None):
    """Binary mask (batch, max_len) from absolute lengths.

    jit-friendly: ``max_len`` should be a static int under jit.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> length_to_mask(jnp.array([2, 3]), max_len=4).astype(jnp.int32)
    Array([[1, 1, 0, 0],
           [1, 1, 1, 0]], dtype=int32)
    """
    import jax.numpy as jnp

    length = jnp.asarray(length)
    if max_len is None:
        max_len = int(length.max())
    positions = jnp.arange(max_len)[None, :]
    mask = positions < length[:, None]
    if dtype is not None:
        mask = mask.astype(dtype)
    return mask


def relative_time_to_absolute(batch, relative_lens, rate):
    """Convert relative lengths to absolute durations at ``rate``."""
    import jax.numpy as jnp

    max_len = batch.shape[1]
    return jnp.round(jnp.asarray(relative_lens) * max_len / rate, 2)


def prepend_bos_token(label, bos_index):
    """Prepend BOS to each row of an int (batch, len) array (jnp).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> prepend_bos_token(jnp.array([[1, 2]]), bos_index=0)
    Array([[0, 1, 2]], dtype=int32)
    """
    import jax.numpy as jnp

    label = jnp.asarray(label)
    bos = jnp.full((label.shape[0], 1), bos_index, dtype=label.dtype)
    return jnp.concatenate([bos, label], axis=1)


def append_eos_token(label, length, eos_index):
    """Append EOS at each row's true end (rows are padded to max length).

    ``length`` holds absolute lengths.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> append_eos_token(jnp.array([[1, 2, 0]]), jnp.array([2]), eos_index=9)
    Array([[1, 2, 9, 0]], dtype=int32)
    """
    import jax.numpy as jnp

    label = jnp.asarray(label)
    length = jnp.asarray(length)
    batch, max_len = label.shape
    padded = jnp.concatenate(
        [label, jnp.zeros((batch, 1), dtype=label.dtype)], axis=1
    )
    positions = jnp.arange(max_len + 1)[None, :]
    eos_mask = positions == length[:, None]
    return jnp.where(eos_mask, jnp.asarray(eos_index, label.dtype), padded)


# ---------------------------------------------------------------------------
# Character/word manipulation (host side)
# ---------------------------------------------------------------------------

def merge_char(sequences, space="_"):
    """Chars -> words: [["a","b","_","c"]] -> [["ab","c"]].

    Example
    -------
    >>> merge_char([["a", "b", "_", "c"]])
    [['ab', 'c']]
    """
    return [
        "".join(seq).split(space) for seq in sequences
    ]


def split_word(sequences, space="_"):
    """Words -> chars with space marker: [["ab","c"]] -> [["a","b","_","c"]].

    Example
    -------
    >>> split_word([["ab", "c"]])
    [['a', 'b', '_', 'c']]
    """
    out = []
    for seq in sequences:
        chars = list(f"{space}".join(seq))
        out.append(chars)
    return out


def read_kaldi_lab(kaldi_ali, kaldi_lab_opts=None):
    """Read Kaldi alignment labels into ``{utt_id: int32 array}``.

    Parity: reference ``dataio/dataio.py:747``.  With
    ``kaldi_lab_opts`` (e.g. ``"ali-to-pdf"``), the standard Kaldi
    pipeline ``gunzip -c ali*.gz | <opts> final.mdl ark:- ark:-`` is
    executed (requires Kaldi binaries on PATH).  Without opts, any
    ``ali*.ark`` / ungzipped ``ali*`` int-vector ark files in the
    directory are parsed natively — no kaldi_io dependency.
    """
    import glob as _glob
    import subprocess

    from speechbrain_tpu.dataio.kaldi_io import read_vec_int_ark

    if kaldi_lab_opts:
        cmd = (
            f"gunzip -c {kaldi_ali}/ali*.gz | "
            f"{kaldi_lab_opts} {kaldi_ali}/final.mdl ark:- ark:-"
        )
        proc = subprocess.Popen(
            cmd, shell=True, stdout=subprocess.PIPE
        )
        lab = {k: v for k, v in read_vec_int_ark(proc.stdout)}
        proc.wait()
        if proc.returncode != 0:
            raise RuntimeError(f"Kaldi pipeline failed: {cmd}")
        return lab
    lab = {}
    paths = sorted(_glob.glob(os.path.join(kaldi_ali, "ali*.ark")))
    if not paths:
        paths = [
            p
            for p in sorted(_glob.glob(os.path.join(kaldi_ali, "ali*")))
            if not p.endswith(".gz")
        ]
    for path in paths:
        lab.update({k: v for k, v in read_vec_int_ark(path)})
    return lab


def _read_via_ffmpeg(path, start=0, stop=None, target_sr=None):
    """Decode compressed audio (mp3/ogg/opus/m4a) through ffmpeg.

    The image has no native codec library (no torchaudio/soundfile);
    ffmpeg — when installed — pipes f32le PCM which is sliced here.
    Raises a clear error otherwise (convert the corpus to wav).
    """
    import shutil
    import subprocess

    if shutil.which("ffmpeg") is None:
        raise RuntimeError(
            f"Cannot decode {path}: no native codec support and ffmpeg "
            "is not installed. Convert the corpus to wav first."
        )
    cmd = ["ffmpeg", "-v", "error", "-i", path, "-f", "f32le"]
    if target_sr:
        cmd += ["-ar", str(target_sr)]
    cmd += ["-ac", "1", "pipe:1"]
    out = subprocess.run(cmd, capture_output=True, check=True).stdout
    audio = np.frombuffer(out, dtype=np.float32)
    if stop is None:
        stop = len(audio)
    return audio[int(start):int(stop)], target_sr or 0


# ---------------------------------------------------------------------------
# Small file utilities (reference ``dataio/dataio.py`` tail)
# ---------------------------------------------------------------------------


def load_pickle(pickle_path):
    """Load a .pkl file (reference ``dataio/dataio.py:117``)."""
    import pickle

    with open(pickle_path, "rb") as f:
        return pickle.load(f)


def save_pkl(obj, file):
    """Save an object in pkl format (reference ``dataio/dataio.py:552``).

    Example
    -------
    >>> tmpfile = getfixture('tmpdir') / "example.pkl"
    >>> save_pkl([1, 2, 3, 4, 5], tmpfile)
    >>> load_pkl(tmpfile)
    [1, 2, 3, 4, 5]
    """
    import pickle

    with open(file, "wb") as f:
        pickle.dump(obj, f)


def load_pkl(file):
    """Load a pkl file, waiting on a sibling ``.lock`` file if another
    process is writing (reference ``dataio/dataio.py:575``)."""
    import pickle
    import time

    count = 100
    while count > 0:
        if os.path.isfile(str(file) + ".lock"):
            time.sleep(1)
            count -= 1
        else:
            break
    try:
        open(str(file) + ".lock", "w").close()
        with open(file, "rb") as f:
            return pickle.load(f)
    finally:
        if os.path.isfile(str(file) + ".lock"):
            os.remove(str(file) + ".lock")


def convert_index_to_lab(batch, ind2lab):
    """Convert a batch of integer IDs to string labels (reference
    ``dataio/dataio.py:612``).

    Example
    -------
    >>> ind2lab = {1: "h", 2: "e", 3: "l", 4: "o"}
    >>> out = convert_index_to_lab([[4, 1], [1, 2, 3, 3, 4]], ind2lab)
    >>> ["".join(seq) for seq in out]
    ['oh', 'hello']
    """
    return [[ind2lab[int(index)] for index in seq] for seq in batch]


def write_txt_file(data, filename, sampling_rate=None):
    """Write data (str / list / array) one line per item (reference
    ``dataio/dataio.py:993``)."""
    del sampling_rate  # interface compatibility
    parent = os.path.dirname(str(filename))
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(filename, "w") as fout:
        if hasattr(data, "tolist"):
            data = data.tolist()
        if isinstance(data, list):
            for line in data:
                print(line, file=fout)
        if isinstance(data, str):
            print(data, file=fout)


def write_stdout(data, filename=None, sampling_rate=None):
    """Print data to standard output (reference
    ``dataio/dataio.py:1030``)."""
    del filename, sampling_rate
    if hasattr(data, "tolist"):
        data = data.tolist()
    if isinstance(data, list):
        for line in data:
            print(line)
    if isinstance(data, str):
        print(data)


def get_md5(file):
    """md5 checksum of a file, read in 64 kB chunks (reference
    ``dataio/dataio.py:1064``)."""
    import hashlib

    BUF_SIZE = 65536
    md5 = hashlib.md5()
    with open(file, "rb") as f:
        while True:
            data = f.read(BUF_SIZE)
            if not data:
                break
            md5.update(data)
    return md5.hexdigest()


def save_md5(files, out_file):
    """Pickle a {path: md5} dict for a list of files (reference
    ``dataio/dataio.py:1092``)."""
    md5_dict = {file: get_md5(file) for file in files}
    save_pkl(md5_dict, out_file)


class IterativeCSVWriter:
    """Write SpeechBrain-format CSV files a line at a time (reference
    ``dataio/dataio.py:655``): each data field expands to
    ``key, key_format, key_opts`` columns.

    Example
    -------
    >>> import io
    >>> f = io.StringIO()
    >>> writer = IterativeCSVWriter(f, ["phn"])
    >>> print(f.getvalue())
    ID,duration,phn,phn_format,phn_opts
    >>> writer.write("UTT1", 2.5, "sil hh ee ll oo sil", "string", "")
    >>> writer.write(ID="UTT2", phn="sil ww oo rr ld sil", phn_format="string")
    >>> writer.set_default("phn_format", "string")
    >>> writer.write_batch(ID=["UTT3", "UTT4"], phn=["ff oo", "bb aa"])
    >>> print(f.getvalue())
    ID,duration,phn,phn_format,phn_opts
    UTT1,2.5,sil hh ee ll oo sil,string,
    UTT2,,sil ww oo rr ld sil,string,
    UTT3,,ff oo,string,
    UTT4,,bb aa,string,
    """

    def __init__(self, outstream, data_fields, defaults={}):
        self._outstream = outstream
        self.fields = ["ID", "duration"] + self._expand_data_fields(
            data_fields
        )
        self.defaults = dict(defaults)
        self._outstream.write(",".join(self.fields))

    def set_default(self, field, value):
        """Set a default value for the given CSV field."""
        if field not in self.fields:
            raise ValueError(f"{field} is not a field in this CSV!")
        self.defaults[field] = value

    def write(self, *args, **kwargs):
        """Write one data line, positionally or by keyword."""
        if args and kwargs:
            raise ValueError(
                "Use either positional fields or named fields, not both."
            )
        if args:
            if len(args) != len(self.fields):
                raise ValueError("Need consistent fields")
            to_write = [str(arg) for arg in args]
        else:
            full_vals = dict(self.defaults)
            full_vals.update(kwargs)
            to_write = [
                str(full_vals.get(field, "")) for field in self.fields
            ]
        self._outstream.write("\n")
        self._outstream.write(",".join(to_write))

    def write_batch(self, *args, **kwargs):
        """Write a batch of lines (lists of equal length)."""
        if args and kwargs:
            raise ValueError(
                "Use either positional fields or named fields, not both."
            )
        if args:
            if len(args) != len(self.fields):
                raise ValueError("Need consistent fields")
            for arg_row in zip(*args):
                self.write(*[str(arg) for arg in arg_row])
        else:
            keys = kwargs.keys()
            for value_row in zip(*kwargs.values()):
                self.write(**dict(zip(keys, value_row)))

    @staticmethod
    def _expand_data_fields(data_fields):
        expanded = []
        for data_field in data_fields:
            expanded.append(data_field)
            expanded.append(data_field + "_format")
            expanded.append(data_field + "_opts")
        return expanded
