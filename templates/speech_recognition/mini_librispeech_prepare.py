"""Mini-LibriSpeech-style manifests for the speech-recognition template.

Two modes, decided by what is on disk (this build has no network
access, so unlike the reference template no download is attempted):

1. If ``data_folder`` contains a LibriSpeech-format tree
   (``<spk>/<chap>/<utt>.wav|.flac`` + ``*.trans.txt``), manifests are
   built from it — point ``data_folder`` at train-clean-5/dev-clean-2
   from OpenSLR #31 for the real mini-librispeech experience.
2. Otherwise a tiny synthetic "tone-word" corpus is generated: each of
   8 vocabulary words is a distinct pure tone, utterances are 2-5 word
   sequences, transcripts are the word names.  The ASR task is
   learnable in a couple of minutes on CPU, which is the point of a
   template.

Manifest rows: ``{id: {wav, length, words}}`` (reference
``templates/speech_recognition/mini_librispeech_prepare.py``).
"""

import json
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)
SAMPLERATE = 16000

VOCAB = {
    "ALPHA": 250.0, "BRAVO": 350.0, "CHARLIE": 450.0, "DELTA": 570.0,
    "ECHO": 700.0, "FOXTROT": 850.0, "GOLF": 1000.0, "HOTEL": 1200.0,
}


def prepare_mini_librispeech(
    data_folder, save_json_train, save_json_valid, save_json_test
):
    """Create train/valid/test manifests (scan corpus or synthesize)."""
    if all(
        os.path.exists(p)
        for p in (save_json_train, save_json_valid, save_json_test)
    ):
        logger.info("Preparation completed in previous run, skipping.")
        return
    rows = _scan_librispeech(data_folder)
    if rows:
        logger.info("Found %d LibriSpeech-format utterances.", len(rows))
        ids = sorted(rows)
        n = len(ids)
        splits = {
            save_json_train: ids[: int(n * 0.8)],
            save_json_valid: ids[int(n * 0.8) : int(n * 0.9)],
            save_json_test: ids[int(n * 0.9) :],
        }
        for path, split_ids in splits.items():
            _write_json(path, {i: rows[i] for i in split_ids})
    else:
        logger.info(
            "No LibriSpeech data under %s - generating the synthetic "
            "tone-word corpus.", data_folder,
        )
        _synthesize(
            data_folder, save_json_train, save_json_valid, save_json_test
        )


def _scan_librispeech(data_folder):
    """LibriSpeech-format rows: audio files + .trans.txt transcripts."""
    texts = {}
    audio = {}
    for dirpath, _, files in os.walk(data_folder):
        for fname in files:
            path = os.path.join(dirpath, fname)
            if fname.endswith(".trans.txt"):
                with open(path, encoding="utf-8") as f:
                    for line in f:
                        parts = line.split(maxsplit=1)
                        if len(parts) == 2:
                            texts[parts[0]] = parts[1].strip()
            elif fname.endswith((".wav", ".flac")):
                audio[os.path.splitext(fname)[0]] = os.path.abspath(path)
    rows = {}
    for utt_id, path in audio.items():
        if utt_id not in texts:
            continue
        rows[utt_id] = {
            "wav": path,
            "length": _duration(path),
            "words": texts[utt_id],
        }
    return rows


def _duration(path):
    if path.endswith(".wav"):
        import wave

        with wave.open(path, "rb") as w:
            return round(w.getnframes() / w.getframerate(), 3)
    try:
        import soundfile as sf

        info = sf.info(path)
        return round(info.frames / info.samplerate, 3)
    except ImportError:
        return round(os.path.getsize(path) / (SAMPLERATE * 2 * 0.55), 3)


def _synthesize(
    data_folder, save_json_train, save_json_valid, save_json_test,
    n_utts=200, seed=0,
):
    """Generate the tone-word corpus + manifests."""
    from speechbrain_tpu.dataio.dataio import write_audio

    wav_dir = os.path.abspath(os.path.join(data_folder, "synthetic_wav"))
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    words = list(VOCAB)
    manifests = {save_json_train: {}, save_json_valid: {},
                 save_json_test: {}}
    for i in range(n_utts):
        n_words = int(rng.integers(2, 6))
        utt_words = [words[int(k)] for k in rng.integers(0, len(words), n_words)]
        pieces = []
        for w in utt_words:
            t = np.arange(int(0.2 * SAMPLERATE)) / SAMPLERATE
            tone = 0.4 * np.sin(
                2 * np.pi * VOCAB[w] * t + rng.uniform(0, np.pi)
            ) * np.hanning(len(t))
            pieces.append(tone)
            pieces.append(np.zeros(int(0.05 * SAMPLERATE)))
        wav = np.concatenate(pieces)
        wav += 0.005 * rng.normal(size=len(wav))
        path = os.path.join(wav_dir, f"utt_{i:03d}.wav")
        write_audio(path, wav.astype(np.float32), SAMPLERATE)
        target = (
            save_json_test if i >= n_utts - 10
            else save_json_valid if i >= n_utts - 20
            else save_json_train
        )
        manifests[target][f"utt_{i:03d}"] = {
            "wav": path,
            "length": round(len(wav) / SAMPLERATE, 3),
            "words": " ".join(utt_words),
        }
    for path, data in manifests.items():
        _write_json(path, data)


def _write_json(path, data):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2)
    logger.info("%s: %d utterances", path, len(data))


if __name__ == "__main__":
    prepare_mini_librispeech(
        "./data", "./data/train.json", "./data/valid.json",
        "./data/test.json",
    )
