"""Mixture synthesis from LibriParty session metadata.

Role counterpart of the reference
``recipes/LibriParty/generate_dataset/local/create_mixtures_from_metadata.py``
but numpy/JAX-native: each speaker's utterances are peak-rescaled to
their metadata level, reverberated with their RIR (via
``processing.signal_processing.reverberate`` — the same delay-
compensated convolution the augmentation layer uses on device), summed
onto the session timeline, impulsive noises likewise, and a background
(file segment or gaussian noise) closes the mixture.  The same session
JSON files drive the VAD recipe.
"""

import json
import os

import numpy as np

from speechbrain_tpu.dataio.dataio import _load_audio_any, write_audio
from speechbrain_tpu.processing.signal_processing import (
    rescale,
    reverberate,
)


def _load(path, channel=None):
    audio, _ = _load_audio_any(path)
    audio = np.asarray(audio, np.float32)
    if audio.ndim > 1:
        ch = channel if channel is not None else 0
        audio = audio[:, ch]
        audio = audio - audio.mean()
    return audio


def _rescale_np(audio, lvl, amp_type="peak"):
    out = rescale(
        audio[None, :],
        np.ones(1),
        lvl,
        scale="dB",
        amp_type=amp_type,
    )
    return np.asarray(out)[0]


def _reverb_np(audio, rir):
    out = reverberate(audio[None, :], rir[None, :], "peak")
    return np.asarray(out)[0]


def create_mixture(session_n, output_dir, params, metadata):
    """Synthesize one session into ``output_dir/session_n/``."""
    os.makedirs(os.path.join(output_dir, session_n), exist_ok=True)
    sr = params["samplerate"]
    session_meta = {}
    speakers = [
        x for x in metadata.keys() if x not in ["noises", "background"]
    ]
    tot_length = int(np.ceil(metadata["background"]["stop"] * sr))
    mixture = np.zeros(tot_length, np.float32)
    assert tot_length > 0, "Mixture has length 0, raise max_length."

    for spk in speakers:
        session_meta[spk] = []
        dry = (
            np.zeros(tot_length, np.float32)
            if params.get("save_dry_sources")
            else None
        )
        wet = (
            np.zeros(tot_length, np.float32)
            if params.get("save_wet_sources")
            else None
        )
        for utt in metadata[spk]:
            c_audio = _load(
                os.path.join(params["librispeech_root"], utt["file"]),
                utt.get("channel"),
            )
            c_audio = _rescale_np(c_audio, utt["lvl"], "peak")
            start = int(utt["start"] * sr)
            stop = start + len(c_audio)
            if dry is not None:
                dry[start:stop] += c_audio
            c_rir = _load(
                os.path.join(params["rirs_noises_root"], utt["rir"]),
                utt.get("rir_channel"),
            )
            c_audio = _reverb_np(c_audio, c_rir)
            seg = mixture[start : start + len(c_audio)]
            seg += c_audio[: len(seg)]
            if wet is not None:
                wseg = wet[start : start + len(c_audio)]
                wseg += c_audio[: len(wseg)]
            session_meta[spk].append(
                {
                    "start": round(start / sr, 3),
                    "stop": round(stop / sr, 3),
                    "lvl": utt["lvl"],
                    "words": utt["words"],
                    "file": utt["file"],
                    "channel": utt.get("channel"),
                    "rir": utt["rir"],
                    "rir_channels": utt.get("rir_channel"),
                }
            )
        for tag, buf in (("dry", dry), ("wet", wet)):
            if buf is not None:
                write_audio(
                    os.path.join(
                        output_dir,
                        session_n,
                        f"session_{session_n}_spk_{spk}_{tag}.wav",
                    ),
                    np.clip(buf, -1, 1),
                    sr,
                )

    with open(
        os.path.join(output_dir, session_n, f"{session_n}.json"), "w"
    ) as f:
        json.dump(session_meta, f, indent=4)

    for noise_event in metadata.get("noises", []):
        c_audio = _load(
            os.path.join(
                params["rirs_noises_root"], noise_event["file"]
            ),
            noise_event.get("channel"),
        )
        c_audio = _rescale_np(c_audio, noise_event["lvl"], "peak")
        c_rir = _load(
            os.path.join(params["rirs_noises_root"], noise_event["rir"]),
            noise_event.get("rir_channel"),
        )
        c_audio = _reverb_np(c_audio, c_rir)
        start = int(noise_event["start"] * sr)
        seg = mixture[start : start + len(c_audio)]
        seg += c_audio[: len(seg)]

    bg = metadata["background"]
    if bg.get("file"):
        audio, _ = _load_audio_any(
            os.path.join(params["backgrounds_root"], bg["file"])
        )
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio[:, bg.get("channel") or 0]
            audio = audio - audio.mean()
        audio = audio[bg["orig_start"] : bg["orig_start"] + tot_length]
        audio = _rescale_np(audio, bg["lvl"], "avg")
        mixture[: len(audio)] += audio
    else:
        noise = np.random.normal(0, 1, tot_length).astype(np.float32)
        mixture += _rescale_np(noise, bg["lvl"], "peak")

    write_audio(
        os.path.join(
            output_dir, session_n, f"{session_n}_mixture.wav"
        ),
        np.clip(mixture, -1, 1),
        sr,
    )
