"""On-the-fly data creation for VAD training (torch-free).

Role counterpart of the reference
``recipes/LibriParty/VAD/data_augment.py``: synthesizes training
examples with every speech/noise transition type (noise=>speech,
speech=>noise, speech=>speech, noise=>noise) by pasting two
randomly-scaled, faded sources over a noise background, and emits the
frame-level targets alongside.  Randomness is PRNG-explicit: every
entry point takes a ``jax.random`` key (augmenter calls) plus a
``numpy.random.Generator`` (host-side placement draws), so batches are
reproducible.  The synthesis itself is host-side numpy — this is data
creation feeding the device pipeline, like the dataset generators.
"""

import jax
import numpy as np

FADE_LEN = 1000  # samples, linear fade (reference torchaudio Fade)


def _fade_in(x):
    n = min(FADE_LEN, x.shape[-1])
    ramp = np.ones(x.shape[-1], np.float32)
    ramp[:n] = np.linspace(0.0, 1.0, n, endpoint=False)
    return x * ramp


def _fade_out(x):
    n = min(FADE_LEN, x.shape[-1])
    ramp = np.ones(x.shape[-1], np.float32)
    if n:
        ramp[-n:] = np.linspace(1.0, 0.0, n)
    return x * ramp


def initialize_targets(wav, sample_rate, time_resolution):
    """Zero frame targets shaped (B, frames, n_sources)."""
    target_downsampling = sample_rate * time_resolution
    target_len = int(wav.shape[1] / target_downsampling)
    return np.zeros(
        (wav.shape[0], target_len, wav.shape[2]), np.float32
    )


def add_chunk(
    wav,
    wav_chunk,
    target,
    rng,
    sample_rate=16000,
    time_resolution=0.01,
    example_length=5,
    min_len=1.0,
    max_len=2.5,
    min_begin_sample=0,
    min_amp=0.4,
    max_amp=1.0,
    chunk_shift=0,
    speech=False,
):
    """Paste a randomly-scaled, faded slice of ``wav`` into
    ``wav_chunk`` at ``chunk_shift`` (reference ``add_chunk``
    semantics: random length in [min_len, max_len] s, random start,
    per-source random amplitude, fade-in when shifted, fade-out when it
    ends early, targets set to 1 over the pasted span when
    ``speech``)."""
    min_len_samples = int(sample_rate * min_len)
    max_len_samples = int(sample_rate * max_len)
    last_sample = int(example_length * sample_rate)

    len_chunk = int(rng.integers(min_len_samples, max_len_samples))
    max_end_sample = min_begin_sample + (last_sample - len_chunk)
    begin_sample = int(
        rng.integers(min_begin_sample, max(max_end_sample, min_begin_sample + 1))
    )
    end_chunk = min(chunk_shift + len_chunk, last_sample)

    rand_amp = (
        rng.random((wav.shape[0], 1, wav.shape[-1])).astype(np.float32)
        * (max_amp - min_amp)
        + min_amp
    )
    wav_to_paste = np.array(
        wav[:, begin_sample : begin_sample + (end_chunk - chunk_shift)]
    )
    # per-(example, source) peak normalization then random amplitude
    max_v = np.abs(wav_to_paste).max(axis=1, keepdims=True)
    wav_to_paste = wav_to_paste / np.maximum(max_v, 1e-9)
    wav_to_paste = rand_amp * wav_to_paste

    if chunk_shift > 0:
        wav_to_paste = np.moveaxis(
            _fade_in(np.moveaxis(wav_to_paste, 1, -1)), -1, 1
        )
    if end_chunk < last_sample:
        wav_to_paste = np.moveaxis(
            _fade_out(np.moveaxis(wav_to_paste, 1, -1)), -1, 1
        )

    wav_chunk = np.array(wav_chunk)
    wav_chunk[:, chunk_shift:end_chunk] += wav_to_paste

    if speech:
        beg = int(chunk_shift / (sample_rate * time_resolution))
        end = int(end_chunk / (sample_rate * time_resolution))
        target[:, beg:end] = 1
    lengths = np.ones((wav_chunk.shape[0], wav_chunk.shape[-1]), np.float32)
    return wav_chunk, target, lengths, end_chunk


def get_samples_from_datasets(datasets, wav, key, rng):
    """Draw a batch of samples (noise or speech) from each augmenter.

    ``datasets`` are PRNG-explicit augmenters
    (``aug(waveforms, lengths, key) -> waveforms``, e.g.
    ``processing.speech_augmentation.AddNoise``); each is fed uniform
    noise of the input's shape, as in the reference."""
    samples = np.zeros(
        (wav.shape[0], wav.shape[1], len(datasets)), np.float32
    )
    keys = jax.random.split(key, max(len(datasets), 1))
    for i, dataset in enumerate(datasets):
        wav_sample = (
            rng.random(wav.shape[:2]).astype(np.float32) * 2 - 1
        )
        len_sample = np.ones(wav.shape[0], np.float32)
        out = dataset(wav_sample, len_sample, keys[i])
        samples[:, :, i] = np.asarray(out)
    idx = rng.permutation(samples.shape[-1])
    return samples[:, :, idx]


def create_chunks(
    wav1,
    wav2,
    background,
    rng,
    sample_rate=16000,
    time_resolution=0.01,
    example_length=5,
    speech1=False,
    speech2=False,
    low_background=0.05,
    high_background=0.15,
    max_pause=16000,
):
    """Two delayed sources + noise background -> (wavs, targets,
    lengths), flattened over the source axis (reference
    ``create_chunks``)."""
    background_amp = (
        rng.random() * (high_background - low_background)
        + low_background
    )
    wav = background_amp * (
        rng.random(background.shape).astype(np.float32) - 0.5
    )
    wav = wav + background_amp * np.roll(background, 1, axis=-1)

    wav, target, lengths, end_chunk = add_chunk(
        wav1,
        wav,
        initialize_targets(wav1, sample_rate, time_resolution),
        rng,
        sample_rate=sample_rate,
        time_resolution=time_resolution,
        example_length=example_length,
        speech=speech1,
    )
    begin_sample = int(rng.integers(end_chunk, end_chunk + max_pause))
    wav, target, lengths, _ = add_chunk(
        wav2,
        wav,
        target,
        rng,
        chunk_shift=begin_sample,
        sample_rate=sample_rate,
        time_resolution=time_resolution,
        example_length=example_length,
        speech=speech2,
    )
    B, T, S = wav.shape
    frames = target.shape[1]
    wav = wav.transpose(0, 2, 1).reshape(B * S, T)
    target = target.transpose(0, 2, 1).reshape(B * S, frames)
    lengths = np.ones(B * S, np.float32)  # full-length by construction
    return wav, target, lengths


def augment_data(noise_datasets, speech_datasets, wavs, targets, lens_targ, key=None, rng=None):
    """Create every transition type and concatenate with the original
    batch (reference ``augment_data``): the output is a training batch
    with speech=>speech, noise=>speech, speech=>noise, noise=>noise
    transitions plus the originals, peak-normalized with random gains.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if rng is None:
        rng = np.random.default_rng(0)
    wavs = np.asarray(wavs)
    if wavs.ndim == 2:
        wavs3 = wavs[..., None]
    else:
        wavs3 = wavs
    k1, k2 = jax.random.split(key)
    wav_noise = get_samples_from_datasets(noise_datasets, wavs3, k1, rng)
    wav_speech = get_samples_from_datasets(speech_datasets, wavs3, k2, rng)

    w_ns, t_ns, l_ns = create_chunks(
        wav_noise, wav_speech, wav_noise, rng, speech1=False, speech2=True
    )
    w_sn, t_sn, l_sn = create_chunks(
        wav_speech, wav_noise, wav_noise, rng, speech1=True, speech2=False
    )
    w_ss, t_ss, l_ss = create_chunks(
        wav_speech,
        np.roll(wav_speech, 1, axis=-1),
        wav_noise,
        rng,
        speech1=True,
        speech2=True,
    )
    w_nn, t_nn, l_nn = create_chunks(
        wav_noise,
        np.roll(wav_noise, 1, axis=-1),
        wav_noise,
        rng,
        speech1=False,
        speech2=False,
    )

    targets = np.asarray(targets)
    out_wavs = np.concatenate([wavs, w_ns, w_sn, w_ss, w_nn], axis=0)
    frames = min(
        targets.shape[1], t_ns.shape[1], t_sn.shape[1],
        t_ss.shape[1], t_nn.shape[1],
    )
    out_targets = np.concatenate(
        [
            targets[:, :frames],
            t_ns[:, :frames],
            t_sn[:, :frames],
            t_ss[:, :frames],
            t_nn[:, :frames],
        ],
        axis=0,
    )
    out_lens = np.concatenate(
        [np.asarray(lens_targ).reshape(-1), l_ns, l_sn, l_ss, l_nn]
    )
    max_amp = np.abs(out_wavs).max(axis=1, keepdims=True)
    out_wavs = out_wavs / np.maximum(max_amp, 1e-9)
    out_wavs = out_wavs * rng.random(
        (out_wavs.shape[0], 1)
    ).astype(np.float32)
    return out_wavs.astype(np.float32), out_targets, out_lens
