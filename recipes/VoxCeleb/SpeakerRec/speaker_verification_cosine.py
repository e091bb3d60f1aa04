#!/usr/bin/env python3
"""Speaker verification with cosine scoring on VoxCeleb1 trials.

    python speaker_verification_cosine.py hparams/verification_ecapa.yaml \
        --data_folder /data/VoxCeleb1 \
        --verification_file /data/VoxCeleb1/veri_test2.txt

Mirrors the reference
``recipes/VoxCeleb/SpeakerRec/speaker_verification_cosine.py``:
embeddings from a trained speaker model (``train_speaker_embeddings.py``
output, loaded from ``pretrain_path``) are L2-cosine scored over the
verification trial list; reports EER and minDCF.
"""

import json
import os
import sys

import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml
from speechbrain_tpu.utils.metric_stats import EER, minDCF


def load_embedding_params(hparams, module, example):
    """Init the embedding module, then overlay msgpack params from
    ``pretrain_path``/embedding_model.ckpt when present."""
    import jax
    from flax import serialization

    variables = module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        example,
        train=False,
    )
    path = os.path.join(
        hparams.get("pretrain_path") or "", "embedding_model.ckpt"
    )
    if hparams.get("pretrain_path") and os.path.exists(path):
        with open(path, "rb") as f:
            variables = serialization.from_bytes(variables, f.read())
    return variables


def compute_embeddings(hparams, variables, wav_paths):
    """Utterance -> embedding dict (cached, batched by file)."""
    import jax.numpy as jnp

    from speechbrain_tpu.dataio.dataio import read_audio

    module = hparams["embedding_model"]
    feats_fn = hparams["compute_features"]
    norm = hparams["mean_var_norm"]
    cache = {}
    for path in wav_paths:
        if path in cache:
            continue
        wav = jnp.asarray(read_audio(path))[None]
        feats = feats_fn(wav)
        feats = norm(feats, jnp.ones(1), training=False)
        emb = module.apply(variables, feats, train=False)
        emb = np.asarray(emb).reshape(-1)
        cache[path] = emb / max(float(np.linalg.norm(emb)), 1e-8)
    return cache


def main():
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    sys.path.insert(0, __file__.rsplit("/SpeakerRec/", 1)[0])
    from voxceleb_prepare import prepare_trials

    os.makedirs(hparams["save_folder"], exist_ok=True)
    trials_json = os.path.join(hparams["save_folder"], "trials.json")
    prepare_trials(
        hparams["verification_file"], hparams["data_folder"], trials_json
    )
    with open(trials_json) as f:
        trials = json.load(f)

    import jax.numpy as jnp

    example = jnp.zeros((1, 200, hparams["n_mels"]))
    variables = load_embedding_params(
        hparams, hparams["embedding_model"], example
    )
    paths = sorted(
        {t["enrol"] for t in trials} | {t["test"] for t in trials}
    )
    cache = compute_embeddings(hparams, variables, paths)

    positive, negative = [], []
    with open(
        os.path.join(hparams["output_folder"], "scores.txt"), "w"
    ) as f:
        for t in trials:
            score = float(cache[t["enrol"]] @ cache[t["test"]])
            (positive if t["label"] == 1 else negative).append(score)
            f.write(f"{t['enrol']} {t['test']} {score}\n")
    eer, _ = EER(np.asarray(positive), np.asarray(negative))
    dcf, _ = minDCF(np.asarray(positive), np.asarray(negative))
    logline = f"EER: {eer * 100:.3f}%  minDCF: {dcf:.4f}"
    print(logline)
    with open(
        os.path.join(hparams["output_folder"], "train_log.txt"), "a"
    ) as f:
        f.write(logline + "\n")


if __name__ == "__main__":
    main()
