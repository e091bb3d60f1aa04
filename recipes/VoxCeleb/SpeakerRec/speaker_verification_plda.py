#!/usr/bin/env python3
"""Speaker verification with PLDA scoring on VoxCeleb1 trials.

    python speaker_verification_plda.py hparams/verification_plda_xvector.yaml \
        --data_folder /data/VoxCeleb1 \
        --verification_file /data/VoxCeleb1/veri_test2.txt

Mirrors the reference
``recipes/VoxCeleb/SpeakerRec/speaker_verification_plda.py``: xvector
embeddings for the training set fit a PLDA backend
(``processing/PLDA_LDA.py``); enrol/test trial embeddings are scored
with fast log-likelihood-ratio PLDA scoring; reports EER and minDCF.
"""

import json
import os
import sys

import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.processing.PLDA_LDA import (
    PLDA,
    Ndx,
    StatObject_SB,
    fast_PLDA_scoring,
)
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml
from speechbrain_tpu.utils.metric_stats import EER, minDCF

from speaker_verification_cosine import (
    compute_embeddings,
    load_embedding_params,
)


def stat_object(ids, spk_ids, embeddings):
    """Wrap raw embeddings into a PLDA stat server."""
    emb = np.stack(embeddings).astype(np.float64)
    n = len(ids)
    return StatObject_SB(
        modelset=np.asarray(spk_ids, dtype="<U100"),
        segset=np.asarray(ids, dtype="<U100"),
        start=np.array([None] * n),
        stop=np.array([None] * n),
        stat0=np.ones((n, 1)),
        stat1=emb,
    )


def main():
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    sys.path.insert(0, __file__.rsplit("/SpeakerRec/", 1)[0])
    from voxceleb_prepare import prepare_trials, prepare_voxceleb

    from speechbrain_tpu.utils.distributed import run_on_main

    run_on_main(
        prepare_voxceleb,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
        },
    )
    trials_json = os.path.join(hparams["save_folder"], "trials.json")
    prepare_trials(
        hparams["verification_file"], hparams["data_folder"], trials_json
    )
    with open(trials_json) as f:
        trials = json.load(f)
    with open(os.path.join(hparams["save_folder"], "train.json")) as f:
        train_manifest = json.load(f)

    import jax.numpy as jnp

    example = jnp.zeros((1, 200, hparams["n_mels"]))
    # embeddings use compute_features + mean_var_norm + embedding_model
    # from hparams (shared helpers with the cosine script); params come
    # from pretrain_path when provided.
    hparams["compute_features"], hparams["mean_var_norm"]  # noqa: B018
    variables = load_embedding_params(
        hparams, hparams["embedding_model"], example
    )
    _ = hparams["pretrain_path"]

    # PLDA training embeddings (capped for tractability)
    items = sorted(train_manifest.items())[: hparams["plda_train_utts"]]
    train_paths = [v["wav"] for _, v in items]
    cache = compute_embeddings(hparams, variables, train_paths)
    train_stat = stat_object(
        [k for k, _ in items],
        [v.get("spk_id", k.split("-")[0]) for k, v in items],
        [cache[v["wav"]] for _, v in items],
    )
    plda = PLDA(rank_f=hparams["rank_f"])
    plda.plda(train_stat)

    # Trial embeddings
    paths = sorted(
        {t["enrol"] for t in trials} | {t["test"] for t in trials}
    )
    cache = compute_embeddings(hparams, variables, paths)
    enrol_ids = sorted({t["enrol"] for t in trials})
    test_ids = sorted({t["test"] for t in trials})
    enrol_stat = stat_object(
        enrol_ids, enrol_ids, [cache[p] for p in enrol_ids]
    )
    test_stat = stat_object(test_ids, test_ids, [cache[p] for p in test_ids])
    ndx = Ndx(
        models=[t["enrol"] for t in trials],
        testsegs=[t["test"] for t in trials],
    )
    scores = fast_PLDA_scoring(
        enrol_stat, test_stat, ndx, plda.mean, plda.F, plda.Sigma
    )
    model_idx = {m: i for i, m in enumerate(scores.modelset)}
    seg_idx = {s: i for i, s in enumerate(scores.segset)}
    positive, negative = [], []
    for t in trials:
        s = float(scores.scoremat[model_idx[t["enrol"]], seg_idx[t["test"]]])
        (positive if t["label"] == 1 else negative).append(s)
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
