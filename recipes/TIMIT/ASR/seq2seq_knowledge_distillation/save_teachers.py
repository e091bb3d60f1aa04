#!/usr/bin/env python3
"""Dump teacher posteriors for TIMIT knowledge distillation.

    python save_teachers.py hparams/save_teachers.yaml \
        --data_folder /data/TIMIT

Mirrors the reference
``recipes/TIMIT/ASR/seq2seq_knowledge_distillation/save_teachers.py``:
every trained teacher (``train_teacher.py`` output dirs listed in
``teacher_dirs``, with matching ``teacher_yamls`` configs) is restored
from its best checkpoint and run over the train/valid/test sets; the
per-utterance CTC posteriors and attention-decoder posteriors are
averaged over the ensemble and written as one ``.npz`` per split for
``train_kd.py`` to distill against.
"""

import importlib.util
import os
import sys

import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.utils.checkpoints import Checkpointer
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml


def _load_teacher_module():
    """Import the ASR Brain class from train_teacher.py next door."""
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "kd_train_teacher", os.path.join(here, "train_teacher.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def forward_posteriors(brain, batch):
    """(ctc log-probs, seq log-probs) for one batch, eval mode."""
    device_batch = brain.prepare_batch(batch)
    brain._ensure_initialized(device_batch)
    rngs = brain._make_step_rngs(brain._next_rng())
    brain._bind(
        brain.train_state["params"],
        brain.train_state["model_state"],
        brain.train_state["extra"],
        rngs,
        train=False,
    )
    ctc_logp, seq_logp, _ = brain.compute_forward(device_batch, Stage.TEST)
    return np.asarray(ctc_logp), np.asarray(seq_logp), device_batch


def main():
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    teacher_mod = _load_teacher_module()
    teacher_dirs = hparams["teacher_dirs"]
    teacher_yamls = hparams["teacher_yamls"]
    assert len(teacher_dirs) == len(teacher_yamls)

    # Accumulated ensemble posteriors per split: {split: {utt: [arr...]}}
    sums = {}
    datasets = None
    for t_dir, t_yaml in zip(teacher_dirs, teacher_yamls):
        t_overrides = {
            "data_folder": hparams["data_folder"],
            "output_folder": t_dir,
        }
        # extra overrides (e.g. shrunken debug dims matching how the
        # teachers were actually trained)
        t_overrides.update(hparams.get("teacher_overrides") or {})
        with open(t_yaml) as f:
            t_hparams = load_hyperpyyaml(f, t_overrides)
        brain = teacher_mod.ASR(
            modules=t_hparams["modules"],
            opt_class=lambda lr: t_hparams["opt_class"](learning_rate=lr),
            hparams=t_hparams,
            run_opts=dict(run_opts),
            checkpointer=Checkpointer(t_hparams["save_folder"]),
        )
        datasets, label_encoder = teacher_mod.dataio_prep(t_hparams)
        brain.label_encoder = label_encoder
        brain.checkpointer.recover_if_possible(min_key="PER")
        for split in ("train", "valid", "test"):
            loader = SaveableDataLoader(
                datasets[split], batch_size=hparams["batch_size"]
            )
            store = sums.setdefault(split, {})
            for batch in loader:
                ctc_logp, seq_logp, dbatch = forward_posteriors(
                    brain, batch
                )
                mask = np.asarray(dbatch["batch_mask"])
                ids = batch["id"]
                for i, utt in enumerate(ids):
                    if i >= len(mask) or mask[i] == 0:
                        continue
                    p_ctc = np.exp(ctc_logp[i]).astype(np.float16)
                    p_seq = np.exp(seq_logp[i]).astype(np.float16)
                    if utt in store:
                        store[utt][0] += p_ctc.astype(np.float32)
                        store[utt][1] += p_seq.astype(np.float32)
                    else:
                        store[utt] = [
                            p_ctc.astype(np.float32),
                            p_seq.astype(np.float32),
                        ]

    n_teachers = len(teacher_dirs)
    for split, store in sums.items():
        arrays = {}
        for utt, (p_ctc, p_seq) in store.items():
            arrays[f"{utt}__ctc"] = (p_ctc / n_teachers).astype(np.float16)
            arrays[f"{utt}__seq"] = (p_seq / n_teachers).astype(np.float16)
        out = os.path.join(
            hparams["output_folder"], f"ensemble_{split}.npz"
        )
        np.savez_compressed(out, **arrays)
        print(f"wrote {out} ({len(store)} utterances)")


if __name__ == "__main__":
    main()
