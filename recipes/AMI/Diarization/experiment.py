#!/usr/bin/env python3
"""Speaker diarization on AMI (TPU-native pipeline).

    python experiment.py hparams/ecapa.yaml --data_folder /data/AMI

Mirrors the reference ``recipes/AMI/Diarization/experiment.py``:
sliding-window ECAPA speaker embeddings over each recording, cosine
affinity + spectral clustering (or kmeans/AHC) into an RTTM, scored
with DER against the reference RTTM.  Embedding extraction is batched
through jit; clustering/scoring run on host (same split as the
reference's torch/sklearn pipeline).
"""

import glob
import os
import sys

import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.processing import diarization as diar
from speechbrain_tpu.processing.PLDA_LDA import StatObject_SB
from speechbrain_tpu.utils.DER import DER


def sliding_windows(n_samples, sr, win_s, hop_s):
    """[(start_sample, stop_sample, start_sec, stop_sec), ...]."""
    win, hop = int(win_s * sr), int(hop_s * sr)
    out = []
    start = 0
    while start + win <= n_samples or start == 0:
        stop = min(start + win, n_samples)
        out.append((start, stop, start / sr, stop / sr))
        if stop >= n_samples:
            break
        start += hop
    return out


def embed_recording(wav, sr, embed_fn, win_s, hop_s):
    """(segset, embeddings) for one recording via sliding windows."""
    import jax.numpy as jnp

    spans = sliding_windows(len(wav), sr, win_s, hop_s)
    win = int(win_s * sr)
    chunks = np.stack(
        [
            np.pad(wav[s:e], (0, max(0, win - (e - s))))
            for s, e, _, _ in spans
        ]
    )
    embs = np.asarray(embed_fn(jnp.asarray(chunks)))
    embs = embs.reshape(len(spans), -1)
    segset = [
        f"rec_{ss:.3f}_{es:.3f}" for _, _, ss, es in spans
    ]
    return segset, embs


def diarize_recording(
    rec_id, wav, sr, embed_fn, out_rttm, num_spkrs=4,
    win_s=1.5, hop_s=0.75, pval=0.3, backend="spec",
):
    """Embed + cluster one recording, writing its RTTM."""
    segset, embs = embed_recording(wav, sr, embed_fn, win_s, hop_s)
    segset = [f"{rec_id}_{s.split('_', 1)[1]}" for s in segset]
    diary = StatObject_SB(
        modelset=segset,
        segset=segset,
        stat0=np.ones((len(segset), 1)),
        stat1=embs,
    )
    if backend == "kmeans":
        diar.do_kmeans_clustering(diary, out_rttm, rec_id, num_spkrs, pval)
    elif backend == "ahc":
        diar.do_AHC(diary, out_rttm, rec_id, num_spkrs, pval)
    else:
        diar.do_spec_clustering(
            diary, out_rttm, rec_id, num_spkrs, pval
        )


if __name__ == "__main__":
    from speechbrain_tpu.dataio.dataio import read_audio
    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    import jax

    classifier = hparams["embedding_model"]
    feats_fn = hparams["compute_features"]
    params = {"value": None}

    @jax.jit
    def embed_fn(chunks):
        feats = feats_fn(chunks)
        return classifier.apply(
            params["value"], feats, train=False
        )

    # Lazy init from the first chunk batch shape.
    def embed(chunks):
        if params["value"] is None:
            params["value"] = classifier.init(
                jax.random.PRNGKey(hparams["seed"]),
                feats_fn(chunks[:1]),
                train=False,
            )
        return embed_fn(chunks)

    wav_dir = os.path.join(hparams["data_folder"], "audio")
    rttm_dir = os.path.join(hparams["data_folder"], "rttm")
    out_dir = os.path.join(hparams["output_folder"], "sys_rttm")
    os.makedirs(out_dir, exist_ok=True)
    ref_rows, sys_rows = [], []
    for wav_path in sorted(glob.glob(os.path.join(wav_dir, "*.wav"))):
        rec_id = os.path.splitext(os.path.basename(wav_path))[0]
        wav = read_audio(wav_path)
        out_rttm = os.path.join(out_dir, rec_id + ".rttm")
        diarize_recording(
            rec_id,
            wav,
            hparams["sample_rate"],
            embed,
            out_rttm,
            num_spkrs=hparams["num_spkrs"],
            win_s=hparams["window_s"],
            hop_s=hparams["hop_s"],
            pval=hparams["pval"],
            backend=hparams["backend"],
        )
        sys_rows += diar.read_rttm(out_rttm)
        ref_path = os.path.join(rttm_dir, rec_id + ".rttm")
        if os.path.exists(ref_path):
            ref_rows += diar.read_rttm(ref_path)
    if ref_rows:
        miss, fa, conf, der = DER(ref_rows, sys_rows)
        msg = (
            f"DER={der:.2f}% (miss {miss:.2f}, falarm {fa:.2f}, "
            f"confusion {conf:.2f})"
        )
        print(msg)
        with open(
            os.path.join(hparams["output_folder"], "DER.txt"), "w"
        ) as f:
            f.write(msg + "\n")
