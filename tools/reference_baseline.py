#!/usr/bin/env python3
"""Measure the REFERENCE toolkit's conformer_small training step.

Replaces the invented ``BASELINE_UTT_S`` anchor in bench.py (round-2
VERDICT weak item 6) with a measured number: the actual reference
code (PyTorch SpeechBrain at /root/reference) running the same
workload class as the bench headline — Fbank features + conformer
(d_model=144, 12 encoder / 4 decoder layers, RelPosMHAXL) + joint
CTC/KL objectives + Adam step — on THIS HOST's CPU torch (the only
hardware the reference can use here; the published recipes ran on
1xV100, which the README does not quantify in utt/s, SURVEY.md §6).

Writes ``{"reference_cpu_utt_s": ..., "config": ...}`` to
--out (default tools/reference_baseline.json); bench.py reports it as
``reference_cpu_utt_s`` alongside the TPU number.  The two run on
different silicon — the comparison is labeled, not normalized.

Usage: python tools/reference_baseline.py [--batch 4] [--seconds 10]
"""

import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"


def _stub(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_reference():
    """Import the reference package with non-numeric deps stubbed
    (same recipe as tests/parity/conftest.py)."""
    _stub(
        "hyperpyyaml",
        load_hyperpyyaml=lambda *a, **k: None,
        resolve_references=lambda *a, **k: None,
        dump_hyperpyyaml=lambda *a, **k: None,
    )
    ta = _stub(
        "torchaudio",
        set_audio_backend=lambda *a, **k: None,
        get_audio_backend=lambda: "soundfile",
        info=lambda *a, **k: None,
        load=lambda *a, **k: None,
        save=lambda *a, **k: None,
    )
    ta.transforms = _stub("torchaudio.transforms")
    ruamel = _stub("ruamel")
    ruamel.yaml = _stub("ruamel.yaml", YAML=object)
    _stub(
        "sentencepiece",
        SentencePieceProcessor=object,
        SentencePieceTrainer=object,
    )
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import speechbrain  # noqa: F401

    return speechbrain


def measure(batch=4, seconds=10.0, vocab=256, u=40, steps=3):
    """Seconds per reference train step -> utt/s on host CPU."""
    import torch

    install_reference()
    from speechbrain.lobes.features import Fbank
    from speechbrain.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )
    from speechbrain.nnet.losses import ctc_loss, kldiv_loss
    from speechbrain.nnet.linear import Linear

    torch.manual_seed(0)
    sr = 16000
    fbank = Fbank(n_mels=80, sample_rate=sr)
    model = TransformerASR(
        tgt_vocab=vocab,
        input_size=80,
        d_model=144,
        nhead=4,
        num_encoder_layers=12,
        num_decoder_layers=4,
        d_ffn=576,
        dropout=0.1,
        encoder_module="conformer",
        attention_type="RelPosMHAXL",
        kernel_size=31,
        normalize_before=True,
        causal=False,
    )
    ctc_lin = Linear(input_size=144, n_neurons=vocab)
    seq_lin = Linear(input_size=144, n_neurons=vocab)
    params = (
        list(model.parameters())
        + list(ctc_lin.parameters())
        + list(seq_lin.parameters())
    )
    opt = torch.optim.Adam(params, lr=1e-3)

    sig = torch.randn(batch, int(seconds * sr))
    wav_lens = torch.ones(batch)
    tokens = torch.randint(3, vocab, (batch, u))
    tokens_bos = torch.cat(
        [torch.ones(batch, 1, dtype=torch.long), tokens], dim=1
    )
    tokens_eos = torch.cat(
        [tokens, 2 * torch.ones(batch, 1, dtype=torch.long)], dim=1
    )
    tok_lens = torch.ones(batch)

    def step():
        feats = fbank(sig)
        enc_out, pred = model(feats, tokens_bos, wav_lens, pad_idx=0)
        ctc_logits = ctc_lin(enc_out)
        p_ctc = torch.log_softmax(ctc_logits, dim=-1)
        seq_logits = seq_lin(pred)
        p_seq = torch.log_softmax(seq_logits, dim=-1)
        loss_ctc = ctc_loss(
            p_ctc, tokens, wav_lens, tok_lens, blank_index=0
        )
        loss_seq = kldiv_loss(
            p_seq, tokens_eos, length=tok_lens, label_smoothing=0.1
        )
        loss = 0.3 * loss_ctc + 0.7 * loss_seq
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return batch / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument(
        "--out",
        default=os.path.join(REPO, "tools", "reference_baseline.json"),
    )
    args = ap.parse_args()
    utt_s, sec_per_step = measure(args.batch, args.seconds)
    result = {
        "reference_cpu_utt_s": round(utt_s, 3),
        "sec_per_step": round(sec_per_step, 3),
        "config": {
            "model": "conformer_small dims (d=144, 12 enc + 4 dec)",
            "batch": args.batch,
            "seconds_per_utt": args.seconds,
            "hardware": "host CPU (torch), the only hardware the "
            "reference can use in this environment",
        },
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
