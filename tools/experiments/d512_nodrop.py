import time
import jax
import __graft_entry__ as ge

# monkeypatch the brain factory's dropout via TransformerASR kwargs:
# rebuild with dropout=0 by copying _conformer_brain with dropout arg
import jax.numpy as jnp
import optax
from speechbrain_tpu.core import Brain
from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.lobes.models.convolution import ConvolutionFrontEnd
from speechbrain_tpu.lobes.models.transformer.TransformerASR import TransformerASR
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.nnet.losses import ctc_loss, kldiv_loss

VOCAB, N_MELS = ge.VOCAB, ge.N_MELS

def make(dropout):
    class CB(Brain):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.fbank = Fbank(n_mels=N_MELS, sample_rate=16000, mxu_dtype="bfloat16")
        def compute_forward(self, batch, stage):
            feats = self.fbank(batch["sig"]).astype(jnp.bfloat16)
            src = self.modules.frontend(feats)
            enc, dec = self.modules.transformer(src, batch["tokens_bos"], wav_len=batch["sig_lens"], pad_idx=0)
            return (jax.nn.log_softmax(self.modules.ctc_lin(enc).astype(jnp.float32), -1),
                    jax.nn.log_softmax(self.modules.seq_lin(dec).astype(jnp.float32), -1))
        def compute_objectives(self, p, batch, stage):
            ctc_logp, seq_logp = p
            mask = batch["batch_mask"]
            return 0.3 * ctc_loss(ctc_logp, batch["tokens"], batch["sig_lens"]*mask, batch["tokens_lens"]*mask, blank_index=0) + \
                   0.7 * kldiv_loss(seq_logp, batch["tokens_eos"], length=batch["tokens_eos_lens"]*mask, label_smoothing=0.1)
    return CB(
        modules={
            "frontend": ConvolutionFrontEnd(num_blocks=2, out_channels=(16, 16)),
            "transformer": TransformerASR(tgt_vocab=VOCAB, input_size=16*(N_MELS//4+1), d_model=512, nhead=8,
                num_encoder_layers=12, num_decoder_layers=6, d_ffn=2048, dropout=dropout,
                encoder_module="conformer", attention_type="RelPosMHAXL", kernel_size=31),
            "ctc_lin": Linear(n_neurons=VOCAB),
            "seq_lin": Linear(n_neurons=VOCAB),
        },
        opt_class=lambda lr: optax.adamw(lr), hparams={"lr": 1e-3}, run_opts={"seed": 0},
    )

def measure(brain, tag, B=16, K=8):
    batches = [brain.prepare_batch(ge._synthetic_batch(B=B, seconds=10.0, U=40, seed=i)) for i in range(4)]
    jax.block_until_ready(batches)
    window = batches + batches
    brain.loss_sync_interval = 200
    brain.step = 1
    brain.fit_batches(window[:K])
    jax.block_until_ready(brain.train_state["params"])
    t0 = time.perf_counter()
    for _ in range(2):
        brain.step += K
        brain.fit_batches(window[:K])
    jax.block_until_ready(brain.train_state["params"])
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt/(2*K)*1e3:.1f} ms/step", flush=True)

measure(make(0.1), "dropout=0.1")
measure(make(0.0), "dropout=0.0")
