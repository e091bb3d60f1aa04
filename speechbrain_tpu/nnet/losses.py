"""Losses with the masked-relative-length convention.

Every sequence loss takes ``length`` as RELATIVE lengths (batch,) and
masks padded frames before reduction (the reference's
``compute_masked_loss`` convention, ``nnet/losses.py:297``).

Parity targets: reference ``nnet/losses.py:27`` (transducer wrapper),
``:245`` (ctc), ``:88`` (PitWrapper), ``:297-690`` (masked losses),
``:690-850`` (SI-SNR), ``:890,940`` (angular margins), ``:1067,1143``
(KD), ``:1198`` (wav2vec2 contrastive).
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "compute_masked_loss",
    "ctc_loss",
    "transducer_loss",
    "nll_loss",
    "mse_loss",
    "l1_loss",
    "bce_loss",
    "kldiv_loss",
    "classification_error",
    "PitWrapper",
    "cal_si_snr",
    "get_si_snr_with_pitwrapper",
    "AngularMargin",
    "AdditiveAngularMargin",
    "LogSoftmaxWrapper",
    "distance_diff_loss",
    "ContrastiveLoss",
]


def _sequence_mask(lengths, max_len, dtype=jnp.float32):
    abs_len = jnp.asarray(lengths) * max_len
    return (jnp.arange(max_len)[None, :] < abs_len[:, None]).astype(dtype)


def compute_masked_loss(
    loss_fn,
    predictions,
    targets,
    length=None,
    label_smoothing=0.0,
    reduction="mean",
):
    """Apply an elementwise loss with padding masking and reduction.

    loss_fn(predictions, targets) must return per-element losses with
    shape (batch, time, ...) summed over trailing dims to (batch, time).
    """
    per_elem = loss_fn(predictions, targets)
    while per_elem.ndim > 2:
        per_elem = per_elem.sum(axis=-1)
    B, T = per_elem.shape
    if length is not None:
        mask = _sequence_mask(length, T, per_elem.dtype)
    else:
        mask = jnp.ones((B, T), per_elem.dtype)
    per_elem = per_elem * mask
    if reduction == "mean":
        loss = per_elem.sum() / jnp.maximum(mask.sum(), 1.0)
    elif reduction == "batchmean":
        loss = per_elem.sum() / B
    elif reduction == "batch":
        loss = per_elem.sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)
    elif reduction == "sum":
        loss = per_elem.sum()
    else:
        raise ValueError(f"Unknown reduction {reduction}")
    if label_smoothing > 0.0:
        # KL to uniform over the vocab (reference convention for nll).
        loss_reg = -jnp.mean(predictions, axis=-1)
        loss_reg = (loss_reg * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        loss = label_smoothing * loss_reg + (1 - label_smoothing) * loss
    return loss


def ctc_loss(
    log_probs,
    targets,
    input_lens,
    target_lens,
    blank_index,
    reduction="mean",
):
    """CTC loss on (batch, time, labels) log-probs with relative lengths.

    Routed through ``ops/pallas/ctc.ctc_loss_per_seq``: optax's XLA
    CTC by default (measured fastest at speech shapes), with an exact
    Pallas lattice kernel available via ``SB_CTC_PALLAS=1`` (gradients
    identical w.r.t. the pre-softmax logits; pinned by
    tests/unittests/test_pallas_ctc.py).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lp = jax.nn.log_softmax(jnp.zeros((1, 4, 3)))
    >>> float(ctc_loss(lp, jnp.array([[1, 2]]), jnp.ones(1),
    ...       jnp.ones(1), blank_index=0)) > 0
    True
    """
    from speechbrain_tpu.ops.pallas.ctc import ctc_loss_per_seq

    log_probs = jnp.asarray(log_probs)
    targets = jnp.asarray(targets, jnp.int32)
    B, T, C = log_probs.shape
    U = targets.shape[1]
    input_lengths = jnp.round(jnp.asarray(input_lens) * T).astype(jnp.int32)
    target_lengths = jnp.round(
        jnp.asarray(target_lens) * U
    ).astype(jnp.int32)
    per_seq = ctc_loss_per_seq(
        log_probs, targets, input_lengths, target_lengths, blank_index
    )
    if reduction == "mean":
        # Reference divides each sequence loss by its target length
        # (torch ctc_loss reduction="mean" semantics, nnet/losses.py:245).
        return (per_seq / jnp.maximum(target_lengths, 1)).mean()
    elif reduction == "batchmean":
        return per_seq.mean()
    elif reduction == "batch":
        # per-sequence loss normalized by its own target length
        # (reference nnet/losses.py:291)
        return per_seq / jnp.maximum(target_lengths, 1)
    elif reduction == "none":
        return per_seq
    elif reduction == "sum":
        return per_seq.sum()
    raise ValueError(f"Unknown reduction {reduction}")


def transducer_loss(
    logits,
    targets,
    input_lens,
    target_lens,
    blank_index,
    reduction="mean",
    use_pallas=True,
):
    """RNN-T loss; see ``speechbrain_tpu.nnet.loss.transducer_loss``."""
    from speechbrain_tpu.nnet.loss.transducer_loss import TransducerLoss

    T = logits.shape[1]
    U = targets.shape[1]
    abs_t = jnp.round(jnp.asarray(input_lens) * T).astype(jnp.int32)
    abs_u = jnp.round(jnp.asarray(target_lens) * U).astype(jnp.int32)
    loss = TransducerLoss(blank_index, use_pallas=use_pallas)(
        logits, targets, abs_t, abs_u
    )
    if reduction == "mean":
        return loss.mean()
    elif reduction == "batch":
        return loss
    elif reduction == "sum":
        return loss.sum()
    raise ValueError(f"Unknown reduction {reduction}")


def nll_loss(
    log_probabilities,
    targets,
    length=None,
    label_smoothing=0.0,
    allowed_len_diff=3,
    reduction="mean",
):
    """Negative log-likelihood on (B, T, C) log-probs vs (B, T) ints.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> lp = jnp.log(jnp.array([[[0.9, 0.1]]]))
    >>> round(float(nll_loss(lp, jnp.array([[0]]))), 4)
    0.1054
    """
    log_probabilities = jnp.asarray(log_probabilities)
    targets = jnp.asarray(targets, jnp.int32)
    if log_probabilities.ndim == 2:
        log_probabilities = log_probabilities[:, None, :]
        targets = targets.reshape(targets.shape[0], 1)

    def fn(pred, tgt):
        return -jnp.take_along_axis(pred, tgt[..., None], axis=-1)[..., 0]

    return compute_masked_loss(
        fn, log_probabilities, targets, length, label_smoothing, reduction
    )


def mse_loss(predictions, targets, length=None, reduction="mean"):
    """Masked mean squared error."""
    return compute_masked_loss(
        lambda p, t: ((p - t) ** 2).mean(axis=-1)
        if p.ndim > 2
        else (p - t) ** 2,
        jnp.asarray(predictions),
        jnp.asarray(targets),
        length,
        reduction=reduction,
    )


def l1_loss(predictions, targets, length=None, reduction="mean"):
    """Masked mean absolute error."""
    return compute_masked_loss(
        lambda p, t: jnp.abs(p - t).mean(axis=-1)
        if p.ndim > 2
        else jnp.abs(p - t),
        jnp.asarray(predictions),
        jnp.asarray(targets),
        length,
        reduction=reduction,
    )


def bce_loss(
    inputs,
    targets,
    length=None,
    weight=None,
    pos_weight=None,
    reduction="mean",
    allowed_len_diff=3,
    label_smoothing=0.0,
):
    """Binary cross-entropy on logits."""
    inputs = jnp.asarray(inputs)
    targets = jnp.asarray(targets, inputs.dtype)
    if label_smoothing > 0:
        targets = targets * (1 - label_smoothing) + 0.5 * label_smoothing

    def fn(x, t):
        log_p = jax.nn.log_sigmoid(x)
        log_not_p = jax.nn.log_sigmoid(-x)
        if pos_weight is not None:
            per = -(pos_weight * t * log_p + (1 - t) * log_not_p)
        else:
            per = -(t * log_p + (1 - t) * log_not_p)
        if weight is not None:
            per = per * weight
        return per

    if inputs.ndim == 1:
        inputs = inputs[:, None]
        targets = targets.reshape(-1, 1)
    return compute_masked_loss(
        fn, inputs, targets, length, reduction=reduction
    )


def kldiv_loss(
    log_probabilities,
    targets,
    length=None,
    label_smoothing=0.0,
    allowed_len_diff=3,
    pad_idx=0,
    reduction="mean",
):
    """KL-divergence loss with label smoothing over int targets.

    With smoothing, the target distribution mixes the one-hot with
    uniform; padding tokens (pad_idx) are masked.
    """
    log_probabilities = jnp.asarray(log_probabilities)
    targets = jnp.asarray(targets, jnp.int32)
    if label_smoothing > 0:
        if log_probabilities.ndim == 2:
            log_probabilities = log_probabilities[:, None, :]
        C = log_probabilities.shape[-1]
        confidence = 1.0 - label_smoothing
        fill = label_smoothing / (C - 1)
        onehot = jax.nn.one_hot(targets, C, dtype=bool)
        true_dist = jnp.where(onehot, confidence, fill)
        # torch kl_div elementwise: p * (log p - log q), with 0 log 0 = 0
        log_true = jnp.where(
            true_dist > 0, jnp.log(jnp.where(true_dist > 0, true_dist, 1.0)), 0.0
        )
        per = (true_dist * (log_true - log_probabilities)).sum(-1)
        mask_pad = (targets != pad_idx).astype(per.dtype)
        per = per * mask_pad
        if length is not None:
            # identical to the reference on real data (padded targets
            # are pad_idx there); additionally zeroes our bucketed
            # dummy rows, whose lengths arrive as 0
            per = per * _sequence_mask(length, per.shape[1], per.dtype)
        B = per.shape[0]
        if reduction == "mean":
            # reference 'mean' is loss.sum().mean() == a GLOBAL SUM
            # (nnet/losses.py:584); recipes use 'batchmean'
            return per.sum()
        if reduction == "batchmean":
            return per.sum() / B
        if reduction == "batch":
            return per.reshape(B, -1).sum(1) / jnp.asarray(length)
        if reduction == "sum":
            return per.sum()
        return per
    return nll_loss(
        log_probabilities, targets, length, reduction=reduction
    )


def classification_error(probabilities, targets, length=None, reduction="mean"):
    """Fraction of frames whose argmax differs from the target."""
    probabilities = jnp.asarray(probabilities)
    targets = jnp.asarray(targets, jnp.int32)
    if probabilities.ndim == 2:
        probabilities = probabilities[:, None, :]
        targets = targets.reshape(targets.shape[0], 1)

    def fn(pred, tgt):
        return (pred.argmax(-1) != tgt).astype(jnp.float32)

    return compute_masked_loss(
        fn, probabilities, targets, length, reduction=reduction
    )


# ---------------------------------------------------------------------------
# Source-separation losses
# ---------------------------------------------------------------------------

class PitWrapper:
    """Permutation-invariant training wrapper (reference
    ``nnet/losses.py:88``).

    The base loss is evaluated ONCE on an all-pairs broadcast: for each
    example, ``pred`` is expanded to (..., n_sources, n_sources) along a
    new second-to-last axis and ``target`` along the last, so
    ``base_loss`` must perform no reduction (reference requirement).
    The pairwise matrix is averaged over leading dims and each
    permutation's diagonal selection scored; the best is returned.

    Returns ``(loss, perms)`` with ``loss`` of shape (batch,) and
    ``perms`` an int array (batch, n_sources): ``perms[b]`` reorders the
    last axis of the predictions into target order (use
    ``reorder_tensor``).  An array (not tuples) so the wrapper is
    jit-traceable; index or ``tolist()`` it on the host for the
    reference's list-of-tuples view.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> pit = PitWrapper(lambda p, t: (p - t) ** 2)
    >>> tgts = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]])  # (1, 2, 2)
    >>> preds = tgts[..., ::-1]
    >>> loss, perms = pit(preds, tgts)
    >>> float(loss.sum()), perms.tolist()
    (0.0, [[1, 0]])
    """

    def __init__(self, base_loss):
        self.base_loss = base_loss

    def _loss_mat(self, pred, target):
        """Per-example pairwise loss matrix (n_sources, n_sources):
        entry (i, j) is base_loss(pred[..., j], target[..., i])."""
        n = pred.shape[-1]
        pred_b = jnp.broadcast_to(
            pred[..., None, :], pred.shape[:-1] + (n, n)
        )
        tgt_b = jnp.broadcast_to(
            target[..., :, None], target.shape[:-1] + (n, n)
        )
        mat = self.base_loss(pred_b, tgt_b)
        # mean over all leading dims, keep the trailing (n, n)
        return mat.reshape((-1, n, n)).mean(axis=0)

    def __call__(self, preds, targets):
        import itertools

        n = preds.shape[-1]
        perms = jnp.asarray(
            list(itertools.permutations(range(n))), jnp.int32
        )  # (n!, n)

        def per_example(pred, target):
            mat = self._loss_mat(pred, target)  # (n, n)
            # score perm p: mean_i mat[i, p[i]]
            scores = mat[jnp.arange(n)[None, :], perms].mean(axis=-1)
            best = jnp.argmin(scores)
            return scores[best], perms[best]

        return jax.vmap(per_example)(preds, targets)

    def reorder_tensor(self, tensor, p):
        """Reorder the trailing source axis per example with the
        permutations from ``__call__`` (reference ``nnet/losses.py:191``)."""
        p = jnp.asarray(p, jnp.int32)  # (B, n)
        idx = p.reshape(p.shape[0:1] + (1,) * (tensor.ndim - 2) + p.shape[1:2])
        return jnp.take_along_axis(tensor, idx, axis=-1)


def cal_si_snr(source, estimate_source):
    """NEGATIVE scale-invariant SNR in dB, PitWrapper-compatible layout.

    Reference-exact (``nnet/losses.py:735``): inputs (T, B, C) — time
    first — returning ``-si_snr`` with a leading singleton: (1, B, C).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> x = jnp.asarray([[1.0, 0], [123, 45], [34, 5], [2312, 421]])
    >>> xhat = x[:, (1, 0)]
    >>> x = jnp.repeat(x[:, :, None], 2, axis=2)
    >>> xhat = jnp.repeat(xhat[:, None, :], 2, axis=1)
    >>> (-cal_si_snr(x, xhat))[0, 0, 0].round(4)
    Array(25.2142, dtype=float32)
    """
    source = jnp.asarray(source)
    estimate_source = jnp.asarray(estimate_source)
    eps = 1e-8
    s = source - source.mean(axis=0, keepdims=True)
    s_hat = estimate_source - estimate_source.mean(axis=0, keepdims=True)
    dot = (s_hat * s).sum(axis=0, keepdims=True)
    s_energy = (s ** 2).sum(axis=0, keepdims=True) + eps
    proj = dot * s / s_energy
    e_noise = s_hat - proj
    ratio = (proj ** 2).sum(axis=0) / ((e_noise ** 2).sum(axis=0) + eps)
    si_snr = 10 * jnp.log10(ratio + eps)
    return -si_snr[None]


def get_si_snr_with_pitwrapper(source, estimate_source):
    """PIT-wrapped negative SI-SNR loss; inputs (B, T, C), returns the
    per-example loss (B,) (reference ``nnet/losses.py:690``)."""
    pit = PitWrapper(cal_si_snr)
    loss, _perms = pit(source, estimate_source)
    return loss


# ---------------------------------------------------------------------------
# Angular-margin classifiers (speaker verification)
# ---------------------------------------------------------------------------

class AngularMargin:
    """outputs = cos(theta); margin-scaled logits (reference :890)."""

    def __init__(self, margin=0.0, scale=1.0):
        self.margin = margin
        self.scale = scale

    def __call__(self, outputs, targets):
        outputs = outputs - self.margin * targets
        return self.scale * outputs


class AdditiveAngularMargin(AngularMargin):
    """ArcFace-style additive angular margin (reference :940).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> aam = AdditiveAngularMargin(margin=0.2, scale=30)
    >>> logits = jnp.array([[0.5, -0.5]])
    >>> targets = jnp.array([[1.0, 0.0]])
    >>> aam(logits, targets).shape
    (1, 2)
    """

    def __init__(self, margin=0.0, scale=1.0, easy_margin=False):
        super().__init__(margin, scale)
        import math

        self.easy_margin = easy_margin
        self.cos_m = math.cos(margin)
        self.sin_m = math.sin(margin)
        self.th = math.cos(math.pi - margin)
        self.mm = math.sin(math.pi - margin) * margin

    def __call__(self, outputs, targets):
        cosine = jnp.asarray(outputs)
        targets = jnp.asarray(targets, cosine.dtype)
        sine = jnp.sqrt(jnp.clip(1.0 - cosine ** 2, 0.0, 1.0))
        phi = cosine * self.cos_m - sine * self.sin_m
        if self.easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            phi = jnp.where(cosine > self.th, phi, cosine - self.mm)
        outputs = targets * phi + (1.0 - targets) * cosine
        return self.scale * outputs


class LogSoftmaxWrapper:
    """Wraps a margin fn into an NLL classification loss on one-hot.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> wrapper = LogSoftmaxWrapper(AdditiveAngularMargin(0.2, 30))
    >>> logits = jnp.array([[[0.9, -0.9]]])
    >>> loss = wrapper(logits, jnp.array([[0]]))
    >>> bool(loss < 1.0)
    True
    """

    def __init__(self, loss_fn):
        self.loss_fn = loss_fn

    def __call__(self, outputs, targets, length=None):
        outputs = jnp.asarray(outputs)
        targets = jnp.asarray(targets, jnp.int32)
        if outputs.ndim == 3:
            outputs = outputs[:, 0, :]
        targets_flat = targets.reshape(-1)
        one_hot = jax.nn.one_hot(
            targets_flat, outputs.shape[-1], dtype=outputs.dtype
        )
        logits = self.loss_fn(outputs, one_hot)
        log_p = jax.nn.log_softmax(logits, axis=-1)
        return -(one_hot * log_p).sum(-1).mean()


def distance_diff_loss(predictions, targets, length=None, beta=0.25, reduction="mean"):
    """Exponential distance-difference loss (G2P homograph, ref :1067)."""
    predictions = jnp.asarray(predictions)
    targets = jnp.asarray(targets)
    diff = jnp.abs(predictions - targets)
    per = jnp.exp(beta * diff) - 1.0
    return compute_masked_loss(
        lambda p, t: per, predictions, targets, length, reduction=reduction
    )


def ctc_loss_kd(log_probs, targets, input_lens, blank_index, device=None):
    """CTC knowledge distillation: CTC against the teacher's greedy path
    (reference ``nnet/losses.py:1067``).

    Fixed-shape on-device collapse (jit-compatible): the teacher argmax
    path has repeats merged and blanks removed by stably compacting the
    kept frames to the front of a (B, T) target buffer; padding slots
    hold blank and are excluded through the relative target lengths.
    """
    t_preds = jnp.argmax(targets, axis=-1)
    B, T = t_preds.shape
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, t_preds.dtype), t_preds[:, :-1]], axis=1
    )
    # only frames within the actual input length produce teacher labels
    # (reference truncates to actual_size before collapsing)
    abs_in = jnp.round(jnp.asarray(input_lens) * T)
    in_range = jnp.arange(T)[None, :] < abs_in[:, None]
    keep = (t_preds != prev) & (t_preds != blank_index) & in_range
    # stable compaction: kept frames keep their index, dropped go last
    order = jnp.argsort(jnp.where(keep, jnp.arange(T)[None, :], T))
    tgt = jnp.take_along_axis(
        jnp.where(keep, t_preds, blank_index), order, axis=1
    )
    lens = keep.sum(axis=1)
    # empty paths degenerate to a single blank target (reference pads
    # empty collapses with [blank])
    lens = jnp.maximum(lens, 1)
    tgt_lens = lens.astype(jnp.float32) / T
    return ctc_loss(log_probs, tgt, input_lens, tgt_lens, blank_index)


def nll_loss_kd(probabilities, targets, rel_lab_lengths):
    """Sequence KD against teacher posteriors (reference :1143).

    Per frame: ``-(targets * probabilities).sum(-1)`` — the reference's
    ``ce_kd`` is a plain dot product of whatever is passed; the KD
    recipes pass the student's LOG-probabilities (making this the
    cross-entropy) and the teacher's probabilities.
    """
    probabilities = jnp.asarray(probabilities)
    targets = jnp.asarray(targets)
    B, T, _ = probabilities.shape
    abs_len = jnp.round(jnp.asarray(rel_lab_lengths) * T)
    mask = (
        jnp.arange(T)[None, :] < abs_len[:, None]
    ).astype(probabilities.dtype)
    per = -(targets * probabilities).sum(-1)
    return (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)


class ContrastiveLoss:
    """wav2vec 2.0 contrastive loss (InfoNCE over sampled negatives).

    Reference ``nnet/losses.py:1198``.
    """

    def __init__(self, logit_temp=0.1):
        self.logit_temp = logit_temp

    def __call__(self, encoded, quantized, negatives):
        """encoded/quantized: (B, T, C); negatives: (N, B, T, C)."""
        encoded = jnp.asarray(encoded)
        quantized = jnp.asarray(quantized)
        negatives = jnp.asarray(negatives)
        candidates = jnp.concatenate(
            [quantized[None], negatives], axis=0
        )  # (N+1, B, T, C)
        logits = (
            (encoded[None] * candidates).sum(-1)
            / (
                jnp.linalg.norm(encoded[None], axis=-1)
                * jnp.linalg.norm(candidates, axis=-1)
                + 1e-8
            )
        ) / self.logit_temp  # (N+1, B, T)
        # Positive is index 0.
        log_p = jax.nn.log_softmax(logits, axis=0)
        return -log_p[0].mean()


def truncate(predictions, targets, allowed_len_diff=3):
    """Trim predictions/targets to a common time length, raising if the
    difference exceeds ``allowed_len_diff`` (reference
    ``nnet/losses.py:597``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> p, t = truncate(jnp.ones((2, 10)), jnp.ones((2, 8)))
    >>> p.shape, t.shape
    ((2, 8), (2, 8))
    """
    len_diff = predictions.shape[1] - targets.shape[1]
    if len_diff == 0:
        return predictions, targets
    if abs(len_diff) > allowed_len_diff:
        raise ValueError(
            "Predictions and targets should be same length, but got "
            f"{predictions.shape[1]} and {targets.shape[1]} respectively."
        )
    if len_diff < 0:
        return predictions, targets[:, : predictions.shape[1]]
    return predictions[:, : targets.shape[1]], targets


def get_mask(source, source_lengths):
    """Binary mask over the leading (time) axis (reference
    ``nnet/losses.py:850``): source (T, B, C) or (T, E, B, C),
    lengths (B,) absolute → mask with a trailing singleton channel.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> get_mask(jnp.ones((4, 3, 2)), jnp.array([2, 1, 4]))[:, :, 0].T.tolist()
    [[1.0, 1.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]]
    """
    T = source.shape[0]
    B = source.shape[-2]
    t_range = jnp.arange(T)
    mask_tb = (t_range[:, None] < source_lengths[None, :B]).astype(
        source.dtype
    )  # (T, B)
    shape = [T] + [1] * (source.ndim - 3) + [B, 1]
    return mask_tb.reshape(T, B)[
        (slice(None),) + (None,) * (source.ndim - 3) + (slice(None), None)
    ] * jnp.ones(shape, source.dtype)


def cal_snr(source, estimate_source):
    """Negative per-(batch, source) SNR for binaural separation,
    PitWrapper-compatible layout (T, E, B, C) (reference
    ``nnet/losses.py:803``)."""
    EPS = 1e-8
    T = estimate_source.shape[0]
    B = estimate_source.shape[-2]
    source_lengths = jnp.full((B,), T)
    mask = get_mask(source, source_lengths)
    estimate_source = estimate_source * mask
    num_samples = source_lengths.reshape(1, -1, 1).astype(source.dtype)
    mean_target = jnp.sum(source, axis=0, keepdims=True) / num_samples
    mean_estimate = (
        jnp.sum(estimate_source, axis=0, keepdims=True) / num_samples
    )
    zero_mean_target = (source - mean_target) * mask
    zero_mean_estimate = (estimate_source - mean_estimate) * mask
    snr_beforelog = jnp.sum(zero_mean_target**2, axis=0) / (
        jnp.sum((zero_mean_estimate - zero_mean_target) ** 2, axis=0) + EPS
    )
    snr = 10 * jnp.log10(snr_beforelog + EPS)  # (E, B, C) or (B, C)
    return -snr[None]


def get_snr_with_pitwrapper(source, estimate_source):
    """SNR with permutation-invariant training over the source axis;
    inputs (B, T, E, C) (reference ``nnet/losses.py:718``)."""
    pit_snr = PitWrapper(cal_snr)
    loss, perms = pit_snr(source, estimate_source)
    return loss


def ce_kd(inp, target):
    """Distillation cross-entropy between student log-probs and teacher
    probs, flattened rows (reference ``nnet/losses.py:1130``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> float(ce_kd(jnp.log(jnp.array([[0.5, 0.5]])),
    ...             jnp.array([[1.0, 0.0]]))[0]) > 0
    True
    """
    return (-target * inp).sum(1)
