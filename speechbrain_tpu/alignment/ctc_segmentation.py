"""CTC segmentation: align long transcripts to audio via CTC posteriors.

Parity target: reference ``alignment/ctc_segmentation.py:136``, which
wraps the external ``ctc_segmentation`` package.  This native version
implements the core algorithm (Kürzinger et al. 2020): a forward DP over
CTC log-posteriors where the text may START at any frame (transition
cost 0 from the "unstarted" state), yielding per-segment timings and
confidence scores.
"""

from types import SimpleNamespace

import numpy as np

__all__ = [
    "CTCSegmentation",
    "CTCSegmentationTask",
    "ctc_segmentation_align",
]

NEG_INF = -1e20


def ctc_segmentation_align(
    log_probs, tokens, blank_index=0, frame_duration=0.02
):
    """Align token sequence to frames; returns per-token (start, end,
    confidence) in seconds.

    log_probs: (T, V) CTC log-posteriors; tokens: list[int].
    """
    T, V = log_probs.shape
    U = len(tokens)
    S = 2 * U + 1  # blank-interleaved states
    states = np.full(S, blank_index, dtype=np.int64)
    states[1::2] = tokens
    alpha = np.full((T, S), NEG_INF)
    back = np.zeros((T, S), dtype=np.int8)
    # text may start at any frame: state 0/1 reachable at every t with
    # cost of staying "unstarted" = 0 (handled by max with 0-entry)
    alpha[0, 0] = log_probs[0, states[0]]
    alpha[0, 1] = log_probs[0, states[1]] if S > 1 else NEG_INF
    for t in range(1, T):
        for s in range(S):
            cands = [alpha[t - 1, s]]
            if s >= 1:
                cands.append(alpha[t - 1, s - 1])
            if (
                s >= 2
                and states[s] != blank_index
                and states[s] != states[s - 2]
            ):
                cands.append(alpha[t - 1, s - 2])
            best = int(np.argmax(cands))
            val = cands[best]
            # allow late start for the first states
            if s <= 1:
                val = max(val, 0.0 if t < T else val)
                if 0.0 >= max(cands):
                    best = 0
            alpha[t, s] = val + log_probs[t, states[s]]
            back[t, s] = best
    # Backtrace from the better of the last two states
    s = S - 1 if alpha[T - 1, S - 1] >= alpha[T - 1, S - 2] else S - 2
    path = np.zeros(T, dtype=np.int64)
    for t in range(T - 1, -1, -1):
        path[t] = s
        if t > 0:
            s = s - back[t, s]
    # Extract per-token segments
    segments = []
    for u in range(U):
        state_id = 2 * u + 1
        frames = np.where(path == state_id)[0]
        if len(frames) == 0:
            segments.append((0.0, 0.0, NEG_INF))
            continue
        start, end = frames[0], frames[-1] + 1
        conf = float(
            np.mean(log_probs[frames, tokens[u]])
        )
        segments.append(
            (start * frame_duration, end * frame_duration, conf)
        )
    return segments


class CTCSegmentationTask(SimpleNamespace):
    """Container for CTC segmentation results (reference
    ``alignment/ctc_segmentation.py:41``); ``str(task)`` renders a
    kaldi-style ``segments`` file.

    Example
    -------
    >>> task = CTCSegmentationTask()
    >>> task.set(segments=[(0.0, 1.5, 0.97)], text=["hello"],
    ...          name="rec1")
    >>> print(str(task), end="")
    rec1_0000 rec1 0.00 1.50 0.9700 hello
    """

    text = None
    ground_truth_mat = None
    utt_begin_indices = None
    timings = None
    char_probs = None
    state_list = None
    segments = None
    config = None
    done = False
    name = "utt"
    utt_ids = None
    lpz = None
    print_confidence_score = True
    print_utterance_text = True

    def set(self, **kwargs):
        """Update object attributes."""
        self.__dict__.update(kwargs)

    def __str__(self):
        """Kaldi-style ``segments`` file rendering."""
        output = ""
        num_utts = len(self.segments)
        if self.utt_ids is None:
            utt_names = [f"{self.name}_{i:04}" for i in range(num_utts)]
        else:
            assert num_utts == len(self.utt_ids)
            utt_names = self.utt_ids
        for i, boundary in enumerate(self.segments):
            utt_entry = f"{utt_names[i]} {self.name} "
            utt_entry += f"{boundary[0]:.2f} {boundary[1]:.2f}"
            if self.print_confidence_score:
                utt_entry += f" {boundary[2]:3.4f}"
            if self.print_utterance_text:
                utt_entry += f" {self.text[i]}"
            output += utt_entry + "\n"
        return output


class CTCSegmentation:
    """Text-to-audio alignment over a CTC ASR interface.

    Arguments
    ---------
    asr_model : object with ``encode_batch`` producing CTC log-probs
        (an ``EncoderASR`` instance) OR a callable wav -> (T, V) lps.
    kaldi_style_text : bool
        If True, each text line starts with an utterance id.
    """

    def __init__(
        self,
        asr_model=None,
        kaldi_style_text=False,
        time_stamps="auto",
        blank_index=0,
        frame_duration=0.02,
        tokenizer=None,
    ):
        self.asr_model = asr_model
        self.kaldi_style_text = kaldi_style_text
        self.blank_index = blank_index
        self.frame_duration = frame_duration
        self.tokenizer = tokenizer

    def get_log_probs(self, wav):
        """CTC log-probabilities for the given audio."""
        import jax.numpy as jnp

        if callable(self.asr_model) and not hasattr(
            self.asr_model, "encode_batch"
        ):
            return np.asarray(self.asr_model(wav))
        lp = self.asr_model.encode_batch(
            jnp.asarray(wav)[None], jnp.ones(1)
        )
        return np.asarray(lp)[0]

    def __call__(self, wav, text, name="utt"):
        """Align ``text`` (list of utterance strings) to ``wav``.

        Returns a :class:`CTCSegmentationTask`; ``task.segments`` holds
        (start, end, confidence) triples and ``task.segments_dicts``
        the older dict form.
        """
        log_probs = self.get_log_probs(wav)
        segments_out = []
        # Tokenize each utterance and concatenate with separators.
        utt_tokens = []
        for utt in text:
            if self.kaldi_style_text:
                utt = utt.split(" ", 1)[1]
            if self.tokenizer is not None:
                toks = self.tokenizer.sp.encode_as_ids(utt)
            else:
                toks = [ord(c) % log_probs.shape[1] for c in utt]
            utt_tokens.append(toks)
        flat = [t for toks in utt_tokens for t in toks]
        aligned = ctc_segmentation_align(
            log_probs, flat, self.blank_index, self.frame_duration
        )
        pos = 0
        for utt, toks in zip(text, utt_tokens):
            segs = aligned[pos : pos + len(toks)]
            pos += len(toks)
            if segs:
                segments_out.append(
                    {
                        "start": segs[0][0],
                        "end": segs[-1][1],
                        "conf": float(
                            np.mean([s[2] for s in segs])
                        ),
                        "text": utt,
                    }
                )
        task = CTCSegmentationTask()
        task.set(
            segments=[
                (d["start"], d["end"], d["conf"]) for d in segments_out
            ],
            segments_dicts=segments_out,
            text=[d["text"] for d in segments_out],
            name=name,
            done=True,
        )
        return task
