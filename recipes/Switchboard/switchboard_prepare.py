"""Switchboard-1 (LDC97S62) + eval2000/Hub5 data preparation.

Builds JSON manifests from the ms98 transcriptions, mirroring the
reference ``recipes/Switchboard/switchboard_prepare.py`` (which follows
Kaldi's swbd1_data_prep.sh):

- audio: 2-channel 8 kHz NIST SPHERE conversations ``sw0XXXX.sph``;
  each transcript line ``sw2001A-ms98-a-0001 <start> <end> <text>``
  names the conversation, channel (A/B) and segment times.
- text: Kaldi-style swbd1 normalization (silence stripped,
  noise/vocalized-noise collapsed to [noise], laughter markers,
  ``[laughter-word]`` -> word, alternates ``word_1`` -> word, partial
  words kept with their dash).
- splits: the last ``dev_conversations`` conversations form the dev
  set; eval2000 (LDC2002S09) segments come from its ``.stm`` file.

Manifest rows: ``{id: {wav: {file, start, stop}, channel, duration,
words, spk_id}}`` — ``start``/``stop`` are sample offsets consumed by
``read_audio``'s segment mode.
"""

import glob
import json
import logging
import os
import re

logger = logging.getLogger(__name__)
SAMPLERATE = 8000


def prepare_switchboard(
    data_folder,
    save_folder,
    splits=("train", "dev"),
    dev_conversations=20,
    skip_prep=False,
):
    """Create train/dev (+ eval2000 if present) JSON manifests."""
    if skip_prep:
        return
    os.makedirs(save_folder, exist_ok=True)
    train_out = os.path.join(save_folder, "train.json")
    dev_out = os.path.join(save_folder, "dev.json")
    if os.path.exists(train_out) and os.path.exists(dev_out):
        logger.info("Skipping preparation, completed in previous run.")
        return

    sph_index = _index_sph_files(data_folder)
    trans_files = sorted(
        glob.glob(
            os.path.join(
                data_folder, "**", "sw*-ms98-a-trans.text"
            ),
            recursive=True,
        )
    )
    if not trans_files:
        raise FileNotFoundError(
            f"No ms98 transcription files under {data_folder}"
        )
    # Group by conversation so the dev split is conversation-disjoint.
    conversations = {}
    for tf in trans_files:
        conv = os.path.basename(tf)[:6]  # sw2001 (with channel sw2001A)
        conversations.setdefault(conv[:6], []).append(tf)
    conv_ids = sorted(conversations)
    dev_ids = set(conv_ids[-dev_conversations:])
    rows = {"train": {}, "dev": {}}
    for conv, files in conversations.items():
        target = "dev" if conv in dev_ids else "train"
        for tf in files:
            rows[target].update(_parse_trans_file(tf, sph_index))
    for split, out in (("train", train_out), ("dev", dev_out)):
        with open(out, "w", encoding="utf-8") as f:
            json.dump(rows[split], f, indent=2)
        logger.info("%s: %d utterances", out, len(rows[split]))

    eval2000_data_prep(data_folder, save_folder)


def _index_sph_files(data_folder):
    """Map conversation id (sw2001) -> sph path (sw02001.sph etc.)."""
    index = {}
    for path in glob.glob(
        os.path.join(data_folder, "**", "*.sph"), recursive=True
    ):
        base = os.path.splitext(os.path.basename(path))[0].lower()
        m = re.match(r"sw_?0?(\d{4})", base)
        if m:
            index["sw" + m.group(1)] = path
    return index


def _parse_trans_file(trans_file, sph_index):
    """One channel's transcript file -> manifest rows."""
    rows = {}
    with open(trans_file, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) < 4:
                continue
            utt_id, start_s, end_s = parts[0], parts[1], parts[2]
            text = filter_text(" ".join(parts[3:]))
            if not text:
                continue
            conv = utt_id.split("-")[0][:6].lower()  # sw2001
            channel = utt_id.split("-")[0][6]  # A / B
            sph = sph_index.get(conv)
            if sph is None:
                continue
            start = int(float(start_s) * SAMPLERATE)
            stop = int(float(end_s) * SAMPLERATE)
            rows[utt_id] = {
                "wav": {"file": sph, "start": start, "stop": stop},
                "channel": 0 if channel.upper() == "A" else 1,
                "duration": round(float(end_s) - float(start_s), 3),
                "words": text,
                "spk_id": conv + channel.upper(),
            }
    return rows


def filter_text(text, dataset="train"):
    """Kaldi-style swbd1/eval2000 transcription normalization
    (reference ``switchboard_prepare.py:270-473`` condensed)."""
    text = text.upper()
    if dataset in ("eval2000", "hub5", "test"):
        # eval2000 stm conventions: ignore excluded segments.
        if "IGNORE_TIME_SEGMENT_" in text:
            return ""
        text = text.replace("(%HESITATION)", "")
        text = re.sub(r"\(\%?\w+\)", "", text)
    text = text.replace("[SILENCE]", "")
    text = re.sub(r"\[VOCALIZED-NOISE\]|\[NOISE\]", "[NOISE]", text)
    # [LAUGHTER-WORD] -> WORD; bare [LAUGHTER] kept as a token.
    text = re.sub(r"\[LAUGHTER-([^\]]+)\]", r"\1", text)
    # Pronunciation variants like THEM_1 -> THEM.
    text = re.sub(r"(\w+)_\d+", r"\1", text)
    # Partial words: W[ORD]- -> W-, -[WO]RD -> -RD (Kaldi convention).
    text = re.sub(r"(\w+)\[[^\]]+\]-", r"\1-", text)
    text = re.sub(r"-\[[^\]]+\](\w+)", r"-\1", text)
    # Anything else in brackets/braces is non-speech.
    text = re.sub(r"\{[^}]*\}", "", text)
    text = re.sub(r"<[^>]*>", "", text)
    text = re.sub(r"\s+", " ", text).strip()
    if text in ("[NOISE]", "[LAUGHTER]", ""):
        return ""
    return text


def eval2000_data_prep(data_folder, save_folder):
    """Parse the eval2000/Hub5 stm into a test manifest (if present)."""
    out = os.path.join(save_folder, "eval2000.json")
    if os.path.exists(out):
        return
    stm_files = glob.glob(
        os.path.join(data_folder, "**", "*.stm"), recursive=True
    )
    if not stm_files:
        logger.info("No eval2000 stm found; skipping test manifest.")
        return
    sph_index = {}
    for path in glob.glob(
        os.path.join(data_folder, "**", "*.sph"), recursive=True
    ):
        base = os.path.splitext(os.path.basename(path))[0].lower()
        sph_index[base] = path
    rows = {}
    with open(stm_files[0], encoding="utf-8") as f:
        for i, line in enumerate(f):
            if line.startswith(";;"):
                continue
            parts = line.split(None, 6)
            if len(parts) < 7:
                continue
            fname, channel, spk, start_s, end_s, _flags, text = parts
            text = filter_text(text, dataset="eval2000")
            if not text:
                continue
            sph = sph_index.get(fname.lower())
            if sph is None:
                continue
            rows[f"{fname}_{i}"] = {
                "wav": {
                    "file": sph,
                    "start": int(float(start_s) * SAMPLERATE),
                    "stop": int(float(end_s) * SAMPLERATE),
                },
                "channel": 0 if channel.upper() in ("A", "1") else 1,
                "duration": round(float(end_s) - float(start_s), 3),
                "words": text,
                "spk_id": spk,
            }
    with open(out, "w", encoding="utf-8") as f:
        json.dump(rows, f, indent=2)
    logger.info("%s: %d utterances", out, len(rows))
