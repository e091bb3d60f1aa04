"""KsponSpeech (Korean conversational speech) data preparation.

Builds one JSON manifest per split for the AI-Hub KsponSpeech corpus.
Mirrors the fork-specific reference
``recipes/KsponSpeech/ksponspeech_prepare.py``: splits are
train / dev (KsponSpeech_05 subdirs 0621-0623) / eval_clean /
eval_other; transcriptions come from ``<split>.trn`` files
(``<path> :: <raw text>``) and are normalized with the KsponSpeech
rules (orthographic side of ``(A)/(B)`` pairs, filler/noise markers
and punctuation removed).

Manifest rows: ``{id: {wav, duration, spk_id, wrd}}``.
Audio must first be converted from raw .pcm with ``convert_to_wav.py``.
"""

import json
import logging
import os
import re

logger = logging.getLogger(__name__)
SAMPLERATE = 16000


def prepare_ksponspeech(
    data_folder,
    save_folder,
    tr_splits=[],
    dev_splits=[],
    te_splits=[],
    select_n_sentences=None,
    merge_lst=[],
    merge_name=None,
    skip_prep=False,
):
    """Create JSON manifests for the requested KsponSpeech splits.

    Arguments
    ---------
    data_folder : str
        Root of the corpus (contains ``train/``, ``test/``, ``*.trn``).
    save_folder : str
        Where the JSON manifests are written.
    tr_splits / dev_splits / te_splits : list
        Splits from ['train', 'dev', 'eval_clean', 'eval_other'].
    select_n_sentences : list or None
        Optional per-split sentence cap.
    merge_lst : list
        Splits to merge into one manifest.
    merge_name : str
        Filename of the merged manifest.
    skip_prep : bool
        If True, do nothing.
    """
    if skip_prep:
        return
    splits = tr_splits + dev_splits + te_splits
    os.makedirs(save_folder, exist_ok=True)
    if all(
        os.path.exists(os.path.join(save_folder, s + ".json"))
        for s in splits
    ):
        logger.info("Skipping preparation, completed in previous run.")
        return

    for split_index, split in enumerate(splits):
        trn = "train.trn" if split in ("train", "dev") else split + ".trn"
        text_dict = text_to_dict(os.path.join(data_folder, trn))
        wav_lst = []
        for d in split2dirs(split):
            droot = os.path.join(data_folder, d)
            for dirpath, _, files in os.walk(droot):
                wav_lst += [
                    os.path.join(dirpath, f)
                    for f in files
                    if f.endswith(".wav")
                ]
        wav_lst.sort()
        n = len(wav_lst)
        if select_n_sentences is not None:
            n = select_n_sentences[split_index]
        create_json(save_folder, wav_lst, text_dict, split, n)

    if merge_lst and merge_name is not None:
        merged = {}
        for split in merge_lst:
            with open(
                os.path.join(save_folder, split + ".json"),
                encoding="utf-8",
            ) as f:
                merged.update(json.load(f))
        with open(
            os.path.join(save_folder, merge_name), "w", encoding="utf-8"
        ) as f:
            json.dump(merged, f, indent=2, ensure_ascii=False)


def create_json(save_folder, wav_lst, text_dict, split, n_sentences):
    """Write one split's manifest."""
    import wave

    path = os.path.join(save_folder, split + ".json")
    rows = {}
    for wav_file in wav_lst[:n_sentences]:
        snt_id = os.path.basename(wav_file).replace(".wav", "")
        if snt_id not in text_dict:
            continue
        with wave.open(wav_file, "rb") as w:
            duration = w.getnframes() / w.getframerate()
        rows[snt_id] = {
            "wav": wav_file,
            "duration": round(duration, 3),
            "spk_id": snt_id.split("_")[-1],
            "wrd": " ".join(text_dict[snt_id].split()),
        }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(rows, f, indent=2, ensure_ascii=False)
    logger.info("%s successfully created (%d rows)!", path, len(rows))


def text_to_dict(trnpath):
    """Parse a ``.trn`` index into {utt_id: normalized text}."""
    text_dict = {}
    with open(trnpath, encoding="utf-8") as f:
        for line in f:
            if " :: " not in line:
                continue
            filename, raw = line.split(" :: ", 1)
            file_id = (
                os.path.basename(filename.strip())
                .replace(".pcm", "")
                .replace(".wav", "")
            )
            text_dict[file_id] = normalize(raw)
    return text_dict


def normalize(string):
    """KsponSpeech text normalization.

    Keeps the orthographic side of ``(orth)/(phon)`` pairs, removes the
    ``n/ b/ o/ l/ u/`` non-speech markers, strips ``+ * / . ? ! ,`` and
    collapses whitespace (reference
    ``recipes/KsponSpeech/ksponspeech_prepare.py:280-311``).
    """
    string = re.sub(r"\(([^)]*)\)\/\(([^)]*)\)", r"\1", string)
    string = re.sub(r"n/|b/|o/|l/|u/", "", string)
    string = re.sub(r"[+*/.?!,]", "", string)
    string = re.sub(r"\s+", " ", string)
    return string.strip()


def split2dirs(split):
    """Corpus directories holding a split's audio."""
    if split not in ("eval_other", "eval_clean", "train", "dev"):
        raise ValueError("Unsupported data split")
    if "eval" in split:
        return ["test/" + split]
    if split == "dev":
        return [
            "train/KsponSpeech_05/KsponSpeech_{0:>04d}".format(n)
            for n in range(621, 624)
        ]
    dirs = []
    for part, lo, hi in (
        (1, 1, 125), (2, 125, 249), (3, 249, 373),
        (4, 373, 497), (5, 497, 621),
    ):
        dirs += [
            "train/KsponSpeech_{0:>02d}/KsponSpeech_{1:>04d}".format(
                part, n
            )
            for n in range(lo, hi)
        ]
    return dirs
