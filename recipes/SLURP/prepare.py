"""SLURP preparation: jsonl annotations -> JSON manifests for SLU.

TPU-native counterpart of the reference ``recipes/SLURP/prepare.py``
(direct SLU variant): each utterance maps audio to a serialized
semantics dict ``{'scenario': ..., 'action': ..., 'entities': [...]}``
parsed from the ``sentence_annotation`` bracket syntax.
"""

import json
import logging
import os

logger = logging.getLogger(__name__)


def parse_entities(sentence_annotation):
    """``[type : filler]`` spans -> list of entity dicts.

    Example
    -------
    >>> parse_entities("wake me at [time : five am]")
    [{'type': 'time', 'filler': 'five am'}]
    """
    entities = []
    for chunk in sentence_annotation.split("[")[1:]:
        body = chunk.split("]")[0]
        if ":" not in body:
            continue
        etype, filler = body.split(":", 1)
        entities.append(
            {"type": etype.strip(), "filler": filler.strip()}
        )
    return entities


def prepare_SLURP(
    data_folder, save_folder, slu_type="direct", train_splits=("train",),
    skip_prep=False,
):
    """Write train/devel/test JSON manifests from SLURP jsonl files."""
    if skip_prep:
        return
    os.makedirs(save_folder, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import read_audio

    jobs = [("train", list(train_splits)), ("devel", ["devel"]), ("test", ["test"])]
    for out_name, splits in jobs:
        out = os.path.join(save_folder, f"{out_name}.json")
        if os.path.exists(out):
            continue
        manifest = {}
        for split in splits:
            jsonl_path = os.path.join(data_folder, split + ".jsonl")
            if not os.path.isfile(jsonl_path):
                raise FileNotFoundError(f"Missing {jsonl_path}")
            with open(jsonl_path) as f:
                for line in f:
                    obj = json.loads(line)
                    semantics = str(
                        {
                            "scenario": obj["scenario"],
                            "action": obj["action"],
                            "entities": parse_entities(
                                obj.get("sentence_annotation", "")
                            ),
                        }
                    ).replace(",", "|")
                    audio_folder = (
                        "slurp_synth" if "synthetic" in split else "slurp_real"
                    )
                    for rec in obj["recordings"]:
                        path = os.path.join(
                            data_folder, audio_folder, rec["file"]
                        )
                        if not os.path.exists(path):
                            continue
                        utt_id = os.path.splitext(rec["file"])[0]
                        manifest[utt_id] = {
                            "wav": path,
                            "duration": round(
                                len(read_audio(path)) / 16000.0, 3
                            ),
                            "transcript": obj["sentence"],
                            "semantics": semantics,
                        }
        with open(out, "w") as f:
            json.dump(manifest, f, indent=2)
        logger.info(f"Prepared {out} ({len(manifest)} utterances)")
