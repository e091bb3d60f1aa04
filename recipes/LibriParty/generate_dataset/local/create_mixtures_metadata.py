"""Metadata generation for synthetic multi-party (LibriParty) sessions.

Role counterpart of the reference
``recipes/LibriParty/generate_dataset/local/create_mixtures_metadata.py``:
for each session, speakers' utterances are laid on a timeline with
exponential inter-utterance gaps (the EEND interval technique),
assigned a random RIR and a clipped-normal level; impulsive noises are
scheduled the same way; a background (file or gaussian) closes the
session.  The emitted JSON schema matches the reference exactly, so
mixtures can be synthesized from official LibriParty metadata too.
"""

import json
import os
from pathlib import Path

import numpy as np

from speechbrain_tpu.dataio.dataio import _load_audio_any


def _file_info(path, configs):
    """(n_frames, n_channels, chosen channel) without keeping audio."""
    audio, sr = _load_audio_any(path)
    assert sr == configs["samplerate"], (
        f"file samplerate {sr} != configured {configs['samplerate']}"
    )
    if audio.ndim > 1 and audio.shape[1] > 1:
        channel = int(np.random.randint(0, audio.shape[1] - 1))
    else:
        channel = 0
    return len(audio), channel


def create_metadata(
    output_filename,
    n_sessions,
    configs,
    utterances_dict,
    words_dict,
    rir_list,
    impulsive_noises_list=None,
    background_noises_list=None,
):
    """Write ``<output_filename>.json`` describing ``n_sessions``."""
    dataset_metadata = {}
    for n_sess in range(n_sessions):
        c_speakers = np.random.choice(
            list(utterances_dict.keys()),
            configs["n_speakers"],
            replace=False,
        )
        activity = {spk: [] for spk in c_speakers}
        tot_length = 0.0
        min_spk_lvl = np.inf
        for spk in c_speakers:
            spk_utts = list(utterances_dict[spk])
            np.random.shuffle(spk_utts)
            intervals = np.random.exponential(
                configs["interval_factor_speech"], len(spk_utts)
            )
            cursor = 0.0
            for j, wait in enumerate(intervals):
                n_frames, channel = _file_info(spk_utts[j], configs)
                c_rir = str(np.random.choice(rir_list, 1)[0])
                _, rir_channel = _file_info(c_rir, configs)
                length = n_frames / configs["samplerate"]
                utt_id = Path(spk_utts[j]).stem
                cursor += wait
                if cursor + length > configs["max_length"]:
                    break
                lvl = float(
                    np.clip(
                        np.random.normal(
                            configs["speech_lvl_mean"],
                            configs["speech_lvl_var"],
                        ),
                        configs["speech_lvl_min"],
                        configs["speech_lvl_max"],
                    )
                )
                min_spk_lvl = min(lvl, min_spk_lvl)
                activity[spk].append(
                    {
                        "start": cursor,
                        "stop": cursor + length,
                        "words": words_dict[utt_id],
                        "rir": str(
                            Path(c_rir).relative_to(
                                configs["rirs_noises_root"]
                            )
                        ),
                        "utt_id": utt_id,
                        "file": str(
                            Path(spk_utts[j]).relative_to(
                                configs["librispeech_root"]
                            )
                        ),
                        "lvl": lvl,
                        "channel": channel,
                        "rir_channel": rir_channel,
                    }
                )
                tot_length = max(cursor + length, tot_length)
                cursor += length

        if impulsive_noises_list:
            activity["noises"] = []
            intervals = np.random.exponential(
                configs["interval_factor_noises"],
                len(impulsive_noises_list),
            )
            cursor = 0.0
            for wait in intervals:
                c_noise = str(
                    np.random.choice(impulsive_noises_list, 1)[0]
                )
                n_frames, channel = _file_info(c_noise, configs)
                c_rir = str(np.random.choice(rir_list, 1)[0])
                _, rir_channel = _file_info(c_rir, configs)
                length = n_frames / configs["samplerate"]
                cursor += wait
                if cursor + length > configs["max_length"]:
                    break
                lvl = float(
                    np.clip(
                        np.random.normal(
                            configs["imp_lvl_mean"],
                            configs["imp_lvl_var"],
                        ),
                        configs["imp_lvl_min"],
                        min(
                            min_spk_lvl + configs["imp_lvl_rel_max"], 0
                        ),
                    )
                )
                activity["noises"].append(
                    {
                        "start": cursor,
                        "stop": cursor + length,
                        "rir": str(
                            Path(c_rir).relative_to(
                                configs["rirs_noises_root"]
                            )
                        ),
                        "file": str(
                            Path(c_noise).relative_to(
                                configs["rirs_noises_root"]
                            )
                        ),
                        "lvl": lvl,
                        "channel": channel,
                        "rir_channel": rir_channel,
                    }
                )
                tot_length = max(tot_length, cursor + length)
                cursor += length
        else:
            activity["noises"] = []

        lvl_hi = min(
            min_spk_lvl + configs["background_lvl_rel_max"], 0
        )
        lvl = int(
            np.random.randint(configs["background_lvl_min"], lvl_hi)
        )
        if background_noises_list:
            background = str(
                np.random.choice(background_noises_list, 1)[0]
            )
            n_frames, channel = _file_info(background, configs)
            need = int(configs["max_length"] * configs["samplerate"])
            assert n_frames >= need, (
                "background noise files should be >= max_length"
            )
            offset = 0
            if n_frames > need:
                offset = int(np.random.randint(0, n_frames - need))
            activity["background"] = {
                "start": 0,
                "stop": tot_length,
                "file": str(
                    Path(background).relative_to(
                        configs["backgrounds_root"]
                    )
                ),
                "lvl": lvl,
                "orig_start": offset,
                "orig_stop": offset
                + int(tot_length * configs["samplerate"]),
                "channel": channel,
            }
        else:
            activity["background"] = {
                "start": 0,
                "stop": tot_length,
                "file": None,
                "lvl": lvl,
                "orig_start": None,
                "orig_stop": None,
                "channel": None,
            }
        dataset_metadata[f"session_{n_sess}"] = activity

    os.makedirs(configs["out_folder"], exist_ok=True)
    with open(
        os.path.join(configs["out_folder"], output_filename + ".json"),
        "w",
    ) as f:
        json.dump(dataset_metadata, f, indent=4)
