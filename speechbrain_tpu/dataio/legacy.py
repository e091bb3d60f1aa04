"""Legacy SpeechBrain CSV format support.

Parity target: reference ``dataio/legacy.py:21`` (ExtendedCSVDataset):
CSVs with ``<name>, <name>_format, <name>_opts`` column triples; wav
entries are loaded, string entries optionally label-encoded.
"""

import csv

import numpy as np

from speechbrain_tpu.dataio.dataset import DynamicItemDataset

__all__ = ["ExtendedCSVDataset"]


class ExtendedCSVDataset(DynamicItemDataset):
    """Dataset over the legacy extended-CSV annotation format.

    Example CSV:
        ID, duration, wav, wav_format, wav_opts
        ex1, 1.0, /path/a.wav, wav,
    """

    def __init__(
        self,
        csvpath,
        replacements={},
        sorting="original",
        min_duration=0,
        max_duration=36000,
        dynamic_items=[],
        output_keys=[],
    ):
        data = load_sb_extended_csv(csvpath, replacements)
        super().__init__(data, dynamic_items, output_keys)
        from speechbrain_tpu.dataio.dataio import read_audio

        # Auto-register audio loading for wav-format entries.
        first = data[next(iter(data))]
        for key, fmt in list(first.get("_formats", {}).items()):
            if fmt == "wav":
                self.add_dynamic_item(
                    read_audio, takes=key, provides=f"{key}_sig"
                )
        if sorting in ("ascending", "descending"):
            reverse = sorting == "descending"
            if not output_keys:
                self.set_output_keys(["id"])
            filtered = self._filtered_sorted_ids(
                key_min_value={"duration": min_duration},
                key_max_value={"duration": max_duration},
                sort_key="duration",
                reverse=reverse,
            )
            self.data_ids = filtered


def load_sb_extended_csv(csv_path, replacements={}):
    """Parse the extended CSV into a dict-of-dicts manifest."""
    with open(csv_path, newline="") as f:
        result = {}
        reader = csv.DictReader(f, skipinitialspace=True)
        for row in reader:
            data_id = row.pop("ID")
            parsed = {"_formats": {}}
            keys = [
                k
                for k in row
                if not k.endswith("_format") and not k.endswith("_opts")
            ]
            for key in keys:
                value = row[key]
                for rk, rv in replacements.items():
                    value = value.replace(f"${rk}", rv)
                fmt = row.get(f"{key}_format", "").strip()
                if key == "duration":
                    parsed[key] = float(value)
                else:
                    parsed[key] = value
                if fmt:
                    parsed["_formats"][key] = fmt
            result[data_id] = parsed
    return result


def read_pkl(file, data_options={}, start=None, stop=None):
    """Load a pickled list/array with optional slicing (reference
    ``dataio/legacy.py`` read_pkl)."""
    from speechbrain_tpu.dataio.dataio import load_pkl

    data = load_pkl(str(file))
    if isinstance(data, list):
        data = np.asarray(data)
    if start is not None or stop is not None:
        data = data[start:stop]
    return data
