"""Generate a tiny synthetic speaker-id corpus (tones) + manifests."""

import json
import os

import numpy as np

SR = 16000
FREQS = [220.0, 880.0, 3520.0]


def prepare_mini_data(data_folder="./data", n_per_class=10, seed=0):
    """Generate the synthetic mini speaker dataset + manifests."""
    from speechbrain_tpu.dataio.dataio import write_audio

    os.makedirs(data_folder, exist_ok=True)
    rng = np.random.default_rng(seed)
    manifests = {"train": {}, "valid": {}}
    for c, freq in enumerate(FREQS):
        for i in range(n_per_class):
            t = np.arange(int(0.5 * SR)) / SR
            wav = 0.5 * np.sin(
                2 * np.pi * freq * t + rng.uniform(0, np.pi)
            )
            wav += 0.01 * rng.normal(size=len(t))
            path = os.path.join(data_folder, f"c{c}_i{i}.wav")
            write_audio(path, wav.astype(np.float32), SR)
            split = "valid" if i >= n_per_class - 2 else "train"
            manifests[split][f"c{c}_i{i}"] = {
                "wav": path,
                "spk_id": c,
                "duration": 0.5,
            }
    for split, data in manifests.items():
        with open(os.path.join(data_folder, f"{split}.json"), "w") as f:
            json.dump(data, f, indent=2)


if __name__ == "__main__":
    prepare_mini_data()
