"""Generate a tiny synthetic enhancement corpus (clean + noisy pairs)."""

import json
import os

import numpy as np

SR = 16000


def prepare_mini_data(data_folder="./data", n_utts=24, seed=0):
    """Write clean tone 'speech' and noisy mixtures + manifests."""
    from speechbrain_tpu.dataio.dataio import write_audio

    os.makedirs(data_folder, exist_ok=True)
    rng = np.random.default_rng(seed)
    manifests = {"train": {}, "valid": {}, "test": {}}
    for i in range(n_utts):
        t = np.arange(int(1.0 * SR)) / SR
        freq = rng.uniform(200, 600)
        clean = 0.4 * np.sin(2 * np.pi * freq * t)
        clean *= np.hanning(len(t))  # utterance envelope
        noise = 0.12 * rng.normal(size=len(t))
        noisy = clean + noise
        clean_path = os.path.join(data_folder, f"clean_{i}.wav")
        noisy_path = os.path.join(data_folder, f"noisy_{i}.wav")
        write_audio(clean_path, clean.astype(np.float32), SR)
        write_audio(noisy_path, noisy.astype(np.float32), SR)
        split = (
            "test" if i >= n_utts - 4
            else "valid" if i >= n_utts - 8
            else "train"
        )
        manifests[split][f"utt_{i}"] = {
            "clean_wav": clean_path,
            "noisy_wav": noisy_path,
            "duration": 1.0,
        }
    for split, data in manifests.items():
        with open(os.path.join(data_folder, f"{split}.json"), "w") as f:
            json.dump(data, f, indent=2)


if __name__ == "__main__":
    prepare_mini_data()
