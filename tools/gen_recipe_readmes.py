#!/usr/bin/env python3
"""Generate per-corpus README.md files for recipes/ from the registry.

Mirrors the reference's per-corpus recipe READMEs (run commands +
result tables).  Re-runnable: READMEs are overwritten from
tests/recipes.csv plus the hand-written corpus notes below.
"""

import csv
import os
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# corpus -> (one-line description, data notes, published reference results)
NOTES = {
    "AISHELL-1": (
        "Mandarin read speech (170 h), char-level ASR.",
        "Expects the standard `data_aishell/wav/{train,dev,test}` layout "
        "plus `transcript/aishell_transcript_v0.8.txt`.",
        "Reference: conformer CER ~5.6 dev / ~6.0 test "
        "(recipes/AISHELL-1/ASR/transformer).",
    ),
    "AMI": (
        "Meeting-room recordings; speaker diarization.",
        "Expects AMI headset mixes + manual annotations (RTTM derived).",
        "Reference: ECAPA embeddings + spectral clustering, DER-scored "
        "with the native md-eval-compatible scorer.",
    ),
    "Aishell1Mix": (
        "Mandarin overlapped-speech mixtures (LibriMix protocol).",
        "Expects `wav8k/min` style mixture folders "
        "(mix_clean/s1/s2) as produced by the Aishell1Mix scripts.",
        "Reference: SepFormer SI-SNRi on the matched protocol.",
    ),
    "BinauralWSJ0Mix": (
        "Binaural (stereo) WSJ0-2mix variant; multi-channel separation.",
        "Expects `2speakers/wav8k/min/{tr,cv,tt}` with stereo wavs.",
        "Reference: stereo SepFormer variants.",
    ),
    "CommonLanguage": (
        "45-language spoken language identification.",
        "Expects the CommonLanguage folder layout "
        "(`common_voice_kpd/<lang>/...`).",
        "Reference: ECAPA-TDNN accuracy ~84.9%.",
    ),
    "CommonVoice": (
        "Crowd-sourced multilingual ASR (Mozilla Common Voice).",
        "Expects a language folder with `validated.tsv` + `clips/` "
        "(mp3 decode needs ffmpeg; wav/flac work natively).",
        "Reference: wav2vec2+CTC WER 15.69 (En), 9.96 (Fr) — top-level "
        "README performance table.",
    ),
    "DVoice": (
        "Low-resource African-language ASR (Darija, Swahili, ...).",
        "Expects `<lang>/{train,dev,test}.csv` + wav folders.",
        "Reference: wav2vec2+CTC per-language WERs in the DVoice README.",
    ),
    "Fisher-Callhome-Spanish": (
        "Spanish->English conversational speech translation.",
        "Expects LDC Fisher/Callhome Spanish audio + the standard "
        "4-reference translation sets.",
        "Reference: transformer ST BLEU ~47 dev2 (multi-task ASR+ST).",
    ),
    "Google-speech-commands": (
        "Keyword spotting (12/35 commands).",
        "Expects the v0.02 tarball layout (one folder per word, "
        "`_background_noise_/`).",
        "Reference: xvector+augment accuracy 98.14% (v12) / 97.43% (v35) "
        "— BASELINE.md baseline config.",
    ),
    "IEMOCAP": (
        "Acted emotional dyadic speech; 4-class emotion recognition.",
        "Expects IEMOCAP_full_release sessions; prepare builds "
        "speaker-independent folds.",
        "Reference: ECAPA/wav2vec2 ~63-65% accuracy leave-one-session-out.",
    ),
    "IWSLT22_lowresource": (
        "Tamasheq->French low-resource speech translation.",
        "Expects the IWSLT22 Tamasheq release (17 h split).",
        "Reference: wav2vec feats + transformer decoder BLEU ~5-8.",
    ),
    "KsponSpeech": (
        "Korean conversational ASR (965 h) — fork-signature corpus.",
        "Expects KsponSpeech_0x folders + trn transcripts "
        "(prepare handles the eucKR/cp949 text normalization).",
        "Fork baseline: conformer CER ~7-8% eval-clean.",
    ),
    "LJSpeech": (
        "Single-speaker English TTS corpus.",
        "Expects `metadata.csv` + `wavs/` (22.05 kHz downsampled to "
        "config rate).",
        "Reference: Tacotron2 + HiFiGAN vocoder pipeline.",
    ),
    "LibriMix": (
        "LibriSpeech-derived overlapped mixtures (2/3 spk).",
        "Expects `Libri2Mix/wav8k/min` style folders.",
        "Reference: SepFormer SI-SNRi ~20.1 dB (Libri2Mix clean).",
    ),
    "LibriParty": (
        "Synthetic cocktail-party scenes; voice activity detection.",
        "Expects the LibriParty generated dataset (JSON metadata).",
        "Reference: CRDNN VAD F-score ~0.94.",
    ),
    "LibriSpeech": (
        "960 h read English ASR; the flagship benchmark family.",
        "Expects the official split dirs (`train-clean-100`, ..., "
        "`test-other`) with FLAC audio — decoded by the native C++ "
        "FLAC decoder, no external deps.",
        "Reference baselines (BASELINE.md): transformer+LM WER 2.27 "
        "test-clean; conformer_small 2.49; CRDNN seq2seq 2.89-3.16; "
        "wav2vec2 CTC 1.90; transducer 11.03 (train-clean-100).",
    ),
    "LibriTTS": (
        "Multi-speaker TTS corpus; vocoder training.",
        "Expects LibriTTS split folders with per-utterance wavs.",
        "Reference: multi-speaker HiFiGAN vocoder.",
    ),
    "REAL-M": (
        "Real-life mixtures; blind SI-SNR estimation.",
        "Expects REAL-M mixture wavs + separator outputs "
        "(pool estimator trains on WHAMR-style synthetic pairs).",
        "Reference: SI-SNR estimator pool model.",
    ),
    "SLURP": (
        "Spoken language understanding (intents + entities).",
        "Expects SLURP jsonl annotation + `slurp_real/slurp_synth` audio.",
        "Reference: direct SLU ~87 intent accuracy; NLU (gold "
        "transcripts) higher — both families here.",
    ),
    "Switchboard": (
        "Conversational telephone speech (2,400 dialogs, stereo SPHERE).",
        "Expects LDC97S62 + eval2000/Hub5 test sets; the stereo "
        "SPHERE segment reader is native (no sox).",
        "Reference: transformer ASR WER ~20 (swbd part of eval2000).",
    ),
    "TIMIT": (
        "Phone-level annotated read speech; PER benchmarks + alignment.",
        "Expects the LDC TIMIT layout (TRAIN/TEST with .PHN files; "
        "SPHERE .WAV decoded natively).",
        "Reference baselines: CRDNN+CTC PER 14.78 test (BASELINE.md); "
        "seq2seq 14.07; wav2vec2 8.04. Alignment family trains "
        "HMM-DNN forward/Viterbi/CTC losses with accuracy vs .PHN ends.",
    ),
    "Taigi": (
        "Taiwanese Hokkien speech translation — fork-signature corpus.",
        "Expects the Sinica Taigi corpus manifests (TAT format).",
        "Fork baseline: ST transformer toward Mandarin text.",
    ),
    "UrbanSound8k": (
        "Environmental sound classification (10 classes).",
        "Expects `UrbanSound8K/audio/fold1..10` + metadata csv "
        "(10-fold cross-validation by official folds).",
        "Reference: ECAPA accuracy ~75-80% fold-averaged.",
    ),
    "Voicebank": (
        "VoiceBank-DEMAND noisy speech; enhancement + robust ASR.",
        "Expects `clean_trainset_28spk_wav`/`noisy_trainset_28spk_wav` "
        "(+ testset dirs) at 16 kHz.",
        "Reference: MetricGAN+ PESQ 3.15; SEGAN/spectral-mask/waveform "
        "variants; MTL robust-ASR enhance+mimic; CTC ASR.",
    ),
    "VoxCeleb": (
        "Speaker verification (VoxCeleb1+2).",
        "Expects `wav/idxxxxx/...` celebrity utterances + the official "
        "verification trial lists.",
        "Reference baselines (BASELINE.md): ECAPA-TDNN EER 0.80% "
        "(Vox1+2), xvector+PLDA 3.23%.",
    ),
    "VoxLingua107": (
        "107-language spoken LID.",
        "Expects per-language folders of the VoxLingua107 release.",
        "Reference: ECAPA accuracy ~93% dev.",
    ),
    "WHAMandWHAMR": (
        "WSJ0-2mix with real noise (WHAM) and reverb (WHAMR).",
        "Expects `wham_noise`-augmented mixture folders (8 kHz min).",
        "Reference: SepFormer SI-SNRi 16.3 dB (WHAM), 13.7 (WHAMR) with "
        "dynamic mixing.",
    ),
    "WSJ0Mix": (
        "The classic wsj0-2mix/3mix separation benchmark.",
        "Expects `2speakers/wav8k/min/{tr,cv,tt}` mixture folders.",
        "Reference: SepFormer SI-SNRi 22.4 dB (2mix) / 19.8 (3mix) — "
        "BASELINE.md context row.",
    ),
    "fluent-speech-commands": (
        "Spoken command understanding (action/object/location frames).",
        "Expects the FSC release (`data/` csvs + wavs).",
        "Reference: direct SLU accuracy ~99.6%.",
    ),
    "timers-and-such": (
        "Numeric voice-command SLU (timers, math, units).",
        "Expects the Timers-and-Such v1.0 release csvs; families: "
        "direct (audio->semantics), decoupled (gold transcript->NLU), "
        "multistage (online ASR transcription->NLU), LM.",
        "Reference: direct test accuracy ~77-85% depending on split.",
    ),
}


def main():
    rows = list(
        csv.DictReader(open(os.path.join(REPO, "tests", "recipes.csv")))
    )
    by_corpus = defaultdict(list)
    for r in rows:
        by_corpus[r["Dataset"]].append(r)
    for corpus, rws in sorted(by_corpus.items()):
        desc, data, results = NOTES.get(
            corpus, (f"{corpus} recipes.", "", "")
        )
        lines = [f"# {corpus}", "", desc, ""]
        if data:
            lines += ["**Data layout.** " + data, ""]
        lines += [
            "## Families",
            "",
            "| Task | Train script | Config |",
            "|---|---|---|",
        ]
        for r in sorted(rws, key=lambda r: r["RecipeID"]):
            script = os.path.relpath(
                r["Script_file"], f"recipes/{corpus}"
            )
            hparams = os.path.relpath(
                r["Hparam_file"], f"recipes/{corpus}"
            )
            lines.append(f"| {r['Task']} | `{script}` | `{hparams}` |")
        ex = sorted(rws, key=lambda r: r["RecipeID"])[0]
        script = os.path.relpath(ex["Script_file"], f"recipes/{corpus}")
        hparams = os.path.relpath(ex["Hparam_file"], f"recipes/{corpus}")
        lines += [
            "",
            "## Running",
            "",
            "```bash",
            f"cd recipes/{corpus}",
            f"python {script} {hparams} --data_folder /path/to/{corpus}",
            "```",
            "",
            "Every family runs end-to-end offline with `--debug` on a "
            "synthetic corpus in CI (see `tests/recipes.csv`); flags "
            "like `--precision bf16`, `--model_parallel N` and "
            "`--grad_accumulation_factor` come from the shared Brain "
            "CLI (`speechbrain_tpu/core.py`).",
        ]
        if results:
            lines += ["", "## Reference results", "", results]
        lines += [
            "",
            "Reference parity target: the same-named recipe family in "
            "SpeechBrain 0.5.13 (`/root/reference/recipes/"
            f"{corpus}`).",
            "",
        ]
        out = os.path.join(REPO, "recipes", corpus, "README.md")
        with open(out, "w") as f:
            f.write("\n".join(lines))
        print("wrote", out)


if __name__ == "__main__":
    main()
