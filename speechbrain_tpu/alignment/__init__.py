"""Forced alignment: HMM forward/Viterbi over NN posteriors, CTC segmentation."""
