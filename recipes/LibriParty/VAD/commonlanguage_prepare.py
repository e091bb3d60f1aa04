#!/usr/bin/env python3
"""CommonLanguage preparation for VAD training (torch-free).

Role counterpart of the reference
``recipes/LibriParty/VAD/commonlanguage_prepare.py``: indexes every wav
under the dataset folder into the reference CSV schema
``ID,duration,wav,wav_format,wav_opts`` (the corpus provides diverse
multilingual speech used as a "speech-like" augmentation source).
"""

import logging
import os

from speechbrain_tpu.utils.data_utils import get_all_files

from musan_prepare import prepare_noise_csv

logger = logging.getLogger(__name__)

COMMON_LANGUAGE_URL = (
    "https://zenodo.org/record/5036977/files/CommonLanguage.tar.gz?download=1"
)


def prepare_commonlanguage(folder, csv_file, max_noise_len=None):
    """Prepare the CommonLanguage dataset for VAD training.

    Arguments
    ---------
    folder : str
        The location of the folder containing the dataset.
    csv_file : str
        Filename for storing the prepared csv file.
    max_noise_len : float
        The maximum length in seconds; longer files are cut into
        pieces.
    """
    logger.info("CommonLanguage Preparation...")
    wav_lst = get_all_files(os.path.join(folder), match_and=[".wav"])
    if not os.path.isfile(csv_file):
        logger.info("%s creation...", csv_file)
        prepare_noise_csv(folder, wav_lst, csv_file, max_noise_len)
