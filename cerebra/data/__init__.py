"""Data layer: .pth corpus schema, label catalogs, corpora, synthetic data.

TPU-first re-design of the reference dataset layer (utils/EEGDataset.py,
utils/PerilsEEGDataset.py, utils/EEGBaseDataset.py): instead of per-sample
Python `__getitem__` work, a corpus is materialized ONCE into dense
(N, T, C) arrays; windowing / channel selection / normalization are pure,
jit-able array ops, and "in-place dataset transforms" of the reference become
pure feature stores.
"""

from cerebra.data.schema import (  # noqa: F401
    RawCorpus,
    LabelCatalog,
    load_corpus_pth,
    save_corpus_pth,
)
from cerebra.data.corpus import EEGCorpus  # noqa: F401
from cerebra.data.synthetic import (  # noqa: F401
    synthetic_eeg_noise,
    make_synthetic_corpus,
)
from cerebra.data.sampling import random_split_indices, batch_iterator  # noqa: F401
from cerebra.data.labelwise import (  # noqa: F401
    load_data_label_wise,
    prepare_eeg_data,
    prepare_data_for_vis,
    calc_mean,
    calc_eeg_mean,
)
