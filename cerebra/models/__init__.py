"""Model zoo (flax.linen, TPU-first).

Reference L3 inventory (SURVEY.md §2.4) rebuilt:
- lstm.Model           — the reconstructed missing `models/lstm.Model`
- lstm.InlineLSTM      — the LSTMDistill.py:112-147 inline variant
- heads.DINOHead       — dino/vision_transformer.py:257-291
- multicrop            — utils/utils.py:598-633 MultiCropWrapper
- conformer.Conformer  — utils/Conformer.py:68-219
- autoencoders         — utils/EEGAutoencoder.py, utils/LSTMAutoEncoders.py
- mlp.CustomModel      — utils/CustomModel.py:4-17
- vit.VisionTransformer— dino/vision_transformer.py:134-254
- barlow.BarlowTwins   — EEG-BarlowNetworks/net.py:11-42
- layers               — layers.py:5-105 conv blocks
- hub                  — dino/hubconf.py named pretrained registry
"""

from cerebra.models.lstm import Model, InlineLSTM  # noqa: F401
from cerebra.models.heads import DINOHead  # noqa: F401
from cerebra.models import hub  # noqa: F401
