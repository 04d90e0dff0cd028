"""CustomModel (utils/CustomModel.py:4-17): the image-feature → EEG regressor
MLP in→2000→2000→out used by `transformEEGData` and `load_data_label_wise`."""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import linen as nn


class CustomModel(nn.Module):
    output_size: int
    hidden: int = 2000
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        h = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(h))
        return nn.Dense(self.output_size, dtype=self.dtype)(h)
