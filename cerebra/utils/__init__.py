"""Host-side utilities: metric logging, config parsing, rng seeding."""

from cerebra.utils.logging import MetricLogger, SmoothedValue  # noqa: F401
from cerebra.utils.config import bool_flag, parse_hyperparams, fix_random_seeds  # noqa: F401
from cerebra.utils.plotting import plot_sample_eeg_channels  # noqa: F401
