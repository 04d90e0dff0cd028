"""Host-side matplotlib helpers (analysis layer L7).

Replaces `plotSampleEEGChannels` (utils/Utilities.py:451-495): overlay a
set of channels from the first trial of an EEG batch, optionally saving the
figure (Agg-safe: never requires a display)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def plot_sample_eeg_channels(
    eeg_data: np.ndarray,
    channels_to_plot: Sequence[int],
    save_figure: bool = False,
    save_figure_name: Optional[str] = None,
):
    """eeg_data: (B, T, C) — plots eeg_data[0][:, chn] per channel with the
    reference's labels/grid/legend layout (utils/Utilities.py:451-475).
    Returns the matplotlib figure (closed after optional save)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig = plt.figure()
    fig.set_size_inches(20, 5)
    eeg0 = np.asarray(eeg_data[0])
    for chn in channels_to_plot:
        plt.plot(eeg0[:, int(chn)], label=f"Channel :{chn}")
    plt.xlabel("Time (s)")
    plt.ylabel("Amplitude")
    plt.title("Filtering signals")
    plt.legend(ncol=10)
    plt.grid(True)
    if save_figure and save_figure_name:
        fig.savefig(save_figure_name)
    plt.close(fig)
    return fig
