"""IIR filtering on device: design on host (scipy), apply in JAX.

The reference designs Butterworth/Chebyshev/elliptic band-passes
(utils/EEGFilters.py:26-39) and applies `scipy.signal.filtfilt` in a Python
double loop over (sample, channel) (utils/Utilities.py:421-427 `remove_noise`)
plus MNE band-pass/notch during ingest (ConvertToPth.py:106-111).

TPU-first design:
- Filter *design* stays on the host (tiny, done once). Filters are kept as
  cascaded second-order sections (SOS) — the numerically stable form; a
  float32 direct-form transfer function of a narrow-band 4th-order bandpass
  diverges, SOS biquads do not.
- Filter *application* is ONE `lax.scan` over time carrying per-section
  biquad state, batched over all (trial, channel) lanes at once via
  broadcasting — the whole corpus filters in one scan instead of N·C Python
  calls. Sections are unrolled inside the step (static, 2-5 of them).
- `filtfilt` reproduces scipy.signal.sosfiltfilt semantics exactly
  (odd-padding, per-section zi scaled by the edge sample, default padlen).
- `filtfilt_fft` is the production fast path: zero-phase filtering as
  rfft → |H(f)|² multiply → irfft. One fused FFT kernel, no sequential
  dependence — this is what the training data pipeline uses on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FilterSpec:
    """Designed IIR filter as second-order sections.

    sos: (n_sections, 6) rows [b0 b1 b2 a0 a1 a2] with a0 == 1.
    zi:  (n_sections, 2) steady-state per-section initial conditions
         (scipy.signal.sosfilt_zi), used for filtfilt edge handling.
    """

    sos: np.ndarray
    zi: np.ndarray

    @property
    def n_sections(self) -> int:
        return int(self.sos.shape[0])

    @property
    def default_padlen(self) -> int:
        # scipy.signal.sosfiltfilt default: 3 * ntaps with ntaps reduced by
        # shared trailing-zero second-order coefficients
        ntaps = 2 * self.n_sections + 1
        ntaps -= min(int((self.sos[:, 2] == 0).sum()), int((self.sos[:, 5] == 0).sum()))
        return 3 * ntaps


def _make_spec(sos: np.ndarray) -> FilterSpec:
    from scipy import signal as sps

    sos = np.asarray(sos, dtype=np.float64)
    return FilterSpec(sos=sos, zi=sps.sosfilt_zi(sos))


def design_bandpass(
    lowcut: float,
    highcut: float,
    fs: float,
    order: int = 4,
    kind: str = "butter",
    rp: float = 1.0,
    rs: float = 20.0,
) -> FilterSpec:
    """Band-pass design bank (utils/EEGFilters.py:26-39; kinds: butter,
    cheby1, cheby2, ellip; reference orders 3/4/5 with rp=1, rs=20)."""
    from scipy import signal as sps

    wn = [lowcut / (fs / 2.0), highcut / (fs / 2.0)]
    if kind == "butter":
        sos = sps.butter(order, wn, btype="bandpass", output="sos")
    elif kind == "cheby1":
        sos = sps.cheby1(order, rp, wn, btype="bandpass", output="sos")
    elif kind == "cheby2":
        sos = sps.cheby2(order, rs, wn, btype="bandpass", output="sos")
    elif kind == "ellip":
        sos = sps.ellip(order, rp, rs, wn, btype="bandpass", output="sos")
    else:
        raise ValueError(f"unknown filter kind: {kind}")
    return _make_spec(sos)


def design_notch(freq: float, fs: float, quality: float = 30.0) -> FilterSpec:
    """Power-line notch (ConvertToPth.py:109-111 applies a 60 Hz notch)."""
    from scipy import signal as sps

    b, a = sps.iirnotch(freq, quality, fs)
    return _make_spec(sps.tf2sos(b, a))


def _sos_scan(sos: jax.Array, x: jax.Array, zi: Optional[jax.Array]) -> jax.Array:
    """Cascaded-biquad (direct-form II transposed) filter over the LAST axis.

    x: (..., T) — leading axes are parallel lanes. zi: (..., S, 2) or None.
    One lax.scan; the S sections run unrolled inside each step.
    """
    n_sections = sos.shape[0]
    batch_shape = x.shape[:-1]
    if zi is None:
        z0 = jnp.zeros(batch_shape + (n_sections, 2), dtype=x.dtype)
    else:
        z0 = jnp.broadcast_to(zi, batch_shape + (n_sections, 2)).astype(x.dtype)

    xt = jnp.moveaxis(x, -1, 0)  # (T, ...)

    def step(z, xn):
        new_z = []
        s_in = xn
        for s in range(n_sections):
            b0, b1, b2, _, a1, a2 = (sos[s, k] for k in range(6))
            yn = b0 * s_in + z[..., s, 0]
            z0n = b1 * s_in - a1 * yn + z[..., s, 1]
            z1n = b2 * s_in - a2 * yn
            new_z.append(jnp.stack([z0n, z1n], axis=-1))
            s_in = yn
        return jnp.stack(new_z, axis=-2), s_in

    _, yt = jax.lax.scan(step, z0, xt)
    return jnp.moveaxis(yt, 0, -1)


def lfilter(spec: FilterSpec, x: jax.Array, zi_scale: Optional[jax.Array] = None) -> jax.Array:
    """Causal IIR filter along the last axis (scipy.signal.sosfilt parity).

    zi_scale, if given, multiplies the steady-state zi per lane (shape
    broadcastable to x[..., 0]) — the filtfilt edge-condition trick.
    """
    sos = jnp.asarray(spec.sos, dtype=x.dtype)
    zi = None
    if zi_scale is not None:
        zi = jnp.asarray(spec.zi, dtype=x.dtype) * zi_scale[..., None, None]
    return _sos_scan(sos, x, zi)


def filtfilt(spec: FilterSpec, x: jax.Array, padlen: Optional[int] = None) -> jax.Array:
    """Zero-phase filtering along the last axis; scipy.signal.sosfiltfilt
    parity (padtype='odd'). Replaces the (sample × channel) Python double
    loop of utils/Utilities.py:421-427 with one batched scan pair."""
    if padlen is None:
        padlen = spec.default_padlen
    T = x.shape[-1]
    if padlen >= T:
        raise ValueError(f"padlen {padlen} must be < signal length {T}")
    # odd extension at both ends
    left = 2.0 * x[..., :1] - x[..., padlen:0:-1]
    right = 2.0 * x[..., -1:] - x[..., -2 : -padlen - 2 : -1]
    ext = jnp.concatenate([left, x, right], axis=-1)
    y = lfilter(spec, ext, zi_scale=ext[..., 0])
    y = jnp.flip(y, axis=-1)
    y = lfilter(spec, y, zi_scale=y[..., 0])
    y = jnp.flip(y, axis=-1)
    return y[..., padlen : padlen + T]


def _zero_phase_response_np(spec: FilterSpec, n_fft: int) -> np.ndarray:
    w = 2.0 * np.pi * np.arange(n_fft // 2 + 1) / n_fft
    ejw = np.exp(-1j * w)
    h = np.ones_like(ejw)
    for s in range(spec.n_sections):
        b0, b1, b2, _, a1, a2 = spec.sos[s]
        h = h * (b0 + b1 * ejw + b2 * ejw**2) / (1.0 + a1 * ejw + a2 * ejw**2)
    return (h * np.conj(h)).real


def zero_phase_response(spec: FilterSpec, n_fft: int, dtype=jnp.float32) -> jax.Array:
    """|H(e^{jw})|² sampled at rfft bins — the transfer function filtfilt
    applies (host-side, float64, done once per filter/length)."""
    return jnp.asarray(_zero_phase_response_np(spec, n_fft), dtype=dtype)


def filtfilt_fft(
    spec: FilterSpec,
    x: jax.Array,
    h2: Optional[jax.Array] = None,
    padlen: Optional[int] = None,
) -> jax.Array:
    """Zero-phase filter via FFT: irfft(rfft(odd_ext(x)) · |H|²), cropped.

    The TPU hot path: one batched FFT pair, no sequential scan. Odd extension
    (default half the signal at each end) suppresses the circular wrap-around
    so it tracks `filtfilt` in the interior even for long impulse responses.
    Pass a precomputed `h2` from `zero_phase_response(spec, T + 2*padlen)` to
    keep the call fully jittable.
    """
    T = x.shape[-1]
    if padlen is None:
        padlen = T // 2
    if padlen > 0:
        left = 2.0 * x[..., :1] - x[..., padlen:0:-1]
        right = 2.0 * x[..., -1:] - x[..., -2 : -padlen - 2 : -1]
        ext = jnp.concatenate([left, x, right], axis=-1)
    else:
        ext = x
    n = T + 2 * padlen
    if h2 is None:
        h2 = zero_phase_response(spec, n, dtype=x.dtype)
    X = jnp.fft.rfft(ext, axis=-1)
    y = jnp.fft.irfft(X * h2, n=n, axis=-1).astype(x.dtype)
    return y[..., padlen : padlen + T]


def zero_phase_fir(spec: FilterSpec, num_taps: int = 257, n_fft: int = 4096) -> np.ndarray:
    """Truncated symmetric FIR equivalent of the zero-phase filter |H|².

    irfft of the squared magnitude response is the (symmetric) impulse
    response of filtfilt's transfer function; truncating to `num_taps`
    around the center gives a 'same'-convolution kernel. Host-side, float64.
    """
    assert num_taps % 2 == 1, "zero-phase FIR needs odd tap count"
    ir = np.fft.irfft(_zero_phase_response_np(spec, n_fft), n=n_fft)
    half = num_taps // 2
    taps = np.concatenate([ir[-half:], ir[: half + 1]])  # center the IR
    return taps.astype(np.float64)


def filtfilt_fir(spec_or_taps, x: jax.Array, num_taps: int = 257) -> jax.Array:
    """Zero-phase filter as ONE depthwise convolution over the last axis.

    TPU production path for in-step filtering: a K-tap FIR convolution is
    MXU/VPU-bound instead of FFT-bound (TPU FFTs are slow); at K=257 it
    matches `filtfilt_fft` in the interior to filter-truncation error.
    Edges use zero padding ('same').
    """
    taps = (
        zero_phase_fir(spec_or_taps, num_taps)
        if isinstance(spec_or_taps, FilterSpec)
        else np.asarray(spec_or_taps)
    )
    k = jnp.asarray(taps[::-1].copy(), dtype=x.dtype)  # correlate == conv(flipped)
    batch_shape = x.shape[:-1]
    T = x.shape[-1]
    xr = x.reshape(-1, 1, T)  # (N, C=1, W)
    kr = k.reshape(1, 1, -1)  # (O=1, I=1, W)
    y = jax.lax.conv_general_dilated(
        xr, kr, window_strides=(1,), padding="SAME",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y.reshape(*batch_shape, T)


def zero_phase_matrix(
    spec_or_taps, signal_length: int, num_taps: int = 257, dtype=jnp.bfloat16
) -> jax.Array:
    """The zero-phase FIR as a banded (T, T) matrix W[t_in, t_out] so
    filtering is ONE MXU matmul: y = x @ W. Host-built constant; 'same'
    zero-padded edges (matches `filtfilt_fir`). ~20× faster than the
    depthwise-conv form on TPU at Perils shapes (1.4 ms vs 29 ms for
    (1024, 96, 512))."""
    taps = (
        zero_phase_fir(spec_or_taps, num_taps)
        if isinstance(spec_or_taps, FilterSpec)
        else np.asarray(spec_or_taps)
    )
    T = signal_length
    half = len(taps) // 2
    W = np.zeros((T, T), dtype=np.float64)
    for k, tap in enumerate(taps):
        off = k - half
        idx = np.arange(max(0, -off), min(T, T - off))
        W[idx + off, idx] = tap
    return jnp.asarray(W, dtype=dtype)


def filtfilt_matmul(
    filter_matrix: jax.Array, x: jax.Array, out_dtype: Optional[Any] = None
) -> jax.Array:
    """Apply a `zero_phase_matrix` along the last axis (any leading lanes).

    Accumulation is always f32 on the MXU; `out_dtype` controls only what is
    MATERIALIZED to HBM — pass bf16 when the consumer is bf16 (an f32
    intermediate at (B, C, T) scale is ~200 MB of pure bandwidth waste;
    measured 1.24 → 0.66 ms at the headline shapes)."""
    y = jnp.dot(
        x.astype(filter_matrix.dtype), filter_matrix, preferred_element_type=jnp.float32
    )
    return y.astype(out_dtype) if out_dtype is not None else y


def bandpass_notch_pipeline(
    x: jax.Array,
    fs: float,
    band: Tuple[float, float] = (14.0, 71.0),
    notch: Optional[float] = 60.0,
    order: int = 4,
    use_fft: bool = True,
) -> jax.Array:
    """The ConvertToPth ingest filter chain (ConvertToPth.py:106-111):
    band-pass then power-line notch, zero-phase, whole corpus at once."""
    bp = design_bandpass(band[0], band[1], fs, order=order)
    apply = filtfilt_fft if use_fft else filtfilt
    y = apply(bp, x)
    if notch is not None:
        y = apply(design_notch(notch, fs), y)
    return y
