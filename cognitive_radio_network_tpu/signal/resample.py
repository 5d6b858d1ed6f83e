"""Rational polyphase resampling (the liquid ``resamp2``/``resamp`` capability).

Used by the simulation medium to move node waveforms between their native
sample rates and the common medium rate (e.g. SU link at 1 MS/s inside a
13 MS/s band — scenarios/predictive_model.cfg:72-76), and by the interferer's
GMSK x2 interpolation (src/interferer.cpp:199-201).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from cognitive_radio_network_tpu.signal import filters

__all__ = ["resample_poly", "halfband_interp"]


@functools.lru_cache(maxsize=64)
def _resample_taps(up: int, down: int, taps_per_phase: int = 12) -> np.ndarray:
    cutoff = 0.5 / max(up, down)
    n = up * taps_per_phase
    n += (n % 2) == 0  # odd length, symmetric
    taps = filters.kaiser_lowpass_taps(n, cutoff, 70.0) * up
    return taps


def resample_poly(x, up: int, down: int):
    """Resample by up/down. complex or float 1-D (host numpy or jnp).

    Zero-stuff by ``up``, low-pass at min Nyquist, take every ``down``-th.
    Output length = ceil(len(x) * up / down).
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == 1 and down == 1:
        return x
    taps = _resample_taps(up, down)
    xnp = np.asarray(x)
    upsampled = np.zeros(len(xnp) * up, dtype=xnp.dtype)
    upsampled[::up] = xnp
    # centered FIR (delay-compensated)
    filt = np.convolve(upsampled, taps.astype(np.float32), mode="full")
    delay = (len(taps) - 1) // 2
    filt = filt[delay : delay + len(upsampled)]
    out = filt[::down]
    want = -(-len(xnp) * up // down)
    if len(out) < want:
        out = np.concatenate([out, np.zeros(want - len(out), xnp.dtype)])
    return out[:want]


def halfband_interp(x):
    """x2 interpolation (liquid resamp2_crcf_interp_execute equivalent)."""
    return resample_poly(x, 2, 1)
