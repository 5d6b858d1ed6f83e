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
    """Resample by up/down. complex or float, 1-D or (B, N) batched rows
    (each row resampled independently — host numpy or jnp).

    Semantics: zero-stuff by ``up``, low-pass at min Nyquist (centered FIR,
    delay-compensated), take every ``down``-th.  Output length =
    ceil(len(x) * up / down).

    Implementation is TRUE POLYPHASE: only the taps that hit nonzero
    (stuffed) samples are touched, so the cost is taps_per_phase (~12) MACs
    per OUTPUT sample regardless of ``up`` — the naive zero-stuff+convolve
    would cost up*len(taps) per input (prohibitive for ratios like 65/7,
    the reference's 1.4 MS/s link inside the 13 MS/s medium,
    scenarios/predictive_model.cfg:40/:76).
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == 1 and down == 1:
        return x
    taps = _resample_taps(up, down).astype(np.float32)
    xnp = np.asarray(x)
    n = xnp.shape[-1]
    want = -(-n * up // down)
    delay = (len(taps) - 1) // 2
    # out[m] = filt[m*down] with filt[i] = sum_q x[q] * taps[i + delay - up*q]
    # Let i = m*down + delay, phase p = i % up, base q0 = i // up:
    #   out[m] = sum_s x[q0 - s] * taps[p + up*s]
    tpp = -(-len(taps) // up)  # taps per phase
    tap_pad = np.zeros(up * tpp, np.float32)
    tap_pad[: len(taps)] = taps
    phases = tap_pad.reshape(tpp, up).T  # phases[p, s] = taps[p + up*s]
    i = np.arange(want, dtype=np.int64) * down + delay
    p = i % up
    q0 = i // up
    # pad x on both sides so every gather index is in range
    idx = (q0[:, None] - np.arange(tpp)[None, :]) + tpp  # (want, tpp)
    ph = phases[p].astype(xnp.real.dtype)
    if xnp.ndim == 2:
        zp = np.zeros((xnp.shape[0], tpp), xnp.dtype)
        xp = np.concatenate([zp, xnp, zp], axis=1)
        out = np.einsum("fms,ms->fm", xp[:, idx], ph)
    else:
        xp = np.concatenate(
            [np.zeros(tpp, xnp.dtype), xnp, np.zeros(tpp, xnp.dtype)]
        )
        out = np.einsum("ms,ms->m", xp[idx], ph)
    return out.astype(xnp.dtype)


def halfband_interp(x):
    """x2 interpolation (liquid resamp2_crcf_interp_execute equivalent)."""
    return resample_poly(x, 2, 1)
