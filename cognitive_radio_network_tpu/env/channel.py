"""Channel impairments and frequency translation (batched jnp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["awgn", "mix_to_offset", "apply_cfo", "soft_gain"]


def awgn(key: jax.Array, x: jax.Array, snr_db: float | jax.Array) -> jax.Array:
    """Add complex white Gaussian noise at the given SNR vs the signal power."""
    p_sig = jnp.mean(jnp.abs(x) ** 2)
    p_noise = p_sig / (10.0 ** (jnp.asarray(snr_db) / 10.0))
    kr, ki = jax.random.split(key)
    scale = jnp.sqrt(p_noise / 2.0)
    n = scale * (
        jax.random.normal(kr, x.shape) + 1j * jax.random.normal(ki, x.shape)
    ).astype(jnp.complex64)
    return x + n


def mix_to_offset(
    x: jax.Array, offset_hz: jax.Array, sample_rate_hz: float, t0: jax.Array = 0
) -> jax.Array:
    """Frequency-translate baseband ``x`` by ``offset_hz`` (complex mixer).

    ``t0`` is the starting sample index so segment-wise synthesis stays
    phase-continuous across block boundaries.
    """
    n = x.shape[-1]
    t = (jnp.arange(n) + t0).astype(jnp.float32)
    ph = 2.0 * jnp.pi * jnp.asarray(offset_hz, jnp.float32) / sample_rate_hz
    lo = jnp.exp(1j * ph.astype(jnp.float32)[..., None] * t).astype(jnp.complex64)
    return x * lo


def apply_cfo(x: jax.Array, cfo_rad_per_samp: jax.Array, t0: jax.Array = 0) -> jax.Array:
    """Apply a carrier-frequency offset given in radians/sample."""
    n = x.shape[-1]
    t = (jnp.arange(n) + t0).astype(jnp.float32)
    return x * jnp.exp(1j * jnp.asarray(cfo_rad_per_samp, jnp.float32) * t).astype(
        jnp.complex64
    )


def soft_gain(gain_db: float | jax.Array) -> jax.Array:
    """Linear amplitude from dB soft gain: 10^(g/20)
    (reference src/extensible_cognitive_radio.cpp:892)."""
    return 10.0 ** (jnp.asarray(gain_db, jnp.float32) / 20.0)
