"""Scene composition: turn PU/interferer activity into sensed IQ blocks.

Replaces the over-the-air data plane of the reference testbed: what the
SU's USRP would receive at fc=833 MHz / 13 MS/s (CE_Predictive_Node.hpp:42-43)
is synthesized directly as (cycles, samples_per_cycle) complex64 blocks.

Per sense cycle each occupied channel contributes a band-limited signal
(low-pass-filtered complex noise mixed to the channel offset — the spectral
footprint of the reference's OFDM links without needing a full link sim), on
top of a complex-Gaussian noise floor.  Everything is batched over cycles and
jit-friendly; this is also the dataset generator for classifier training.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cognitive_radio_network_tpu.signal import filters

__all__ = ["SceneConfig", "synthesize_scene", "occupancy_to_powers"]


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    sample_rate_hz: float = 13e6
    center_hz: float = 833e6
    channels_hz: tuple[float, ...] = (833e6, 835e6, 838e6)
    signal_bw_hz: float = 1.4e6  # PU link rate (scenarios/predictive_model.cfg:39)
    noise_floor_power: float = 1e-3
    filter_taps: int = 129


def occupancy_to_powers(
    trace: jax.Array, num_channels: int = 3, power: float = 1.0
) -> jax.Array:
    """Channel-index trace (C,) -> per-channel linear power matrix (C, K).

    Index -1 (or >= K) means no channel active that cycle.
    """
    return (
        jax.nn.one_hot(trace, num_channels, dtype=jnp.float32) * power
    )


def synthesize_scene(
    key: jax.Array,
    channel_powers: jax.Array,
    samples_per_cycle: int,
    cfg: SceneConfig = SceneConfig(),
    *,
    as_planes: bool = False,
) -> jax.Array:
    """(C, K) per-cycle channel powers -> (C, samples_per_cycle) complex64 IQ,
    or float32 planes (C, samples_per_cycle, 2) with ``as_planes=True`` (the
    canonical on-device format — see signal.iq)."""
    c, k = channel_powers.shape
    n = samples_per_cycle
    taps = jnp.asarray(
        filters.kaiser_lowpass_taps(
            cfg.filter_taps, cfg.signal_bw_hz / 2.0 / cfg.sample_rate_hz, 60.0
        )
    )
    # Normalize so filtered unit-power noise keeps unit power.
    taps = taps / jnp.sqrt(jnp.sum(taps * taps))

    keys = jax.random.split(key, 2 * k + 1)
    t = jnp.arange(n, dtype=jnp.float32)
    total = jnp.zeros((c, n), jnp.complex64)
    for ch in range(k):
        kr, ki = keys[2 * ch], keys[2 * ch + 1]
        w = (
            jax.random.normal(kr, (c, n)) + 1j * jax.random.normal(ki, (c, n))
        ).astype(jnp.complex64) / np.sqrt(2.0)
        # Band-limit: depthwise 1D convolution over the time axis.
        sig = jax.vmap(lambda row: jnp.convolve(row, taps.astype(jnp.complex64), "same"))(w)
        off = (cfg.channels_hz[ch] - cfg.center_hz) / cfg.sample_rate_hz
        lo = jnp.exp(2j * jnp.pi * np.float32(off) * t).astype(jnp.complex64)
        amp = jnp.sqrt(channel_powers[:, ch]).astype(jnp.complex64)[:, None]
        total = total + amp * sig * lo[None, :]

    kr, ki = jax.random.split(keys[-1])
    noise = (
        jax.random.normal(kr, (c, n)) + 1j * jax.random.normal(ki, (c, n))
    ).astype(jnp.complex64) * np.sqrt(cfg.noise_floor_power / 2.0)
    out = total + noise
    if as_planes:
        return jnp.stack([jnp.real(out), jnp.imag(out)], axis=-1).astype(jnp.float32)
    return out
