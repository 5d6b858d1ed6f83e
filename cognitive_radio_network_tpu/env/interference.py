"""Interferer waveform synthesis — the fault-injection subsystem.

The reference's ``Interferer`` node (src/interferer.cpp) is its only fault
injector for the RF environment: six waveform types with duty-cycle gating and
fixed/sweep/random frequency hopping.  Here each builder is batched jnp
synthesis of a block of samples; the scene composer applies the duty cycle and
hop trace.

Waveform contracts (src/interferer.cpp:128-288, include/interferer.hpp:12-28):
  CW    constant 0.5 + 0.5j
  NOISE uniform per rail in [-0.25, 0.25)
  AWGN  Gaussian per rail, mean 5.0, std 5.0 — yes, a huge DC term; the
        reference constructs ``dist(5.0, 5.0)`` (src/interferer.cpp:24) and we
        default to the same (configurable)
  GMSK  Gaussian-filtered MSK frames, 2 samps/sym interpolated x2 (-> 4)
  RRC   root-raised-cosine QPSK, 2 samps/sym, semilength 32, beta 0.35,
        rails in {-0.25, +0.25}
  OFDM  random-payload OFDM symbols, M = 2*(tx_rate/30e3) subcarriers, CP 16

Frequency behaviors (src/interferer.cpp:334-355): SWEEP steps by
``tx_freq_resolution`` and reflects at [tx_freq_min, tx_freq_max]; RANDOM
quantizes a uniform draw over the band to the resolution grid.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from cognitive_radio_network_tpu.signal import filters

__all__ = ["InterfererConfig", "synthesize_interference", "hop_trace", "duty_cycle_gate"]

InterferenceType = Literal["cw", "noise", "awgn", "gmsk", "rrc", "ofdm"]


@dataclasses.dataclass(frozen=True)
class InterfererConfig:
    """Mirrors node_parameters' interferer block (include/crts.hpp:167-180)."""

    interference_type: InterferenceType = "cw"
    period_s: float = 1.0
    duty_cycle: float = 1.0
    tx_rate_hz: float = 1e6
    tx_gain_soft_db: float = -3.0
    tx_freq_behavior: Literal["fixed", "sweep", "random"] = "fixed"
    tx_freq_hz: float = 833e6
    tx_freq_min_hz: float = 833e6
    tx_freq_max_hz: float = 838e6
    tx_freq_dwell_s: float = 1.0
    tx_freq_resolution_hz: float = 1e6
    awgn_mean: float = 5.0
    awgn_std: float = 5.0


def _qpsk_rails(key: jax.Array, shape) -> jax.Array:
    """Rails in {-0.25, +0.25}: 0.5*round(U[0,1)) - 0.25 (interferer.cpp:237-240)."""
    kr, ki = jax.random.split(key)
    re = 0.5 * jnp.round(jax.random.uniform(kr, shape)) - 0.25
    im = 0.5 * jnp.round(jax.random.uniform(ki, shape)) - 0.25
    return (re + 1j * im).astype(jnp.complex64)


def synthesize_interference(
    key: jax.Array, cfg: InterfererConfig, num_samples: int
) -> jax.Array:
    """One ON-burst of ``num_samples`` baseband samples of the configured type."""
    t = cfg.interference_type
    if t == "cw":
        return jnp.full((num_samples,), 0.5 + 0.5j, jnp.complex64)
    if t == "noise":
        kr, ki = jax.random.split(key)
        re = 0.5 * jax.random.uniform(kr, (num_samples,)) - 0.25
        im = 0.5 * jax.random.uniform(ki, (num_samples,)) - 0.25
        return (re + 1j * im).astype(jnp.complex64)
    if t == "awgn":
        kr, ki = jax.random.split(key)
        re = cfg.awgn_mean + cfg.awgn_std * jax.random.normal(kr, (num_samples,))
        im = cfg.awgn_mean + cfg.awgn_std * jax.random.normal(ki, (num_samples,))
        return (re + 1j * im).astype(jnp.complex64)
    if t == "rrc":
        k_sym = 2
        n_sym = -(-num_samples // k_sym)
        syms = _qpsk_rails(key, (n_sym,))
        up = jnp.zeros((n_sym * k_sym,), jnp.complex64).at[::k_sym].set(syms)
        taps = jnp.asarray(filters.rrcos_taps(2, 32, 0.35))
        out = jnp.convolve(up, taps.astype(jnp.complex64), mode="same")
        return out[:num_samples]
    if t == "gmsk":
        # 1 bit/sym at 2 samps/sym then x2 interpolation => 4 samps/bit.
        sps = 4
        n_bits = -(-num_samples // sps)
        bits = jax.random.bernoulli(key, 0.5, (n_bits,)).astype(jnp.float32)
        nrz = 2.0 * bits - 1.0
        up = jnp.zeros((n_bits * sps,), jnp.float32).at[::sps].set(nrz * sps)
        g = jnp.asarray(filters.gaussian_taps(sps, 3, 0.3))
        freq = jnp.convolve(up, g, mode="same")
        # MSK phase ramp: pi/2 per bit.
        phase = jnp.cumsum(freq) * (jnp.pi / 2.0) / sps
        g_lin = 10.0 ** (cfg.tx_gain_soft_db / 20.0)
        return (g_lin * jnp.exp(1j * phase)).astype(jnp.complex64)[:num_samples]
    if t == "ofdm":
        m = max(8, 2 * int(cfg.tx_rate_hz / 30e3))
        cp = 16
        sym_len = m + cp
        n_syms = -(-num_samples // sym_len)
        syms = _qpsk_rails(key, (n_syms, m)) * 4.0  # unit-ish power rails
        time_syms = jnp.fft.ifft(syms, axis=-1) * np.sqrt(m)
        with_cp = jnp.concatenate([time_syms[:, -cp:], time_syms], axis=-1)
        g_lin = 10.0 ** (cfg.tx_gain_soft_db / 20.0)
        return (g_lin * with_cp.reshape(-1)[:num_samples]).astype(jnp.complex64)
    raise ValueError(f"unknown interference type: {t}")


def hop_trace(key: jax.Array, cfg: InterfererConfig, num_dwells: int) -> jax.Array:
    """Center frequency per dwell interval (float32 Hz)."""
    if cfg.tx_freq_behavior == "fixed":
        return jnp.full((num_dwells,), cfg.tx_freq_hz, jnp.float32)
    if cfg.tx_freq_behavior == "sweep":

        def step(carry, _):
            freq, coeff = carry
            nf = freq + cfg.tx_freq_resolution_hz * coeff
            out_of_band = (nf > cfg.tx_freq_max_hz) | (nf < cfg.tx_freq_min_hz)
            ncoeff = jnp.where(out_of_band, -coeff, coeff)
            nf = jnp.where(out_of_band, nf + 2.0 * cfg.tx_freq_resolution_hz * ncoeff, nf)
            return (nf, ncoeff), nf

        (_, _), trace = jax.lax.scan(
            step,
            (jnp.float32(cfg.tx_freq_hz), jnp.float32(1.0)),
            None,
            length=num_dwells,
        )
        return trace
    if cfg.tx_freq_behavior == "random":
        bw = cfg.tx_freq_max_hz - cfg.tx_freq_min_hz
        draws = jax.random.uniform(key, (num_dwells,), minval=0.0, maxval=bw)
        return (
            cfg.tx_freq_resolution_hz * jnp.round(draws / cfg.tx_freq_resolution_hz)
            + cfg.tx_freq_min_hz
        ).astype(jnp.float32)
    raise ValueError(f"unknown tx_freq_behavior: {cfg.tx_freq_behavior}")


def duty_cycle_gate(
    cfg: InterfererConfig, num_samples: int, sample_rate_hz: float
) -> jax.Array:
    """0/1 ON mask implementing period/duty_cycle gating (interferer.cpp:394-420)."""
    period = max(int(round(cfg.period_s * sample_rate_hz)), 1)
    on = int(round(cfg.duty_cycle * period))
    idx = jnp.arange(num_samples)
    return ((idx % period) < on).astype(jnp.float32)
