"""GMSK frame generation — the ``gmskframegen`` capability.

The reference uses liquid's GMSK framegen purely as an interference source
(BuildGMSKTransmission, src/interferer.cpp:161-219: random 8-byte header +
50-byte payload, CRC-16, Hamming(7,4) outer FEC, 2 samps/sym interpolated
x2); it never demodulates GMSK.  This module provides the same generator as
batched jnp synthesis: framed bits (preamble + coded header/payload) through
a Gaussian-filtered MSK modulator.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cognitive_radio_network_tpu.phy import crc as crc_mod
from cognitive_radio_network_tpu.phy import fec as fec_mod
from cognitive_radio_network_tpu.phy.bits import unpack_bits
from cognitive_radio_network_tpu.signal import filters
from cognitive_radio_network_tpu.signal.msequence import msequence_bytes

__all__ = ["gmsk_modulate", "gmsk_frame", "GMSK_HEADER_LEN", "GMSK_PAYLOAD_LEN"]

GMSK_HEADER_LEN = 8  # include/interferer.hpp:16
GMSK_PAYLOAD_LEN = 50  # include/interferer.hpp:15
_BT = 0.3
_PREAMBLE_BITS = 63  # m-sequence preamble for ramp-up/detection


def gmsk_modulate(bits: np.ndarray, sps: int = 4, bt: float = _BT) -> jnp.ndarray:
    """bits {0,1} -> complex64 GMSK at ``sps`` samples/bit.

    NRZ impulses -> Gaussian pulse filter -> phase integration at pi/2 per
    bit -> complex exponential (constant envelope).
    """
    bits = jnp.asarray(bits, jnp.float32)
    nrz = 2.0 * bits - 1.0
    up = jnp.zeros((bits.shape[0] * sps,), jnp.float32).at[::sps].set(nrz)
    g = jnp.asarray(filters.gaussian_taps(sps, 3, bt))
    freq = jnp.convolve(up, g, mode="same")
    phase = jnp.cumsum(freq) * (jnp.pi / 2.0)
    return jnp.exp(1j * phase).astype(jnp.complex64)


def gmsk_frame(
    rng: np.random.Generator,
    payload_len: int = GMSK_PAYLOAD_LEN,
    sps: int = 4,
    soft_gain_db: float = 0.0,
) -> jnp.ndarray:
    """One frame with random header/payload, CRC-16 + Hamming(7,4)
    (the reference's gmskCrcScheme/FecSchemeOuter, src/interferer.cpp:162-180).
    """
    header = rng.integers(0, 256, GMSK_HEADER_LEN).astype(np.uint8)
    payload = rng.integers(0, 256, payload_len).astype(np.uint8)
    body = np.concatenate([header, payload])
    coded = fec_mod.encode("h74", np.concatenate([body, crc_mod.crc_generate("crc16", body)]))
    pre = unpack_bits(msequence_bytes(_PREAMBLE_BITS // 8 + 1))[:_PREAMBLE_BITS]
    bits = np.concatenate([pre, unpack_bits(coded), np.zeros(6, np.uint8)])
    g = 10.0 ** (soft_gain_db / 20.0)
    return (g * gmsk_modulate(bits, sps)).astype(jnp.complex64)
