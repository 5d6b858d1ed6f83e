"""Bit/byte packing helpers (MSB-first), host numpy and jnp variants."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["unpack_bits", "pack_bits", "unpack_bits_jnp", "pack_bits_jnp"]


def unpack_bits(data: np.ndarray) -> np.ndarray:
    """uint8 bytes (...,) -> bits (..., 8*n) MSB-first."""
    return np.unpackbits(np.asarray(data, np.uint8), axis=-1)


def pack_bits(bits: np.ndarray) -> np.ndarray:
    return np.packbits(np.asarray(bits, np.uint8), axis=-1)


def unpack_bits_jnp(data, axis: int = -1):
    """uint8 bytes -> bits along a new trailing expansion of ``axis``."""
    data = jnp.asarray(data, jnp.uint8)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (data[..., None] >> shifts) & 1
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def pack_bits_jnp(bits):
    bits = jnp.asarray(bits, jnp.uint8)
    n = bits.shape[-1] // 8
    b = bits[..., : n * 8].reshape(*bits.shape[:-1], n, 8)
    weights = (1 << jnp.arange(7, -1, -1, dtype=jnp.uint32)).astype(jnp.uint32)
    return jnp.sum(b.astype(jnp.uint32) * weights, axis=-1).astype(jnp.uint8)
