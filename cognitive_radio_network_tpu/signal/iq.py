"""Canonical IQ representations.

The framework's on-device IQ format is **float32 I/Q planes**: shape
``(..., N, 2)`` with the last axis = [I, Q].  Rationale (TPU-first):

* TPUs have no complex ALU — XLA decomposes complex math into real pairs
  anyway; planes make the layout explicit and keep the lane dimension real;
* it unlocks reduced-precision storage (bf16 IQ) and clean Pallas tiling;
* complex64 arrays at jit boundaries are a portability hazard (some PJRT
  backends — including the tunneled TPU used in CI here — cannot transfer
  complex buffers device<->host).

Complex arrays remain accepted at every public entry point for convenience
(tests, CPU analysis); ``split_iq`` normalizes either form to an (I, Q) pair.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["split_iq", "to_planes", "from_planes", "planes_abs2"]


def split_iq(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Normalize complex (..., N) or planes (..., N, 2) to (re, im) each (..., N)."""
    if jnp.iscomplexobj(x):
        return jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32)
    if x.shape[-1] == 2:
        return x[..., 0].astype(jnp.float32), x[..., 1].astype(jnp.float32)
    raise ValueError(
        f"IQ input must be complex or (..., 2) planes; got {x.dtype} {x.shape}"
    )


def to_planes(x) -> jax.Array:
    """Complex array (host or device) -> float32 planes (..., 2)."""
    if isinstance(x, np.ndarray):
        return np.stack([x.real, x.imag], axis=-1).astype(np.float32)
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1).astype(jnp.float32)


def from_planes(x):
    """Planes (..., 2) -> complex64 (host numpy in, numpy out)."""
    if isinstance(x, np.ndarray):
        return (x[..., 0] + 1j * x[..., 1]).astype(np.complex64)
    return (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)


def planes_abs2(x: jax.Array) -> jax.Array:
    """|z|^2 for planes input (..., N, 2) -> (..., N)."""
    return x[..., 0] * x[..., 0] + x[..., 1] * x[..., 1]
