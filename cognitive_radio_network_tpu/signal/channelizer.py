"""Critically-sampled polyphase analysis channelizer.

The wideband scale-out primitive (BASELINE.json config 5): splits one wide IQ
stream into M equal channels via an M-phase FIR filterbank + length-M IDFT.
There is no equivalent in the reference (its 3 channels are sensed jointly in
one 512-pt FFT); this is the new-design component that makes 64-channel
wideband sensing shardable.

Math (standard PFB analysis, commutator form):
    xp[t, c] = x[t*M + c]                       (phase decomposition)
    v[t, c]  = sum_p h[p, c] * xp[t-p, c]       (per-phase FIR, taps (P, M))
    y[t, k]  = sum_c v[t, c] e^{-2 pi i c k/M}  (= fft(v[t]))
so channel k is x mixed down from center frequency +k/M * fs and decimated
by M through the prototype low-pass (unit passband gain: a unit tone at a
channel center produces a unit-amplitude channel output).

TPU mapping: the per-phase FIR is an einsum over P stacked shifts (VPU), the
IDFT across phases is one (T, M) @ (M, M) matmul (MXU) — both batched over
the whole block.  The only cross-block state is the last P-1 phase rows,
which is exactly what :func:`parallel.halo.halo_exchange` passes between
time shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cognitive_radio_network_tpu.signal import filters

__all__ = ["polyphase_taps", "channelize", "channelize_planes"]


def polyphase_taps(num_channels: int, taps_per_channel: int = 8) -> np.ndarray:
    """(P, M) float32 phase-decomposed prototype low-pass."""
    proto = filters.channelizer_prototype(num_channels, taps_per_channel)
    return proto.reshape(taps_per_channel, num_channels)


def _fir_phases(xp: jax.Array, taps: jax.Array) -> jax.Array:
    """Per-phase causal FIR along t: xp (T, M) [+ leading batch dims], taps (P, M)."""
    p = taps.shape[0]
    shifted = jnp.stack(
        [jnp.roll(xp, i, axis=-2) for i in range(p)], axis=0
    )  # (P, ..., T, M); roll wraps — mask the head
    t_idx = jnp.arange(xp.shape[-2])
    mask = (t_idx[None, :] >= jnp.arange(p)[:, None]).astype(xp.dtype)  # (P, T)
    mask = mask.reshape(p, *([1] * (xp.ndim - 2)), xp.shape[-2], 1)
    shifted = shifted * mask
    return jnp.einsum("pc,p...tc->...tc", taps.astype(xp.dtype), shifted)


def channelize(
    x: jax.Array, taps: jax.Array, *, history: jax.Array | None = None
) -> jax.Array:
    """x: complex (..., T*M) wide stream -> (..., T, M) per-channel streams.

    ``history``: optional (..., P-1, M) phase rows from the previous block
    (overlap-save carry); if given, the FIR is seeded with them so block
    boundaries are seamless — this is the argument the halo exchange fills.
    """
    p, m = taps.shape
    xp = x.reshape(*x.shape[:-1], -1, m)
    if history is not None:
        xp_full = jnp.concatenate([history, xp], axis=-2)
        v = _fir_phases(xp_full, taps)[..., p - 1 :, :]
    else:
        v = _fir_phases(xp, taps)
    return jnp.fft.fft(v, axis=-1)


def channelize_planes(
    planes: jax.Array, taps: jax.Array, *, history: jax.Array | None = None
) -> jax.Array:
    """Planes variant: (..., T*M, 2) -> (..., T, M, 2). Complex only inside."""
    x = planes[..., 0] + 1j * planes[..., 1]
    h = None if history is None else history[..., 0] + 1j * history[..., 1]
    y = channelize(x, taps, history=h)
    return jnp.stack([jnp.real(y), jnp.imag(y)], axis=-1).astype(jnp.float32)
