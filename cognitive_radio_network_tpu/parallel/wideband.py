"""Wideband sharded sense pipeline: 64-channel channelizer -> energy detect.

BASELINE.json config 5: "64-channel polyphase channelizer, channels +
time-blocks sharded across hosts with overlap-save halo exchange".  The
pipeline, as one pjit-ed graph over a ('time', 'channel'[, 'data']) mesh:

    wide IQ planes (T*M, 2), time-sharded
      -> sharded polyphase channelizer (ppermute halo)     [halo.py]
      -> per-channel per-cycle energy (VPU reductions), resharded so the
         channel axis lies on the 'channel' mesh axis (XLA all_to_all)
      -> global noise-floor estimate across channels (psum via jnp.mean)
      -> per-channel occupancy decisions (energy detector), plus per-channel
         feature rows for the shared-weight MLP classifier

The cross-shard communication is exactly: the (P-1)-row FIR halo over ICI
neighbors, one all-to-all at the time->channel reshard, and one psum for the
noise floor — laid out so all of it rides ICI, per the scaling-book recipe.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cognitive_radio_network_tpu.parallel.halo import sharded_channelize
from cognitive_radio_network_tpu.signal.channelizer import polyphase_taps
from cognitive_radio_network_tpu.signal.iq import planes_abs2

__all__ = [
    "WidebandConfig",
    "wideband_sense",
    "wideband_energy_packed",
    "sharded_wideband_energy_packed",
    "make_wideband_fn",
]


@dataclasses.dataclass(frozen=True)
class WidebandConfig:
    num_channels: int = 64
    taps_per_channel: int = 8
    block_len: int = 128  # per-channel samples per sense cycle
    threshold_ratio: float = 4.0  # occupancy if energy > ratio * noise floor
    # matmul precision for the fused FIR+DFT channelizer: "highest" (f32),
    # "high" (bf16_3x, default), "default" (bf16 single pass, fastest)
    precision: str = "high"

    def taps(self) -> np.ndarray:
        return polyphase_taps(self.num_channels, self.taps_per_channel)


def wideband_sense(
    planes: jax.Array,
    taps: jax.Array,
    mesh: Mesh,
    cfg: WidebandConfig,
    *,
    batch_axis: str | None = None,
):
    """planes: (T*M, 2) or (B, T*M, 2) wide IQ at rate M * per-channel rate.

    Returns dict:
      energy   (..., C, M)  per-cycle per-channel mean power
      noise    (..., C, 1)  cross-channel noise-floor estimate
      occupied (..., C, M)  boolean energy-detector decisions
    with C = T / block_len sense cycles.
    """
    m = cfg.num_channels
    chan = sharded_channelize(
        planes, taps, mesh, batch_axis=batch_axis, precision=cfg.precision
    )  # (..., T, M, 2)
    has_channel = "channel" in mesh.axis_names
    t_axis = "time" if "time" in mesh.axis_names else None

    power = planes_abs2(chan)  # (..., T, M)
    cyc = power.reshape(*power.shape[:-2], -1, cfg.block_len, m)
    energy = jnp.mean(cyc, axis=-2)  # (..., C, M)

    if has_channel:
        spec = (
            P(batch_axis, t_axis, "channel")
            if batch_axis
            else P(t_axis, "channel")
        )
        energy = jax.lax.with_sharding_constraint(
            energy, NamedSharding(mesh, spec)
        )

    # Noise floor: mean of the quietest half of the channels (median-ish but
    # collective-friendly: one global sort-free estimate via mean/min mix).
    mean_e = jnp.mean(energy, axis=-1, keepdims=True)
    min_e = jnp.min(energy, axis=-1, keepdims=True)
    noise = 0.5 * (min_e + jnp.minimum(mean_e, 2.0 * min_e))
    occupied = energy > cfg.threshold_ratio * noise
    return {"energy": energy, "noise": noise, "occupied": occupied}


def wideband_energy_packed(
    xr: jax.Array,
    xi: jax.Array,
    taps: jax.Array,
    cfg: WidebandConfig,
    *,
    precision: str = "high",
) -> jax.Array:
    """Single-chip fast path: planar wide stream -> per-cycle channel energy.

    Fully lane-packed formulation — the wide stream reshapes to rows of
    512 samples (8 output times each for M=64), frame windows are lane
    slices of a row-pair concat, and the FIR+DFT is the combined matrix G
    of signal/channelizer.py.  No (T, 64) half-empty-lane arrays anywhere:
    ~2x the throughput of channelize-then-reduce.  Energy only (the
    channelized IQ itself is never materialized); use sharded_channelize
    when per-channel streams are needed.

    xr/xi: (T*M,) float32.  Returns (C, M) with C = T / block_len.
    Requires M * P = 512-wide windows divisible into 512-lane rows (the
    default M=64, P=8) and T divisible by 8 * block_len.
    """
    from cognitive_radio_network_tpu.signal.channelizer import (
        _PRECISIONS,
        _fir_dft_matrices,
    )

    m, p = cfg.num_channels, cfg.taps_per_channel
    win = m * p
    times_per_row = win // m  # 8
    if win != 512:
        raise ValueError(f"packed path requires M*P=512, got {win}")
    t_total = xr.shape[0] // m
    r = t_total // times_per_row
    if cfg.block_len % times_per_row or t_total % cfg.block_len:
        raise ValueError(
            f"block_len must be a multiple of {times_per_row} and "
            f"T={t_total} a multiple of block_len"
        )
    prec = _PRECISIONS[precision]
    gre, gim = _fir_dft_matrices(taps)

    rows_r = xr.reshape(r, win)
    rows_i = xi.reshape(r, win)
    zpad = jnp.zeros((1, win), jnp.float32)
    x2r = jnp.concatenate(
        [jnp.concatenate([zpad, rows_r[:-1]], axis=0), rows_r], axis=1
    )
    x2i = jnp.concatenate(
        [jnp.concatenate([zpad, rows_i[:-1]], axis=0), rows_i], axis=1
    )

    def mm(a, b):
        return jnp.matmul(a, b, precision=prec, preferred_element_type=jnp.float32)

    power = jnp.zeros((r, m), jnp.float32)
    for k in range(times_per_row):
        s = m * (k + 1)
        wr = jax.lax.slice(x2r, (0, s), (r, s + win))
        wi = jax.lax.slice(x2i, (0, s), (r, s + win))
        yre = mm(wr, gre) - mm(wi, gim)
        yim = mm(wr, gim) + mm(wi, gre)
        power = power + (yre * yre + yim * yim)
    power = power / times_per_row  # mean over the row's 8 output times
    rows_per_cycle = cfg.block_len // times_per_row
    return power.reshape(r // rows_per_cycle, rows_per_cycle, m).mean(axis=1)


def sharded_wideband_energy_packed(
    xr: jax.Array,
    xi: jax.Array,
    mesh: Mesh,
    cfg: WidebandConfig,
    *,
    time_axis: str = "time",
    precision: str = "high",
) -> jax.Array:
    """Time-sharded lane-packed energy detector (BASELINE config 5 on the
    fast path): each shard runs :func:`wideband_energy_packed` on its
    segment, with the cross-shard FIR state — exactly ONE packed row
    (512 wide samples >= the P-1 phase-row history) — flowing between ring
    neighbors via the same ppermute halo as sharded_channelize.

    xr/xi: (T*M,) planar wide stream, sharded over ``time_axis``.
    Returns (C, M) energies with the cycle axis sharded the same way.
    """
    from cognitive_radio_network_tpu.parallel.halo import halo_exchange
    from cognitive_radio_network_tpu.signal.channelizer import (
        _PRECISIONS,
        _fir_dft_matrices,
    )

    m = cfg.num_channels
    win = m * cfg.taps_per_channel
    times_per_row = win // m
    prec = _PRECISIONS[precision]
    taps = jnp.asarray(cfg.taps())
    gre, gim = _fir_dft_matrices(taps)

    def local(xr_l, xi_l):
        r = xr_l.shape[0] // win
        rows_r = xr_l.reshape(r, win)
        rows_i = xi_l.reshape(r, win)
        # halo: previous shard's LAST packed row seeds this shard's first
        ext_r = halo_exchange(rows_r, 1, time_axis, axis=0)  # (r+1, win)
        ext_i = halo_exchange(rows_i, 1, time_axis, axis=0)
        x2r = jnp.concatenate([ext_r[:-1], rows_r], axis=1)  # (r, 2*win)
        x2i = jnp.concatenate([ext_i[:-1], rows_i], axis=1)

        def mm(a, b):
            return jnp.matmul(
                a, b, precision=prec, preferred_element_type=jnp.float32
            )

        power = jnp.zeros((r, m), jnp.float32)
        for k in range(times_per_row):
            s = m * (k + 1)
            wr = jax.lax.slice(x2r, (0, s), (r, s + win))
            wi = jax.lax.slice(x2i, (0, s), (r, s + win))
            yre = mm(wr, gre) - mm(wi, gim)
            yim = mm(wr, gim) + mm(wi, gre)
            power = power + (yre * yre + yim * yim)
        power = power / times_per_row
        rows_per_cycle = cfg.block_len // times_per_row
        return power.reshape(r // rows_per_cycle, rows_per_cycle, m).mean(axis=1)

    from jax import shard_map

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(time_axis), P(time_axis)),
        out_specs=P(time_axis),
        check_vma=False,
    )(xr, xi)


def make_wideband_fn(mesh: Mesh, cfg: WidebandConfig, *, batch_axis: str | None = None):
    """Jitted wideband pipeline with input shardings bound to the mesh."""
    taps = jnp.asarray(cfg.taps())

    @functools.partial(jax.jit)
    def fn(planes):
        return wideband_sense(planes, taps, mesh, cfg, batch_axis=batch_axis)

    return fn
