"""Pallas TPU kernel: fused 64-channel wideband energy detector.

The VMEM-resident successor to parallel/wideband.py::wideband_energy_packed
(BASELINE.json config 5's per-chip building block) — same numerical contract
(polyphase channelizer -> per-cycle per-channel energy, the 64-channel
generalisation of the reference's joint 3-channel sensing,
CE_Predictive_Node.cpp:146-197) but with the FIR, DFT, magnitude and block
mean fused into ONE kernel so HBM traffic is input reads only.  The pure-XLA
path materializes the FIR output and the DFT output in HBM and pays relayout
copies for every sublane-shifted FIR read; this kernel measures ~5-7x faster
at streaming block sizes.

Layout: the flat planar stream (T*M,) reshapes FREE (row-major) to
``pair rows`` (T/2, 2M): row q = [phases of output time 2q | time 2q+1].
All 128 lanes carry payload (an (T, 64) layout would halve lane utilisation
and the reshape to it is a real repack — see CLAUDE.md).  Per tile of
TQ rows, all in VMEM:

    FIR     : v[t, c] = sum_d h[d, c] x[t-d, c] becomes 9 shifted VPU
              multiply-adds — 4 on the tile itself (even delays: source and
              output lie in the same lane half) and 5 on its 64-lane
              rotation (odd delays swap halves; one pltpu.roll).  The
              4-row halo comes from the previous tile via a second
              BlockSpec on the same operand.
    DFT     : one (TQ, 4M) @ (4M, 4M) matmul — [vr | vi] lane-concat times
              the constant [[D, E], [-E, D]] block matrix with
              D = blkdiag(Wre, Wre), E = blkdiag(Wim, Wim): the complex
              M-point DFT of both packed times in one full-width MXU pass.
    energy  : |y|^2, mean over block_len times, lane-half fold   (VPU)

Precision ladder for the DFT matmul as in ops/fused_sense_ct.py: "highest"
(direct f32), "high" (manual bf16_3x — Mosaic has no Precision.HIGH),
"default" (single bf16 pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["wideband_energy_fused"]

_M = 64  # channels; the lane pairing below hardcodes 2*M = 128 lanes
_P = 8  # taps per channel (delays 0..7 -> 4-row halo in pair layout)
_HALO = 8  # halo block rows (f32 sublane tile); only the last 4 are used


def _coeff_rows(taps: np.ndarray) -> np.ndarray:
    """(16, 2M) constant: rows 0..3 = same-half coefficients for tile
    shifts k=0..3 (delay d=2k, both lane halves), rows 8..12 = swapped-half
    coefficients for rotated-tile shifts k=0..4 (delays 2k-1 into half 0,
    2k+1 into half 1)."""
    p, m = taps.shape
    assert (p, m) == (_P, _M)
    c = np.zeros((16, 2 * _M), np.float32)
    for k in range(4):  # even delays d = 2k
        c[k, :_M] = taps[2 * k]
        c[k, _M:] = taps[2 * k]
    for k in range(5):  # odd delays via the lane-swapped tile
        if 1 <= k:  # d = 2k - 1 feeds output half 0
            c[8 + k, :_M] = taps[2 * k - 1]
        if k <= 3:  # d = 2k + 1 feeds output half 1
            c[8 + k, _M:] = taps[2 * k + 1]
    return c


def _dft_pair_matrix() -> np.ndarray:
    """(4M, 4M) real matrix: [yr(2 times) | yi(2 times)] =
    [vr(2 times) | vi(2 times)] @ [[D, E], [-E, D]] with
    D = blkdiag(Wre, Wre), E = blkdiag(Wim, Wim)."""
    m = _M
    ang = -2.0 * np.pi * np.outer(np.arange(m), np.arange(m)) / m
    wre = np.cos(ang).astype(np.float32)
    wim = np.sin(ang).astype(np.float32)
    d = np.zeros((2 * m, 2 * m), np.float32)
    e = np.zeros((2 * m, 2 * m), np.float32)
    d[:m, :m] = wre
    d[m:, m:] = wre
    e[:m, :m] = wim
    e[m:, m:] = wim
    top = np.concatenate([d, e], axis=1)
    bot = np.concatenate([-e, d], axis=1)
    return np.concatenate([top, bot], axis=0)


def _kernel(
    xr_ref,
    xi_ref,
    hr_ref,
    hi_ref,
    init_r_ref,
    init_i_ref,
    coef_ref,
    dft_ref,
    out_ref,
    *,
    tile_q: int,
    rows_per_cycle: int,
    precision: str,
):
    def dot(a, b):
        return jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    def split(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    if precision == "highest":

        def mm(a, b):
            return jax.lax.dot_general(
                a,
                b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

    elif precision == "high":
        # bf16_3x (Mosaic has no Precision.HIGH): b is an exact constant
        # in bf16 terms only approximately — split both operands
        def mm(a, b):
            ah, al = split(a)
            bh, bl = split(b)
            return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))

    else:  # "default"

        def mm(a, b):
            return dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))

    first = pl.program_id(0) == 0
    # Stream start: tile 0's halo comes from the caller-provided initial
    # history (the previous SHARD's tail in the sharded pipeline; zeros for
    # an FIR starting from rest) instead of the clamped in-stream halo.
    hscale = jnp.where(first, 0.0, 1.0).astype(jnp.float32)

    def fir(x_ref, h_ref, init_ref):
        head = (
            h_ref[_HALO - 4 :, :] * hscale
            + init_ref[_HALO - 4 :, :] * (1.0 - hscale)
        )
        x2 = jnp.concatenate([head, x_ref[...]], axis=0)  # (TQ + 4, 2M)
        xs = pltpu.roll(x2, _M, 1)  # lane-half swap (odd delays)
        v = coef_ref[0:1, :] * x2[4 : 4 + tile_q, :]
        for k in range(1, 4):
            v = v + coef_ref[k : k + 1, :] * x2[4 - k : 4 - k + tile_q, :]
        for k in range(5):
            v = v + coef_ref[8 + k : 9 + k, :] * xs[4 - k : 4 - k + tile_q, :]
        return v

    vr = fir(xr_ref, hr_ref, init_r_ref)
    vi = fir(xi_ref, hi_ref, init_i_ref)
    y = mm(jnp.concatenate([vr, vi], axis=1), dft_ref[...])  # (TQ, 4M)
    e2 = y[:, : 2 * _M] ** 2 + y[:, 2 * _M :] ** 2  # (TQ, 2M)
    em = jnp.mean(
        e2.reshape(tile_q // rows_per_cycle, rows_per_cycle, 2 * _M), axis=1
    )
    out_ref[...] = 0.5 * (em[:, :_M] + em[:, _M:])


def wideband_energy_fused(
    xr: jax.Array,
    xi: jax.Array,
    taps: jax.Array | np.ndarray,
    cfg,
    *,
    precision: str = "high",
    tile_q: int = 2048,
    interpret: bool = False,
    initial_history: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """xr/xi: (T*M,) float32 planar wide stream -> (C, M) per-cycle channel
    energies, C = T / cfg.block_len.  Numerically matches
    parallel/wideband.py::wideband_energy_packed (same taps, same DFT).

    Requires M=64, P=8, even block_len with (block_len/2) | tile_q, and
    T*M divisible by 2*M*tile_q (pad the stream outside if needed — padding
    here would cost a full HBM copy).

    ``initial_history``: optional (hist_r, hist_i), each (4, 2M) float32 —
    the 4 pair rows (8 wide sample times) immediately preceding this stream,
    seeding the FIR instead of rest-from-zero.  This is the cross-SHARD
    overlap-save state in the sharded pipeline
    (parallel/wideband.py::sharded_wideband_energy_fused).
    """
    m, p = cfg.num_channels, cfg.taps_per_channel
    if (m, p) != (_M, _P):
        raise ValueError(f"fused path requires M=64, P=8, got {(m, p)}")
    rows_per_cycle = cfg.block_len // 2
    if cfg.block_len % 2 or tile_q % rows_per_cycle:
        raise ValueError("block_len must be even and block_len/2 | tile_q")
    q_total = xr.shape[0] // (2 * m)
    if q_total % tile_q:
        raise ValueError(
            f"T*M = {xr.shape[0]} must divide into (2M x tile_q) tiles"
        )
    xr2 = xr.reshape(q_total, 2 * m)  # free: row-major pair rows
    xi2 = xi.reshape(q_total, 2 * m)
    if initial_history is None:
        init_r = jnp.zeros((_HALO, 2 * m), jnp.float32)
        init_i = init_r
    else:
        hist_r, hist_i = initial_history
        if hist_r.shape != (4, 2 * m):
            raise ValueError(f"initial_history rows must be (4, {2 * m})")
        pad = jnp.zeros((_HALO - 4, 2 * m), jnp.float32)
        init_r = jnp.concatenate([pad, hist_r.astype(jnp.float32)])
        init_i = jnp.concatenate([pad, hist_i.astype(jnp.float32)])
    coef = jnp.asarray(_coeff_rows(np.asarray(taps, np.float32)))
    dft = jnp.asarray(_dft_pair_matrix())
    cyc_per_tile = tile_q // rows_per_cycle
    n_tiles = q_total // tile_q

    grid_rows = lambda i: (i, 0)
    # Halo: the previous tile's last rows — same operand, second BlockSpec
    # one 8-row block back (clamped at the stream start; tile 0 zeroes it).
    halo_idx = lambda i: (jnp.maximum(i * (tile_q // _HALO) - 1, 0), 0)

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            tile_q=tile_q,
            rows_per_cycle=rows_per_cycle,
            precision=precision,
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_q, 2 * m), grid_rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 2 * m), grid_rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((_HALO, 2 * m), halo_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((_HALO, 2 * m), halo_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((_HALO, 2 * m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_HALO, 2 * m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 2 * m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (4 * m, 4 * m), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (cyc_per_tile, m), grid_rows, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * cyc_per_tile, m), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q_total * (4 * m) * (4 * m),
            bytes_accessed=q_total * 2 * m * 8 + n_tiles * cyc_per_tile * m * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xr2, xi2, xr2, xi2, init_r, init_i, coef, dft)
    return out
