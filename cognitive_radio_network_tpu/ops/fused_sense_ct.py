"""Pallas TPU kernel: fused Cooley-Tukey sense chain, VMEM-resident.

The flagship-path successor to :mod:`.fused_sense`: the same contract
(IQ planes -> averaged spectrum + band-energy features, the sensing math of
CE_Predictive_Node.cpp:146-197) but with the DFT factored as N = 4 x 128
Cooley-Tukey, which cuts MXU flops/sample ~4x vs the dense (N, N) matmul:

    per tile (TILE_C cycles x A buffers), all in VMEM:
      radix-4 stage  : x[m1*128+n2] butterflies — twiddles are +-1/+-i,
                       pure VPU adds                       (stage 1)
      twiddle        : * W_512^(k1*n2), constant (4,128)    (stage 2, VPU)
      128-pt DFT     : per k1, four (rows,128)@(128,128)
                       real-split matmuls — full MXU tiles  (stage 3, MXU)
      magnitude      : sqrt(re^2+im^2)                      (VPU)
      average over A : mean across the buffer axis          (VPU)
      band reduce    : (TILE_C,128)@(128,128) per k1, rows
                       of the band matrix permuted to the
                       (k1,k2) bin order, accumulated       (MXU)
      square         : (sum |X|)^2 per band                 (VPU)

The pure-XLA ct_matmul mode (signal/fft.py) computes the same factorization
but materializes every stage in HBM (~6x the input traffic), which measures
SLOWER than the dense matmul; keeping the chain fused in VMEM makes HBM
traffic = input reads only.

Spectrum layout: the kernel writes the averaged spectrum k1-major
(bin (k1,k2) at column k1*128+k2); :func:`fused_sense_ct` de-permutes to
natural bin order outside the kernel (one cheap (C,4,128)->(C,128,4)
transpose on a tiny array).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cognitive_radio_network_tpu.signal import bands as bands_mod
from cognitive_radio_network_tpu.signal.fft import _ct_twiddles_np, _dft_matrices_np

__all__ = ["fused_sense_ct", "ct_band_features"]

_N1, _N2 = 4, 128
_N = _N1 * _N2  # 512


def _kernel(
    xr_ref,
    xi_ref,
    fre_ref,
    fim_ref,
    twr_ref,
    twi_ref,
    band_ref,
    avg_ref,
    feat_ref,
    *,
    averaging: int,
    tile_c: int,
    precision,
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
        # true f32 matmuls (Mosaic supports HIGHEST directly)
        def mm(a, b):
            return jax.lax.dot_general(
                a,
                b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

    elif precision == "high":
        # bf16_3x: Mosaic has no Precision.HIGH — decompose manually into
        # hi/lo bf16 halves, a@b ~= ah@bh + (ah@bl + al@bh), f32 accumulate
        def mm(a, b):
            ah, al = split(a)
            bh, bl = split(b)
            return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))

    else:  # "default": single bf16 pass
        def mm(a, b):
            return dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))

    fre = fre_ref[...]
    fim = fim_ref[...]
    # factor slices x[m1*128 + n2]: static lane slices of the (rows, 512)
    # tile, upcast so bf16 IQ inputs (the half-bandwidth ingest option —
    # an SDR front-end's 8-14-bit ADC fits in bf16's 8-bit mantissa) go
    # through the radix/twiddle stages in f32
    xr = [
        xr_ref[:, m * _N2 : (m + 1) * _N2].astype(jnp.float32)
        for m in range(_N1)
    ]
    xi = [
        xi_ref[:, m * _N2 : (m + 1) * _N2].astype(jnp.float32)
        for m in range(_N1)
    ]
    # radix-4 butterflies (adds only; W_4 in {1, -i, -1, +i})
    a_r, a_i = xr[0] + xr[2], xi[0] + xi[2]
    b_r, b_i = xr[0] - xr[2], xi[0] - xi[2]
    c_r, c_i = xr[1] + xr[3], xi[1] + xi[3]
    d_r, d_i = xr[1] - xr[3], xi[1] - xi[3]
    y = (
        (a_r + c_r, a_i + c_i),  # k1 = 0
        (b_r + d_i, b_i - d_r),  # k1 = 1: b - i d
        (a_r - c_r, a_i - c_i),  # k1 = 2
        (b_r - d_i, b_i + d_r),  # k1 = 3: b + i d
    )
    feats = jnp.zeros((tile_c, _N2), jnp.float32)
    for k1 in range(_N1):
        twr = twr_ref[k1 : k1 + 1, :]  # (1, 128) broadcast over rows
        twi = twi_ref[k1 : k1 + 1, :]
        yr, yi = y[k1]
        zr = yr * twr - yi * twi
        zi = yr * twi + yi * twr
        xre = mm(zr, fre) - mm(zi, fim)
        xim = mm(zr, fim) + mm(zi, fre)
        mag = jnp.sqrt(xre * xre + xim * xim)  # (rows, 128)
        avg = jnp.mean(mag.reshape(tile_c, averaging, _N2), axis=1)
        avg_ref[:, k1 * _N2 : (k1 + 1) * _N2] = avg
        feats = feats + mm(avg, band_ref[k1 * _N2 : (k1 + 1) * _N2, :])
    feat_ref[...] = feats * feats  # power = (sum |X|)^2, CE_Predictive_Node.cpp:193-197


@functools.lru_cache(maxsize=8)
def _band_permuted(bands: bands_mod.SensingBands) -> np.ndarray:
    """Band matrix rows reordered to the kernel's (k1, k2) bin layout:
    out[k1*128 + k2, :] = band[k1 + 4*k2, :], padded to 128 columns."""
    nat = bands_mod._band_matrix_np(bands)  # (512, 4)
    perm = np.zeros((_N, _N2), np.float32)
    for k1 in range(_N1):
        for k2 in range(_N2):
            perm[k1 * _N2 + k2, :4] = nat[k1 + _N1 * k2]
    return perm


def fused_sense_ct(
    iq,
    *,
    averaging: int = 10,
    bands: bands_mod.SensingBands = bands_mod.DEFAULT_BANDS,
    tile_c: int = 32,
    precision: str = "high",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """IQ for C cycles -> (avg_spectrum (C, 512), features (C, 4)).

    ``iq``: planar tuple (xr, xi), each **buffers-flat 2D** (C*A, 512) —
    the fast path: 2D keeps the averaging grouping logical, so no physical
    relayout happens anywhere (a (C, A, 512) array is tile-padded A=10->16
    on TPU and reshaping it to 2D is a real repack costing ~as much as the
    kernel).  Also accepted with a conversion cost: planar 3D (C, A, 512)
    (one repack) and interleaved planes (C, A, 512, 2) (strided
    de-interleave; convert on ingest instead, see signal/iq.py).
    Same numerical contract as averaged_magnitude_spectrum + band_features.
    C is padded up to a multiple of ``tile_c`` internally.
    """
    a = averaging
    if isinstance(iq, (tuple, list)):
        # keep bf16 planar inputs as-is (half the HBM read traffic; the
        # kernel upcasts after the VMEM load) — anything else becomes f32
        xr, xi = (
            jnp.asarray(v)
            if getattr(v, "dtype", None) == jnp.bfloat16
            else jnp.asarray(v, jnp.float32)
            for v in iq
        )
        if xr.ndim == 3:
            a = xr.shape[1]
            xr = xr.reshape(-1, xr.shape[-1])
            xi = xi.reshape(-1, xi.shape[-1])
    else:
        c3, a, n3, _ = iq.shape
        xr = iq[..., 0].astype(jnp.float32).reshape(c3 * a, n3)
        xi = iq[..., 1].astype(jnp.float32).reshape(c3 * a, n3)
    rows_total, n = xr.shape
    if n != _N:
        raise ValueError(f"fused_sense_ct requires N={_N}, got {n}")
    if rows_total % a:
        raise ValueError(f"rows {rows_total} not divisible by averaging {a}")
    c = rows_total // a
    pad = (-c) % tile_c
    if pad:
        z = jnp.zeros((pad * a, n), xr.dtype)
        xr = jnp.concatenate([xr, z], axis=0)
        xi = jnp.concatenate([xi, z], axis=0)
    cp = c + pad
    fre, fim = _dft_matrices_np(_N2)
    twr, twi = _ct_twiddles_np(_N1, _N2)
    # pad twiddles (4,128) -> (8,128) to the f32 sublane tile
    twr8 = np.zeros((8, _N2), np.float32)
    twi8 = np.zeros((8, _N2), np.float32)
    twr8[:_N1] = twr
    twi8[:_N1] = twi
    band = _band_permuted(bands)

    rows = tile_c * a

    avg_perm, feats = pl.pallas_call(
        functools.partial(
            _kernel,
            averaging=a,
            tile_c=tile_c,
            precision=precision,
        ),
        grid=(cp // tile_c,),
        in_specs=[
            pl.BlockSpec((rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_N2, _N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_N2, _N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_N, _N2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_c, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, _N2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cp, n), jnp.float32),
            jax.ShapeDtypeStruct((cp, _N2), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            # stage-3 dominates: 16 (rows,128)@(128,128) matmuls per tile
            flops=32 * cp * a * _N2 * _N2,
            bytes_accessed=cp * a * n * 8 + cp * n * 4,
            transcendentals=cp * a * n,  # sqrt
        ),
        interpret=interpret,
    )(xr, xi, jnp.asarray(fre), jnp.asarray(fim), jnp.asarray(twr8), jnp.asarray(twi8), jnp.asarray(band))
    # de-permute spectrum to natural bin order: k = k1 + 4*k2
    avg = (
        avg_perm[:c]
        .reshape(c, _N1, _N2)
        .transpose(0, 2, 1)
        .reshape(c, n)
    )
    return avg, feats[:c, :4]


def ct_band_features(iq_planes: jax.Array, **kw) -> jax.Array:
    """Features only (drop-in for fused_sense.fused_band_features)."""
    return fused_sense_ct(iq_planes, **kw)[1]
