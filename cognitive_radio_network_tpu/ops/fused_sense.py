"""Pallas TPU kernel: fused DFT -> magnitude -> average -> band energies.

The HBM-bandwidth-critical stage of the sense pipeline.  The pure-XLA path
(signal/fft.py + signal/bands.py) materializes the (B, N) spectra in HBM
between ops; this kernel keeps everything resident in VMEM per tile:

    HBM: IQ planes tile (TILE_C * A, N, 2)
      -> VMEM: 4 MXU matmuls against the DFT matrices (in VMEM, ~2 MB)
      -> VPU: magnitude, average over A
      -> MXU: band-indicator matmul (N x 128, 4 used columns)
      -> HBM: features tile (TILE_C, 128)

Tiling: second-to-last dims padded to the f32 (8, 128) tile grid; the band
matrix is padded N x 128 so the tiny 4-column reduction still maps onto the
MXU.  Per-tile VMEM: DFT 2 MB + tile IO ~ (TILE_C*A*N)*12 B; TILE_C=16, A=10
-> ~3.2 MB total, well under the ~16 MB budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cognitive_radio_network_tpu.signal import bands as bands_mod
from cognitive_radio_network_tpu.signal.fft import _dft_matrices_np

__all__ = ["fused_band_features"]


def _kernel(xr_ref, xi_ref, fre_ref, fim_ref, band_ref, out_ref, *, averaging: int):
    # NOTE: I and Q are separate (rows, N) inputs — a trailing (..., 2) plane
    # axis would be lane-padded 2 -> 128 on TPU and blow up VMEM 64x.
    xr = xr_ref[...]
    xi = xi_ref[...]
    rows, n = xr.shape
    fre = fre_ref[...]
    fim = fim_ref[...]

    def mm(a, b):
        return jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    xre = mm(xr, fre) - mm(xi, fim)
    xim = mm(xr, fim) + mm(xi, fre)
    mag = jnp.sqrt(xre * xre + xim * xim)  # (rows, N)
    avg = jnp.mean(mag.reshape(rows // averaging, averaging, n), axis=1)
    sums = mm(avg, band_ref[...])  # (TILE_C, 128)
    out_ref[...] = sums * sums


@functools.lru_cache(maxsize=8)
def _band_padded(bands: bands_mod.SensingBands) -> np.ndarray:
    m = np.zeros((bands.fft_length, 128), np.float32)
    m[:, :4] = bands_mod._band_matrix_np(bands)  # pure numpy: jit-trace safe
    return m


def fused_band_features(
    iq_planes: jax.Array,
    *,
    averaging: int = 10,
    bands: bands_mod.SensingBands = bands_mod.DEFAULT_BANDS,
    tile_c: int = 16,
) -> jax.Array:
    """(C, A, N, 2) float32 IQ planes -> (C, 4) band-energy features.

    Drop-in replacement for averaged_magnitude_spectrum + band_features
    (same numerical contract, f32-HIGHEST matmuls). C must be a multiple of
    ``tile_c`` (the pipeline pads its cycle batch accordingly).
    """
    c, a, n, _ = iq_planes.shape
    if c % tile_c:
        raise ValueError(f"cycles {c} not a multiple of tile_c {tile_c}")
    fre, fim = _dft_matrices_np(n)
    band = _band_padded(bands)

    flat = iq_planes.reshape(c * a, n, 2).astype(jnp.float32)
    xr = flat[..., 0]
    xi = flat[..., 1]

    grid = (c // tile_c,)
    out = pl.pallas_call(
        functools.partial(_kernel, averaging=a),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_c * a, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c * a, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_c, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * c * a * n * n + 2 * c * n * 128,
            bytes_accessed=c * a * n * 8 + 2 * n * n * 4 + c * 128 * 4,
            transcendentals=c * a * n,  # sqrt
        ),
    )(xr, xi, jnp.asarray(fre), jnp.asarray(fim), jnp.asarray(band))
    return out[:, :4]
