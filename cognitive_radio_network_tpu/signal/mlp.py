"""The 4-5-3 sigmoid occupancy MLP.

The reference hard-codes trained weights in source (CE_Predictive_Node.cpp:78-120;
"Error = 0.000100 after 63.145737 Milion Epoch") and runs the forward pass as
scalar loops with 1-based indexing where row 0 of each weight table is the
bias (CE_Predictive_Node.cpp:214-235).  Here the same network is a pair of
batched matmuls, and the reference weights ship as a loadable fixture.

Weight layout mapping (reference -> here):
  w1[i-1, j-1] = WeightIH[i][j]   (i=1..4 inputs, j=1..5 hidden)
  b1[j-1]      = WeightIH[0][j]
  w2[j-1, k-1] = WeightHO[j][k]   (j=1..5 hidden, k=1..3 outputs)
  b2[k-1]      = WeightHO[0][k]
Input order: [noise_floor, ch1, ch2, ch3] (Features_Buffer[1..4],
CE_Predictive_Node.cpp:200).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MLPParams", "reference_weights", "mlp_forward", "init_mlp"]


class MLPParams(NamedTuple):
    w1: jax.Array  # (n_in, n_hidden)
    b1: jax.Array  # (n_hidden,)
    w2: jax.Array  # (n_hidden, n_out)
    b2: jax.Array  # (n_out,)


# WeightIH[i][j] transposed into (input, hidden): rows i=1..4, cols j=1..5.
_REF_W1 = np.array(
    [
        # j=1        j=2        j=3        j=4        j=5
        [-0.106634, -0.415470, 0.309261, 0.159974, 0.212781],  # i=1 (NF)
        [0.005650, 0.741944, 0.006133, -0.620100, 0.669892],  # i=2 (CH1)
        [-0.057578, 0.621154, -0.048268, -0.249186, 0.734475],  # i=3 (CH2)
        [0.092680, 0.809336, -0.010821, -0.546496, 0.609384],  # i=4 (CH3)
    ],
    dtype=np.float64,
)
_REF_B1 = np.array(
    [-0.188208, -0.170684, -0.024726, 0.001448, 0.015983], dtype=np.float64
)
# WeightHO[j][k]: rows j=1..5, cols k=1..3.
_REF_W2 = np.array(
    [
        # k=1        k=2         k=3
        [10.857465, -18.452471, 15.609466],  # j=1
        [-6.848443, 2.053071, -2.929559],  # j=2
        [17.053079, -13.375309, -15.703407],  # j=3
        [0.087664, -0.269499, 0.407028],  # j=4
        [-6.552455, 2.655529, -2.552555],  # j=5
    ],
    dtype=np.float64,
)
_REF_B2 = np.array([-7.033320, 2.726400, -2.590206], dtype=np.float64)


def reference_weights(dtype=jnp.float32) -> MLPParams:
    """The reference's trained 4-5-3 weights (CE_Predictive_Node.cpp:78-120)."""
    return MLPParams(
        jnp.asarray(_REF_W1, dtype),
        jnp.asarray(_REF_B1, dtype),
        jnp.asarray(_REF_W2, dtype),
        jnp.asarray(_REF_B2, dtype),
    )


def mlp_forward(params: MLPParams, features: jax.Array) -> jax.Array:
    """Sigmoid MLP forward pass: (..., n_in) -> (..., n_out) in [0, 1].

    Matches CE_Predictive_Node.cpp:214-235 (sigmoid hidden + sigmoid output).
    """
    x = features.astype(params.w1.dtype)
    h = jax.nn.sigmoid(
        jnp.matmul(x, params.w1, preferred_element_type=jnp.float32) + params.b1
    )
    o = jnp.matmul(h, params.w2, preferred_element_type=jnp.float32) + params.b2
    return jax.nn.sigmoid(o)


def init_mlp(
    key: jax.Array, n_in: int = 4, n_hidden: int = 5, n_out: int = 3, dtype=jnp.float32
) -> MLPParams:
    """Fresh trainable parameters (Glorot-uniform weights, zero biases)."""
    k1, k2 = jax.random.split(key)
    s1 = float(np.sqrt(6.0 / (n_in + n_hidden)))
    s2 = float(np.sqrt(6.0 / (n_hidden + n_out)))
    return MLPParams(
        jax.random.uniform(k1, (n_in, n_hidden), dtype, -s1, s1),
        jnp.zeros((n_hidden,), dtype),
        jax.random.uniform(k2, (n_hidden, n_out), dtype, -s2, s2),
        jnp.zeros((n_out,), dtype),
    )
