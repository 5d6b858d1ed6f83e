"""Primary-user channel-occupancy processes.

Ports the behavior of the reference's PU engines as trace generators:

* ``markov_pu_trace`` — the 3-state Markov hopper of CE_PU_MARKOV_Chain_Tx
  (hop every 5 s).  The *documented* transition matrix
  (README.md:70-74, CE_PU_MARKOV_Chain_Tx.cpp:15-26) is the default.  The
  C++ implementation has a broken guard (``state_probability>=1 ||
  state_probability<4`` is true for any outcome >= 1,
  CE_PU_MARKOV_Chain_Tx.cpp:104/:114/:123) that collapses every row to
  P(CH1)=0.1, P(CH2)=0.9, P(CH3)=0; pass
  ``matrix=MARKOV_MATRIX_AS_IMPLEMENTED`` to replay that quirk.
* ``random_pu_trace`` — uniform channel choice every 2 s
  (CE_Random_Behaviour_PU.cpp:28-69).

Traces are channel *indices* (int32); the scene composer maps them to center
frequencies.  Note the Markov PU's channel plan is 833/836/838 MHz
(CE_PU_MARKOV_Chain_Tx.hpp:11-13) while the sensing SU assumes 833/835/838
(CE_Predictive_Node.hpp:55-57) — a reference inconsistency kept configurable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "PU_CHANNELS_HZ",
    "MARKOV_MATRIX_DOCUMENTED",
    "MARKOV_MATRIX_AS_IMPLEMENTED",
    "markov_pu_trace",
    "random_pu_trace",
]

# Markov PU channel plan (CE_PU_MARKOV_Chain_Tx.hpp:11-13).
PU_CHANNELS_HZ = (833e6, 836e6, 838e6)

# Rows = current channel, cols = next channel, P(next | current).
MARKOV_MATRIX_DOCUMENTED = np.array(
    [
        [0.1, 0.3, 0.6],
        [0.1, 0.5, 0.4],
        [0.1, 0.2, 0.7],
    ],
    dtype=np.float32,
)

# What CE_PU_MARKOV_Chain_Tx.cpp:97-128 actually realizes (guard quirk).
MARKOV_MATRIX_AS_IMPLEMENTED = np.array(
    [
        [0.1, 0.9, 0.0],
        [0.1, 0.9, 0.0],
        [0.1, 0.9, 0.0],
    ],
    dtype=np.float32,
)


def markov_pu_trace(
    key: jax.Array,
    num_hops: int,
    matrix: np.ndarray | jax.Array = MARKOV_MATRIX_DOCUMENTED,
    initial_channel: int = 0,
) -> jax.Array:
    """Channel index per hop period (default period: 5 s per hop).

    Returns int32 (num_hops,) including the initial state as element 0.
    """
    p = jnp.asarray(matrix, jnp.float32)
    logp = jnp.log(jnp.maximum(p, 1e-30))

    def step(state, k):
        nxt = jax.random.categorical(k, logp[state])
        return nxt, nxt

    keys = jax.random.split(key, num_hops - 1)
    _, rest = jax.lax.scan(step, jnp.int32(initial_channel), keys)
    return jnp.concatenate([jnp.array([initial_channel], jnp.int32), rest])


def random_pu_trace(key: jax.Array, num_hops: int, num_channels: int = 3) -> jax.Array:
    """Uniform random channel per hop period (default period: 2 s per hop)."""
    return jax.random.randint(key, (num_hops,), 0, num_channels, dtype=jnp.int32)
