"""Occupancy decision + channel-switch policy.

Reproduces the decision chain of CE_Predictive_Node.cpp:245-261:

    if      Output[1] >= 0.8:  CH1 occupied -> retune tx to CHANNEL2 (835 MHz)
    elif    Output[2] >= 0.8:  CH2 occupied -> retune tx to CHANNEL1 (833 MHz)
    elif    Output[3] >= 0.8:  CH3 occupied -> retune tx to CHANNEL2 (835 MHz)
    else:   "ALL BUSY, SENSE AND OBSERVE AGAIN" (keep current tx freq)

Note the if/elif *priority* matters (the reference never evaluates Output[2]
when Output[1] fired), and the "else" branch keeps the radio where it is —
both preserved here as branchless jnp selects so the policy stays inside the
fused graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "DECISION_ALL_BUSY",
    "SU_CHANNELS_HZ",
    "occupancy_decision",
    "next_tx_channel",
]

# Secondary-user channel plan (CE_Predictive_Node.hpp:55-57).
SU_CHANNELS_HZ = (833e6, 835e6, 838e6)

DECISION_ALL_BUSY = 0  # decision code when no output crosses the threshold


def occupancy_decision(outputs: jax.Array, threshold: float = 0.8) -> jax.Array:
    """First output >= threshold, 1-indexed; 0 = all busy / sense again.

    outputs: (..., 3) MLP activations. Returns int32 (...,) in {0, 1, 2, 3}.
    """
    o1, o2, o3 = outputs[..., 0], outputs[..., 1], outputs[..., 2]
    return jnp.where(
        o1 >= threshold,
        1,
        jnp.where(o2 >= threshold, 2, jnp.where(o3 >= threshold, 3, DECISION_ALL_BUSY)),
    ).astype(jnp.int32)


def next_tx_channel(
    decision: jax.Array,
    current_freq_hz: jax.Array,
    channels_hz: tuple[float, float, float] = SU_CHANNELS_HZ,
) -> jax.Array:
    """Map a decision code to the next tx center frequency.

    decision 1 -> channels[1] (835e6); 2 -> channels[0] (833e6);
    3 -> channels[1] (835e6); 0 -> keep current frequency.
    """
    ch1, ch2, _ = channels_hz
    cur = jnp.asarray(current_freq_hz, jnp.float32)
    table = jnp.stack(
        [
            cur,  # 0: all busy -> keep
            jnp.full_like(cur, ch2),  # 1: CH1 occupied -> go to CH2
            jnp.full_like(cur, ch1),  # 2: CH2 occupied -> go to CH1
            jnp.full_like(cur, ch2),  # 3: CH3 occupied -> go to CH2
        ],
        axis=-1,
    )
    return jnp.take_along_axis(table, decision[..., None], axis=-1)[..., 0]
