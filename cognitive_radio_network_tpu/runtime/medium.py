"""Shared RF medium: the over-the-air data plane, simulated.

Replaces the reference's physical USRP link: every node contributes a
baseband block at the common medium rate; each receiver hears the gain-
weighted sum of the *other* nodes.  One block = one simulation step.

Thermal noise is RECEIVER-REFERRED (added by each radio's front end,
runtime/radio.py, from ``MediumConfig.noise_power``) — as in the physical
system, where kTB noise arises in the receiving USRP's own analog chain,
not in the air.  The medium therefore ships pure signal and returns
``None`` for receivers that hear nothing this block, which lets a silent
step cost nothing end to end (no noise synthesis, no 512 KB block on the
control-plane wire, squelch-skip at the receiver).
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["MediumConfig", "Medium"]


@dataclasses.dataclass(frozen=True)
class MediumConfig:
    sample_rate_hz: float = 13e6
    center_hz: float = 833e6
    block_len: int = 5120  # samples per simulation step
    noise_power: float = 1e-6  # receiver-referred (see module docstring)
    seed: int = 0

    @property
    def block_dt(self) -> float:
        return self.block_len / self.sample_rate_hz


class Medium:
    def __init__(self, cfg: MediumConfig, num_nodes: int, gains: np.ndarray | None = None):
        self.cfg = cfg
        self.num_nodes = num_nodes
        # gains[j, i]: linear amplitude from tx node j to rx node i
        if gains is None:
            gains = np.ones((num_nodes, num_nodes), np.float32)
        np.fill_diagonal(gains, 0.0)  # a node does not hear itself
        self.gains = gains
        self.rng = np.random.default_rng(cfg.seed)

    def propagate(
        self, contributions: list[np.ndarray | None]
    ) -> list[np.ndarray | None]:
        """contributions[j]: complex64 (block_len,) at medium rate/center,
        or None for a silent transmitter.  Returns per-receiver SIGNAL
        blocks; ``None`` where a receiver hears no active transmitter
        (noise is receiver-referred, see module docstring).

        One BLAS matmul for the whole N-to-N mix — at the 48-node cap
        (include/crts.hpp:189) the per-receiver broadcast loop this replaces
        allocated N^2 temporaries per block."""
        active = [j for j, c in enumerate(contributions) if c is not None]
        if not active:
            return [None] * self.num_nodes
        stack = np.stack([contributions[j] for j in active])
        g = self.gains.T[:, active].astype(np.complex64)  # (rx, n_active)
        heard = g.any(axis=1)
        sig = g @ stack  # (rx, block)
        return [sig[i] if heard[i] else None for i in range(self.num_nodes)]
