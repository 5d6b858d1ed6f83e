"""Shared RF medium: the over-the-air data plane, simulated.

Replaces the reference's physical USRP link: every node contributes a
baseband block at the common medium rate; each receiver hears the gain-
weighted sum of the *other* nodes plus thermal noise.  One block = one
simulation step.
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
    noise_power: float = 1e-6
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

    def propagate(self, contributions: list[np.ndarray]) -> list[np.ndarray]:
        """contributions[j]: complex64 (block_len,) at medium rate/center.
        Returns per-receiver blocks (noise independent per receiver).

        One BLAS matmul for the whole N-to-N mix — at the 48-node cap
        (include/crts.hpp:189) the per-receiver broadcast loop this replaces
        allocated N^2 temporaries per block."""
        n = self.cfg.block_len
        stack = np.stack(
            [
                c if c is not None else np.zeros(n, np.complex64)
                for c in contributions
            ]
        )
        sig = self.gains.T.astype(np.complex64) @ stack  # (rx, block)
        noise = np.sqrt(self.cfg.noise_power / 2) * (
            self.rng.standard_normal((self.num_nodes, n))
            + 1j * self.rng.standard_normal((self.num_nodes, n))
        )
        out_all = (sig + noise).astype(np.complex64)
        return list(out_all)
