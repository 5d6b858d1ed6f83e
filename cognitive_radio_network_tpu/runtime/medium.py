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

        Fast path: when every nonzero gain equals one constant g (the
        default all-ones-off-diagonal matrix, and each cell of a celled
        matrix), receiver i hears g*(total - own_i) — one O(N*block) sum
        instead of the O(N^2*block) mix GEMM, which dominated controller
        cost at 8+ nodes.  The general matrix falls back to one BLAS
        matmul for the whole N-to-N mix."""
        active = [j for j, c in enumerate(contributions) if c is not None]
        if not active:
            return [None] * self.num_nodes
        g = self.gains.T[:, active].astype(np.float32)  # (rx, n_active)
        heard = g.any(axis=1)
        uni = self._uniform_gain()
        if uni is not None and len(active) > 1:
            total = contributions[active[0]].astype(np.complex64).copy()
            for j in active[1:]:
                total += contributions[j]
            if uni != 1.0:
                total *= np.float32(uni)
            out: list[np.ndarray | None] = []
            for i in range(self.num_nodes):
                if not heard[i]:
                    out.append(None)
                elif contributions[i] is None:
                    out.append(total)
                else:
                    own = contributions[i].astype(np.complex64)
                    out.append(total - (np.float32(uni) * own if uni != 1.0 else own))
            return out
        gc = g.astype(np.complex64)
        stack = np.stack([contributions[j] for j in active])
        sig = gc @ stack  # (rx, block)
        return [sig[i] if heard[i] else None for i in range(self.num_nodes)]

    def _uniform_gain(self) -> float | None:
        """The single off-diagonal gain value if the matrix is
        ``g * (ones - I)`` (cached against the gains array identity)."""
        cached = getattr(self, "_uni_cache", None)
        if cached is not None and cached[0] is self.gains:
            return cached[1]
        gg = self.gains
        off = ~np.eye(self.num_nodes, dtype=bool)
        vals = gg[off]
        uni: float | None = None
        if self.num_nodes > 1 and np.all(vals == vals.flat[0]) and np.all(
            np.diag(gg) == 0.0
        ):
            uni = float(vals.flat[0]) if vals.flat[0] != 0.0 else None
        self._uni_cache = (gg, uni)
        return uni
