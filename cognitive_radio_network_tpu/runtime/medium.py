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

        Fast path: when the gain matrix decomposes into isolated CELLS
        whose off-diagonal entries all equal one constant g_c (the default
        all-ones matrix is the one-cell case; the celled matrices of
        frequency-reuse deployments are the general one), receiver i in
        cell c hears g_c*(total_c - own_i) — one O(N*block) sum instead of
        the O(N^2*block) mix GEMM, which dominated controller cost at 8+
        nodes.  Per-sample error of the subtraction is bounded by
        eps_f32 * |own| ~ -138 dB relative to the receiver's own transmit
        amplitude — negligible against any link that can decode at all.
        Matrices with non-uniform in-cell gains fall back to one BLAS
        matmul for the whole N-to-N mix."""
        active = [j for j, c in enumerate(contributions) if c is not None]
        if not active:
            return [None] * self.num_nodes
        cells = self._gain_cells()
        if cells is not None:
            active_set = set(active)
            out: list[np.ndarray | None] = [None] * self.num_nodes
            for members, g_c in cells:
                act = [j for j in members if j in active_set]
                if not act or g_c == 0.0:
                    continue
                total = contributions[act[0]].astype(np.complex64).copy()
                for j in act[1:]:
                    total += contributions[j]
                if g_c != 1.0:
                    total = total * np.float32(g_c)
                for i in members:
                    others = len(act) - (1 if i in active_set else 0)
                    if others <= 0:
                        continue  # hears nothing but itself
                    if contributions[i] is None:
                        # every silent receiver in the cell shares ONE
                        # `total` ndarray — READ-ONLY invariant: consumers
                        # (runtime/radio.py) never mutate rx blocks in
                        # place (they copy via block+noise); an in-place
                        # edit here would corrupt the other receivers
                        out[i] = total
                    else:
                        own = contributions[i].astype(np.complex64)
                        out[i] = total - (
                            np.float32(g_c) * own if g_c != 1.0 else own
                        )
            return out
        # cast DIRECTLY to complex64: a phase-bearing (complex) gain matrix
        # must keep its imaginary part (a float32 intermediate silently
        # dropped it, ADVICE r4)
        gc = self.gains.T[:, active].astype(np.complex64, copy=False)
        heard = gc.any(axis=1)
        stack = np.stack([contributions[j] for j in active])
        sig = gc @ stack  # (rx, block)
        return [sig[i] if heard[i] else None for i in range(self.num_nodes)]

    def _gain_cells(self) -> list[tuple[np.ndarray, float]] | None:
        """Cell decomposition of the gain matrix, or None when the matrix
        is not celled-uniform: connected components of the nonzero-gain
        graph whose off-diagonal entries within each component all equal
        one constant.  Cached against the matrix CONTENT (shape + bytes),
        not array identity — in-place edits of ``medium.gains`` must
        invalidate the analysis."""
        gg = self.gains
        key = (gg.shape, gg.tobytes())
        cached = getattr(self, "_cells_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        cells: list[tuple[np.ndarray, float]] | None = None
        n = self.num_nodes
        if n > 1 and np.all(np.diag(gg) == 0.0):
            nz = (gg != 0) | (gg.T != 0)
            comp = -np.ones(n, np.int64)
            c = 0
            for i in range(n):
                if comp[i] >= 0:
                    continue
                stack = [i]
                comp[i] = c
                while stack:
                    u = stack.pop()
                    for v in np.flatnonzero(nz[u]):
                        if comp[v] < 0:
                            comp[v] = c
                            stack.append(v)
                c += 1
            cells = []
            for cc in range(c):
                mem = np.flatnonzero(comp == cc)
                if len(mem) == 1:
                    cells.append((mem, 0.0))
                    continue
                sub = gg[np.ix_(mem, mem)]
                vals = sub[~np.eye(len(mem), dtype=bool)]
                if not np.all(vals == vals.flat[0]) or vals.flat[0] == 0.0:
                    cells = None
                    break
                cells.append((mem, float(vals.flat[0])))
        self._cells_cache = (key, cells)
        return cells
