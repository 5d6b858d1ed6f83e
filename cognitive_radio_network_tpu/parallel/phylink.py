"""Time-sharded OFDM link: frame-sync state across shard boundaries.

SURVEY §7.5's declared hard part (a): liquid's synchronizer carries opaque
streaming state across every recv boundary
(src/extensible_cognitive_radio.cpp:1307), so a frame straddling two blocks
still decodes.  In the sharded world the analog is OVERLAP-SAVE AT FRAME
SCALE: each time shard of the IQ stream ppermutes the HEAD of its segment
(one maximum-frame-length halo) to its LEFT ring neighbor, so a frame that
starts near the end of shard i and spills into shard i+1 is decoded wholly
by shard i.  Ownership is by frame START (``0 <= best < shard_len``), which
also dedups detections between neighbors.

The per-shard receive is the fused one-dispatch fixed-config block receiver
(phy/framesync.py::_receive_block_graph) run under ``shard_map``; the only
cross-shard communication is the single ppermute of the halo — it rides ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from cognitive_radio_network_tpu.phy.framegen import OFDMFrameConfig
from cognitive_radio_network_tpu.phy.framesync import (
    OFDMFrameSync,
    _receive_block_graph,
    _to_np_planes,
)

__all__ = ["ShardedFrameReceiver"]


class ShardedFrameReceiver:
    """Fixed-config OFDM receiver sharded over a mesh 'time' axis.

    The stream is split into equal contiguous segments, one per device on
    ``time_axis``; each shard decodes every frame that STARTS inside its
    segment, including frames that straddle into the next shard (via the
    frame-length halo).  Decodes bit-match the single-device receiver.
    """

    def __init__(
        self,
        cfg: OFDMFrameConfig,
        payload_len: int,
        mesh: Mesh,
        *,
        time_axis: str = "time",
        k_per_shard: int = 16,
    ):
        self.cfg = cfg
        self.sync = OFDMFrameSync(cfg, payload_len)
        self.mesh = mesh
        self.time_axis = time_axis
        self.k_per_shard = k_per_shard
        gen = self.sync.gen
        # halo: enough for a frame starting at the last owned sample PLUS the
        # detector's correlation lookahead (win + half ~ 2.5m) and the
        # refinement span (2m)
        self.halo = gen.frame_len + 8 * cfg.num_subcarriers
        self._fn_cache: dict[int, callable] = {}

    def _sharded_fn(self, shard_len: int):
        """Builds the jitted shard_map receive for a given per-shard length."""
        if shard_len in self._fn_cache:
            return self._fn_cache[shard_len]
        gen = self.sync.gen
        halo = self.halo
        axis = self.time_axis
        k = self.k_per_shard
        d = self.mesh.shape[axis]

        def local(rr_l, ri_l):
            # send my HEAD to my LEFT neighbor: shard i receives shard i+1's
            # first `halo` samples (frames spilling rightward stay decodable)
            head_r = jax.lax.slice_in_dim(rr_l, 0, halo, axis=0)
            head_i = jax.lax.slice_in_dim(ri_l, 0, halo, axis=0)
            perm = [(i, (i - 1) % d) for i in range(d)]
            halo_r = jax.lax.ppermute(head_r, axis, perm)
            halo_i = jax.lax.ppermute(head_i, axis, perm)
            ext_r = jnp.concatenate([rr_l, halo_r])
            ext_i = jnp.concatenate([ri_l, halo_i])
            idx = jax.lax.axis_index(axis)
            # the last shard's "right neighbor" is shard 0 (ring wrap): its
            # halo is not stream data, so its valid length stops at the end
            n_valid = jnp.where(idx == d - 1, shard_len, shard_len + halo)
            bests, peaks, cfos, out, ok = _receive_block_graph(
                gen, ext_r, ext_i, n_valid, k=k
            )
            ok = ok & (bests < shard_len)  # ownership: frame starts here
            out = dict(out)
            out["bests"] = bests + idx * shard_len  # absolute offsets
            out["peaks"] = peaks
            out["ok"] = ok
            return out

        specs_out = {
            "headers": P(axis, None),
            "phy": P(axis, None),
            "payloads": P(axis, None),
            "hdr_ok": P(axis),
            "pay_ok": P(axis),
            "evm_db": P(axis),
            "rssi_db": P(axis),
            "cfo": P(axis),
            "bests": P(axis),
            "peaks": P(axis),
            "ok": P(axis),
        }
        fn = jax.jit(
            shard_map(
                local,
                mesh=self.mesh,
                in_specs=(P(axis), P(axis)),
                out_specs=specs_out,
                check_vma=False,
            )
        )
        self._fn_cache[shard_len] = fn
        return fn

    def receive(self, iq, threshold: float = 0.2):
        """Decode every frame in ``iq`` (complex or planes, length divisible
        by the mesh's time-axis size).  Returns frames like
        :meth:`OFDMFrameSync.receive_block`: a list of
        {offset, stats, header, payload}, sorted by offset."""
        re_np, im_np = _to_np_planes(iq)
        n = re_np.shape[0]
        d = self.mesh.shape[self.time_axis]
        if n % d:
            pad = d - n % d
            re_np = np.concatenate([re_np, np.zeros(pad, np.float32)])
            im_np = np.concatenate([im_np, np.zeros(pad, np.float32)])
            n += pad
        fn = self._sharded_fn(n // d)
        out = fn(jnp.asarray(re_np), jnp.asarray(im_np))
        out = {kk: np.asarray(v) for kk, v in out.items()}
        frames, consumed_end = [], 0
        for i in np.argsort(out["bests"], kind="stable"):
            off = int(out["bests"][i])
            if out["peaks"][i] < threshold or not out["ok"][i]:
                continue
            if off < consumed_end:
                continue
            frames.append(
                {
                    "offset": off,
                    "stats": self.sync._stats_from(out, int(i)),
                    "header": out["headers"][i],
                    "payload": out["payloads"][i],
                }
            )
            consumed_end = off + self.sync.gen.frame_len
        return frames
