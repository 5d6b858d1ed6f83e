"""Time-sharded OFDM link: frames straddling every shard boundary decode.

SURVEY §7.5 hard part (a): the reference's liquid synchronizer carries
streaming state across recv boundaries
(src/extensible_cognitive_radio.cpp:1307); the sharded receiver's analog is
the frame-length ppermute halo (parallel/phylink.py).  These tests place a
frame across EVERY boundary of the virtual 8-device mesh and require the
sharded output to bit-match the single-device receivers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from cognitive_radio_network_tpu.phy import OFDMFrameConfig, OFDMFrameGen, OFDMFrameSync
from cognitive_radio_network_tpu.phy.framesync import StreamReceiver
from cognitive_radio_network_tpu.parallel.phylink import ShardedFrameReceiver


def _mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(8), ("time",))


def _straddling_stream(rng, gen, n_shards=8, shard_len=None):
    """One frame straddling every shard boundary + extras inside shards."""
    flen = gen.frame_len
    shard_len = shard_len or 4 * flen
    n = n_shards * shard_len
    b = 2 * n_shards - 1
    headers = rng.integers(0, 256, (b, 8)).astype(np.uint8)
    payloads = rng.integers(0, 256, (b, gen.payload_len)).astype(np.uint8)
    iq = np.asarray(gen.assemble(headers, payloads))
    stream = 0.005 * (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype(np.complex64)
    offs = []
    # straddle each internal boundary: start flen//2 before it
    for s in range(1, n_shards):
        o = s * shard_len - gen.frame_len // 2
        offs.append(o)
    # plus one mid-shard frame per shard (except it would overlap a straddler)
    for s in range(n_shards):
        offs.append(s * shard_len + shard_len // 4)
    offs = sorted(offs)
    for i, o in enumerate(offs):
        stream[o : o + flen] += iq[i]
    return stream, offs, headers[: len(offs)], payloads[: len(offs)]


class TestShardedLink:
    def test_boundary_straddlers_bitmatch_single_device(self, rng):
        cfg = OFDMFrameConfig()
        gen = OFDMFrameGen(cfg, payload_len=48)
        stream, offs, headers, payloads = _straddling_stream(rng, gen)
        mesh = _mesh()
        rx = ShardedFrameReceiver(cfg, 48, mesh, k_per_shard=8)
        frames = rx.receive(stream)
        assert len(frames) == len(offs), (
            [f["offset"] for f in frames],
            offs,
        )
        # single-device oracle: the adaptive StreamReceiver over blocks
        single = StreamReceiver(cfg)
        got_single = []
        blk = len(stream) // 16
        for s in range(0, len(stream), blk):
            got_single += single.process(stream[s : s + blk])
        assert len(got_single) == len(offs)
        for f, fs, o, h, p in zip(frames, got_single, offs, headers, payloads):
            assert abs(f["offset"] - o) <= 2
            assert f["offset"] == fs["offset"]
            np.testing.assert_array_equal(f["header"], fs["header"])
            np.testing.assert_array_equal(f["payload"], fs["payload"])
            np.testing.assert_array_equal(f["payload"], p)
            assert f["stats"].payload_valid

    def test_ownership_no_duplicates(self, rng):
        """A straddling frame is decoded exactly once (by the shard where it
        starts), never by its right neighbor."""
        cfg = OFDMFrameConfig()
        gen = OFDMFrameGen(cfg, payload_len=32)
        stream, offs, _, _ = _straddling_stream(rng, gen)
        rx = ShardedFrameReceiver(cfg, 32, _mesh(), k_per_shard=8)
        frames = rx.receive(stream)
        got = [f["offset"] for f in frames]
        assert len(got) == len(set(got)) == len(offs)

    def test_matches_fused_single_device_receive_block(self, rng):
        """Sharded output == the fused single-device receive_block on the
        same stream (same decode graphs, just sharded detection)."""
        cfg = OFDMFrameConfig()
        gen = OFDMFrameGen(cfg, payload_len=48)
        stream, offs, _, _ = _straddling_stream(rng, gen)
        sync = OFDMFrameSync(cfg, 48)
        ref = sync.receive_block(stream, k=32)
        rx = ShardedFrameReceiver(cfg, 48, _mesh(), k_per_shard=8)
        got = rx.receive(stream)
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            assert a["offset"] == b["offset"]
            np.testing.assert_array_equal(a["payload"], b["payload"])
            np.testing.assert_array_equal(a["header"], b["header"])
