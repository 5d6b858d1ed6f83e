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
from cognitive_radio_network_tpu.parallel.phylink import (
    ShardedFrameReceiver,
    ShardedStreamReceiver,
)


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

    def test_sharded_stream_mixed_configs_bitmatch(self, rng):
        """The adaptive sharded receiver: two payload configs interleaved in
        one stream, fed in successive blocks whose size guarantees frames
        straddle BLOCK boundaries; every decode bit-matches the single-device
        StreamReceiver fed the same blocks (VERDICT r2 task 2)."""
        cfg_a = OFDMFrameConfig()  # qam4 / h128
        cfg_b = OFDMFrameConfig(mod_scheme="qam16", fec0="v27", fec1="none")
        gen_a = OFDMFrameGen(cfg_a, payload_len=40)
        gen_b = OFDMFrameGen(cfg_b, payload_len=96)
        pay_a = rng.integers(0, 256, (3, 40)).astype(np.uint8)
        pay_b = rng.integers(0, 256, (3, 96)).astype(np.uint8)
        hdr = rng.integers(0, 256, (6, 8)).astype(np.uint8)
        iq_a = np.asarray(gen_a.assemble(hdr[:3], pay_a))
        iq_b = np.asarray(gen_b.assemble(hdr[3:], pay_b))
        gap = np.zeros(700, np.complex64)
        stream = np.concatenate(
            [gap, iq_a[0], gap, iq_b[0], gap, iq_a[1], gap, iq_b[1],
             gap, iq_a[2], gap, iq_b[2], gap, gap]
        )
        sharded = ShardedStreamReceiver(cfg_a, _mesh(), k_per_shard=8)
        single = StreamReceiver(cfg_a)
        got_s, got_1 = [], []
        blk = max(gen_a.frame_len, gen_b.frame_len) - 97  # force straddlers
        for s in range(0, len(stream), blk):
            got_s += sharded.receive(stream[s : s + blk])
            got_1 += single.process(stream[s : s + blk])
        assert len(got_s) == len(got_1) == 6
        assert {len(f["payload"]) for f in got_s} == {40, 96}
        for a, b in zip(got_s, got_1):
            assert a["offset"] == b["offset"]
            np.testing.assert_array_equal(a["payload"], b["payload"])
            np.testing.assert_array_equal(a["header"], b["header"])
            assert a["stats"].payload_valid
            assert a["stats"].mod_scheme == b["stats"].mod_scheme
            assert a["stats"].fec0 == b["stats"].fec0
        np.testing.assert_array_equal(
            [f["payload"] for f in got_s if len(f["payload"]) == 40], pay_a
        )
        np.testing.assert_array_equal(
            [f["payload"] for f in got_s if len(f["payload"]) == 96], pay_b
        )

    def test_sharded_stream_shard_seam_straddlers(self, rng):
        """Frames placed across every internal SHARD seam of a single large
        block decode exactly once with correct bits (the header-prefix halo
        at work), matching the single-device StreamReceiver."""
        cfg = OFDMFrameConfig()
        gen = OFDMFrameGen(cfg, payload_len=48)
        rx = ShardedStreamReceiver(cfg, _mesh(), k_per_shard=8)
        # first call on a fresh receiver: residual empty, so the internal
        # shard length is the power-of-two bucket of ceil(n / 8)
        d = 8
        flen = gen.frame_len
        shard_len = 1 << int(
            np.ceil(np.log2(max(4 * flen, rx.scan_halo,
                                4 * cfg.num_subcarriers)))
        )
        n = d * shard_len
        b = 2 * d - 1
        headers = rng.integers(0, 256, (b, 8)).astype(np.uint8)
        payloads = rng.integers(0, 256, (b, 48)).astype(np.uint8)
        iq = np.asarray(gen.assemble(headers, payloads))
        stream = 0.005 * (
            rng.standard_normal(n) + 1j * rng.standard_normal(n)
        ).astype(np.complex64)
        offs = sorted(
            [s * shard_len - flen // 2 for s in range(1, d)]
            + [s * shard_len + shard_len // 4 for s in range(d)]
        )
        for i, o in enumerate(offs):
            stream[o : o + flen] += iq[i]
        frames = rx.receive(stream)
        got = [f["offset"] for f in frames]
        assert len(got) == len(set(got)) == len(offs)
        single = StreamReceiver(cfg)
        ref = single.process(stream)
        assert len(ref) == len(offs)
        for f, r, o in zip(frames, ref, offs):
            assert abs(f["offset"] - o) <= 2
            assert f["offset"] == r["offset"]
            np.testing.assert_array_equal(f["payload"], r["payload"])
            np.testing.assert_array_equal(f["header"], r["header"])

    def test_sharded_stream_residual_carries_partial_frame(self, rng):
        """A block ending mid-frame yields the frame on the NEXT call — the
        residual carry (liquid keeps this state inside ofdmflexframesync,
        src/extensible_cognitive_radio.cpp:1307)."""
        cfg = OFDMFrameConfig()
        gen = OFDMFrameGen(cfg, payload_len=64)
        hdr = rng.integers(0, 256, (1, 8)).astype(np.uint8)
        pay = rng.integers(0, 256, (1, 64)).astype(np.uint8)
        iq = np.asarray(gen.assemble(hdr, pay))[0]
        lead = np.zeros(900, np.complex64)
        stream = np.concatenate([lead, iq, np.zeros(400, np.complex64)])
        cut = 900 + gen.frame_len // 2  # mid-frame
        rx = ShardedStreamReceiver(cfg, _mesh(), k_per_shard=4)
        first = rx.receive(stream[:cut])
        assert first == []
        second = rx.receive(stream[cut:])
        assert len(second) == 1
        assert abs(second[0]["offset"] - 900) <= 2
        np.testing.assert_array_equal(second[0]["payload"], pay[0])

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

    def test_decode_stage_per_device_memory_shrinks_with_mesh(self, rng):
        """Round-3 review item: the adaptive receiver's decode stage must
        consume the SHARDED stream, not a replicated full buffer.  Trace
        the shard_map avals of both dispatches on 2- and 4-device meshes
        at the same stream length: every per-shard stream operand must be
        n/d-sized (so per-device memory shrinks with mesh size), and the
        only full-size decode arrays are the (G, frame_len) windows."""
        from cognitive_radio_network_tpu.phy.framegen import OFDMFrameConfig, gen_for

        cfg = OFDMFrameConfig()
        gen = gen_for(cfg, 48)
        outs = {}
        stream, offs, hdrs, pays = _straddling_stream(rng, gen, n_shards=8)
        for d in (2, 4):
            mesh = Mesh(np.array(jax.devices()[:d]).reshape(d), ("time",))
            # bucketed shard lengths can place ~9 of the 15 frames in one
            # shard: k_per_shard must cover that
            rx = ShardedStreamReceiver(cfg, mesh, k_per_shard=16)
            frames = rx.receive(stream, threshold=0.2)
            assert len(frames) == len(offs)
            outs[d] = frames
            n = len(stream)
            shard_len = next(iter(rx._scan_cache))
            # per-shard stream length shrinks with the mesh: bucketed n/d
            assert shard_len < n, (d, shard_len, n)
            assert shard_len * d <= 1.25 * n + d  # eighth-octave bucket bound
            # introspect the DECODE shard_map: its per-shard stream avals
            # must be shard-sized, and no operand may be full-stream-sized
            # except none (windows are (G, flen))
            (ck, fn), = rx._decode_cache.items()
            _key, s_len, gpad = ck
            offs_a = jnp.zeros(gpad, jnp.int32)
            cfs_a = jnp.zeros(gpad, jnp.float32)
            rr = jnp.zeros(d * s_len, jnp.float32)
            jaxpr = jax.make_jaxpr(fn)(rr, rr, offs_a, cfs_a)
            def _find_shard_map(jx):
                for e in jx.eqns:
                    if e.primitive.name == "shard_map":
                        return e.params["jaxpr"]
                    for v in e.params.values():
                        inner_jx = getattr(v, "jaxpr", None)
                        if inner_jx is not None:
                            r = _find_shard_map(inner_jx)
                            if r is not None:
                                return r
                return None
            inner = _find_shard_map(jaxpr.jaxpr)
            assert inner is not None, jaxpr.pretty_print()
            stream_avals = [
                v.aval.shape for v in inner.invars if v.aval.ndim == 1
                and v.aval.shape[0] not in (gpad,)
            ]
            assert (s_len,) in stream_avals, stream_avals
            for shp in [v.aval.shape for v in inner.invars]:
                flat = int(np.prod(shp)) if shp else 1
                assert flat <= max(s_len, gpad * gen.frame_len), (
                    shp, s_len, gpad, gen.frame_len,
                )
        # decodes agree across mesh sizes (and with the stream content)
        for f2, f4 in zip(outs[2], outs[4]):
            assert f2["offset"] == f4["offset"]
            np.testing.assert_array_equal(f2["payload"], f4["payload"])


class TestDeviceResidentShardedStreaming:
    """receive_device: the sharded streaming path with device-resident
    residual carry (round-4 verdict #4) — bit-matches receive() on the
    same blocks, and never re-uploads a full buffer from the host."""

    def test_bitmatch_and_no_full_buffer_upload(self, rng, monkeypatch):
        cfg_a = OFDMFrameConfig()
        cfg_b = OFDMFrameConfig(mod_scheme="qam16", fec0="v27", fec1="none")
        gen_a = OFDMFrameGen(cfg_a, payload_len=40)
        gen_b = OFDMFrameGen(cfg_b, payload_len=96)
        pay_a = rng.integers(0, 256, (3, 40)).astype(np.uint8)
        pay_b = rng.integers(0, 256, (3, 96)).astype(np.uint8)
        hdr = rng.integers(0, 256, (6, 8)).astype(np.uint8)
        iq_a = np.asarray(gen_a.assemble(hdr[:3], pay_a))
        iq_b = np.asarray(gen_b.assemble(hdr[3:], pay_b))
        gap = np.zeros(700, np.complex64)
        stream = np.concatenate(
            [gap, iq_a[0], gap, iq_b[0], gap, iq_a[1], gap, iq_b[1],
             gap, iq_a[2], gap, iq_b[2], gap, gap]
        )
        host_rx = ShardedStreamReceiver(cfg_a, _mesh(), k_per_shard=8)
        dev_rx = ShardedStreamReceiver(cfg_a, _mesh(), k_per_shard=8)
        blk = max(gen_a.frame_len, gen_b.frame_len) - 97  # force straddlers
        # stage every block on device OUTSIDE the instrumented region
        # (an upstream jitted producer would leave them there)
        blocks = []
        for s in range(0, len(stream), blk):
            seg = stream[s : s + blk]
            blocks.append(
                (seg, jnp.asarray(seg.real.copy()), jnp.asarray(seg.imag.copy()))
            )
        # instrument host->device uploads: receive_device must never move
        # more than control-plane-sized host data (decode offsets etc.)
        uploads = []
        real_put = jax.device_put

        def spy_put(x, *a, **k):
            for leaf in jax.tree_util.tree_leaves(x):
                if isinstance(leaf, np.ndarray):
                    uploads.append(leaf.size)
            return real_put(x, *a, **k)

        got_host, got_dev = [], []
        for seg, br, bi in blocks:
            got_host += host_rx.receive(seg)
            monkeypatch.setattr(jax, "device_put", spy_put)
            try:
                got_dev += dev_rx.receive_device(br, bi)
            finally:
                monkeypatch.setattr(jax, "device_put", real_put)
        assert len(got_dev) == len(got_host) == 6
        for a, b in zip(got_dev, got_host):
            assert a["offset"] == b["offset"]
            np.testing.assert_array_equal(a["payload"], b["payload"])
            np.testing.assert_array_equal(a["header"], b["header"])
            assert a["stats"].mod_scheme == b["stats"].mod_scheme
            assert a["stats"].payload_valid
        # the host path uploads the full padded buffer every call; the
        # device path must not upload anything block-sized at all
        assert not uploads or max(uploads) < blk // 4, uploads

    def test_partial_frame_carry_on_device(self, rng):
        """Residual carry across receive_device calls: a block ending
        mid-frame yields the frame on the NEXT call, bit-matching the
        host-residual path."""
        cfg = OFDMFrameConfig()
        gen = OFDMFrameGen(cfg, payload_len=64)
        hdr = rng.integers(0, 256, (1, 8)).astype(np.uint8)
        pay = rng.integers(0, 256, (1, 64)).astype(np.uint8)
        iq = np.asarray(gen.assemble(hdr, pay))[0]
        lead = np.zeros(900, np.complex64)
        stream = np.concatenate([lead, iq, np.zeros(400, np.complex64)])
        cut = 900 + gen.frame_len // 2  # mid-frame
        rx = ShardedStreamReceiver(cfg, _mesh(), k_per_shard=4)
        first = rx.receive_device(
            jnp.asarray(stream[:cut].real.copy()),
            jnp.asarray(stream[:cut].imag.copy()),
        )
        assert first == []
        assert rx.pending_frame
        second = rx.receive_device(
            jnp.asarray(stream[cut:].real.copy()),
            jnp.asarray(stream[cut:].imag.copy()),
        )
        assert len(second) == 1
        assert abs(second[0]["offset"] - 900) <= 2
        np.testing.assert_array_equal(second[0]["payload"], pay[0])
