"""Native runtime library (native/ + cognitive_radio_network_tpu.native).

Builds libcrn_runtime.so via make (g++) and checks every subsystem against
its pure-Python counterpart: IQ prefetch stream vs io.iq.IQReader, binlog
framing + CRC integrity, framed TCP transport round-trips, and the packet
engine vs signal.msequence / runtime.traffic (bit-identical).
"""

import struct
import threading
import zlib

import numpy as np
import pytest

from cognitive_radio_network_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no C++ toolchain)"
)


# ---------------- IQ stream ----------------


def _write_capture(tmp_path, n, seed=0):
    from cognitive_radio_network_tpu.io.iq import IQWriter

    rng = np.random.default_rng(seed)
    data = rng.standard_normal((n, 2)).astype(np.float32)
    path = tmp_path / "cap.iq"
    with IQWriter(path, 13e6, 833e6) as w:
        w.write(data)
    return path, data


class TestNativeIQStream:
    def test_blocks_match_file(self, tmp_path):
        path, data = _write_capture(tmp_path, 4096)
        with native.NativeIQStream(path, 512, depth=4) as s:
            assert s.num_samples == 4096
            blocks = list(s.blocks())
        assert len(blocks) == 8
        np.testing.assert_array_equal(np.concatenate(blocks), data)

    def test_partial_tail_dropped(self, tmp_path):
        path, _ = _write_capture(tmp_path, 1000)
        with native.NativeIQStream(path, 512) as s:
            blocks = list(s.blocks())
        assert len(blocks) == 1  # 1000 // 512

    def test_resumable_cursor(self, tmp_path):
        path, data = _write_capture(tmp_path, 2048)
        with native.NativeIQStream(path, 256) as s:
            s.next_block()
            s.next_block()
            cur = s.cursor
        assert cur == 512
        with native.NativeIQStream(path, 256, start_sample=cur) as s2:
            b = s2.next_block()
        np.testing.assert_array_equal(b, data[512:768])

    def test_loop_mode(self, tmp_path):
        path, data = _write_capture(tmp_path, 512)
        with native.NativeIQStream(path, 256, loop=True) as s:
            blocks = [s.next_block() for _ in range(6)]
        for i, b in enumerate(blocks):
            np.testing.assert_array_equal(b, data[(i % 2) * 256 : (i % 2) * 256 + 256])

    def test_matches_python_reader(self, tmp_path):
        from cognitive_radio_network_tpu.io.iq import IQReader

        path, _ = _write_capture(tmp_path, 4096, seed=7)
        py = list(IQReader(path).blocks(512))
        with native.NativeIQStream(path, 512) as s:
            nat = list(s.blocks())
        assert len(py) == len(nat)
        for a, b in zip(py, nat):
            np.testing.assert_array_equal(a, b)


# ---------------- binlog ----------------


class TestBinLog:
    def test_roundtrip(self, tmp_path):
        p = tmp_path / "phy_rx.crnl"
        recs = [struct.pack("<ifd", i, 1.5 * i, 0.25 * i) for i in range(100)]
        with native.BinLogWriter(p, "phy_rx:<ifd") as w:
            for r in recs:
                w.append(r)
        with native.BinLogReader(p) as rd:
            assert rd.stream_name == "phy_rx:<ifd"
            assert len(rd) == 100
            got = list(rd)
        assert got == recs

    def test_variable_length_records(self, tmp_path):
        p = tmp_path / "v.crnl"
        recs = [bytes(range(i % 251)) for i in range(50)]
        with native.BinLogWriter(p, "var") as w:
            for r in recs:
                w.append(r)
        with native.BinLogReader(p) as rd:
            assert list(rd) == recs

    def test_truncated_tail_dropped(self, tmp_path):
        p = tmp_path / "t.crnl"
        with native.BinLogWriter(p, "s") as w:
            w.append(b"A" * 64)
            w.append(b"B" * 64)
        raw = p.read_bytes()
        p.write_bytes(raw[:-10])  # simulate crash mid-record
        with native.BinLogReader(p) as rd:
            assert len(rd) == 1
            assert rd.record(0) == b"A" * 64

    def test_corruption_detected(self, tmp_path):
        p = tmp_path / "c.crnl"
        with native.BinLogWriter(p, "s") as w:
            w.append(b"hello world")
        raw = bytearray(p.read_bytes())
        raw[-3] ^= 0xFF  # flip a payload byte
        p.write_bytes(bytes(raw))
        with native.BinLogReader(p) as rd:
            with pytest.raises(OSError, match="CRC"):
                rd.record(0)

    def test_crc32_matches_zlib(self):
        for data in (b"", b"a", b"123456789", bytes(range(256))):
            assert native.crc32(data) == zlib.crc32(data)


# ---------------- transport ----------------


class TestTransport:
    def test_roundtrip_and_timeout(self):
        srv = native.MsgTransport.listen(47123)
        got = {}

        def server():
            conn = native.MsgTransport.accept(srv, 5000)
            got["first"] = conn.recv(5000)
            conn.send(7, b"reply-payload")
            got["timeout"] = conn.recv(100)  # nothing more -> None
            conn.close()

        t = threading.Thread(target=server)
        t.start()
        cli = native.MsgTransport.connect("127.0.0.1", 47123, 5000)
        cli.send(3, b"hello control plane")
        typ, payload = cli.recv(5000)
        t.join(10)
        assert got["first"] == (3, b"hello control plane")
        assert got["timeout"] is None
        assert (typ, payload) == (7, b"reply-payload")
        cli.close()
        native.MsgTransport.close_server(srv)

    def test_empty_and_large_payloads(self):
        srv = native.MsgTransport.listen(47124)
        out = {}

        def server():
            conn = native.MsgTransport.accept(srv, 5000)
            out["a"] = conn.recv(5000)
            out["b"] = conn.recv(5000)
            conn.close()

        t = threading.Thread(target=server)
        t.start()
        cli = native.MsgTransport.connect("127.0.0.1", 47124, 5000)
        big = bytes(np.random.default_rng(0).integers(0, 256, 1 << 20, dtype=np.uint8))
        cli.send(1)
        cli.send(2, big)
        t.join(10)
        assert out["a"] == (1, b"")
        assert out["b"] == (2, big)
        cli.close()
        native.MsgTransport.close_server(srv)

    def test_oversized_payload_keeps_stream_framed(self):
        # A payload beyond the recv cap must raise a clear error AND leave
        # the stream framed: the next message is still readable.
        srv = native.MsgTransport.listen(47126)
        out = {}

        def server():
            conn = native.MsgTransport.accept(srv, 5000)
            conn._cap = 64  # shrink cap to force the -4 path
            conn._buf = None
            try:
                conn.recv(5000)
            except ValueError as e:
                out["err"] = str(e)
            out["next"] = conn.recv(5000)
            conn.close()

        t = threading.Thread(target=server)
        t.start()
        cli = native.MsgTransport.connect("127.0.0.1", 47126, 5000)
        cli.send(2, bytes(range(200)))  # 200 > 64 cap
        cli.send(3, b"still-framed")
        t.join(10)
        assert "recv cap" in out["err"]
        assert out["next"] == (3, b"still-framed")
        cli.close()
        native.MsgTransport.close_server(srv)

    def test_peer_close_raises(self):
        srv = native.MsgTransport.listen(47125)

        def server():
            conn = native.MsgTransport.accept(srv, 5000)
            conn.close()

        t = threading.Thread(target=server)
        t.start()
        cli = native.MsgTransport.connect("127.0.0.1", 47125, 5000)
        t.join(10)
        with pytest.raises(ConnectionResetError):
            cli.recv(5000)
        cli.close()
        native.MsgTransport.close_server(srv)


# ---------------- packet engine ----------------


class TestPacketEngine:
    def test_msequence_bitmatch_python(self):
        from cognitive_radio_network_tpu.signal.msequence import msequence_bytes

        for m in (7, 12, 15):
            py = msequence_bytes(512, m)
            nat = native.msequence_bytes_native(512, m)
            np.testing.assert_array_equal(py, nat)

    def test_fill_packets_matches_traffic_source(self):
        from cognitive_radio_network_tpu.runtime.traffic import (
            PACKET_LEN,
            TrafficConfig,
            TrafficSource,
        )

        src = TrafficSource(TrafficConfig())
        py_packets = [src._make_packet() for _ in range(5)]
        nat = native.fill_packets(5, PACKET_LEN, 0, src.base_payload)
        for i in range(5):
            np.testing.assert_array_equal(py_packets[i], nat[i])
            assert native.packet_number(nat[i]) == i
            assert TrafficSource.packet_number(nat[i]) == i

    def test_bit_errors(self, rng):
        a = rng.integers(0, 256, 10000, dtype=np.uint8)
        b = a.copy()
        flips = rng.choice(10000, 100, replace=False)
        b[flips] ^= np.uint8(1 << 3)
        assert native.bit_errors(a, b) == 100
        expected = int(np.unpackbits(a ^ b).sum())
        assert native.bit_errors(a, b) == expected


# ---------------- framework integration ----------------


class TestLogSinkSpill:
    def test_scenario_spill_and_readback(self, tmp_path):
        """Run a scenario with binary spill enabled; the .crnl streams must
        reproduce the in-memory records, and the export CLI must convert
        them to Octave."""
        from cognitive_radio_network_tpu.runtime import ScenarioRuntime
        from cognitive_radio_network_tpu.runtime.logging import (
            LogSink,
            read_binlog_dir,
        )
        from tests.test_runtime import _link_scenario

        sink = LogSink(spill_dir=tmp_path)
        rt = ScenarioRuntime(_link_scenario(run_time=0.05), sink)
        rt.run()
        sink.close()
        assert len(sink.phy_tx) > 0 and len(sink.net_tx) > 0
        streams = read_binlog_dir(tmp_path)
        assert len(streams["phy_tx"]) == len(sink.phy_tx)
        assert len(streams["net_tx"]) == len(sink.net_tx)
        for mem, disk in zip(sink.phy_tx, streams["phy_tx"]):
            assert disk["node"] == mem["node"]
            assert disk["frame_num"] == mem["frame_num"]
            assert disk["tx_freq"] == mem["tx_freq"]
            assert disk["tx_modulation"] == mem["tx_modulation"]
        for mem, disk in zip(sink.net_tx, streams["net_tx"]):
            assert disk["packet_num"] == mem["packet_num"]
            assert abs(disk["t"] - mem["t"]) < 1e-12

        from cognitive_radio_network_tpu.__main__ import main as cli_main

        out = tmp_path / "run.m"
        assert cli_main(["export", str(tmp_path), "-o", str(out)]) == 0
        text = out.read_text()
        assert "phy_tx_tx_freq = [" in text
        assert "net_tx_packet_num = [" in text

    def test_phy_rx_roundtrip_strings(self, tmp_path):
        """String fields (mod/crc/fec names) survive the packed layout."""
        from cognitive_radio_network_tpu.runtime.logging import (
            BINLOG_SCHEMAS,
            LogSink,
            _pack_record,
            read_binlog,
        )

        sink = LogSink(spill_dir=tmp_path)
        rec = {
            "node": 2,
            "t": 1.25,
            "frame_num": 77,
            "frame_type": 1,
            "header_valid": 1,
            "payload_valid": 0,
            "evm_dB": -22.5,
            "rssi_dB": -40.0,
            "cfo": 0.001,
            "num_framesyms": 9,
            "mod_scheme": "qam16",
            "crc": "crc32",
            "fec0": "h128",
            "fec1": "v27",
        }
        sink._spill("phy_rx", rec)
        sink.close()
        stream, recs = read_binlog(tmp_path / "phy_rx.crnl")
        assert stream == "phy_rx"
        got = recs[0]
        assert got["mod_scheme"] == "qam16"
        assert got["fec1"] == "v27"
        assert got["frame_num"] == 77
        assert abs(got["evm_dB"] - -22.5) < 1e-6


class TestIQPrefetchIntegration:
    def test_prefetch_blocks_resumable(self, tmp_path):
        from cognitive_radio_network_tpu.io.iq import IQReader

        path, data = _write_capture(tmp_path, 4096, seed=11)
        r = IQReader(path)
        it = r.prefetch_blocks(512)
        first = [next(it), next(it)]
        it.close()
        assert r.cursor.sample_index == 1024
        np.testing.assert_array_equal(np.concatenate(first), data[:1024])
        # resume from the saved cursor
        rest = list(IQReader(path, r.cursor).prefetch_blocks(512))
        assert len(rest) == 6
        np.testing.assert_array_equal(np.concatenate(rest), data[1024:])

    def test_planar_blocks(self, tmp_path):
        """next_planar returns (I, Q) planes matching the interleaved data;
        de-interleave happens on the prefetch thread."""
        path, data = _write_capture(tmp_path, 2048, seed=21)
        with native.NativeIQStream(path, 512) as s:
            planar = list(s.planar_blocks())
        assert len(planar) == 4
        xi_all = np.concatenate([q for _, q in planar])
        xr_all = np.concatenate([i for i, _ in planar])
        np.testing.assert_array_equal(xr_all, data[:, 0])
        np.testing.assert_array_equal(xi_all, data[:, 1])


class TestRingStress:
    def test_spsc_ring_under_pressure(self, tmp_path):
        """Small ring depth + bursty consumer: every block arrives exactly
        once, in order, bit-exact — no torn reads from producer/consumer
        races."""
        import time as _time

        n_blocks, block = 200, 256
        path, data = _write_capture(tmp_path, n_blocks * block, seed=3)
        rng = np.random.default_rng(0)
        with native.NativeIQStream(path, block, depth=2) as s:
            for i in range(n_blocks):
                if i % 17 == 0:
                    _time.sleep(0.002)  # let the producer fill + stall
                b = s.next_block()
                np.testing.assert_array_equal(
                    b, data[i * block : (i + 1) * block]
                )
            assert s.next_block() is None

    def test_many_streams_concurrently(self, tmp_path):
        """8 independent streams (8 producer threads) over one capture."""
        import threading

        path, data = _write_capture(tmp_path, 4096, seed=4)
        errors = []

        def consume(start):
            try:
                with native.NativeIQStream(
                    path, 256, depth=3, start_sample=start
                ) as s:
                    got = list(s.blocks())
                    want = data[start:]
                    want = want[: len(want) // 256 * 256]
                    np.testing.assert_array_equal(np.concatenate(got), want)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [
            threading.Thread(target=consume, args=(i * 256,)) for i in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(30)
        assert not errors, errors
