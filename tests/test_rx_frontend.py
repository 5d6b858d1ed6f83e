"""Receiver front end: receiver-referred thermal noise + squelch.

The medium ships pure signal (None when nothing is heard) and each radio
adds its own front-end noise (runtime/medium.py module docstring); the
squelch — liquid's AGC squelch analog driven per-sample in ECR_rx_worker
(src/extensible_cognitive_radio.cpp:1299-1324) — skips frame DETECTION on
blocks at the tracked noise floor while keeping stream offsets and the
CE sensing tap intact.
"""

import numpy as np

from cognitive_radio_network_tpu.phy.framegen import OFDMFrameConfig, OFDMFrameGen
from cognitive_radio_network_tpu.runtime.engine import CEEvent
from cognitive_radio_network_tpu.runtime.radio import Radio


def _radio(noise=1e-6, rate=1e6):
    r = Radio(medium_rate=rate, medium_center=460e6)
    r.params.rx_rate = rate  # no resample: medium rate == rx rate
    r.params.rx_freq = 460e6
    r.rx_noise_power = noise
    r.noise_seed = (3, 0)
    r.start_rx()
    return r


class TestSquelch:
    def test_noise_blocks_skip_detection_frame_still_decodes(self, rng):
        """Silent (None) blocks are squelch-skipped after warmup; a frame
        arriving later decodes with the ABSOLUTE stream offset intact."""
        r = _radio()
        n = 8192
        for i in range(10):
            r.push_rx_block(None, t=i * 1e-3, n=n)
        assert r._rx_blocks_seen == 10
        # floor locked to the thermal power; later silent blocks skipped
        assert abs(r._rx_noise_floor - r.rx_noise_power) < 0.3 * r.rx_noise_power
        # offsets advanced through the skipped region
        assert r._rx._residual_offset + len(r._rx._residual) == 10 * n

        gen = OFDMFrameGen(OFDMFrameConfig(), payload_len=32)
        pay = rng.integers(0, 256, (1, 32)).astype(np.uint8)
        hdr = rng.integers(0, 256, (1, 8)).astype(np.uint8)
        iq = np.asarray(gen.assemble(hdr, pay))[0]
        block = np.zeros(n, np.complex64)
        block[100 : 100 + len(iq)] = iq
        r.push_rx_block(block, t=10e-3)
        frames = [
            e for e in r.drain_events() if e.ce_event == CEEvent.PHY_FRAME_RECEIVED
        ]
        assert len(frames) == 1
        assert frames[0].payload_valid
        np.testing.assert_array_equal(frames[0].payload, pay[0])

    def test_sensing_tap_survives_squelch(self):
        """A sensing CE still receives every (noise) sample while frame
        detection is squelched — liquid's AGC sees squelched samples too."""
        r = _radio()
        r.ce_sensing = True
        r.ce_usrp_rx_buffer_length = 512
        n = 4096
        for i in range(8):
            r.push_rx_block(None, t=i * 1e-3, n=n)
        sens = [e for e in r.drain_events() if e.ce_event == CEEvent.USRP_RX_SAMPS]
        assert len(sens) == 8 * n // 512
        p = np.concatenate([np.asarray(e.payload) for e in sens])
        assert abs(np.mean(np.abs(p) ** 2) - r.rx_noise_power) < 0.1 * r.rx_noise_power

    def test_squelch_disable_processes_everything(self):
        r = _radio()
        r.rx_squelch_enabled = False
        for i in range(6):
            r.push_rx_block(None, t=i * 1e-3, n=4096)
        # detection ran on every block: residual carries the stream tail
        assert len(r._rx._residual) > 0


class TestReceiverNoise:
    def test_noise_deterministic_per_seed(self):
        a, b = _radio(), _radio()
        na = a._noise_slice(4096)
        nb = b._noise_slice(4096)
        np.testing.assert_array_equal(na, nb)
        c = _radio()
        c.noise_seed = (3, 1)  # different node index -> independent noise
        assert not np.array_equal(na, c._noise_slice(4096))

    def test_noise_power_calibrated(self):
        r = _radio(noise=2.5e-4)
        x = r._noise_slice(1 << 16)
        assert abs(np.mean(np.abs(x) ** 2) - 2.5e-4) < 2e-5

    def test_zero_noise_silence_is_zeros(self):
        r = _radio(noise=0.0)
        r.rx_squelch_enabled = False
        r.push_rx_block(None, t=0.0, n=4096)
        assert float(np.max(np.abs(r._rx._residual))) == 0.0
