"""Tests for CRC, FEC, modem, and bit utilities."""

import numpy as np
import jax.numpy as jnp
import pytest

from cognitive_radio_network_tpu.phy import bits, crc, fec, modem


class TestBits:
    def test_roundtrip(self, rng):
        data = rng.integers(0, 256, 64).astype(np.uint8)
        assert np.array_equal(bits.pack_bits(bits.unpack_bits(data)), data)

    def test_jnp_matches_numpy(self, rng):
        data = rng.integers(0, 256, 32).astype(np.uint8)
        np.testing.assert_array_equal(
            np.asarray(bits.unpack_bits_jnp(jnp.asarray(data))), bits.unpack_bits(data)
        )
        b = bits.unpack_bits(data)
        np.testing.assert_array_equal(
            np.asarray(bits.pack_bits_jnp(jnp.asarray(b))), data
        )


class TestCRC:
    @pytest.mark.parametrize("scheme", ["none", "checksum", "crc16", "crc32"])
    def test_validate_roundtrip(self, rng, scheme):
        data = rng.integers(0, 256, 100).astype(np.uint8)
        chk = crc.crc_generate(scheme, data)
        assert crc.crc_validate(scheme, np.concatenate([data, chk]))

    @pytest.mark.parametrize("scheme", ["checksum", "crc16", "crc32"])
    def test_detects_corruption(self, rng, scheme):
        data = rng.integers(0, 256, 100).astype(np.uint8)
        chk = crc.crc_generate(scheme, data)
        bad = np.concatenate([data, chk])
        bad[3] ^= 0x40
        assert not crc.crc_validate(scheme, bad)

    def test_crc32_known_value(self):
        # CRC-32/IEEE of ASCII "123456789" is 0xCBF43926.
        data = np.frombuffer(b"123456789", np.uint8)
        chk = crc.crc_generate("crc32", data)
        assert int.from_bytes(bytes(chk), "big") == 0xCBF43926

    def test_crc32_jnp_matches(self, rng):
        data = rng.integers(0, 256, (5, 64)).astype(np.uint8)
        got = np.asarray(crc.crc32_jnp(jnp.asarray(data)))
        want = [
            int.from_bytes(bytes(crc.crc_generate("crc32", row)), "big")
            for row in data
        ]
        np.testing.assert_array_equal(got.astype(np.uint32), np.array(want, np.uint32))


class TestFEC:
    @pytest.mark.parametrize("scheme", fec.SCHEMES)
    def test_clean_roundtrip(self, rng, scheme):
        data = rng.integers(0, 256, 50).astype(np.uint8)
        enc = fec.encode(scheme, data)
        assert len(enc) == fec.encoded_length(scheme, len(data))
        dec = fec.decode(scheme, enc, len(data))
        np.testing.assert_array_equal(dec, data)

    @pytest.mark.parametrize("scheme", ["rep3", "h74", "h128", "v27"])
    def test_corrects_sparse_bit_errors(self, rng, scheme):
        data = rng.integers(0, 256, 30).astype(np.uint8)
        enc = fec.encode(scheme, data)
        enc_bits = bits.unpack_bits(enc)
        # one bit error per 23-bit stretch — within each code's correction
        # power (23 is coprime to rep3's copy length so errors never align
        # across copies, and exceeds h74/h128 block sizes)
        for pos in range(5, len(enc_bits) - 8, 23):
            enc_bits[pos] ^= 1
        corrupted = bits.pack_bits(enc_bits)
        dec = fec.decode(scheme, corrupted, len(data))
        np.testing.assert_array_equal(dec, data)

    def test_viterbi_jnp_matches_numpy(self, rng):
        n_bits = 64
        msg = rng.integers(0, 2, n_bits).astype(np.uint8)
        coded = fec.conv_encode_bits(msg)
        # flip a few bits
        coded = coded.copy()
        for pos in (3, 30, 77, 101):
            coded[pos] ^= 1
        dec_np = fec.viterbi_decode_bits(coded, n_bits)
        dec_j = np.asarray(fec.viterbi_decode_jnp(jnp.asarray(coded), n_bits))
        np.testing.assert_array_equal(dec_np, msg)
        np.testing.assert_array_equal(dec_j, msg)

    def test_viterbi_jnp_batched(self, rng):
        n_bits = 40
        msgs = rng.integers(0, 2, (4, n_bits)).astype(np.uint8)
        coded = np.stack([fec.conv_encode_bits(m) for m in msgs])
        dec = np.asarray(fec.viterbi_decode_jnp(jnp.asarray(coded), n_bits))
        np.testing.assert_array_equal(dec, msgs)


class TestModem:
    @pytest.mark.parametrize("scheme", modem.SCHEMES)
    def test_roundtrip(self, rng, scheme):
        m = 1 << modem.bits_per_symbol(scheme)
        syms = rng.integers(0, m, 256)
        x = modem.modulate(scheme, jnp.asarray(syms))
        got, evm = modem.demodulate(scheme, x)
        np.testing.assert_array_equal(np.asarray(got), syms)
        assert float(jnp.max(evm)) < 1e-9

    @pytest.mark.parametrize("scheme", modem.SCHEMES)
    def test_unit_energy(self, scheme):
        pts = np.asarray(modem.constellation(scheme))
        assert abs(np.mean(np.abs(pts) ** 2) - 1.0) < 1e-5

    @pytest.mark.parametrize("scheme", ["qpsk", "qam16", "qam64"])
    def test_gray_neighbors(self, scheme):
        """Nearest neighbors in the constellation differ by exactly 1 bit."""
        pts = np.asarray(modem.constellation(scheme))
        m = len(pts)
        for s in range(m):
            d = np.abs(pts - pts[s])
            d[s] = np.inf
            nearest = np.flatnonzero(d < d.min() + 1e-6)
            for t in nearest:
                assert bin(s ^ t).count("1") == 1, (scheme, s, t)

    def test_noisy_demod_qam16(self, rng):
        syms = rng.integers(0, 16, 2000)
        x = modem.modulate("qam16", jnp.asarray(syms))
        noise = 0.05 * (rng.standard_normal(2000) + 1j * rng.standard_normal(2000))
        got, _ = modem.demodulate("qam16", x + jnp.asarray(noise.astype(np.complex64)))
        ser = np.mean(np.asarray(got) != syms)
        assert ser < 0.01


class TestBatchedEncoders:
    """Batched CRC/FEC/frame encoders are bit-identical to per-frame."""

    def test_crc_generate_batch(self, rng):
        from cognitive_radio_network_tpu.phy import crc

        for scheme in ("none", "checksum", "crc16", "crc32"):
            data = rng.integers(0, 256, (7, 33), dtype=np.uint8)
            batch = crc.crc_generate_batch(scheme, data)
            for i in range(7):
                np.testing.assert_array_equal(
                    batch[i], crc.crc_generate(scheme, data[i]), err_msg=scheme
                )

    def test_fec_encode_batch(self, rng):
        from cognitive_radio_network_tpu.phy import fec

        for scheme in ("none", "rep3", "h74", "h128", "v27"):
            data = rng.integers(0, 256, (5, 40), dtype=np.uint8)
            batch = fec.encode_batch(scheme, data)
            for i in range(5):
                np.testing.assert_array_equal(
                    batch[i], fec.encode(scheme, data[i]), err_msg=scheme
                )

    def test_framegen_batch_encoders(self, rng):
        import dataclasses

        from cognitive_radio_network_tpu.phy.framegen import (
            OFDMFrameConfig,
            OFDMFrameGen,
        )

        cfg = dataclasses.replace(OFDMFrameConfig(), fec0="v27", crc_scheme="crc16")
        gen = OFDMFrameGen(cfg, 48)
        hdrs = rng.integers(0, 256, (4, 8), dtype=np.uint8)
        pays = rng.integers(0, 256, (4, 48), dtype=np.uint8)
        hb = gen.encode_header_batch(hdrs)
        pb = gen.encode_payload_batch(pays)
        for i in range(4):
            np.testing.assert_array_equal(hb[i], gen.encode_header(hdrs[i]))
            np.testing.assert_array_equal(pb[i], gen.encode_payload(pays[i]))
