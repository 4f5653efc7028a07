import jax
import numpy as np
import pytest

from neural_network_image_compression_tpu.coding import (
    build_tables,
    compress_image,
    decode_latent,
    decompress_image,
    encode_latent,
    estimate_bits,
    pack_container,
    quantize_pmf,
    rans,
    unpack_container,
)
from neural_network_image_compression_tpu.coding.container import ContainerHeader
from neural_network_image_compression_tpu.config import Config
from neural_network_image_compression_tpu.models import NeuralCodec


def _skewed_pmf(rng, c, l):
    raw = rng.exponential(1.0, (c, l)) ** 3
    return raw / raw.sum(axis=1, keepdims=True)


class TestQuantizePmf:
    def test_sums_and_floor(self, rng):
        pmf = _skewed_pmf(rng, 8, 256)
        cdf = quantize_pmf(pmf, 16)
        assert cdf.shape == (8, 257)
        assert (cdf[:, 0] == 0).all()
        assert (cdf[:, -1] == 1 << 16).all()
        freqs = np.diff(cdf.astype(np.int64), axis=1)
        assert freqs.min() >= 1

    def test_deterministic(self, rng):
        pmf = _skewed_pmf(rng, 4, 256)
        c1 = quantize_pmf(pmf, 16)
        c2 = quantize_pmf(pmf.copy(), 16)
        np.testing.assert_array_equal(c1, c2)

    def test_degenerate_pmf(self):
        pmf = np.zeros((2, 256))
        pmf[0, 3] = 1.0  # all mass on one symbol
        cdf = quantize_pmf(pmf, 16)
        freqs = np.diff(cdf.astype(np.int64), axis=1)
        assert freqs.min() >= 1
        assert (cdf[:, -1] == 1 << 16).all()


class TestRans:
    @pytest.mark.parametrize("n,c", [(0, 1), (1, 1), (1000, 1), (4096, 32), (999, 7)])
    def test_cpp_round_trip(self, rng, n, c):
        pmf = _skewed_pmf(rng, c, 256)
        cdf = quantize_pmf(pmf, 16)
        # Distribution mismatch is fine here — round-trip must hold for ANY
        # symbols since every symbol has frequency >= 1.
        sym = rng.integers(0, 256, n, dtype=np.uint8)
        blob = rans.encode(sym, cdf)
        out = rans.decode(blob, n, cdf)
        np.testing.assert_array_equal(out, sym)

    def test_native_matches_python(self, rng):
        assert rans.native_available(), "C++ rANS must build in this environment"
        pmf = _skewed_pmf(rng, 4, 256)
        cdf = quantize_pmf(pmf, 16)
        sym = rng.integers(0, 256, 1024, dtype=np.uint8)
        blob_c = rans.encode(sym, cdf)
        blob_py = rans.encode_py(sym, cdf)
        assert blob_c == blob_py
        np.testing.assert_array_equal(rans.decode_py(blob_c, 1024, cdf), sym)

    def test_size_close_to_entropy(self, rng):
        pmf = _skewed_pmf(rng, 2, 256)
        cdf = quantize_pmf(pmf, 16)
        sym = np.stack(
            [rng.choice(256, size=20000, p=pmf[0]), rng.choice(256, size=20000, p=pmf[1])],
            axis=-1,
        ).reshape(-1).astype(np.uint8)
        blob = rans.encode(sym, cdf)
        est_bits = estimate_bits(sym, cdf)
        actual_bits = 8 * len(blob)
        # within 1% + the 32-bit state flush
        assert actual_bits <= est_bits * 1.01 + 64
        assert actual_bits >= est_bits * 0.99

    def test_uniform_worst_case(self, rng):
        # near-incompressible data must still round-trip (and not explode)
        cdf = quantize_pmf(np.full((1, 256), 1 / 256), 16)
        sym = rng.integers(0, 256, 10000, dtype=np.uint8)
        blob = rans.encode(sym, cdf)
        assert len(blob) <= 10000 * 1.05 + 8
        np.testing.assert_array_equal(rans.decode(blob, 10000, cdf), sym)


class TestContainer:
    def test_round_trip(self):
        header = ContainerHeader(
            model_id="base-ycbcr-32", colorspace="ycbcr", levels=256,
            latent_channels=32, orig_h=512, orig_w=768, lat_h=64, lat_w=96,
        )
        streams = [b"abc", b"", b"\x00\xff" * 10]
        blob = pack_container(header, streams)
        h2, s2 = unpack_container(blob)
        assert h2 == header
        assert s2 == streams

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            unpack_container(b"JUNKxxxxxxx")


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = Config()
        codec = NeuralCodec(cfg)
        params = codec.init(jax.random.key(0))
        tables = build_tables(codec, params)
        return codec, params, tables

    def test_latent_bit_exact_round_trip(self, setup, rng):
        codec, params, tables = setup
        sym = rng.integers(0, 256, (8, 12, 96), dtype=np.uint8)
        streams = encode_latent(sym, *tables)
        out = decode_latent(streams, (8, 12), *tables)
        np.testing.assert_array_equal(out, sym)

    def test_compress_decompress_image(self, setup, rng, jit_forward):
        codec, params, tables = setup
        rgb = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
        blob = compress_image(codec, params, rgb, tables)
        out = decompress_image(codec, params, blob, tables)
        assert out.shape == rgb.shape and out.dtype == np.uint8
        # bitstream round-trip must equal the direct forward path exactly
        direct = jit_forward(codec, params, rgb)
        np.testing.assert_array_equal(out, direct)


class TestCrypto:
    def test_encrypt_round_trip(self):
        from neural_network_image_compression_tpu.coding.crypto import (
            decrypt,
            encrypt,
            is_encrypted,
        )

        payload = b"\x00\x01\x02" * 1000 + b"tail"
        blob = encrypt(payload, "hunter2")
        assert is_encrypted(blob) and not is_encrypted(payload)
        assert blob != payload
        assert decrypt(blob, "hunter2") == payload

    def test_wrong_password_and_tamper(self):
        from neural_network_image_compression_tpu.coding.crypto import decrypt, encrypt

        blob = encrypt(b"secret latent data", "right")
        with pytest.raises(ValueError):
            decrypt(blob, "wrong")
        tampered = blob[:-5] + bytes(5)
        with pytest.raises(ValueError):
            decrypt(tampered, "right")

    def test_chacha20_rfc8439_block_vector(self):
        """RFC 8439 section 2.3.2: the serialized block function output."""
        from neural_network_image_compression_tpu.coding.crypto import (
            chacha20_blocks,
        )

        key = bytes(range(32))
        nonce = bytes.fromhex("000000090000004a00000000")
        block = chacha20_blocks(key, nonce, np.array([1], dtype=np.uint64))
        expect = bytes.fromhex(
            "10f1e7e4d13b5915500fdd1fa32071c4"
            "c7d1f4c733c068030422aa9ac3d46c4e"
            "d2826446079faa0914c2d705d98b02a2"
            "b5129cd1de164eb9cbd083e8a2503c4e"
        )
        assert block.tobytes() == expect

    def test_chacha20_rfc8439_encryption_vector(self):
        """RFC 8439 section 2.4.2: the sunscreen plaintext."""
        from neural_network_image_compression_tpu.coding.crypto import chacha20_xor

        key = bytes(range(32))
        nonce = bytes.fromhex("000000000000004a00000000")
        plaintext = (
            b"Ladies and Gentlemen of the class of '99: If I could offer you "
            b"only one tip for the future, sunscreen would be it."
        )
        expect = bytes.fromhex(
            "6e2e359a2568f98041ba0728dd0d6981"
            "e97e7aec1d4360c20a27afccfd9fae0b"
            "f91b65c5524733ab8f593dabcd62b357"
            "1639d624e65152ab8f530c359f0861d8"
            "07ca0dbf500d6a6156a38e088a22b65e"
            "52bc514d16ccf806818ce91ab7793736"
            "5af90bbf74a35be6b40b8eedf2785e42"
            "874d"
        )
        got = chacha20_xor(key, nonce, plaintext, counter=1)
        assert got == expect
        assert chacha20_xor(key, nonce, got, counter=1) == plaintext

    def test_key_separation_and_header_authenticated(self):
        """The envelope header (incl. salt) is covered by the MAC: flipping
        a salt byte must fail authentication, not silently derive a different
        key and emit garbage."""
        from neural_network_image_compression_tpu.coding.crypto import (
            WrongKeyError,
            decrypt,
            encrypt,
        )

        blob = bytearray(encrypt(b"payload", "pw"))
        blob[7] ^= 1  # inside the salt
        with pytest.raises(WrongKeyError):
            decrypt(bytes(blob), "pw")

    def test_legacy_v1_container_still_decrypts(self):
        """Containers written by the pre-v2 format (no version byte,
        SHA-256-CTR keystream, single PBKDF2 key) must keep decrypting —
        recognized purely by their own MAC verifying."""
        import hashlib
        import hmac as hmac_mod
        import struct

        from neural_network_image_compression_tpu.coding.crypto import (
            decrypt,
            derive_key,
        )

        payload = b"legacy latent payload" * 40
        password = "old-password"
        salt, nonce = bytes(range(16)), bytes(range(16, 32))
        key = derive_key(password, salt)
        stream = bytearray()
        counter = 0
        while len(stream) < len(payload):
            stream += hashlib.sha256(
                key + nonce + struct.pack("<Q", counter)
            ).digest()
            counter += 1
        cipher = bytes(a ^ b for a, b in zip(payload, stream))
        tag = hmac_mod.new(key, nonce + cipher, hashlib.sha256).digest()
        legacy_blob = b"NICE" + salt + nonce + cipher + tag
        assert decrypt(legacy_blob, password) == payload
        with pytest.raises(ValueError):
            decrypt(legacy_blob, "not-the-password")

    def test_encrypted_container_end_to_end(self, rng, jit_forward):
        import jax

        cfg = Config()
        codec = NeuralCodec(cfg)
        params = codec.init(jax.random.key(0))
        tables = build_tables(codec, params)
        rgb = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
        blob = compress_image(codec, params, rgb, tables, password="pw")
        out = decompress_image(codec, params, blob, tables, password="pw")
        direct = jit_forward(codec, params, rgb)
        np.testing.assert_array_equal(out, direct)
        with pytest.raises(ValueError):
            decompress_image(codec, params, blob, tables)  # no password


class TestRans64:
    """64-bit 4-way interleaved coder (container flag bit4): round-trip,
    byte-identity vs the pure-python twin, and cross-engine containers."""

    @pytest.mark.parametrize("n,c", [(0, 1), (1, 1), (5, 3), (4096, 32), (999, 7)])
    def test_round_trip(self, rng, n, c):
        pmf = _skewed_pmf(rng, c, 256)
        cdf = quantize_pmf(pmf, 16)
        sym = rng.integers(0, 256, n, dtype=np.uint8)
        blob = rans.encode64(sym, cdf)
        np.testing.assert_array_equal(rans.decode64(blob, n, cdf), sym)

    def test_native_matches_python_twin(self, rng):
        pmf = _skewed_pmf(rng, 4, 256)
        cdf = quantize_pmf(pmf, 16)
        sym = rng.integers(0, 256, 1003, dtype=np.uint8)
        blob = rans.encode64(sym, cdf)
        assert blob == rans.encode64_py(sym, cdf)
        np.testing.assert_array_equal(rans.decode64_py(blob, 1003, cdf), sym)

    def test_indexed_round_trip_and_twin(self, rng):
        pmf = _skewed_pmf(rng, 16, 64)
        cdf = quantize_pmf(pmf, 16)
        idx = rng.integers(0, 16, 777).astype(np.int32)
        sym = rng.integers(0, 64, 777, dtype=np.uint8)
        blob = rans.encode64_indexed(sym, idx, cdf)
        np.testing.assert_array_equal(rans.decode64_indexed(blob, idx, cdf), sym)
        assert blob == rans.encode64_indexed_py(sym, idx, cdf)
        np.testing.assert_array_equal(
            rans.decode64_indexed_py(blob, idx, cdf), sym
        )

    def test_rate_overhead_vs_rans32(self, rng):
        # Interleaving costs only the extra flush words (4 states instead of
        # one 32-bit state): ~20 bytes per stream, not a rate regression.
        pmf = _skewed_pmf(rng, 8, 256)
        cdf = quantize_pmf(pmf, 16)
        sym = np.searchsorted(
            np.cumsum(pmf[0]), rng.random(50_000)
        ).astype(np.uint8)
        b32 = rans.encode(sym, cdf)
        b64 = rans.encode64(sym, cdf)
        assert len(b64) <= len(b32) + 32

    def test_container_coder_flag_round_trip(self):
        header = ContainerHeader(
            model_id="m", colorspace="ycbcr", levels=256, latent_channels=2,
            orig_h=8, orig_w=8, lat_h=1, lat_w=1, coder="rans64",
        )
        blob = pack_container(header, [b"a", b"b", b"c"])
        got, streams = unpack_container(blob)
        assert got.coder == "rans64"
        legacy = ContainerHeader(
            model_id="m", colorspace="ycbcr", levels=256, latent_channels=2,
            orig_h=8, orig_w=8, lat_h=1, lat_w=1,
        )
        got2, _ = unpack_container(pack_container(legacy, [b"a", b"b", b"c"]))
        assert got2.coder == "rans32"

    def test_decompress_honours_stream_engine(self, rng):
        # A container written with the legacy coder must decode on a codec
        # configured for rans64 (self-describing streams), and vice versa.
        import dataclasses

        from neural_network_image_compression_tpu.coding.codec_stream import (
            compress_image as _compress,
        )

        for write_engine in ("rans32", "rans64"):
            cfg = Config()
            cfg = cfg.replace(
                codec=dataclasses.replace(cfg.codec, coder=write_engine)
            )
            codec = NeuralCodec(cfg)
            params = codec.init(jax.random.key(0), (32, 32))
            img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            blob = _compress(codec, params, img)
            header, _ = unpack_container(blob)
            assert header.coder == write_engine
            read_cfg = Config()
            read_cfg = read_cfg.replace(
                codec=dataclasses.replace(
                    read_cfg.codec,
                    coder="rans64" if write_engine == "rans32" else "rans32",
                )
            )
            reader = NeuralCodec(read_cfg)
            out = decompress_image(reader, params, blob)
            assert out.shape == (32, 32, 3)
