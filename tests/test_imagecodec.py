"""Real image decode in-environment: the vendored pure-Python PPM/BMP
codec (operators/imagecodec.py) and the multimodal operators driven
over actual image bytes (not the digest stub)."""

from __future__ import annotations

import numpy as np
import pytest

from kamu_cli_spark.operators import imagecodec as ic


def _gradient(w: int, h: int) -> np.ndarray:
    """Deterministic test image: R=x, G=y, B=(x+y) mod 256."""
    xs = np.arange(w, dtype=np.uint16)
    ys = np.arange(h, dtype=np.uint16)
    r = np.broadcast_to(xs % 256, (h, w))
    g = np.broadcast_to((ys % 256)[:, None], (h, w))
    b = (r + g) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


class TestCodec:
    def test_ppm_p6_roundtrip(self):
        img = _gradient(37, 23)
        out = ic.decode(ic.encode_ppm(img))
        assert out.shape == (23, 37, 3)
        assert np.array_equal(out, img)

    def test_ppm_p6_comments_and_split_header(self):
        img = _gradient(4, 2)
        raw = b"P6 # inline comment\n# full line\n 4\t2 # dims\n255\n" + img.tobytes()
        assert np.array_equal(ic.decode(raw), img)

    def test_ppm_p3_ascii(self):
        raw = b"P3\n2 2\n255\n255 0 0  0 255 0\n0 0 255  255 255 255\n"
        out = ic.decode(raw)
        assert out.shape == (2, 2, 3)
        assert out[0, 0].tolist() == [255, 0, 0]
        assert out[1, 1].tolist() == [255, 255, 255]

    def test_ppm_maxval_rescale(self):
        raw = b"P3\n1 1\n31\n31 0 15\n"
        out = ic.decode(raw)
        assert out[0, 0].tolist() == [255, 0, (15 * 255) // 31]

    def test_bmp_roundtrip_with_row_padding(self):
        # width 3 -> 9-byte rows padded to 12: exercises the pad path
        img = _gradient(3, 5)
        raw = ic.encode_bmp(img)
        assert raw[:2] == b"BM"
        out = ic.decode(raw)
        assert np.array_equal(out, img)

    def test_bmp_topdown_rows(self):
        img = _gradient(2, 2)
        raw = bytearray(ic.encode_bmp(img))
        # flip the height sign to top-down and reorder the rows to match
        import struct

        struct.pack_into("<i", raw, 22, -2)
        data_off = struct.unpack_from("<I", raw, 10)[0]
        rows = [bytes(raw[data_off + 8 * i : data_off + 8 * (i + 1)]) for i in range(2)]
        raw[data_off:] = rows[1] + rows[0]
        assert np.array_equal(ic.decode(bytes(raw)), img)

    def test_sniff(self):
        assert ic.sniff(ic.encode_ppm(_gradient(2, 2))) == "ppm"
        assert ic.sniff(ic.encode_bmp(_gradient(2, 2))) == "bmp"
        assert ic.sniff(b"hello world, definitely text") is None
        assert ic.sniff(None) is None

    def test_decode_errors(self):
        with pytest.raises(ic.ImageDecodeError):
            ic.decode(b"P6\n4 4\n255\n\x00\x00")  # truncated pixels
        with pytest.raises(ic.ImageDecodeError):
            ic.decode(b"BM" + b"\x00" * 60)  # bogus header fields
        with pytest.raises(ic.ImageDecodeError):
            ic.decode(b"plain text payload!!")

    def test_resize_nearest(self):
        img = _gradient(8, 8)
        up = ic.resize_nearest(img, 16, 16)
        assert up.shape == (16, 16, 3)
        # pixel-center sampling: each source pixel becomes a 2x2 block
        assert np.array_equal(up[::2, ::2], img)
        down = ic.resize_nearest(img, 4, 4)
        assert down.shape == (4, 4, 3)
        assert np.array_equal(down, img[1::2, 1::2])


class TestSparkDecode:
    def _media(self, spark, payloads):
        rows = [(i, "image/x-test", bytearray(p), {}) for i, p in enumerate(payloads)]
        from kamu_cli_spark.operators.multimodal import MEDIA_SCHEMA

        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    def test_decode_image_real_bytes_through_spark(self, spark):
        from kamu_cli_spark.operators.multimodal import decode_image

        img = _gradient(6, 4)
        media = self._media(
            spark, [ic.encode_ppm(img), ic.encode_bmp(img), b"not an image"]
        )
        out = {r["media_id"]: r for r in decode_image(media, 3, 2).collect()}
        for mid in (0, 1):
            r = out[mid]
            assert r["decoded"] and (r["orig_width"], r["orig_height"]) == (6, 4)
            got = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(2, 3, 3)
            assert np.array_equal(got, ic.resize_nearest(img, 3, 2))
        assert out[2]["decoded"] is False and out[2]["pixels"] is None

    def test_extract_features_uses_real_pixels_for_images(self, spark):
        from kamu_cli_spark.operators.multimodal import (
            _stub_feature,
            extract_features,
        )

        # solid mid-gray image: means are exactly 128 -> feature ~0.0039
        img = np.full((10, 10, 3), 128, dtype=np.uint8)
        payload = ic.encode_ppm(img)
        media = self._media(spark, [payload, b"text payload"])
        rows = {r["media_id"]: r for r in extract_features(media).collect()}
        f = rows[0]["feature"]
        assert len(f) == 8
        # mean channels at [-1,1]-mapped 128/255, stds exactly -1 (solid)
        expect_mean = 128 / 255 * 2 - 1
        for ch in f[2:5]:
            assert abs(ch - expect_mean) < 1e-6
        for ch in f[5:8]:
            assert abs(ch - (-1.0)) < 1e-6
        # non-image payloads keep the deterministic digest stub
        assert rows[1]["feature"] == pytest.approx(
            _stub_feature(b"text payload"), abs=1e-6
        )
