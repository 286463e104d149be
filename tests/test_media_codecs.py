"""Pure-Python media codecs (operators/media_codecs.py): BMP, netpbm,
WAV decode/encode round trips, bilinear resize, feature extraction.
These are the real codecs behind the multimodal operators' decode
step (SURVEY §7 G) — no external image/audio library needed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cowsdb_spark.operators.media_codecs import (
    audio_features,
    decode_bmp,
    decode_image,
    decode_netpbm,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_wav,
    encode_y4m,
    image_features,
    resize_bilinear,
)


class TestBmp:
    def test_round_trip_exact(self):
        rng = np.random.default_rng(42)
        img = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(img))
        assert out is not None and np.array_equal(out, img)

    def test_row_padding_odd_width(self):
        img = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(5, 3, 3)
        out = decode_bmp(encode_bmp(img))
        assert np.array_equal(out, img)

    def test_top_down_and_32bpp(self):
        # hand-build a 2x2 top-down 32bpp BMP: BGRA pixels
        px = [
            (1, 2, 3, 0), (4, 5, 6, 0),   # row 0 (top)
            (7, 8, 9, 0), (10, 11, 12, 0),
        ]
        body = b"".join(struct.pack("<4B", *p) for p in px)
        info = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 32, 0,
                           len(body), 0, 0, 0, 0)
        hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        img = decode_bmp(hdr + info + body)
        assert img.shape == (2, 2, 3)
        assert tuple(img[0, 0]) == (3, 2, 1)   # BGR -> RGB
        assert tuple(img[1, 1]) == (12, 11, 10)

    def test_rejects_compressed_and_garbage(self):
        assert decode_bmp(b"BM" + b"\x00" * 60) is None
        assert decode_bmp(b"nonsense") is None


class TestNetpbm:
    def test_p6_rgb(self):
        img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        raw = b"P6\n# comment\n3 2\n255\n" + img.tobytes()
        assert np.array_equal(decode_netpbm(raw), img)

    def test_p5_gray_promoted_to_rgb_by_decode_image(self):
        gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
        raw = b"P5 3 2 255 " + gray.tobytes()
        assert np.array_equal(decode_netpbm(raw), gray)
        rgb = decode_image(raw)
        assert rgb.shape == (2, 3, 3) and np.array_equal(rgb[:, :, 0], gray)


class TestWav:
    def test_round_trip_sine(self):
        t = np.arange(800) / 8000.0
        sig = 0.5 * np.sin(2 * np.pi * 440 * t)
        arr, rate = decode_wav(encode_wav(sig, 8000))
        assert rate == 8000 and len(arr) == 800
        assert np.max(np.abs(arr - sig)) < 1e-3  # 16-bit quantization

    def test_stereo_downmix_and_8bit(self):
        # hand-build 8-bit stereo: L=255, R=1 → mono ≈ 0
        pcm = bytes([255, 1] * 4)
        fmt = struct.pack("<HHIIHH", 1, 2, 8000, 16000, 2, 8)
        wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
               + b"fmt " + struct.pack("<I", 16) + fmt
               + b"data" + struct.pack("<I", len(pcm)) + pcm)
        arr, rate = decode_wav(wav)
        assert len(arr) == 4 and abs(arr[0]) < 0.01

    def test_rejects_garbage(self):
        assert decode_wav(b"RIFFxxxx") is None
        assert decode_wav(b"\x00" * 64) is None


class TestResize:
    def test_identity(self):
        img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
        assert resize_bilinear(img, 4, 4) is img

    def test_solid_color_stays_solid(self):
        img = np.full((8, 8, 3), 77, dtype=np.uint8)
        out = resize_bilinear(img, 3, 5)
        assert out.shape == (5, 3, 3) and np.all(out == 77)

    def test_2x_upscale_gradient_monotone(self):
        img = np.zeros((1, 4, 3), dtype=np.uint8)
        img[0, :, 0] = [0, 80, 160, 240]
        out = resize_bilinear(img, 8, 1)
        r = out[0, :, 0].astype(int)
        assert all(r[i] <= r[i + 1] for i in range(7))
        assert r[0] == 0 and r[-1] == 240


class TestFeatures:
    def test_image_features_known_values(self):
        img = np.zeros((2, 4, 3), dtype=np.uint8)
        img[:, :, 0] = 100  # pure red block
        f = image_features(img)
        assert f[:3] == [4.0, 2.0, 3.0]
        assert f[3] == 100.0 and f[4] == 0.0 and f[5] == 0.0
        assert f[6] == 0.0  # uniform gray level -> zero std
        assert f[7] == 2.0

    def test_audio_features_known_values(self):
        sig = np.array([0.5, -0.5] * 400)
        f = audio_features(sig, 8000)
        assert abs(f[0] - 100.0) < 1e-9
        assert f[2] == pytest.approx(0.5)
        assert f[3] == pytest.approx(1.0)  # alternating signs: zcr 1
        assert f[4] == 0.5


class TestY4m:
    def test_mono_round_trip_exact(self):
        rng = np.random.default_rng(7)
        frames = rng.integers(0, 256, size=(3, 6, 9), dtype=np.uint8)
        blob = encode_y4m(frames, fps=(10, 1))
        out = decode_y4m(blob)
        assert out is not None
        vid, fps = out
        assert fps == 10.0 and vid.shape == (3, 6, 9, 3)
        # mono stores luma exactly; decode replicates it across RGB
        assert np.array_equal(vid[..., 0], frames)
        assert np.array_equal(vid[..., 1], frames)

    def test_color_round_trip_close(self):
        rng = np.random.default_rng(11)
        frames = rng.integers(0, 256, size=(2, 4, 5, 3), dtype=np.uint8)
        out = decode_y4m(encode_y4m(frames, fps=(25, 1)))
        assert out is not None
        vid, fps = out
        assert fps == 25.0 and vid.shape == frames.shape
        # C444 full-range BT.601 round trip: small quantization error
        assert np.max(np.abs(vid.astype(int) - frames.astype(int))) <= 2

    def test_header_fields_and_rejects(self):
        frames = np.zeros((1, 2, 2, 3), dtype=np.uint8)
        blob = encode_y4m(frames, fps=(30, 1))
        assert blob.startswith(b"YUV4MPEG2 W2 H2 F30:1")
        assert decode_y4m(b"garbage") is None
        assert decode_y4m(b"YUV4MPEG2 W2 H2 F1:1 C420\nFRAME\n" + b"\0" * 6) is None
        assert decode_y4m(blob[:20]) is None  # truncated frame

    def test_frame_sample_decodes_real_pixels(self, spark):
        # x23's operator on the synthetic table: video rows cycle
        # y4m / AVI-DIB / opaque stub; sampled frames of the decodable
        # containers must be valid BMPs whose pixels match the clip's
        # own frames, and is_real must come from the decode site
        from cowsdb_spark.operators.media_codecs import decode_video as d
        from cowsdb_spark.operators.multimodal import (
            sample_frames,
            synthetic_media,
        )

        media = synthetic_media(spark, n=18)
        rows = sample_frames(media, every_ms=250).collect()
        vids = {
            r["media_id"]: bytes(r["payload"])
            for r in media.filter("kind = 'video'").collect()
        }
        real = stub = avi = 0
        for r in rows:
            clip = d(vids[r["media_id"]])
            frame_img = decode_image(bytes(r["frame"]))
            assert r["is_real"] == (clip is not None)
            if clip is None:
                assert frame_img is None  # stub bytes are not a BMP
                stub += 1
                continue
            vid, fps = clip
            fi = min(len(vid) - 1, int(round(r["ts_ms"] / 1000.0 * fps)))
            assert frame_img is not None
            assert np.array_equal(frame_img, vid[fi])
            real += 1
            if vids[r["media_id"]][:4] == b"RIFF":
                avi += 1
        assert real > 0 and stub > 0 and avi > 0  # all tiers exercised

    def test_avi_dib_round_trip_exact(self):
        from cowsdb_spark.operators.media_codecs import (
            decode_avi,
            decode_video,
            encode_avi,
        )

        rng = np.random.default_rng(23)
        frames = rng.integers(0, 256, size=(4, 7, 13, 3), dtype=np.uint8)
        blob = encode_avi(frames, fps=(12, 1), codec="DIB")
        out = decode_avi(blob)
        assert out is not None
        vid, fps = out
        assert fps == 12.0
        assert np.array_equal(vid, frames)  # raw DIB is lossless
        out2 = decode_video(blob)
        assert out2 is not None and np.array_equal(out2[0], frames)
        # rejects
        assert decode_avi(b"RIFF\x08\x00\x00\x00WAVE" + b"\0" * 8) is None
        assert decode_avi(blob[:40]) is None
        assert decode_video(b"\x00" * 64) is None

    def test_avi_mjpeg_round_trip_close(self):
        from cowsdb_spark.operators import media_codecs as mc

        if mc._PIL_Image is None:
            pytest.skip("PIL absent in this container (documented gate)")
        rng = np.random.default_rng(29)
        # smooth gradient content so JPEG error stays small
        yy, xx = np.mgrid[0:16, 0:24]
        frames = np.stack(
            [
                np.stack([(xx * 3 + k) % 200, (yy * 5) % 200, (xx + yy) % 200],
                         axis=-1).astype(np.uint8)
                for k in range(3)
            ]
        )
        blob = mc.encode_avi(frames, fps=(10, 1), codec="MJPG")
        out = mc.decode_avi(blob)
        assert out is not None
        vid, fps = out
        assert fps == 10.0 and vid.shape == frames.shape
        assert np.mean(np.abs(vid.astype(int) - frames.astype(int))) < 8
