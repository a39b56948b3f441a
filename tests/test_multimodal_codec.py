"""Dependency-free media codec tests (no Spark): PPM/BMP decode,
nearest-neighbor resize, video frame sampling — the real implementations
behind the multimodal_decode_stats query (stubs removed in round 2)."""

import struct

import numpy as np
import pytest

from pypgcdc_spark.operators.multimodal import (
    decode_image,
    encode_ppm,
    encode_video,
    resize_image,
    sample_frames,
    synth_image,
    synth_video,
    _synth_dims,
)


def _encode_bmp24(w, h, arr):
    """Minimal 24-bit BMP writer (bottom-up, BGR, 4-byte row padding) —
    test-local so the production decoder is exercised against an
    independent encoder."""
    row_stride = (w * 3 + 3) & ~3
    img_size = row_stride * h
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y][:, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (row_stride - len(row)))
    return hdr + info + b"".join(rows)


def _pattern(w, h, seed=0):
    n = w * h * 3
    return np.frombuffer(
        bytes((seed + k) % 256 for k in range(n)), dtype=np.uint8
    ).reshape(h, w, 3)


def test_ppm_roundtrip():
    arr = _pattern(5, 4, seed=200)  # crosses the mod-256 wrap
    w, h, got = decode_image(encode_ppm(5, 4, arr.tobytes()))
    assert (w, h) == (5, 4)
    np.testing.assert_array_equal(got, arr)


def test_ppm_header_with_comment():
    arr = _pattern(3, 2)
    payload = b"P6\n# a comment\n3 2\n255\n" + arr.tobytes()
    w, h, got = decode_image(payload)
    assert (w, h) == (3, 2)
    np.testing.assert_array_equal(got, arr)


def test_bmp_roundtrip_with_row_padding():
    # w=3 -> 9-byte rows padded to 12: exercises the stride math.
    arr = _pattern(3, 5, seed=77)
    w, h, got = decode_image(_encode_bmp24(3, 5, arr))
    assert (w, h) == (3, 5)
    np.testing.assert_array_equal(got, arr)


def test_decode_rejects_unknown_magic():
    with pytest.raises(ValueError, match="unsupported image payload"):
        decode_image(b"GIF89a....")


def test_resize_nearest_neighbor_exact():
    arr = _pattern(4, 4)
    out = resize_image(arr, 2, 2)
    # src index = dst * 4 // 2 -> rows/cols {0, 2}.
    np.testing.assert_array_equal(out, arr[np.ix_([0, 2], [0, 2])])
    # Accepts raw payloads too (decodes first).
    out2 = resize_image(encode_ppm(4, 4, arr.tobytes()), 2, 2)
    np.testing.assert_array_equal(out2, out)
    # Upscale repeats source pixels.
    up = resize_image(arr, 8, 8)
    assert up.shape == (8, 8, 3)
    np.testing.assert_array_equal(up[0, 0], arr[0, 0])
    np.testing.assert_array_equal(up[1, 1], arr[0, 0])


def test_video_frame_sampling():
    frames = [encode_ppm(2, 2, _pattern(2, 2, seed=10 * f).tobytes()) for f in range(5)]
    vid = encode_video(frames)
    sampled = list(sample_frames(vid, every_n=2))
    assert [s[0] for s in sampled] == [0, 2, 4]
    for idx, w, h, arr in sampled:
        assert (w, h) == (2, 2)
        np.testing.assert_array_equal(arr, _pattern(2, 2, seed=10 * idx))


def test_synth_image_matches_oracle_formula():
    for doc_id in (0, 1, 17, 36, 255, 1000):
        w, h, s = _synth_dims(doc_id)
        n = w * h * 3
        dw, dh, arr = decode_image(synth_image(doc_id))
        assert (dw, dh) == (w, h)
        expected = n * s + n * (n - 1) // 2 - 256 * max(0, s + n - 256)
        assert int(arr.sum()) == expected
        # Video frames 0 and 2 (every_n=2 over 3 frames).
        vsum = sum(int(a.sum()) for _, _, _, a in sample_frames(synth_video(doc_id), 2))
        s2 = (s + 22) % 256
        assert vsum == expected + (n * s2 + n * (n - 1) // 2 - 256 * max(0, s2 + n - 256))


# -- property-based roundtrips (hypothesis) --------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    @st.composite
    def _images(draw):
        w = draw(st.integers(min_value=1, max_value=16))
        h = draw(st.integers(min_value=1, max_value=16))
        data = draw(
            st.binary(min_size=w * h * 3, max_size=w * h * 3)
        )
        return w, h, np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)

    @settings(max_examples=50, deadline=None)
    @given(_images())
    def test_ppm_roundtrip_property(img):
        w, h, arr = img
        dw, dh, got = decode_image(encode_ppm(w, h, arr.tobytes()))
        assert (dw, dh) == (w, h)
        np.testing.assert_array_equal(got, arr)

    @settings(max_examples=50, deadline=None)
    @given(_images())
    def test_bmp_roundtrip_property(img):
        w, h, arr = img
        dw, dh, got = decode_image(_encode_bmp24(w, h, arr))
        assert (dw, dh) == (w, h)
        np.testing.assert_array_equal(got, arr)

    @settings(max_examples=50, deadline=None)
    @given(
        _images(),
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
    )
    def test_resize_property(img, out_w, out_h):
        w, h, arr = img
        out = resize_image(arr, out_w, out_h)
        assert out.shape == (out_h, out_w, 3)
        # Every output pixel is a source pixel at the NN-mapped index.
        for y in range(out_h):
            for x in range(out_w):
                np.testing.assert_array_equal(
                    out[y, x], arr[(y * h) // out_h, (x * w) // out_w]
                )

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(_images(), min_size=1, max_size=6),
        st.integers(min_value=1, max_value=4),
    )
    def test_frame_sampling_property(imgs, every_n):
        frames = [encode_ppm(w, h, a.tobytes()) for w, h, a in imgs]
        sampled = list(sample_frames(encode_video(frames), every_n=every_n))
        assert [s[0] for s in sampled] == list(range(0, len(frames), every_n))
        for idx, w, h, arr in sampled:
            ew, eh, earr = imgs[idx]
            assert (w, h) == (ew, eh)
            np.testing.assert_array_equal(arr, earr)


def test_wav_roundtrip_and_chunk_walking():
    import numpy as np

    from pypgcdc_spark.operators.multimodal import decode_wav, encode_wav

    x = np.array([0, 1, -1, 32767, -32768, 123], dtype=np.int16)
    sr, y = decode_wav(encode_wav(8000, x))
    assert sr == 8000
    assert (y == x).all()
    # Chunk walker must skip unknown chunks before data (spec-true RIFF).
    import struct

    raw = encode_wav(16000, x)
    fmt_and_rest = raw[12:]
    junk = struct.pack("<4sI", b"LIST", 6) + b"junk\x00\x00"
    patched = raw[:12] + junk + fmt_and_rest
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    sr2, y2 = decode_wav(patched)
    assert sr2 == 16000 and (y2 == x).all()


def test_wav_rejects_malformed():
    import numpy as np
    import pytest

    from pypgcdc_spark.operators.multimodal import decode_wav, encode_wav

    with pytest.raises(ValueError):
        decode_wav(b"nonsense bytes here definitely not riff")
    # Stereo (channels=2) must be rejected, not silently mis-decoded.
    import struct

    raw = bytearray(encode_wav(8000, np.array([1, 2], dtype=np.int16)))
    raw[22] = 2  # channels field inside fmt chunk
    with pytest.raises(ValueError):
        decode_wav(bytes(raw))


def test_synth_audio_matches_closed_form():
    import numpy as np

    from pypgcdc_spark.operators.multimodal import decode_wav, synth_audio

    for doc_id in (0, 1, 7, 123, 4999):
        sr, x = decode_wav(synth_audio(doc_id))
        n = 40 + doc_id % 50
        s = (doc_id * 13) % 997
        k = np.arange(n, dtype=np.int64)
        expect = (s * 31 + k * 17) % 4001 - 2000
        assert sr == 8000 and len(x) == n and (x.astype(np.int64) == expect).all()
