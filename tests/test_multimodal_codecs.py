"""Real WAV/PPM codec round-trips and rejection paths."""
import numpy as np
import pytest

from olap_xtrctr_spark.operators import multimodal as M


def test_wav_roundtrip_bitexact():
    payload = M.make_wav(7, 240, 16000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    rate, s = M.decode_wav(payload)
    assert rate == 16000
    assert np.array_equal(s, M.wav_samples(7, 240))


def test_wav_rejects_unsupported_layout():
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00" * 16)
    with pytest.raises(ValueError, match="2ch"):
        M.decode_wav(buf.getvalue())


def test_ppm_roundtrip_and_comment_header():
    img = M.decode_ppm(M.make_ppm(5, 20, 16))
    assert img.shape == (16, 20, 3)
    assert np.array_equal(img, M.ppm_pixels(5, 20, 16))
    # '#' comments between header tokens are legal PPM
    with_comment = b"P6\n# made by hand\n4 2\n255\n" + bytes(range(24))
    assert M.decode_ppm(with_comment).shape == (2, 4, 3)
    assert M.decode_ppm(with_comment)[0, 0, 2] == 2


def test_ppm_rejects_wrong_magic_and_maxval():
    with pytest.raises(ValueError, match="P6"):
        M.decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 4)
    with pytest.raises(ValueError, match="maxval"):
        M.decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)


def test_resize_nearest_index_mapping():
    img = M.ppm_pixels(3, 20, 16)
    out = M.resize_nearest(img, 8, 8)
    assert out.shape == (8, 8, 3)
    for y, x in ((0, 0), (3, 5), (7, 7)):
        assert np.array_equal(out[y, x], img[(y * 16) // 8, (x * 20) // 8])


def test_wav_decode_stats_distributed(spark):
    out = {r["media_id"]: r
           for r in M.wav_decode_stats(
               M.synthetic_wav_media(spark, 6)).collect()}
    assert len(out) == 6
    s = M.wav_samples(4, 200 + 4 % 5 * 40).astype(np.int64)
    r = out[4]
    assert r["sample_rate"] == 8000 * (1 + 4 % 3)
    assert r["n_samples"] == len(s)
    assert r["sum_amp"] == int(s.sum())
    assert r["sum_sq"] == int((s * s).sum())
    assert r["n_zero_cross"] == int(((s[:-1] < 0) != (s[1:] < 0)).sum())


def test_ppm_decode_stats_distributed(spark):
    out = {r["media_id"]: r
           for r in M.ppm_decode_stats(
               M.synthetic_ppm_media(spark, 5)).collect()}
    img = M.ppm_pixels(2, 16 + 2 % 4 * 4, 12 + 2 % 3 * 4).astype(np.int64)
    r = out[2]
    assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
    assert r["sum_g"] == int(img[:, :, 1].sum())
    weights = 1 + (np.arange(img.size, dtype=np.int64) % 97)
    assert r["wsum_px"] == int((img.ravel() * weights).sum())


def test_ppm_header_fuzz_roundtrip_and_clean_rejection():
    """Property: any (w, h, comment/whitespace layout) round-trips; any
    corrupted prefix either raises ValueError or parses to a raster of
    the declared shape — never an unhelpful crash."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(w=st.integers(1, 40), h=st.integers(1, 30),
           ws=st.sampled_from([" ", "\n", "\t", "\n# c\n"]),
           mid=st.integers(0, 1 << 30))
    def roundtrip(w, h, ws, mid):
        raster = M.ppm_pixels(mid, w, h)
        payload = b"P6" + ws.encode() + str(w).encode() + b" " \
            + str(h).encode() + ws.encode() + b"255\n" + raster.tobytes()
        img = M.decode_ppm(payload)
        assert img.shape == (h, w, 3)
        assert (img == raster).all()

    roundtrip()

    @settings(max_examples=200, deadline=None)
    @given(junk=st.binary(min_size=0, max_size=64))
    def rejects(junk):
        try:
            M.decode_ppm(b"P6\n" + junk)
        except (ValueError, IndexError):
            pass        # clean structured rejection

    rejects()


def test_ppm_truncated_header_raises_not_hangs():
    """Regression: a header that ends mid-token (no trailing whitespace)
    used to spin forever — past-the-end slices are b'' and never
    .isspace().  Must raise ValueError instead."""
    import pytest
    for payload in (b"P6", b"P6\n", b"P6\n12", b"P6\n12 34",
                    b"P6\n12 34 255", b"P6\n# comment only",
                    b"P6\n0 5\n255\n", b"P6\n5 -1\n255\n"):
        with pytest.raises((ValueError, IndexError)):
            M.decode_ppm(payload)


def test_wav_decode_rejects_corruption_cleanly():
    """Corrupted/truncated RIFF containers must raise ValueError (the
    family's single structured rejection type) — never a raw stdlib
    internal or a hang."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pytest

    good = M.make_wav(7, 256, 8000)

    @settings(max_examples=200, deadline=None)
    @given(cut=st.integers(0, len(good) - 1),
           junk=st.binary(min_size=0, max_size=32))
    def fuzz(cut, junk):
        payload = good[:cut] + junk
        try:
            rate, s = M.decode_wav(payload)
            assert rate > 0                 # parsed => sane header
        except ValueError:
            pass                            # clean structured rejection

    fuzz()

    # stereo/8-bit contract rejections stay explicit
    import io
    import wave as wv
    buf = io.BytesIO()
    with wv.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="PCM16 mono"):
        M.decode_wav(buf.getvalue())
