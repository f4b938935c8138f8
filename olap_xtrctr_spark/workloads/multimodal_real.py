"""Real-codec multimodal entries (round 7): WAV audio decode, PPM image
decode, and real nearest-neighbor resize — full-oracle.

The payloads are REAL containers (RIFF/WAVE written by the stdlib
``wave`` module; binary P6 PPM), parsed back by real header-aware
decoders (`operators/multimodal.py`).  The sample/pixel content is
closed-form integer arithmetic, so DuckDB recomputes the expected
decoded values from the formula and every aggregate must match
bit-exactly — this certifies the *decode path*, not just plumbing.

The compressed-format slots (JPEG/MP3/MP4) remain env-blocked and
honestly stubbed; these entries cover the uncompressed regime a
container-less environment can support for real.
"""
from __future__ import annotations

from ..operators import multimodal as M

# WAV fixture: id i -> 200 + (i%5)*40 PCM16 mono samples at
# 8000*(1+i%3) Hz, s(t) = ((i*2654435761 + t*69069) % 65536) - 32768.
_WAV_ORACLE = """WITH m AS (SELECT unnest(generate_series(0, 127)) AS i),
    p AS (SELECT i, 200 + (i % 5) * 40 AS n, 8000 * (1 + i % 3) AS rate
          FROM m),
    t AS (SELECT i, n, rate, unnest(generate_series(0, n - 1)) AS t
          FROM p),
    s AS (SELECT i, n, rate, t,
                 ((i * 2654435761 + t * 69069) % 65536) - 32768 AS v
          FROM t),
    z AS (SELECT i, n, rate, t, v,
                 lag(v) OVER (PARTITION BY i ORDER BY t) AS pv
          FROM s)
    SELECT CAST(i AS BIGINT) AS media_id,
           CAST(rate AS INTEGER) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(SUM(v) AS BIGINT) AS sum_amp,
           CAST(SUM(v * v) AS BIGINT) AS sum_sq,
           CAST(MIN(v) AS INTEGER) AS min_amp,
           CAST(MAX(v) AS INTEGER) AS max_amp,
           CAST(COUNT(*) FILTER (WHERE pv IS NOT NULL
                                   AND (pv < 0) <> (v < 0)) AS BIGINT)
               AS n_zero_cross
    FROM z GROUP BY i, n, rate"""

# PPM fixture: id i -> (16 + (i%4)*4) x (12 + (i%3)*4) RGB, pixel
# p(x,y,c) = (i*31 + x*7 + y*13 + c*101) % 256.  wsum_px is the
# position-weighted checksum: v * (1 + byte_offset % 97), byte_offset
# = (y*w + x)*3 + c — order-sensitive, catches axis/channel swaps.
_PPM_STATS = """SELECT CAST(i AS BIGINT) AS media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(SUM(v) FILTER (WHERE c = 0) AS BIGINT) AS sum_r,
           CAST(SUM(v) FILTER (WHERE c = 1) AS BIGINT) AS sum_g,
           CAST(SUM(v) FILTER (WHERE c = 2) AS BIGINT) AS sum_b,
           CAST(SUM(v * (1 + ((y * w + x) * 3 + c) % 97)) AS BIGINT)
               AS wsum_px
    FROM v GROUP BY i, w, h"""

_PPM_ORACLE = ("""WITH m AS (SELECT unnest(generate_series(0, 95)) AS i),
    d AS (SELECT i, 16 + (i % 4) * 4 AS w, 12 + (i % 3) * 4 AS h FROM m),
    yy AS (SELECT i, w, h, unnest(generate_series(0, h - 1)) AS y FROM d),
    xx AS (SELECT i, w, h, y, unnest(generate_series(0, w - 1)) AS x
           FROM yy),
    cc AS (SELECT i, w, h, y, x, unnest(generate_series(0, 2)) AS c
           FROM xx),
    v AS (SELECT i, w, h, y, x, c,
                 (i * 31 + x * 7 + y * 13 + c * 101) % 256 AS v
          FROM cc)
    """ + _PPM_STATS)

# Resized raster: out 8x8, src_x = (x*w)//8, src_y = (y*h)//8 (top-left
# nearest-neighbor) — the oracle evaluates the pixel formula at the
# mapped source coordinates and weights by the OUTPUT raster offset.
_PPM_RESIZE_ORACLE = """WITH m AS (
        SELECT unnest(generate_series(0, 95)) AS i),
    d AS (SELECT i, 16 + (i % 4) * 4 AS sw, 12 + (i % 3) * 4 AS sh FROM m),
    yy AS (SELECT i, sw, sh, unnest(generate_series(0, 7)) AS y FROM d),
    xx AS (SELECT i, sw, sh, y, unnest(generate_series(0, 7)) AS x
           FROM yy),
    cc AS (SELECT i, sw, sh, y, x, unnest(generate_series(0, 2)) AS c
           FROM xx),
    v AS (SELECT i, 8 AS w, 8 AS h, y, x, c,
                 (i * 31 + ((x * sw) // 8) * 7
                  + ((y * sh) // 8) * 13 + c * 101) % 256 AS v
          FROM cc)
    """ + _PPM_STATS


def register(add) -> None:

    add("multimodal_wav_decode_stats",
        lambda spark, sf: M.wav_decode_stats(
            M.synthetic_wav_media(spark, 128)),
        _WAV_ORACLE)

    add("multimodal_ppm_decode_stats",
        lambda spark, sf: M.ppm_decode_stats(
            M.synthetic_ppm_media(spark, 96)),
        _PPM_ORACLE)

    add("multimodal_ppm_resize_real",
        lambda spark, sf: M.ppm_resize_stats(
            M.synthetic_ppm_media(spark, 96), 8, 8),
        _PPM_RESIZE_ORACLE)
