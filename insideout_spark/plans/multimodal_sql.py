"""DuckDB oracles for the REAL uncompressed-container decoders in
plans/multimodal.py (WAV PCM16 / BMP24).

The oracle never touches the payload bytes: it replays the sample /
pixel GENERATOR FORMULA (splitmix64 over a per-doc counter stream) and
aggregates the same exact-integer stats. The Spark side goes
formula -> real container bytes -> real parser -> stats, so a gate
match proves the write->parse round trip of the container layout
(chunk offsets, endianness, bottom-up rows, BGR order, row padding) —
two independent routes to the same integers.
"""

from __future__ import annotations

from .webtext_sql import _SM_ADD, _SM_M1, _SM_M2, _TWO64, _mulmod64_sql


def splitmix64_sql(x_expr: str) -> str:
    """SQL twin of sources/pages._splitmix64 for a HUGEINT expression in
    [0, 2^64) — identical add/xor-shift/multiply pipeline mod 2^64."""
    x = f"((({x_expr}) + {_SM_ADD}) % {_TWO64})"
    z1 = _mulmod64_sql(f"xor({x}, ({x}) // {1 << 30})", _SM_M1)
    z2 = _mulmod64_sql(f"xor({z1}, ({z1}) // {1 << 27})", _SM_M2)
    return f"xor({z2}, ({z2}) // {1 << 31})"


def audio_features_sql(table: str = "documents") -> str:
    """Oracle for multimodal.audio_features over synth_wav_media:
    n_samples = 160 + doc_id % 441, rate = 8000 + (doc_id % 3) * 4025,
    sample_i = int16(splitmix64(doc_id * 2^32 + i) & 0xFFFF)."""
    h = splitmix64_sql(f"(CAST(doc_id AS HUGEINT) * {1 << 32} + i) % {_TWO64}")
    return (
        f"WITH dims AS (SELECT doc_id, 160 + doc_id % 441 AS n, "
        f"8000 + (doc_id % 3) * 4025 AS rate FROM {table}), "
        "idx AS (SELECT doc_id, n, rate, unnest(range(0, n)) AS i FROM dims), "
        f"smp AS (SELECT doc_id, rate, i, CAST(({h}) % 65536 AS BIGINT) AS v "
        "FROM idx), "
        "s AS (SELECT doc_id, rate, i, "
        "CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s FROM smp) "
        "SELECT doc_id, CAST(any_value(rate) AS INTEGER) AS sample_rate, "
        "CAST(count(*) AS INTEGER) AS n_samples, "
        "CAST(max(abs(s)) AS BIGINT) AS peak, "
        "CAST(sum(s * s) AS BIGINT) AS sum_sq, "
        "CAST(sum((i + 1) * s) AS BIGINT) AS wsum "
        "FROM s GROUP BY doc_id"
    )


def png_features_sql(table: str = "documents") -> str:
    """Oracle for multimodal.png_features over synth_png_media:
    w = 1 + doc_id % 11, h = 1 + doc_id % 5, channels = 3 + doc_id % 2
    (RGBA on odd ids), pixel idx in top-down raster order, channel k =
    byte k of splitmix64(doc_id * 2^32 + 2^30 + idx). The Spark side
    goes formula -> filtered scanlines -> DEFLATE -> real PNG chunks ->
    CRC-checked parse -> inflate -> numpy unfilter; this replay of the
    raw formula proves that whole round trip byte-for-byte."""
    h = splitmix64_sql(
        f"(CAST(doc_id AS HUGEINT) * {1 << 32} + {1 << 30} + i) % {_TWO64}"
    )
    return (
        f"WITH dims AS (SELECT doc_id, 1 + doc_id % 11 AS w, 1 + doc_id % 5 AS ht, "
        f"3 + doc_id % 2 AS c FROM {table}), "
        "idx AS (SELECT doc_id, w, ht, c, unnest(range(0, w * ht)) AS i FROM dims), "
        f"px AS (SELECT doc_id, w, ht, c, i, ({h}) AS hv FROM idx), "
        "ch AS (SELECT doc_id, w, ht, c, i, "
        "CAST(hv % 256 AS BIGINT) AS r, "
        "CAST((hv // 256) % 256 AS BIGINT) AS g, "
        "CAST((hv // 65536) % 256 AS BIGINT) AS b, "
        "CAST((hv // 16777216) % 256 AS BIGINT) AS a FROM px) "
        "SELECT doc_id, CAST(any_value(w) AS INTEGER) AS width, "
        "CAST(any_value(ht) AS INTEGER) AS height, "
        "CAST(any_value(c) AS INTEGER) AS channels, "
        "CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g, "
        "CAST(sum(b) AS BIGINT) AS sum_b, "
        "CAST(CASE WHEN any_value(c) = 4 THEN sum(a) ELSE 0 END AS BIGINT) AS sum_a, "
        "CAST(sum((i + 1) * r) AS BIGINT) AS wsum_r "
        "FROM ch GROUP BY doc_id"
    )


def jpeg_features_sql(table: str = "documents") -> str:
    """Oracle for multimodal.jpeg_features over synth_jpeg_media: the
    entropy layer of baseline JPEG is LOSSLESS, so the decoder recovers
    the generator's quantized coefficients exactly and this replay of
    the coefficient formula gates the whole marker/Huffman/byte-
    stuffing/differential-DC/run-length/dequant pipeline.
    w = 8*(1+doc%3), h = 8*(1+doc%2), nb = (w/8)*(h/8); per zigzag
    index k of block b: hv = splitmix64(doc*2^32 + 2^29 + b*64 + k);
    k=0 -> dc = hv%7 - 3; k>0 -> nonzero iff hv%4==0, value
    sign((hv//16)%2) * ((hv//4)%3 + 1); dequant multiplies (k%7)+1."""
    h = splitmix64_sql(
        f"(CAST(doc_id AS HUGEINT) * {1 << 32} + {1 << 29} + b * 64 + k) % {_TWO64}"
    )
    return (
        f"WITH dims AS (SELECT doc_id, 8 * (1 + doc_id % 3) AS w, "
        f"8 * (1 + doc_id % 2) AS ht, "
        f"(1 + doc_id % 3) * (1 + doc_id % 2) AS nb FROM {table}), "
        "bk AS (SELECT doc_id, w, ht, nb, unnest(range(0, nb)) AS b FROM dims), "
        "bkk AS (SELECT doc_id, w, ht, nb, b, unnest(range(0, 64)) AS k FROM bk), "
        f"hv AS (SELECT doc_id, w, ht, nb, b, k, ({h}) AS hv FROM bkk), "
        "cf AS (SELECT doc_id, w, ht, nb, b, k, "
        "CASE WHEN k = 0 THEN CAST(hv % 7 AS BIGINT) - 3 "
        "WHEN hv % 4 = 0 THEN "
        "(CASE WHEN (hv // 16) % 2 = 0 THEN 1 ELSE -1 END) * "
        "(CAST((hv // 4) % 3 AS BIGINT) + 1) "
        "ELSE 0 END AS v FROM hv), "
        "dq AS (SELECT doc_id, w, ht, nb, b, k, v, v * (k % 7 + 1) AS deq FROM cf) "
        "SELECT doc_id, CAST(any_value(w) AS INTEGER) AS width, "
        "CAST(any_value(ht) AS INTEGER) AS height, "
        "CAST(any_value(nb) AS INTEGER) AS n_blocks, "
        "CAST(sum(CASE WHEN k = 0 THEN deq ELSE 0 END) AS BIGINT) AS sum_dc, "
        "CAST(sum(CASE WHEN k > 0 AND deq != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero_ac, "
        "CAST(sum((b * 64 + k + 1) * deq) AS BIGINT) AS wsum_coef, "
        "CAST(sum(abs(deq)) AS BIGINT) AS sum_abs_deq "
        "FROM dq GROUP BY doc_id"
    )


def video_demux_sql(table: str = "documents") -> str:
    """Oracle for multimodal.video_demux_features over synth_mp4_media:
    n = 6 + doc%25, timescale = 600 + (doc%5)*100, duration =
    sum(10 + i%3), size_i = 16 + splitmix64(doc*2^32 + 3*2^28 + 2^20
    + i) % 32, byte_ij = splitmix64(doc*2^32 + 3*2^28 + i*2^8 + j) &
    255. The Spark side goes formula -> real ISO BMFF (two-pass stco
    layout) -> box-tree walk -> stsc/stco chunk resolution -> sliced
    sample bytes; this replay proves every sample was extracted from
    its true mdat offset."""
    stream = 3 << 28
    sz = splitmix64_sql(
        f"(CAST(doc_id AS HUGEINT) * {1 << 32} + {stream} + {1 << 20} + i) % {_TWO64}"
    )
    bt = splitmix64_sql(
        f"(CAST(doc_id AS HUGEINT) * {1 << 32} + {stream} + i * 256 + j) % {_TWO64}"
    )
    return (
        f"WITH dims AS (SELECT doc_id, 6 + doc_id % 25 AS n, "
        f"600 + (doc_id % 5) * 100 AS ts FROM {table}), "
        "smp AS (SELECT doc_id, n, ts, unnest(range(0, n)) AS i FROM dims), "
        f"sz AS (SELECT doc_id, n, ts, i, 16 + CAST(({sz}) % 32 AS BIGINT) AS size_i "
        "FROM smp), "
        "by AS (SELECT doc_id, i, size_i, unnest(range(0, size_i)) AS j FROM sz), "
        f"bv AS (SELECT doc_id, i, j, CAST(({bt}) % 256 AS BIGINT) AS b FROM by), "
        "bagg AS (SELECT doc_id, CAST(sum((i * 64 + j + 1) * b) AS BIGINT) AS wsum_bytes "
        "FROM bv GROUP BY doc_id), "
        "sagg AS (SELECT doc_id, CAST(any_value(ts) AS INTEGER) AS timescale, "
        "CAST(sum(10 + i % 3) AS BIGINT) AS duration, "
        "CAST(any_value(n) AS INTEGER) AS n_samples, "
        "CAST(sum(size_i) AS BIGINT) AS total_bytes, "
        "CAST(sum((i + 1) * size_i) AS BIGINT) AS wsum_size "
        "FROM sz GROUP BY doc_id) "
        "SELECT s.doc_id, s.timescale, s.duration, s.n_samples, "
        "s.total_bytes, s.wsum_size, b.wsum_bytes "
        "FROM sagg s JOIN bagg b ON s.doc_id = b.doc_id"
    )


def frames_sampled_sql(table: str = "documents", every_nth: int = 5) -> str:
    """Oracle for the every-nth frame-extraction gate: replay the
    per-sample size formula for sampled indices (i % n == 0)."""
    stream = 3 << 28
    sz = splitmix64_sql(
        f"(CAST(doc_id AS HUGEINT) * {1 << 32} + {stream} + {1 << 20} + i) % {_TWO64}"
    )
    return (
        f"WITH dims AS (SELECT doc_id, 6 + doc_id % 25 AS n FROM {table}), "
        "smp AS (SELECT doc_id, unnest(range(0, n)) AS i FROM dims) "
        "SELECT doc_id, CAST(i AS INTEGER) AS frame_idx, "
        f"CAST(16 + ({sz}) % 32 AS INTEGER) AS frame_len "
        f"FROM smp WHERE i % {int(every_nth)} = 0"
    )


def mjpeg_pixel_sql(table: str = "documents") -> str:
    """Oracle for multimodal.video_frame_pixel_features over
    synth_mjpeg_media: per doc, n_frames = 3 + doc_id % 4; frame i is a
    real baseline JPEG generated from fid = doc_id*37 + (i+1)*101, so
    the per-frame coefficient stats replay jpeg_features_sql's formula
    with fid in place of doc_id. The Spark side goes formula -> real
    JPEG bytes -> real MP4 mux -> real demux (stsc/stco resolution) ->
    real Huffman/DC/RLE/dequant decode -> stats; a match proves every
    FRAME was extracted from its true mdat offset and decoded exactly.
    (The IDCT pixel sum is pytest-gated — lossy, not SQL-replayable.)"""
    h = splitmix64_sql(
        f"(CAST(fid AS HUGEINT) * {1 << 32} + {1 << 29} + b * 64 + k) % {_TWO64}"
    )
    return (
        f"WITH fr AS (SELECT doc_id, unnest(range(0, 3 + doc_id % 4)) AS i FROM {table}), "
        "fid AS (SELECT doc_id, i, doc_id * 37 + (i + 1) * 101 AS fid FROM fr), "
        "dims AS (SELECT doc_id, i, fid, 8 * (1 + fid % 3) AS w, "
        "8 * (1 + fid % 2) AS ht, (1 + fid % 3) * (1 + fid % 2) AS nb FROM fid), "
        "bk AS (SELECT doc_id, i, fid, w, ht, nb, unnest(range(0, nb)) AS b FROM dims), "
        "bkk AS (SELECT doc_id, i, fid, w, ht, nb, b, unnest(range(0, 64)) AS k FROM bk), "
        f"hv AS (SELECT doc_id, i, w, ht, nb, b, k, ({h}) AS hv FROM bkk), "
        "cf AS (SELECT doc_id, i, w, ht, nb, b, k, "
        "CASE WHEN k = 0 THEN CAST(hv % 7 AS BIGINT) - 3 "
        "WHEN hv % 4 = 0 THEN "
        "(CASE WHEN (hv // 16) % 2 = 0 THEN 1 ELSE -1 END) * "
        "(CAST((hv // 4) % 3 AS BIGINT) + 1) "
        "ELSE 0 END AS v FROM hv), "
        "dq AS (SELECT doc_id, i, w, ht, nb, b, k, v * (k % 7 + 1) AS deq FROM cf) "
        "SELECT doc_id, CAST(i AS INTEGER) AS frame_idx, "
        "CAST(any_value(w) AS INTEGER) AS width, "
        "CAST(any_value(ht) AS INTEGER) AS height, "
        "CAST(sum(CASE WHEN k = 0 THEN deq ELSE 0 END) AS BIGINT) AS sum_dc, "
        "CAST(sum(CASE WHEN k > 0 AND deq != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero_ac, "
        "CAST(sum((b * 64 + k + 1) * deq) AS BIGINT) AS wsum_coef, "
        "CAST(sum(abs(deq)) AS BIGINT) AS sum_abs_deq "
        "FROM dq GROUP BY doc_id, i"
    )


def resize_image_sql(table: str = "documents", max_side: int = 4) -> str:
    """Oracle for multimodal.resize_image_features over synth_bmp_media:
    replay the generator pixel formula at EXACTLY the nearest-neighbor
    sampled source indices — tw = max(1, w*max_side // max(w,h)) (no
    upscale), sx = (2x+1)*w // (2*tw) — all integer arithmetic, so a
    match proves the real decode + the sampling geometry."""
    ms = int(max_side)
    h = splitmix64_sql(
        f"(CAST(doc_id AS HUGEINT) * {1 << 32} + {1 << 31} + src) % {_TWO64}"
    )
    return (
        f"WITH dims AS (SELECT doc_id, 1 + doc_id % 13 AS w, 1 + doc_id % 7 AS ht "
        f"FROM {table}), "
        "t AS (SELECT doc_id, w, ht, "
        f"CASE WHEN greatest(w, ht) <= {ms} THEN w "
        f"ELSE greatest(1, (w * {ms}) // greatest(w, ht)) END AS tw, "
        f"CASE WHEN greatest(w, ht) <= {ms} THEN ht "
        f"ELSE greatest(1, (ht * {ms}) // greatest(w, ht)) END AS th FROM dims), "
        # target raster index j in [0, tw*th): y = j // tw, x = j % tw
        "idx AS (SELECT doc_id, w, ht, tw, th, unnest(range(0, tw * th)) AS j FROM t), "
        "m AS (SELECT doc_id, w, ht, tw, th, j, "
        "((2 * (j // tw) + 1) * ht) // (2 * th) AS sy, "
        "((2 * (j % tw) + 1) * w) // (2 * tw) AS sx FROM idx), "
        "s AS (SELECT doc_id, w, ht, tw, th, j, sy * w + sx AS src FROM m), "
        f"px AS (SELECT doc_id, w, ht, tw, th, j, ({h}) AS hv FROM s), "
        "c AS (SELECT doc_id, w, ht, tw, th, j, "
        "CAST(hv % 256 AS BIGINT) AS r, "
        "CAST((hv // 256) % 256 AS BIGINT) AS g, "
        "CAST((hv // 65536) % 256 AS BIGINT) AS b FROM px) "
        "SELECT doc_id, CAST(any_value(w) AS INTEGER) AS width, "
        "CAST(any_value(ht) AS INTEGER) AS height, "
        "CAST(any_value(tw) AS INTEGER) AS target_w, "
        "CAST(any_value(th) AS INTEGER) AS target_h, "
        "CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g, "
        "CAST(sum(b) AS BIGINT) AS sum_b, "
        "CAST(sum((j + 1) * r) AS BIGINT) AS wsum_r "
        "FROM c GROUP BY doc_id"
    )


def image_features_sql(table: str = "documents") -> str:
    """Oracle for multimodal.image_features over synth_bmp_media:
    w = 1 + doc_id % 13, h = 1 + doc_id % 7, pixel idx in top-down
    raster order, (r,g,b) = low 3 bytes of
    splitmix64(doc_id * 2^32 + 2^31 + idx)."""
    h = splitmix64_sql(
        f"(CAST(doc_id AS HUGEINT) * {1 << 32} + {1 << 31} + i) % {_TWO64}"
    )
    return (
        f"WITH dims AS (SELECT doc_id, 1 + doc_id % 13 AS w, 1 + doc_id % 7 AS ht "
        f"FROM {table}), "
        "idx AS (SELECT doc_id, w, ht, unnest(range(0, w * ht)) AS i FROM dims), "
        f"px AS (SELECT doc_id, w, ht, i, ({h}) AS hv FROM idx), "
        "c AS (SELECT doc_id, w, ht, i, "
        "CAST(hv % 256 AS BIGINT) AS r, "
        "CAST((hv // 256) % 256 AS BIGINT) AS g, "
        "CAST((hv // 65536) % 256 AS BIGINT) AS b FROM px) "
        "SELECT doc_id, CAST(any_value(w) AS INTEGER) AS width, "
        "CAST(any_value(ht) AS INTEGER) AS height, "
        "CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g, "
        "CAST(sum(b) AS BIGINT) AS sum_b, "
        "CAST(sum((i + 1) * r) AS BIGINT) AS wsum_r "
        "FROM c GROUP BY doc_id"
    )
