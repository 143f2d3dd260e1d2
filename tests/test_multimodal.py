"""Real media header decode (stdlib container parse) over the
committed fixtures/media/*.{png,gif,bmp} — the round-2 stub shrunk to
feature extraction only — plus the sniffing unit contract."""

import os

import pytest

from ontology_matcher_spark.operators.multimodal import (
    extract_media_embeddings,
    extract_media_features,
    sniff_media_header,
)
from ontology_matcher_spark.schemas import DOCUMENTS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MEDIA = os.path.join(REPO, "fixtures", "media")


@pytest.mark.parametrize(
    "fname,fmt,w,h",
    [("tiny.png", "png", 3, 2), ("tiny.gif", "gif", 5, 4), ("tiny.bmp", "bmp", 7, 5)],
)
def test_sniff_media_header(fname, fmt, w, h):
    with open(os.path.join(MEDIA, fname), "rb") as f:
        data = f.read()
    assert sniff_media_header(data) == (fmt, w, h)


def test_sniff_rejects_garbage():
    assert sniff_media_header(b"") == (None, None, None)
    assert sniff_media_header(b"not an image at all, sorry") == (None, None, None)
    assert sniff_media_header(b"\x89PNG\r\n\x1a\nshort") == (None, None, None)


def test_real_decode_over_file_refs(spark):
    """fake=False parses committed fixture headers through the full
    mapInPandas path; unresolvable media:// refs yield NULL dims."""
    spans = [
        {"kind": "image", "text": "", "media_ref": f"file://{MEDIA}/tiny.png", "offset": 0},
        {"kind": "image", "text": "", "media_ref": f"file://{MEDIA}/tiny.gif", "offset": 10},
        {"kind": "image", "text": "", "media_ref": f"file://{MEDIA}/tiny.bmp", "offset": 20},
        {"kind": "image", "text": "", "media_ref": "media://image/0/3", "offset": 30},
        {"kind": "text", "text": "no media here", "media_ref": "", "offset": 40},
    ]
    docs = spark.createDataFrame([("d0", spans)], DOCUMENTS)
    rows = {
        r["span_idx"]: r
        for r in extract_media_features(docs, fake=False).collect()
    }
    assert set(rows) == {0, 1, 2, 3}  # text span never decoded
    assert (rows[0]["width"], rows[0]["height"]) == (3, 2)
    assert (rows[1]["width"], rows[1]["height"]) == (5, 4)
    assert (rows[2]["width"], rows[2]["height"]) == (7, 5)
    assert rows[3]["width"] is None and rows[3]["height"] is None
    for r in rows.values():
        assert r["features"] is None  # extraction stays stubbed


# ------------------------------------------- real pixel decode (r4)
def test_png_pixel_decode_pinned():
    """Expected pixels transcribed BY HAND from tiny.png's inflated
    IDAT bytes (filter-0 scanlines: 00|00001e0a001e14001e /
    00|00141e0a141e14141e) — independent of the decoder."""
    from ontology_matcher_spark.operators.multimodal import decode_image

    with open(os.path.join(MEDIA, "tiny.png"), "rb") as f:
        px = decode_image(f.read())
    assert px == [
        [(0, 0, 30), (10, 0, 30), (20, 0, 30)],
        [(0, 20, 30), (10, 20, 30), (20, 20, 30)],
    ]


def test_png_filters_roundtrip():
    """Each PNG filter type (0-4) decodes back to the same pixels: a
    known 2x2 RGB image is re-encoded per filter with an independent
    in-test encoder (straight RFC 2083 filter definitions)."""
    import struct
    import zlib

    from ontology_matcher_spark.operators.multimodal import decode_image

    pixels = [[(10, 200, 30), (250, 60, 7)], [(0, 128, 255), (33, 44, 55)]]
    w = h = 2
    raws = {0: [], 1: [], 2: [], 3: [], 4: []}
    prev = [0] * (w * 3)
    flat = [[c for px in row for c in px] for row in pixels]
    for row in flat:
        raws[0].append(bytes(row))
        raws[1].append(bytes((row[i] - (row[i - 3] if i >= 3 else 0)) & 255 for i in range(6)))
        raws[2].append(bytes((row[i] - prev[i]) & 255 for i in range(6)))
        raws[3].append(bytes(
            (row[i] - (((row[i - 3] if i >= 3 else 0) + prev[i]) >> 1)) & 255
            for i in range(6)
        ))
        def paeth(i, row=row, prev=prev):
            a = row[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        raws[4].append(bytes((row[i] - paeth(i)) & 255 for i in range(6)))
        prev = row

    def make_png(ftype):
        def chunk(typ, payload):
            return (
                struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload))
            )

        raw = b"".join(bytes([ftype]) + line for line in raws[ftype])
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    for ftype in range(5):
        assert decode_image(make_png(ftype)) == pixels, f"filter {ftype}"


def test_bmp_pixel_decode_pinned():
    """BMP rows are raw BGR bottom-up — expected values read straight
    off the committed bytes: bottom row pixels 000000 0a0000 ... (B
    ascending by 10 per column), G ascending by 10 per row upward."""
    from ontology_matcher_spark.operators.multimodal import decode_image

    with open(os.path.join(MEDIA, "tiny.bmp"), "rb") as f:
        px = decode_image(f.read())
    assert len(px) == 5 and len(px[0]) == 7
    # decoder returns top-down: top row has the HIGHEST G (4*10)
    assert px[0] == [(0, 40, 10 * x) for x in range(7)]
    assert px[4] == [(0, 0, 10 * x) for x in range(7)]  # bottom row


def test_gif_pixel_decode_checkerboard():
    from ontology_matcher_spark.operators.multimodal import decode_image

    with open(os.path.join(MEDIA, "tiny.gif"), "rb") as f:
        px = decode_image(f.read())
    blk, wht = (0, 0, 0), (255, 255, 255)
    assert px == [
        [[blk, wht][(x + y) % 2] for x in range(5)] for y in range(4)
    ]


def test_lzw_roundtrip_with_table_growth():
    """_lzw_decode vs an INDEPENDENT in-test LZW encoder that uses
    real table growth (not the clear-per-literal trick the fixture
    encoder uses) — exercises the code-width bump and the
    code==len(table) (KwKwK) special case."""
    import random

    from ontology_matcher_spark.operators.multimodal import _lzw_decode

    def lzw_encode(indices, min_code):
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        table = {(i,): i for i in range(clear)}
        next_code = eoi + 1
        width = min_code + 1
        codes = [(clear, width)]
        buf = ()
        for s in indices:
            if buf + (s,) in table:
                buf = buf + (s,)
                continue
            codes.append((table[buf], width))
            table[buf + (s,)] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
            buf = (s,)
        if buf:
            codes.append((table[buf], width))
        codes.append((eoi, width))
        bits = []
        for code, wdt in codes:
            bits.extend((code >> i) & 1 for i in range(wdt))
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j, bit in enumerate(bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)

    rng = random.Random(7)
    for trial in range(20):
        n = rng.randrange(1, 400)
        seq = [rng.randrange(4) for _ in range(n)]
        if trial % 3 == 0:  # runs → KwKwK case
            seq = [v for v in seq for _ in range(rng.randrange(1, 6))]
        assert _lzw_decode(lzw_encode(seq, 2), 2, len(seq)) == seq


def test_media_embeddings_end_to_end(spark):
    """extract_media_embeddings: real pixel decode → 24-dim histogram
    through mapInPandas; expected histograms hand-computed from the
    pinned pixel patterns above."""
    spans = [
        {"kind": "image", "text": "", "media_ref": f"file://{MEDIA}/tiny.png", "offset": 0},
        {"kind": "image", "text": "", "media_ref": f"file://{MEDIA}/tiny.gif", "offset": 10},
        {"kind": "image", "text": "", "media_ref": f"file://{MEDIA}/tiny.bmp", "offset": 20},
        {"kind": "audio", "text": "", "media_ref": "media://audio/0/9", "offset": 30},
        {"kind": "text", "text": "words", "media_ref": "", "offset": 40},
    ]
    docs = spark.createDataFrame([("d0", spans)], DOCUMENTS)
    rows = {r["span_idx"]: r for r in extract_media_embeddings(docs).collect()}
    assert set(rows) == {0, 1, 2, 3}

    def close(xs, ys):
        assert len(xs) == len(ys) and all(abs(a - b) < 1e-4 for a, b in zip(xs, ys))

    # PNG: every channel value < 32 → bin 0 of each channel
    png = [0.0] * 24
    png[0] = png[8] = png[16] = 1.0
    close(rows[0]["features"], png)
    # GIF checkerboard: half 0 (bin 0), half 255 (bin 7), per channel
    gif = [0.0] * 24
    for base in (0, 8, 16):
        gif[base] = gif[base + 7] = 0.5
    close(rows[1]["features"], gif)
    # BMP 7x5 (raw bytes are B,G,R): R all 0 → bin0; G 0..40 by row →
    # 28/35 bin0 + 7/35 bin1; B 0..60 by column → 20/35 bin0 + 15/35 bin1
    bmp = [0.0] * 24
    bmp[0] = 1.0
    bmp[8], bmp[9] = 28 / 35, 7 / 35
    bmp[16], bmp[17] = 20 / 35, 15 / 35
    close(rows[2]["features"], bmp)
    # undecodable media: metadata row kept, NULL features
    assert rows[3]["features"] is None and rows[3]["width"] is None
    assert (rows[0]["width"], rows[0]["height"]) == (3, 2)


def test_wav_header_and_features_pinned():
    """tiny.wav (committed; mono 8 kHz 16-bit PCM, 64 ramp+sine
    frames) — container facts and amplitude histogram pinned from an
    independent hand-computation of the generator formula."""
    from ontology_matcher_spark.operators.multimodal import (
        parse_wav_header,
        wav_features,
    )

    with open(os.path.join(MEDIA, "tiny.wav"), "rb") as f:
        data = f.read()
    hdr = parse_wav_header(data)
    assert hdr == {
        "channels": 1,
        "sample_rate": 8000,
        "bits_per_sample": 16,
        "block_align": 2,
        "data_offset": 44,
        "n_frames": 64,
        "duration_sec": 0.008,
    }
    feats = wav_features(data)
    assert feats[:4] == [1.0, 8.0, 16.0, 0.008]
    # histogram mass sums to 1 over the 8 amplitude bins
    assert abs(sum(feats[4:]) - 1.0) < 1e-6
    assert feats[4:8] == [0.21875, 0.296875, 0.359375, 0.125]
    assert feats[8:] == [0.0, 0.0, 0.0, 0.0]
    # non-WAV bytes → None (images keep their own path)
    assert wav_features(b"RIFFxxxxAVI LIST") is None
    assert wav_features(b"\x89PNG\r\n\x1a\n" + b"0" * 40) is None


def test_wav_features_inconsistent_block_align_clamped():
    """A header whose block_align disagrees with channels*bits/8
    (stereo 16-bit but block_align=2) used to make np.frombuffer
    request more bytes than the payload holds and raise — one corrupt
    span aborting the job. The sample count is clamped to the payload;
    the row still carries the container facts + a valid histogram."""
    import struct

    from ontology_matcher_spark.operators.multimodal import wav_features

    payload = struct.pack("<64h", *([1000] * 64))  # 64 samples = 128 B
    # fmt says channels=2, bits=16 (true bytes/frame 4) but
    # block_align=2 → n_frames = 128//2 = 64 → n_samp = 128 requests
    # 256 bytes from a 128-byte payload without the clamp
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 2, 16)
        + b"data" + struct.pack("<I", len(payload))
    )
    feats = wav_features(hdr + payload)
    assert feats is not None
    assert feats[0] == 2.0 and feats[2] == 16.0  # container facts kept
    assert abs(sum(feats[4:]) - 1.0) < 1e-6  # histogram over clamped samples


def test_wav_through_media_embeddings(spark):
    """The audio path through the production mapInPandas surface: a
    file://-backed WAV span yields real features (no longer the NULL
    envelope); undecodable audio refs still yield NULL features."""
    from ontology_matcher_spark.operators.multimodal import (
        extract_media_embeddings,
    )

    spans = [
        {"kind": "audio", "text": "", "media_ref": f"file://{MEDIA}/tiny.wav", "offset": 0},
        {"kind": "audio", "text": "", "media_ref": "media://audio/0/9", "offset": 10},
    ]
    docs = spark.createDataFrame([("d0", spans)], DOCUMENTS)
    rows = {r["span_idx"]: r for r in extract_media_embeddings(docs).collect()}
    assert rows[0]["features"] is not None
    assert abs(rows[0]["features"][3] - 0.008) < 1e-6  # duration
    assert rows[0]["width"] is None  # no image dims for audio
    assert rows[1]["features"] is None  # unresolvable ref stays NULL


def test_decode_throughput_quarter_megapixel():
    """Round-4 verdict item 6: the vectorized decode path must handle
    a ~0.25-megapixel PNG in interactive time (the old per-pixel
    Python loops ran ~10⁶ interpreter ops per stage — multiple
    seconds each for unfilter + RGB-ify + histogram). Bound is
    generous for a loaded sandbox; the old path could not meet it."""
    import struct as st
    import time
    import zlib as zl

    import numpy as np

    from ontology_matcher_spark.operators.multimodal import (
        decode_image_array,
        histogram_features,
    )

    w = h = 512
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # encode with the vectorizable filters (0/1/2 cycling): Sub/Up
    # encoding = forward difference of the target scanlines
    raw = bytearray()
    prev = np.zeros((w, 3), dtype=np.int16)
    for y in range(h):
        ftype = y % 3
        row = px[y].astype(np.int16)
        if ftype == 0:
            enc = row
        elif ftype == 1:  # Sub: raw[x] = row[x] - row[x-1]
            enc = row - np.vstack([np.zeros((1, 3), dtype=np.int16), row[:-1]])
        else:  # Up: raw[x] = row[x] - prev[x]
            enc = row - prev
        raw.append(ftype)
        raw += (enc % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(typ, body):
        return (
            st.pack(">I", len(body)) + typ + body
            + st.pack(">I", zl.crc32(typ + body))
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zl.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    t0 = time.time()
    arr = decode_image_array(png)
    feats = histogram_features(arr)
    wall = time.time() - t0
    assert arr is not None and arr.shape == (h, w, 3)
    assert (arr == px).all()  # decode is exact
    assert abs(sum(feats) - 3.0) < 1e-3  # 3 channels, each L1=1
    print(f"\n0.25MP decode+histogram: {wall:.3f}s")
    assert wall < 3.0, f"vectorized decode too slow: {wall:.2f}s"
