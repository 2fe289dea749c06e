"""The real multimodal container path: the fixture generator must emit
byte-valid BMP/WAV/PPM containers and the pure-stdlib parser must
decode real header bytes (and refuse malformed ones) — plus a pure-
Python third-engine recompute of the geometry the DuckDB oracle
derives arithmetically.
"""

from __future__ import annotations

import struct

import pytest

from big_data_2021_spark_streaming_spark.operators.multimodal import (
    WAV_RATES,
    build_container,
    multimodal_decode,
    parse_container,
)

SF = "/root/testdata/sf0.001"

TEXTS = ["", "x", "hello world " * 40, "a" * 3000, "Z" * 7]


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 5, 36, 22, 28, 757, 9999])
def test_round_trip_and_third_engine_geometry(doc_id):
    for text in TEXTS:
        media_type, payload = build_container(doc_id, text)
        p = parse_container(payload)
        assert p["media_type"] == media_type
        assert p["n_bytes"] == len(payload)
        kind = doc_id % 3
        if kind == 0:
            w, h = doc_id % 37 + 1, doc_id % 23 + 1
            stride = (3 * w + 3) // 4 * 4
            assert (p["width"], p["height"]) == (w, h)
            assert p["n_bytes"] == 54 + stride * h
        elif kind == 1:
            rate = WAV_RATES[(doc_id // 3) % 3]
            ns = (len(text) * 7) % 3001 + 50
            assert p["sample_rate"] == rate
            assert p["n_samples"] == ns
            assert p["duration_ms"] == (2 * ns * 1000 + rate) // (2 * rate)
            assert p["n_bytes"] == 44 + 2 * ns
        else:
            w, h = doc_id % 29 + 1, doc_id % 17 + 1
            assert (p["width"], p["height"]) == (w, h)
            assert p["n_bytes"] == 9 + len(str(w)) + len(str(h)) + 3 * w * h


def test_bmp_bytes_are_a_wellformed_file():
    _, payload = build_container(36, "pixels!")  # 37x14, stride padding
    assert payload[:2] == b"BM"
    size, _, _, offset = struct.unpack("<IHHI", payload[2:14])
    hsz, w, h, planes, bpp = struct.unpack("<IiiHH", payload[14:30])
    assert (size, offset, hsz, planes, bpp) == (len(payload), 54, 40, 1, 24)
    stride = (bpp * w + 31) // 32 * 4
    assert stride % 4 == 0 and stride >= 3 * w
    assert offset + stride * h == len(payload)
    # padding bytes at each row tail are zero
    for y in range(h):
        row = payload[offset + y * stride : offset + (y + 1) * stride]
        assert set(row[3 * w :]) <= {0}


def test_bmp_topdown_negative_height_parses_as_abs():
    _, payload = build_container(36, "t")
    h = struct.unpack("<i", payload[22:26])[0]
    flipped = payload[:22] + struct.pack("<i", -h) + payload[26:]
    assert parse_container(flipped)["height"] == h


def test_wav_parser_skips_unknown_and_odd_chunks():
    # hand-built RIFF: an odd-length junk chunk (word-aligned with a pad
    # byte) before fmt/data — a real in-the-wild layout
    junk = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
    data = struct.pack("<4sI", b"data", 8) + b"\x01\x02" * 4
    body = junk + fmt + data
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    p = parse_container(payload)
    assert p["media_type"] == "audio/wav"
    assert p["n_samples"] == 4
    assert p["sample_rate"] == 8000


def test_ppm_parser_handles_comments():
    payload = b"P6\n# a comment line\n4 2\n255\n" + b"\xaa" * 24
    p = parse_container(payload)
    assert (p["width"], p["height"]) == (4, 2)


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"GIF89a not supported",
        b"BM" + b"\x00" * 30,  # truncated before full headers
        # BMP whose declared size disagrees with the actual bytes
        struct.pack("<2sIHHI", b"BM", 999, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, 4, 0, 0, 0, 0)
        + b"\x00" * 4,
        # RIFF with a lying length field
        struct.pack("<4sI4s", b"RIFF", 999, b"WAVE"),
        # WAV missing its data chunk
        struct.pack("<4sI4s", b"RIFF", 4 + 24, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16),
        b"P6\n4 2\n255\n" + b"\x00" * 5,  # raster shorter than 3*w*h
        b"P6\n4 2\n65535\n" + b"\x00" * 48,  # unsupported maxval
    ],
)
def test_malformed_containers_raise_value_error(bad):
    with pytest.raises(ValueError):
        parse_container(bad)


def test_e2e_decode_covers_all_kinds_and_never_nulls_wrong_fields(spark):
    rows = multimodal_decode(spark, SF).collect()
    assert len(rows) > 0
    kinds = {r.media_type for r in rows}
    assert kinds == {"image/bmp", "audio/wav", "image/ppm"}
    for r in rows:
        assert r.n_bytes > 0
        if r.media_type == "audio/wav":
            assert r.width is None and r.sample_rate in WAV_RATES
            assert r.duration_ms is not None
        else:
            assert r.sample_rate is None and r.width >= 1 and r.height >= 1


# --- property: synthesis/parse round-trip over the whole input space ---

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        doc_id=st.integers(min_value=0, max_value=2**62),
        text=st.text(
            alphabet=st.characters(codec="utf-8"), max_size=400
        ),
    )
    def test_property_round_trip(doc_id, text):
        media_type, payload = build_container(doc_id, text)
        p = parse_container(payload)
        assert p["media_type"] == media_type
        assert p["n_bytes"] == len(payload)
        kind = doc_id % 3
        if kind == 1:
            # length(text) in the oracle is CHARACTERS; the generator
            # must key n_samples off characters too or non-ASCII text
            # would diverge the twin
            assert p["n_samples"] == (len(text) * 7) % 3001 + 50
        else:
            assert p["width"] >= 1 and p["height"] >= 1

    @settings(max_examples=200, deadline=None)
    @given(blob=st.binary(max_size=200))
    def test_property_arbitrary_bytes_never_parse_silently(blob):
        # random bytes either raise ValueError or, in the measure-zero
        # case they form a valid header, must satisfy the size
        # cross-checks the parser enforces
        try:
            p = parse_container(blob)
        except ValueError:
            return
        assert p["n_bytes"] == len(blob)
        assert p["media_type"] in ("image/bmp", "audio/wav", "image/ppm")

except ImportError:  # hypothesis is in the baked image; belt-and-braces
    pass
