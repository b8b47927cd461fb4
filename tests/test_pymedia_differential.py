"""Differential pins for multimodal/pymedia.py (the r13 mapInArrow port
of the five media metadata queries) against the expression path kept in
multimodal/binary.py.

Two layers, both over a doc_id range that covers every payload class AND
every per-class parity branch (k = d//cycle walks the decoy/Xing-vs-Info/
ogg-full/ebml-doctype alternations):

1. SYNTH bytes: pymedia.<family>_payload(d) must equal the expression
   synth byte-for-byte — the port may not change a single payload bit.
2. PARSE fields: binary.py's expression parsers evaluated over the
   pymedia payloads must equal pymedia's parsers field-for-field — the
   port may not change a single parsed value.

The build+execute of the expression trees is exactly the cost the port
removes, so this differential is `slow`-tier; the default run keeps the
five queries oracle-checked in the parity smoke sample instead."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_market_tracker_etl_spark.multimodal import binary as bx
from crypto_market_tracker_etl_spark.multimodal import pymedia as pm

pytestmark = pytest.mark.slow

N = 480  # ≥ 2 full parity cycles of the largest class (19 × 2 × 2)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(N).select(F.col("id").alias("doc_id"))


def _expr_payloads(ids, expr):
    rows = ids.select("doc_id", expr.alias("p")).collect()
    return {r["doc_id"]: bytes(r["p"]) for r in rows}


def test_synth_bytes_match_expression_path(ids):
    from crypto_market_tracker_etl_spark.queries_ext import (
        _audio_payload_expr,
        _image_payload_expr,
        _media_payload_expr,
    )

    for name, expr, fn in [
        ("image", _image_payload_expr(), pm.image_payload),
        ("audio", _audio_payload_expr(), pm.audio_payload),
        ("media", _media_payload_expr(), pm.media_payload),
    ]:
        truth = _expr_payloads(ids, expr)
        bad = [d for d, b in truth.items() if fn(d) != b]
        assert not bad, f"{name}: synth bytes diverge at doc_ids {bad[:5]}"


def test_mime_and_video_synth_cycles_match(ids):
    """The mime/video payload cycles live inline in pymedia (the old
    query bodies); rebuild them from binary.py synths and compare."""
    d = F.col("doc_id")
    m = d % 16
    w = (F.lit(100) + d % 800).cast("int")
    h = (F.lit(100) + (d * 7) % 800).cast("int")
    mime_expr = (
        F.when(m == 0, bx.synth_png(w, h))
        .when(m == 1, bx.synth_gif(w, h))
        .when(m == 2, bx.synth_wav(F.lit(16000), F.lit(1).cast("int"),
                                   F.lit(16), F.lit(16000)))
        .when(m == 3, bx.synth_mp4(F.lit("isom"), F.lit(600), F.lit(6000),
                                   F.lit(1).cast("int")))
        .when(m == 4, F.unhex(F.lit("FFD8FFE000104A464946")))
        .when(m == 5, F.unhex(F.lit("255044462D312E34")))
        .when(m == 6, F.unhex(F.lit("504B03041400")))
        .when(m == 7, F.unhex(F.lit("1F8B08000000")))
        .when(m == 8, bx.synth_mp4(F.lit("heic"), F.lit(600), F.lit(6000),
                                   F.lit(1).cast("int")))
        .when(m == 9, bx.synth_mp4(F.lit("M4A "), F.lit(600), F.lit(6000),
                                   F.lit(1).cast("int")))
        .when(m == 10, bx.synth_webp_vp8(w, h))
        .when(m == 11, bx.synth_tiff(w, h, little_endian=False))
        .when(m == 12, bx.synth_flac(F.lit(44100), F.lit(2).cast("int"),
                                     F.lit(16), F.lit(44100)))
        .when(m == 13, bx.synth_mp3(F.lit(3), F.lit(0), F.lit(False)))
        .when(m == 14, bx.synth_bmp(w, h))
        .otherwise(bx.synth_ogg(F.lit(48000).cast("int"),
                                F.lit(2).cast("int"), F.lit(160).cast("int")))
    )
    truth = _expr_payloads(ids, mime_expr)
    bad = [d_ for d_, b in truth.items() if pm.mime_payload(d_) != b]
    assert not bad, f"mime: synth bytes diverge at doc_ids {bad[:5]}"

    ts = F.element_at(
        F.array(F.lit(600), F.lit(1000), F.lit(30000), F.lit(90000)),
        (d % 4 + 1).cast("int"),
    ).cast("int")
    dur = (F.lit(1000) + (d * 53) % 900000).cast("int")
    dur64 = (dur + (d % 2) * F.lit(2 ** 33)).cast("long")
    edur = (dur + (F.floor(d / 10) % 2) * F.lit(2 ** 33)).cast("long")
    tracks = (d % 3 + 1).cast("int")
    brand = F.when(d % 2 == 0, F.lit("isom")).otherwise(F.lit("mp42"))
    ew = (F.lit(320) + (d * 3) % 1600).cast("int")
    eh = (F.lit(240) + (d * 7) % 840).cast("int")
    is_wav_row = d % 7 == 6
    is_ebml_row = (d % 5 == 2) & ~is_wav_row
    video_expr = (
        F.when(is_wav_row, bx.synth_wav(F.lit(16000), F.lit(1).cast("int"),
                                        F.lit(16), F.lit(16000)))
        .when(is_ebml_row & (d % 2 == 0),
              bx.synth_mkv("webm", F.lit(1000000), edur, ew, eh))
        .when(is_ebml_row,
              bx.synth_mkv("matroska", F.lit(500000), edur, ew, eh,
                           audio_first=True))
        .when(d % 3 == 1, bx.synth_mp4(brand, ts, dur64, tracks,
                                       version1=True))
        .otherwise(bx.synth_mp4(brand, ts, dur, tracks))
    )
    truth = _expr_payloads(ids, video_expr)
    bad = [d_ for d_, b in truth.items() if pm.video_payload(d_) != b]
    assert not bad, f"video: synth bytes diverge at doc_ids {bad[:5]}"


def test_parsers_match_expression_path(spark):
    """binary.py's expression parsers over pymedia's payload bytes must
    equal pymedia's parsers — covering every class of all five cycles
    plus raw-magic and truncated blobs."""
    payloads = (
        [pm.image_payload(d) for d in range(0, 300)]
        + [pm.audio_payload(d) for d in range(0, 200)]
        + [pm.media_payload(d) for d in range(0, 200)]
        + [pm.mime_payload(d) for d in range(0, 64)]
        + [pm.video_payload(d) for d in range(0, 150)]
    )
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i int, payload binary"
    )
    parsed = df.select(
        "i",
        bx.sniff_mime("payload").alias("mime"),
        bx.image_meta("payload").alias("im"),
        bx.audio_meta("payload").alias("am"),
        bx.video_meta("payload").alias("vm"),
        bx.ebml_doctype("payload").alias("dt"),
        bx.ebml_info("payload").alias("ei"),
        bx.ebml_video_dims("payload").alias("ed"),
    ).collect()
    for row in sorted(parsed, key=lambda r: r["i"]):
        b = payloads[row["i"]]
        assert pm.sniff_mime(b) == row["mime"], (row["i"], b.hex()[:60])
        im = row["im"]
        assert pm.parse_image_meta(b) == (
            im["mime_type"], im["width"], im["height"]), (row["i"], im)
        am = row["am"]
        assert pm.parse_audio_meta(b) == (
            am["mime_type"], am["channels"], am["sample_rate_hz"],
            am["bits_per_sample"], am["duration_ms"], am["bitrate_kbps"],
        ), (row["i"], am)
        vm = row["vm"]
        got = pm.parse_video_mp4(b)
        assert got == (vm["mime_type"], vm["brand"], vm["timescale"],
                       vm["duration_ms"], vm["n_tracks"]), (row["i"], vm, got)
        assert pm._ebml_doctype(b) == row["dt"], row["i"]
        ei, ed = row["ei"], row["ed"]
        assert pm._ebml_info(b) == (
            ei["timescale_ns"], ei["duration_ms"]), (row["i"], ei)
        assert pm._ebml_video_dims(b) == (
            ed["width"], ed["height"]), (row["i"], ed)
