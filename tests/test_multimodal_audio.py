"""The synthesized WAV headers are REAL: the stdlib ``wave`` module (an
independent RIFF reader) must parse the same parameters the in-engine
expression parser extracts — a differential test against a third
implementation, beyond the DuckDB oracle's analytic check of the
[audio_meta]/[mime_sniff] queries."""

from __future__ import annotations

import io
import wave

from pyspark.sql import functions as F

from crypto_market_tracker_etl_spark.multimodal.binary import (
    audio_meta,
    sniff_mime,
    synth_wav,
)


def test_synth_wav_opens_with_stdlib_wave(spark):
    rows = (
        spark.range(6)
        .select(
            F.col("id"),
            synth_wav(
                F.lit(8000) + F.col("id").cast("int") * 1000,
                (F.col("id") % 2 + 1).cast("int"),
                F.when(F.col("id") % 2 == 0, F.lit(16)).otherwise(F.lit(8)),
                F.lit(12345).cast("long"),
            ).alias("payload"),
        )
        .collect()
    )
    for r in rows:
        wf = wave.open(io.BytesIO(bytes(r.payload)))
        assert wf.getframerate() == 8000 + r.id * 1000
        assert wf.getnchannels() == r.id % 2 + 1
        assert wf.getsampwidth() == (2 if r.id % 2 == 0 else 1)
        assert wf.getnframes() == 12345


def test_audio_meta_matches_stdlib_wave(spark):
    df = spark.range(10).select(
        synth_wav(
            F.lit(44100),
            F.lit(2).cast("int"),
            F.lit(16),
            (F.lit(1000) + F.col("id") * 997).cast("long"),
        ).alias("payload")
    )
    got = df.select(audio_meta(F.col("payload")).alias("m"), "payload").collect()
    for r in got:
        wf = wave.open(io.BytesIO(bytes(r.payload)))
        assert r.m.mime_type == "audio/x-wav"
        assert r.m.channels == wf.getnchannels() == 2
        assert r.m.sample_rate_hz == wf.getframerate() == 44100
        assert r.m.bits_per_sample == wf.getsampwidth() * 8 == 16
        assert r.m.duration_ms == wf.getnframes() * 1000 // 44100


def test_audio_meta_unknown_bytes_never_error(spark):
    df = spark.createDataFrame(
        [(b"\x00",), (b"",), (b"RIFFxxxx",), (b"not audio at all",)],
        "payload binary",
    )
    got = df.select(audio_meta(F.col("payload")).alias("m")).collect()
    for r in got:
        assert r.m.mime_type == "application/octet-stream"
        assert r.m.channels is None and r.m.duration_ms is None


def test_sniff_mime_signatures(spark):
    cases = [
        (bytes.fromhex("FFD8FFE0") + b"rest", "image/jpeg"),
        (b"%PDF-1.7 ...", "application/pdf"),
        (bytes.fromhex("504B0304") + b"zip", "application/zip"),
        (bytes.fromhex("1F8B08"), "application/gzip"),
        (b"plain text", "application/octet-stream"),
        (b"RIFF1234WAVEfmt rest", "audio/x-wav"),
        # broadcast-WAV shape: bext/LIST chunks precede "fmt " — the ROUTER
        # must still send it to the audio pipeline (the fixed-layout
        # audio_meta parser separately NULLs non-canonical layouts)
        (b"RIFF1234WAVEbext" + b"\x00" * 8, "audio/x-wav"),
        (b"RIFF1234AVI LIST", "application/octet-stream"),  # RIFF-not-WAVE
        (b"", "application/octet-stream"),
    ]
    df = spark.createDataFrame([(p,) for p, _ in cases], "payload binary")
    got = [r[0] for r in df.select(sniff_mime(F.col("payload"))).collect()]
    assert got == [m for _, m in cases]
