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


def _py_flac_streaminfo(b: bytes):
    """Independent pure-Python FLAC STREAMINFO bit parser (the
    _py_jpeg_dims pattern). Returns (sr, ch, bps, total_samples) or
    None."""
    if b[0:4] != b"fLaC" or (b[4] & 0x7F) != 0:
        return None
    packed = int.from_bytes(b[18:26], "big")
    sr = packed >> 44
    ch = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    ts = packed & 0xFFFFFFFFF
    return (sr, ch, bps, ts)


def _py_mp3_header(b: bytes):
    """Independent pure-Python MP3 header decode behind the ID3v2 skip.
    Returns (sample_rate, channels) or None."""
    p = 0
    if b[0:3] == b"ID3":
        size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
        p = 10 + size
    if len(b) < p + 4 or b[p] != 0xFF or (b[p + 1] >> 5) != 7:
        return None
    ver = (b[p + 1] >> 3) & 3
    layer = (b[p + 1] >> 1) & 3
    br_idx = b[p + 2] >> 4
    sr_idx = (b[p + 2] >> 2) & 3
    table = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
             0: (11025, 12000, 8000)}
    if ver not in table or sr_idx == 3 or layer == 0 or br_idx == 15:
        return None
    ch = 1 if (b[p + 3] >> 6) == 3 else 2
    return (table[ver][sr_idx], ch)


def test_synth_flac_roundtrip_and_independent_parser(spark):
    """synth_flac emits bytes BOTH parsers read back exactly — including
    total-sample counts past 2^32, where the 36-bit field's nibble split
    would first betray a packing bug."""
    from crypto_market_tracker_etl_spark.multimodal.binary import synth_flac

    rows = (
        spark.range(1, 30)
        .select(
            "id",
            synth_flac(
                F.lit(8000) + (F.col("id") * 997 % 100000).cast("int"),
                (F.col("id") % 8 + 1).cast("int"),
                (F.col("id") % 28 + 4).cast("int"),
                (F.col("id") * 12345 + (F.col("id") % 2) * F.lit(2**33)).cast(
                    "long"
                ),
            ).alias("payload"),
        )
        .select("id", "payload", audio_meta(F.col("payload")).alias("m"))
        .collect()
    )
    for r in rows:
        sr = 8000 + r.id * 997 % 100000
        ch, bps = r.id % 8 + 1, r.id % 28 + 4
        ts = r.id * 12345 + (r.id % 2) * 2**33
        assert _py_flac_streaminfo(bytes(r.payload)) == (sr, ch, bps, ts), r.id
        assert (r.m.mime_type, r.m.channels, r.m.sample_rate_hz,
                r.m.bits_per_sample, r.m.duration_ms) == (
            "audio/flac", ch, sr, bps, ts * 1000 // sr,
        ), r.id


def test_synth_mp3_roundtrip_and_independent_parser(spark):
    """synth_mp3 (bare and ID3v2-prefixed, pads past 127 exercising the
    multi-byte synchsafe size) reads back identically through the Spark
    parser and the pure-Python reference; bits/duration stay NULL (the
    honest codec boundary)."""
    from crypto_market_tracker_etl_spark.multimodal.binary import synth_mp3

    vbits = (
        F.when(F.col("id") % 3 == 0, F.lit(3))
        .when(F.col("id") % 3 == 1, F.lit(2))
        .otherwise(F.lit(0))
    )
    rows = (
        spark.range(1, 30)
        .select(
            "id",
            synth_mp3(vbits, F.col("id") * 7 % 3, F.col("id") % 2 == 0).alias(
                "bare"
            ),
            synth_mp3(
                vbits, F.col("id") * 7 % 3, F.col("id") % 2 == 0,
                id3_pad=F.lit(100) + F.col("id") * 13 % 300,
            ).alias("tagged"),
        )
        .select(
            "id", "bare", "tagged",
            audio_meta(F.col("bare")).alias("mb"),
            audio_meta(F.col("tagged")).alias("mt"),
        )
        .collect()
    )
    table = {0: (44100, 48000, 32000), 1: (22050, 24000, 16000),
             2: (11025, 12000, 8000)}
    for r in rows:
        sr = table[r.id % 3][r.id * 7 % 3]
        ch = 1 if r.id % 2 == 0 else 2
        for m, p in (("mb", "bare"), ("mt", "tagged")):
            assert _py_mp3_header(bytes(r[p])) == (sr, ch), (p, r.id)
            mm = r[m]
            assert (mm.mime_type, mm.channels, mm.sample_rate_hz) == (
                "audio/mpeg", ch, sr,
            ), (m, r.id)
            assert mm.bits_per_sample is None and mm.duration_ms is None
        assert len(bytes(r["tagged"])) == 14 + 100 + r.id * 13 % 300


def _py_mp3_duration(b: bytes):
    """Independent pure-Python MP3 duration/bitrate estimate — the same
    two-tier policy every tag reader ships: Xing/Info frame count when
    present, else CBR byte-length arithmetic; None when the stream is
    shorter than one frame. Bitrate is None under a Xing tag (VBR — the
    nominal first-frame rate misdescribes it; r10 review) and the
    header rate under Info (LAME's CBR convention) or no tag. Returns
    (kbps, duration_ms) or None."""
    hdr = _py_mp3_header(b)
    if hdr is None:
        return None
    p = 0
    if b[0:3] == b"ID3":
        p = 10 + ((b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9])
    ver = (b[p + 1] >> 3) & 3
    layer = (b[p + 1] >> 1) & 3
    if layer != 1:  # Layer III only
        return None
    br_idx = b[p + 2] >> 4
    if br_idx == 0:
        return None
    v1 = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    v2 = (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    kbps = (v1 if ver == 3 else v2)[br_idx - 1]
    sr = hdr[0]
    spf = 1152 if ver == 3 else 576
    mono = (b[p + 3] >> 6) == 3
    si = (17 if mono else 32) if ver == 3 else (9 if mono else 17)
    tag_at = p + 4 + si
    if b[tag_at : tag_at + 4] in (b"Xing", b"Info"):
        tag_kbps = None if b[tag_at : tag_at + 4] == b"Xing" else kbps
        flags = int.from_bytes(b[tag_at + 4 : tag_at + 8], "big")
        if flags & 1:
            frames = int.from_bytes(b[tag_at + 8 : tag_at + 12], "big")
            return (tag_kbps, frames * spf * 1000 // sr)
        return (tag_kbps, None)
    audio_bytes = len(b) - p
    frame_size = spf // 8 * kbps * 1000 // sr + ((b[p + 2] >> 1) & 1)
    if audio_bytes < frame_size:
        return (kbps, None)
    return (kbps, audio_bytes * 8 // kbps)


def test_mp3_cbr_and_xing_duration(spark):
    """The r10 duration tiers: a CBR body (duration from byte length ×
    bitrate), a Xing VBR tag (duration from the exact frame count,
    overriding the byte estimate), and an ID3-tagged CBR body (the tag
    bytes must NOT count as audio). The Spark parse and the independent
    pure-Python estimator agree bit-exactly; bodiless headers keep the
    honest NULL."""
    from crypto_market_tracker_etl_spark.multimodal.binary import synth_mp3

    vbits = (
        F.when(F.col("id") % 3 == 0, F.lit(3))
        .when(F.col("id") % 3 == 1, F.lit(2))
        .otherwise(F.lit(0))
    )
    sr_idx = F.col("id") * 7 % 3
    mono = F.col("id") % 2 == 0
    rows = (
        spark.range(1, 30)
        .select(
            "id",
            synth_mp3(
                vbits, sr_idx, mono, n_frames=F.lit(40) + F.col("id") * 3
            ).alias("cbr"),
            synth_mp3(
                vbits, sr_idx, mono, xing_frames=F.lit(900) + F.col("id") * 31
            ).alias("vbr"),
            synth_mp3(
                vbits, sr_idx, mono,
                xing_frames=F.lit(700) + F.col("id") * 17,
                vbr_sig=F.lit("496E666F"),  # "Info": CBR by convention
            ).alias("info_cbr"),
            synth_mp3(
                vbits, sr_idx, mono,
                id3_pad=F.lit(100) + F.col("id") * 13 % 300,
                n_frames=F.lit(25),
            ).alias("tagged_cbr"),
        )
        .select(
            "id", "cbr", "vbr", "info_cbr", "tagged_cbr",
            audio_meta(F.col("cbr")).alias("mc"),
            audio_meta(F.col("vbr")).alias("mv"),
            audio_meta(F.col("info_cbr")).alias("mi"),
            audio_meta(F.col("tagged_cbr")).alias("mt"),
        )
        .collect()
    )
    for r in rows:
        for m, p in (
            ("mc", "cbr"), ("mv", "vbr"), ("mi", "info_cbr"),
            ("mt", "tagged_cbr"),
        ):
            kbps, dur = _py_mp3_duration(bytes(r[p]))
            assert (r[m].bitrate_kbps, r[m].duration_ms) == (kbps, dur), (
                m, r.id, (r[m].bitrate_kbps, r[m].duration_ms), (kbps, dur),
            )
            assert r[m].duration_ms is not None, (m, r.id)
        # the policy itself, pinned explicitly: Xing → VBR → NULL rate;
        # Info → CBR → header rate
        assert r["mv"].bitrate_kbps is None
        assert r["mi"].bitrate_kbps is not None


def test_mp3_xing_without_frame_count_stays_null(spark):
    """A Xing tag whose flags clear the frames bit carries no count —
    duration must stay NULL (not fall through to a CBR estimate over
    VBR bytes: that is the lie the tag exists to prevent)."""
    # MPEG1 Layer III, 44100, stereo, idx 9 (128 kbps), side info 32
    hdr = bytes([0xFF, 0xFB, 0x90, 0x40])
    xing_noframes = (
        hdr + b"\x00" * 32 + b"Xing" + b"\x00\x00\x00\x00" + b"\x00" * 400
    )
    df = spark.createDataFrame([(xing_noframes,)], "payload binary")
    m = df.select(audio_meta(F.col("payload")).alias("m")).collect()[0].m
    assert m.mime_type == "audio/mpeg" and m.bitrate_kbps is None  # VBR
    assert m.duration_ms is None
    assert _py_mp3_duration(xing_noframes) == (None, None)


def test_audio_malformed_flac_mp3_never_error(spark):
    """A FLAC whose first block is not STREAMINFO, an ID3 tag with no
    frame behind it, and a desynced bare header all yield NULL fields
    (mime still routed) — the image_meta contract."""
    cases = {
        # fLaC + first block type 4 (VORBIS_COMMENT): no STREAMINFO first
        1: (b"fLaC\x04\x00\x00\x22" + b"\x00" * 34, "audio/flac"),
        # ID3 tag, size 5, then junk that is not a frame header
        2: (b"ID3\x04\x00\x00\x00\x00\x00\x05" + b"\x00" * 5 + b"junk",
            "audio/mpeg"),
        # bare FF but second byte fails the sync mask
        3: (bytes([0xFF, 0x1B, 0x90, 0x40]), "application/octet-stream"),
        # 11-bit sync holds but every field is reserved (all-ones blob):
        # must NOT register as MPEG audio (review r9)
        4: (b"\xff" * 8, "application/octet-stream"),
        # sync + valid version/layer but reserved bitrate (1111)
        5: (bytes([0xFF, 0xFB, 0xF0, 0x40]), "application/octet-stream"),
    }
    df = spark.createDataFrame(
        [(k, p) for k, (p, _) in cases.items()], "id long, payload binary"
    )
    got = {
        r["id"]: r["m"]
        for r in df.select("id", audio_meta(F.col("payload")).alias("m")).collect()
    }
    for k, (_, mime) in cases.items():
        assert got[k].mime_type == mime, k
        assert got[k].channels is None and got[k].sample_rate_hz is None, k
        assert got[k].bits_per_sample is None and got[k].duration_ms is None, k


def test_sniff_mime_signatures(spark):
    cases = [
        (bytes.fromhex("FFD8FFE0") + b"rest", "image/jpeg"),
        (b"fLaC\x00\x00\x00\x22" + b"\x00" * 34, "audio/flac"),
        (b"ID3\x04\x00\x00\x00\x00\x00\x05", "audio/mpeg"),
        (bytes([0xFF, 0xFB, 0x92, 0x40]), "audio/mpeg"),
        (b"\xff" * 8, "application/octet-stream"),  # reserved fields
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


def _py_ogg_vorbis(b: bytes):
    """Independent pure-Python Ogg Vorbis id-header parse: page header →
    segment-count hop → packet fields. None when not an Ogg page or the
    first packet is not a Vorbis id header."""
    import struct

    if b[:4] != b"OggS" or len(b) < 28:
        return None
    n_segs = b[26]
    p = 27 + n_segs
    if b[p : p + 7] != b"\x01vorbis":
        return None
    ch = b[p + 11]
    sr = struct.unpack("<I", b[p + 12 : p + 16])[0]
    nominal = struct.unpack("<i", b[p + 20 : p + 24])[0]
    kbps = nominal // 1000 if 0 < nominal else None
    return (ch, sr, kbps)


def _py_ogg_duration_ms(b: bytes):
    """Independent pure-Python Ogg page WALK — not a tail scan: hops
    page to page via the real lacing values (27-byte header + segment
    table + summed segment lengths), tracking the granule of the page
    that carries the EOS flag. Returns duration_ms from that granule
    and the id header's sample rate, or None when the stream has no
    well-formed EOS page (header-only slices, truncations). Because it
    walks structurally, it also validates the SYNTH's page sizes — a
    synth whose lacing doesn't match its body would break the walk."""
    info = _py_ogg_vorbis(b)
    if info is None or not info[1]:
        return None
    sr = info[1]
    p, eos_granule = 0, None
    while p + 27 <= len(b):
        if b[p : p + 4] != b"OggS" or b[p + 4] != 0:
            return None  # walk landed off a page boundary: malformed
        import struct

        typ = b[p + 5]
        granule = struct.unpack("<q", b[p + 6 : p + 14])[0]
        n_segs = b[p + 26]
        seg_table = b[p + 27 : p + 27 + n_segs]
        if len(seg_table) < n_segs:
            return None
        if typ & 0x04:
            eos_granule = granule
        p += 27 + n_segs + sum(seg_table)
    if p != len(b) or eos_granule is None or eos_granule <= 0:
        return None
    return eos_granule * 1000 // sr


def test_ogg_full_file_duration(spark):
    """r11 Ogg duration: a full synthesized Vorbis file (BOS id page +
    middle audio page + EOS page) yields duration_ms from the LAST
    page's granule; the Spark tail-locate must agree with the
    independent pure-Python page WALKER on every payload, and the
    header-only slice in the same plan stays honestly NULL."""
    from crypto_market_tracker_etl_spark.multimodal.binary import (
        audio_meta,
        synth_ogg,
        synth_ogg_full,
    )

    sr = F.element_at(
        F.array(F.lit(8000), F.lit(22050), F.lit(44100), F.lit(48000)),
        (F.col("id") % 4 + 1).cast("int"),
    ).cast("int")
    ch = (F.col("id") % 2 + 1).cast("int")
    kbps = (F.lit(48) + F.col("id") * 13 % 400).cast("int")
    gran = (sr * (F.lit(2) + F.col("id") % 17) + F.col("id") * 331 % 997).cast(
        "long"
    )
    payload = F.when(
        F.col("id") % 3 == 2, synth_ogg(sr, ch, kbps)
    ).otherwise(synth_ogg_full(sr, ch, kbps, gran))
    rows = (
        spark.range(1, 40)
        .select("id", payload.alias("ogg"))
        .select("id", "ogg", audio_meta(F.col("ogg")).alias("m"))
        .collect()
    )
    full = header_only = 0
    for r in rows:
        want = _py_ogg_duration_ms(bytes(r["ogg"]))
        assert r["m"]["duration_ms"] == want, (r["id"], want)
        assert r["m"]["mime_type"] == "audio/ogg"
        if r["id"] % 3 == 2:
            assert want is None
            header_only += 1
        else:
            assert want is not None and want > 0
            full += 1
    assert full > 0 and header_only > 0


def test_ogg_tail_guards_reject_fakes(spark):
    """The tail locate trusts a granule only behind structural guards:
    an appended data blob that SPELLS 'OggS' but has a nonzero version
    byte, undefined type bits, a missing EOS flag, or an absurd granule
    must leave duration NULL rather than misreport it — and must not
    shadow anything (these candidates are LAST, so a weaker parser
    would read them)."""
    import struct

    from crypto_market_tracker_etl_spark.multimodal.binary import (
        audio_meta,
        synth_ogg,
    )

    def fake(ver, typ, granule):
        return (
            b"OggS" + bytes([ver, typ]) + struct.pack("<q", granule)
            + b"\x01\x00\x00\x00" + b"\x03\x00\x00\x00"
            + b"\x00\x00\x00\x00" + b"\x01\x05" + b"\x00" * 5
        )

    hdr_df = spark.range(1, 2).select(
        synth_ogg(
            F.lit(44100).cast("int"), F.lit(2).cast("int"),
            F.lit(96).cast("int"),
        ).alias("h")
    )
    hdr = bytes(hdr_df.collect()[0]["h"])
    cases = [
        (1, hdr + fake(1, 4, 44100)),  # bad version byte
        (2, hdr + fake(0, 0x44, 44100)),  # undefined type bit
        (3, hdr + fake(0, 0, 44100)),  # no EOS flag (plain data page)
        (4, hdr + fake(0, 4, -1)),  # granule -1: "no packet ends here"
        (5, hdr + fake(0, 4, 2**60)),  # absurd granule
        (6, hdr + fake(0, 4, 44100)),  # control: this one IS trusted
    ]
    rows = (
        spark.createDataFrame(cases, "id long, payload binary")
        .select("id", audio_meta(F.col("payload")).alias("m"))
        .collect()
    )
    got = {r["id"]: r["m"]["duration_ms"] for r in rows}
    assert got == {1: None, 2: None, 3: None, 4: None, 5: None, 6: 1000}


def test_ogg_vorbis_roundtrip(spark):
    """r10 Ogg Vorbis: channels / sample rate / declared nominal
    bitrate from the id header behind the one-hop page-segment offset;
    duration honestly NULL (it lives in the LAST page's granule). Spark
    parse ≡ the independent pure-Python reference."""
    from crypto_market_tracker_etl_spark.multimodal.binary import (
        audio_meta,
        sniff_mime,
        synth_ogg,
    )

    sr = F.element_at(
        F.array(F.lit(8000), F.lit(22050), F.lit(44100), F.lit(48000)),
        (F.col("id") % 4 + 1).cast("int"),
    ).cast("int")
    ch = (F.col("id") % 2 + 1).cast("int")
    kbps = (F.lit(48) + F.col("id") * 13 % 400).cast("int")
    rows = (
        spark.range(1, 30)
        .select("id", synth_ogg(sr, ch, kbps).alias("ogg"))
        .select(
            "id", "ogg",
            audio_meta(F.col("ogg")).alias("m"),
            sniff_mime(F.col("ogg")).alias("mime"),
        )
        .collect()
    )
    for r in rows:
        got = (r["m"]["channels"], r["m"]["sample_rate_hz"],
               r["m"]["bitrate_kbps"])
        assert got == _py_ogg_vorbis(bytes(r["ogg"])), r["id"]
        assert r["m"]["mime_type"] == "audio/ogg" and r["mime"] == "audio/ogg"
        assert r["m"]["duration_ms"] is None  # honest: needs last page
        assert r["m"]["bits_per_sample"] is None  # not a Vorbis concept


def test_ogg_non_vorbis_routes_with_null_fields(spark):
    """A real Ogg page whose first packet is NOT a Vorbis id header —
    an Opus stream ("OpusHead") and a bare data page — still routes
    audio/ogg (container-level) with NULL fields; a truncated page
    never errors."""
    from crypto_market_tracker_etl_spark.multimodal.binary import (
        audio_meta,
        sniff_mime,
    )

    page = (
        b"OggS" + b"\x00\x02" + b"\x00" * 8 + b"\x01\x00\x00\x00"
        + b"\x00" * 8 + b"\x01\x13"
    )
    cases = [
        (1, page + b"OpusHead\x01\x02\x38\x01\x80\xbb\x00\x00\x00\x00\x00"),
        (2, page + b"\x00" * 19),  # data bytes, no id header
        (3, b"OggS\x00"),  # truncated mid page header
    ]
    rows = (
        spark.createDataFrame(cases, "id long, payload binary")
        .select(
            "id",
            audio_meta(F.col("payload")).alias("m"),
            sniff_mime(F.col("payload")).alias("mime"),
        )
        .collect()
    )
    for r in rows:
        assert r["mime"] == "audio/ogg", r["id"]
        assert r["m"]["mime_type"] == "audio/ogg"
        assert r["m"]["channels"] is None
        assert r["m"]["sample_rate_hz"] is None
        assert r["m"]["bitrate_kbps"] is None
