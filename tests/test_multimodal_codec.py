"""Pure-stdlib media codec: real byte parsing (netpbm/BMP/WAV) plus
the quarantine path for malformed payloads.

Reference parity: the reference treats uploaded artifacts as opaque
rows; the multimodal column model (binary payload + typed metadata)
is a north-star addition, so these tests bind the decode contract
directly rather than to a reference file.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from cdc_pipe_line_spark.multimodal import (
    MediaDecodeError,
    as_media_table,
    decode_media,
    extract_media_meta,
)


def make_ppm(w: int, h: int, *, magic: bytes = b"P6", maxval: int = 255) -> bytes:
    bpp = 3 if magic == b"P6" else 1
    return (
        magic + b"\n" + f"{w} {h}\n{maxval}\n".encode() + b"\x7f" * (w * h * bpp)
    )


def make_bmp(w: int, h: int, *, bpp: int = 24, compression: int = 0) -> bytes:
    row = ((w * bpp + 31) // 32) * 4
    data = b"\x00" * (row * abs(h))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, compression,
                       len(data), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return hdr + info + data


def make_wav(n_frames: int, channels: int = 2, bits: int = 16) -> bytes:
    block = channels * bits // 8
    data = b"\x00" * (n_frames * block)
    fmt = struct.pack("<HHIIHH", 1, channels, 44100, 44100 * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_ppm_p6_and_p5():
    assert decode_media(make_ppm(17, 9), "image/ppm") == {"width": 17, "height": 9}
    assert decode_media(make_ppm(4, 3, magic=b"P5"), "image/pgm") == {
        "width": 4, "height": 3,
    }


def test_decode_ppm_comment_and_16bit():
    payload = b"P6\n# a comment line\n5 4\n65535\n" + b"\x00" * (5 * 4 * 3 * 2)
    assert decode_media(payload, "image/ppm") == {"width": 5, "height": 4}


def test_decode_ppm_truncated_pixels_raises():
    full = make_ppm(10, 10)
    with pytest.raises(MediaDecodeError, match="truncated"):
        decode_media(full[:-1], "image/ppm")


def test_decode_ppm_truncated_header_raises():
    with pytest.raises(MediaDecodeError, match="truncated header"):
        decode_media(b"P6\n10 10", "image/ppm")


def test_decode_bmp_bottom_up_and_top_down():
    assert decode_media(make_bmp(13, 7), "image/bmp") == {"width": 13, "height": 7}
    assert decode_media(make_bmp(13, -7), "image/bmp") == {"width": 13, "height": 7}


def test_decode_bmp_rejects_compressed_and_truncated():
    with pytest.raises(MediaDecodeError, match="compressed"):
        decode_media(make_bmp(4, 4, compression=1), "image/bmp")
    with pytest.raises(MediaDecodeError, match="truncated"):
        decode_media(make_bmp(64, 64)[:-5], "image/bmp")
    with pytest.raises(MediaDecodeError, match="truncated header"):
        decode_media(b"BM\x00\x00", "image/bmp")


def test_decode_wav_frames_and_channels():
    # width = frame count, height = channel count (documented mapping)
    assert decode_media(make_wav(1000, channels=2), "audio/wav") == {
        "width": 1000, "height": 2,
    }
    assert decode_media(make_wav(50, channels=1, bits=8), "audio/wav") == {
        "width": 50, "height": 1,
    }


def test_decode_wav_truncated_data_raises():
    with pytest.raises(MediaDecodeError, match="truncated"):
        decode_media(make_wav(1000)[:-10], "audio/wav")


def test_decode_unknown_magic_raises():
    with pytest.raises(MediaDecodeError, match="unsupported container"):
        decode_media(b"\x00\x01\x02\x03junkjunkjunk", "application/octet-stream")


def test_extract_media_meta_real_decode_and_quarantine(spark):
    """One good PPM, one truncated PPM, one BMP, one WAV through the
    Arrow-batched extractor: good rows carry real parsed dims, the
    poison row is quarantined in place (nulls + decode_err), the job
    never fails."""
    rows = [
        (1, "image/ppm", make_ppm(17, 9)),
        (2, "image/ppm", make_ppm(10, 10)[:-1]),
        (3, "image/bmp", make_bmp(13, 7)),
        (4, "audio/wav", make_wav(250, channels=2)),
    ]
    df = spark.createDataFrame(rows, "media_id long, mt string, payload binary")
    media = df.select(
        "media_id", F.col("mt").alias("media_type"), "payload"
    )
    out = {r.media_id: r for r in extract_media_meta(media).collect()}
    assert (out[1].width, out[1].height, out[1].decode_err) == (17, 9, None)
    assert out[2].width is None and out[2].height is None
    assert "truncated" in out[2].decode_err
    assert (out[3].width, out[3].height) == (13, 7)
    assert (out[4].width, out[4].height) == (250, 2)
    # n_bytes/md5 still populated for the quarantined row
    assert out[2].n_bytes == len(make_ppm(10, 10)) - 1


def test_extract_media_meta_fake_type_unchanged(spark):
    """``*/fake`` keeps the deterministic length-derived stand-in used
    by oracle fixtures."""
    media = as_media_table(
        spark.createDataFrame([(7, "hello world")], "doc_id long, text string"),
        id_col="doc_id",
        payload_col=F.col("text").cast("binary"),
        media_type="image/fake",
    )
    r = extract_media_meta(media).collect()[0]
    assert (r.width, r.height, r.decode_err) == (11 % 640, 11 % 480, None)


def test_decode_ppm_comment_immediately_after_digits():
    """'#' legally terminates a pending header token ('255#c\\n'):
    the token must flush before the comment skip, and pixel data
    starts right after the comment's newline."""
    payload = b"P6\n5 4#trailing comment\n255#c\n" + b"\xab" * (5 * 4 * 3)
    assert decode_media(payload, "image/ppm") == {"width": 5, "height": 4}
    # exact-length payload: one byte short must now be detected
    with pytest.raises(MediaDecodeError, match="truncated"):
        decode_media(payload[:-1], "image/ppm")


def test_decode_bmp_rejects_bad_bpp():
    """bpp=0 must quarantine, not vacuously pass the row-size check
    (row_bytes would compute to 0)."""
    with pytest.raises(MediaDecodeError, match="bits-per-pixel"):
        decode_media(make_bmp(13, 7, bpp=0), "image/bmp")


def test_extract_media_meta_null_media_type_quarantined(spark):
    """A NULL media_type is a poison row like bad bytes: nulled dims +
    decode_err, never an AttributeError failing the scan."""
    df = spark.createDataFrame(
        [(1, None, b"P6\n1 1\n255\n\x00\x00\x00"), (2, "image/ppm", make_ppm(2, 2))],
        "media_id long, media_type string, payload binary",
    )
    out = {r.media_id: r for r in extract_media_meta(df).collect()}
    assert out[1].width is None and out[1].decode_err == "null media_type"
    assert (out[2].width, out[2].height, out[2].decode_err) == (2, 2, None)


# ---------------------------------------------------------------------------
# PNG: the compressed-format tier
# ---------------------------------------------------------------------------

from cdc_pipe_line_spark.multimodal import make_png  # noqa: E402


def test_decode_png_roundtrip_color_types_and_depths():
    for color, depth in [(2, 8), (0, 8), (6, 8), (4, 8), (2, 16), (0, 16)]:
        p = make_png(19, 7, b"0123456789abcdef", color=color, depth=depth)
        assert decode_media(p, "image/png") == {"width": 19, "height": 7}, (
            color, depth,
        )


def test_png_byte_length_is_arithmetic():
    """The oracle recomputes n_bytes as h*(1+w*3)+68 for RGB-8 — pin
    the encoder to that formula."""
    for w, h in [(1, 1), (64, 48), (17, 9)]:
        assert len(make_png(w, h, b"xy")) == h * (1 + w * 3) + 68


def test_decode_png_truncated_raises():
    p = make_png(8, 8, b"fill")
    for cut in (7, 20, len(p) // 2, len(p) - 1):
        with pytest.raises(MediaDecodeError, match="png:|unsupported container"):
            decode_media(p[:cut], "image/png")


def test_decode_png_bad_crc_raises():
    p = bytearray(make_png(8, 8, b"fill"))
    # flip a bit inside the IDAT payload (after sig 8 + IHDR 25 + len/type 8)
    p[8 + 25 + 8 + 3] ^= 0x01
    with pytest.raises(MediaDecodeError, match="CRC mismatch"):
        decode_media(bytes(p), "image/png")


def test_decode_png_bad_filter_byte_raises():
    """Corrupt scanline content with a RE-CRC'd chunk: only the
    decompress+scanline validation can catch it."""
    import struct as _s
    import zlib as _z

    from cdc_pipe_line_spark.multimodal import _zlib_store

    raw = bytearray(b"\x00" + b"\x11" * 9)  # 1 row, 3px RGB
    raw[0] = 9  # filter type out of range
    idat = _zlib_store(bytes(raw))
    def chunk(t, d):
        return len(d).to_bytes(4, "big") + t + d + _z.crc32(t + d).to_bytes(4, "big")
    p = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 3, 1, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(MediaDecodeError, match="bad filter type"):
        decode_media(p, "image/png")


def test_decode_png_scanline_length_mismatch_raises():
    """IHDR claims 4x2 but the (valid, CRC-correct) zlib stream holds
    one row — dims must not be trusted without the byte count check."""
    import struct as _s
    import zlib as _z

    from cdc_pipe_line_spark.multimodal import _zlib_store

    idat = _zlib_store(b"\x00" + b"\x22" * 12)
    def chunk(t, d):
        return len(d).to_bytes(4, "big") + t + d + _z.crc32(t + d).to_bytes(4, "big")
    p = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(MediaDecodeError, match="scanline data"):
        decode_media(p, "image/png")


def test_decode_png_rejects_palette_and_interlace():
    import struct as _s
    import zlib as _z

    def chunk(t, d):
        return len(d).to_bytes(4, "big") + t + d + _z.crc32(t + d).to_bytes(4, "big")

    pal = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", _s.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0)
    )
    with pytest.raises(MediaDecodeError, match="color type 3"):
        decode_media(pal + chunk(b"IEND", b""), "image/png")
    adam = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", _s.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 1)
    )
    with pytest.raises(MediaDecodeError, match="interlace"):
        decode_media(adam + chunk(b"IEND", b""), "image/png")


def test_extract_media_meta_png_through_arrow_batches(spark):
    """PNG payloads through the mapInPandas extractor: good rows carry
    inflated-and-validated dims; a bad-CRC payload quarantines."""
    good = make_png(21, 5, b"abcdefgh")
    bad = bytearray(good)
    bad[8 + 25 + 8 + 1] ^= 0x40
    df = spark.createDataFrame(
        [(1, "image/png", good), (2, "image/png", bytes(bad))],
        "media_id long, media_type string, payload binary",
    )
    out = {r.media_id: r for r in extract_media_meta(df).collect()}
    assert (out[1].width, out[1].height, out[1].decode_err) == (21, 5, None)
    assert out[2].width is None and "CRC mismatch" in out[2].decode_err


# ---------------------------------------------------------------------------
# Header-tier parsers: JPEG / GIF / MP4 (container walk, no pixel decode)
# ---------------------------------------------------------------------------


def make_jpeg(w: int, h: int, *, sof: int = 0xC0) -> bytes:
    def seg(marker, data):
        return bytes([0xFF, marker]) + (len(data) + 2).to_bytes(2, "big") + data

    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes(64))
    sof0 = seg(sof, b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01")
    sos = seg(0xDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    return b"\xff\xd8" + app0 + dqt + sof0 + sos + b"\x12\x34" + b"\xff\xd9"


def box(btype: bytes, body: bytes) -> bytes:
    return (len(body) + 8).to_bytes(4, "big") + btype + body


def make_mp4(w: int, h: int) -> bytes:
    tkhd = box(
        b"tkhd",
        bytes(4) + bytes(76) + (w << 16).to_bytes(4, "big")
        + (h << 16).to_bytes(4, "big"),
    )
    audio_tkhd = box(b"tkhd", bytes(4) + bytes(76) + bytes(8))  # 0x0 dims
    moov = box(b"moov", box(b"trak", audio_tkhd) + box(b"trak", tkhd))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov + box(
        b"mdat", b"\x00" * 32
    )


def test_decode_jpeg_sof_variants_and_gif():
    assert decode_media(make_jpeg(640, 480), "image/jpeg") == {
        "width": 640, "height": 480,
    }
    # progressive (SOF2) carries dims the same way
    assert decode_media(make_jpeg(31, 17, sof=0xC2), "image/jpeg") == {
        "width": 31, "height": 17,
    }
    # GIF is no longer header-tier: a header-only payload (no image
    # data) must QUARANTINE now that the LZW stream is really decoded
    gif = b"GIF89a" + (99).to_bytes(2, "little") + (44).to_bytes(2, "little") \
        + b"\x00\x00\x00"
    with pytest.raises(MediaDecodeError, match="gif: truncated before trailer"):
        decode_media(gif, "image/gif")
    from cdc_pipe_line_spark.multimodal import make_gif

    assert decode_media(make_gif(99, 44), "image/gif") == {
        "width": 99, "height": 44,
    }


def test_decode_jpeg_adversarial():
    good = make_jpeg(640, 480)
    # truncated mid-segment
    with pytest.raises(MediaDecodeError, match="jpeg: truncated"):
        decode_media(good[:10], "image/jpeg")
    # DHT (0xC4) must NOT be taken for a frame header: strip the real
    # SOF and the walk must hit SOS and fail, not return DHT bytes
    def seg(marker, data):
        return bytes([0xFF, marker]) + (len(data) + 2).to_bytes(2, "big") + data
    no_sof = b"\xff\xd8" + seg(0xC4, bytes(20)) + seg(
        0xDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00"
    )
    with pytest.raises(MediaDecodeError, match="scan data before SOF"):
        decode_media(no_sof, "image/jpeg")
    with pytest.raises(MediaDecodeError, match="truncated segment"):
        decode_media(b"\xff\xd8" + seg(0xE0, b"JFIF\x00")[:-3], "image/jpeg")


def test_decode_mp4_box_walk():
    assert decode_media(make_mp4(1920, 1080), "video/mp4") == {
        "width": 1920, "height": 1080,
    }
    # audio-only: no visual track dims anywhere
    audio_only = box(b"ftyp", b"isom\x00\x00\x02\x00") + box(
        b"moov", box(b"trak", box(b"tkhd", bytes(4) + bytes(76) + bytes(8)))
    )
    with pytest.raises(MediaDecodeError, match="no visual track"):
        decode_media(audio_only, "video/mp4")
    # box overrunning its parent must not read out of bounds
    bad = box(b"ftyp", b"isom") + (1 << 30).to_bytes(4, "big") + b"moov"
    with pytest.raises(MediaDecodeError, match="overruns"):
        decode_media(bad, "video/mp4")
    # truncation INSIDE moov (before any tkhd dims can short-circuit)
    with pytest.raises(MediaDecodeError, match="overruns"):
        decode_media(make_mp4(8, 8)[:44], "video/mp4")
    # dangling partial box header at top level
    with pytest.raises(MediaDecodeError, match="truncated box header"):
        decode_media(audio_only + b"\xff\xff", "video/mp4")


def test_decode_png_deflate_bomb_bounded():
    """A tiny IDAT inflating to 64 MB while IHDR claims 3x2 must be
    rejected WITHOUT materializing the bomb (inflate is bounded at the
    scanline byte count + 1)."""
    import struct as _s
    import zlib as _z

    def chunk(t, d):
        return len(d).to_bytes(4, "big") + t + d + _z.crc32(t + d).to_bytes(4, "big")

    bomb = _z.compress(b"\x00" * (64 << 20), 9)  # ~64 KB compressed
    assert len(bomb) < 100_000
    p = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    import tracemalloc

    tracemalloc.start()
    with pytest.raises(MediaDecodeError, match="scanline data"):
        decode_media(p, "image/png")
    peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()
    assert peak < 8 << 20, f"inflate materialized {peak} bytes"


def test_decode_fuzz_only_decode_errors():
    """Random truncations/bit-flips/tail-grafts of every supported
    container must only ever raise MediaDecodeError — a scan of
    untrusted payloads can quarantine that, anything else would fail
    the job (deterministic seed, ~4k mutations)."""
    import random

    from cdc_pipe_line_spark.multimodal import make_png

    rng = random.Random(20260813)
    payloads = [
        make_ppm(9, 5), make_ppm(4, 3, magic=b"P5"), make_bmp(13, 7),
        make_wav(100), make_png(12, 8, b"abc"), make_jpeg(33, 21),
        make_mp4(64, 32),
        b"GIF89a" + bytes([40, 0, 30, 0]) + b"\x00\x00\x00",
    ]
    for _ in range(4000):
        p = bytearray(rng.choice(payloads))
        op = rng.randrange(3)
        if op == 0 and len(p) > 1:
            p = p[: rng.randrange(len(p))]
        elif op == 1:
            for _ in range(rng.randrange(1, 6)):
                p[rng.randrange(len(p))] = rng.randrange(256)
        else:
            p = p[: rng.randrange(len(p))] + bytes(
                rng.randrange(256) for _ in range(rng.randrange(20))
            )
        try:
            decode_media(bytes(p), "x/fuzz")
        except MediaDecodeError:
            pass


def test_wav_pcm_roundtrip_and_truncation():
    from cdc_pipe_line_spark.multimodal import MediaDecodeError, _wav_pcm, make_wav

    b = make_wav(8, 500, channels=2, rate=8000)
    rate, ch, samples = _wav_pcm(b)
    assert (rate, ch, len(samples)) == (8000, 2, 16)
    assert samples[0] == 500 and samples[2] == -500  # square wave frames
    import pytest as _pytest

    with _pytest.raises(MediaDecodeError, match="truncated"):
        _wav_pcm(b[:-1])
    with _pytest.raises(MediaDecodeError, match="RIFF"):
        _wav_pcm(b"nope" + b[4:])
    # odd byte cut into the sample area -> frame alignment check
    bad = bytearray(b)
    bad[-2:] = b""  # remove one sample of one channel
    with _pytest.raises(MediaDecodeError):
        _wav_pcm(bytes(bad))


def test_audio_stats_quarantines_malformed(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from cdc_pipe_line_spark.multimodal import as_media_table, audio_stats, make_wav

    good = make_wav(16, 100)
    rows = [(1, good), (2, good[:-3]), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    media = as_media_table(
        df, id_col="doc_id", payload_col=F.col("payload"), media_type="audio/wav"
    )
    out = {r.media_id: r for r in audio_stats(media).collect()}
    assert out[1].rms == 100.0 and out[1].peak == 100 and out[1].n_samples == 16
    assert out[2].decode_err == "wav: data chunk truncated"
    assert out[2].rms is None
    assert out[3].decode_err == "null payload"


def test_gif_lzw_roundtrip_and_adversarial():
    import pytest as _pytest

    from cdc_pipe_line_spark.multimodal import (
        MediaDecodeError,
        _gif_lzw_pixel_count,
        decode_media,
        make_gif,
    )

    b = make_gif(9, 4, seed=7)
    assert decode_media(b, "image/gif") == {"width": 9, "height": 4}
    # truncated mid sub-block
    with _pytest.raises(MediaDecodeError, match="truncated sub-block"):
        decode_media(b[:-5], "image/gif")
    # an LZW stream decoding to the WRONG pixel count must quarantine:
    # shrink the image descriptor's width so 36 decoded pixels face an
    # 8x4 claim
    forged = bytearray(make_gif(9, 4))
    off = 13 + 768 + 5  # image descriptor width field
    forged[off : off + 2] = (8).to_bytes(2, "little")
    with _pytest.raises(MediaDecodeError, match="LZW decoded 36 pixels"):
        decode_media(bytes(forged), "image/gif")
    # invalid code: a code beyond next_code
    with _pytest.raises(MediaDecodeError, match="invalid LZW code"):
        # min code size 2: clear=4, eoi=5; emit code 7 right after clear
        # bits LSB-first, 3-bit codes: 4 (100), 7 (111)
        _gif_lzw_pixel_count(bytes([0b00111100]), 2)
    # stream ending without EOI
    with _pytest.raises(MediaDecodeError, match="no EOI"):
        _gif_lzw_pixel_count(bytes([0b00000100]), 2)  # CLEAR then nothing
    # interlace flag routes to the full-codec hook
    il = bytearray(make_gif(3, 3))
    il[13 + 768 + 9] |= 0x40
    with _pytest.raises(MediaDecodeError, match="interlaced"):
        decode_media(bytes(il), "image/gif")


def test_gif_lzw_real_compression_stream():
    """The decoder handles a PROPER growing-dictionary LZW stream, not
    just the naive CLEAR-per-pixel encoder: build one by hand for a
    known pixel sequence (with the KwKwK case) and count."""
    from cdc_pipe_line_spark.multimodal import _gif_lzw_pixel_count

    # min code size 2: roots 0..3, CLEAR=4, EOI=5, first dict code 6.
    # Encode pixel sequence 1,1,1,1 : codes CLEAR,1,6(KwKwK '11'),1,EOI
    # dict: after '1'->nothing; emit 6 before it exists = KwKwK; then
    # entry 6='11', next 7='11'+... emit 1, EOI.  Output = 1,11,1 = 4px
    codes = [(4, 3), (1, 3), (6, 3), (1, 3), (5, 3)]
    acc = 0
    nbits = 0
    out = bytearray()
    for c, sz in codes:
        acc |= c << nbits
        nbits += sz
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    assert _gif_lzw_pixel_count(bytes(out), 2) == 4


def test_mp4_sample_table_layout_and_adversarial():
    import pytest

    from cdc_pipe_line_spark.multimodal import (
        MediaDecodeError,
        make_mp4_sampled,
        mp4_sample_table,
    )

    b = make_mp4_sampled(9, 30, seed=2)
    t = mp4_sample_table(b)
    assert len(t) == 9
    # contiguous one-chunk layout: each sample starts where the
    # previous ended, sizes follow base + i%7
    for i in range(1, 9):
        assert t[i][0] == t[i - 1][0] + t[i - 1][1]
        assert t[i][1] == 30 + (i % 7)
    # mdat body cut -> bounds check names the first failing sample
    with pytest.raises(MediaDecodeError, match="beyond EOF"):
        mp4_sample_table(b[: t[0][0]])
    # stsz/stco count mismatch: claim one more sample than chunks hold
    forged = bytearray(b)
    stsz_count_off = b.index(b"stsz") + 4 + 8
    forged[stsz_count_off : stsz_count_off + 4] = (
        (10).to_bytes(4, "big")
    )
    with pytest.raises(MediaDecodeError):
        mp4_sample_table(bytes(forged))
    # no moov at all
    with pytest.raises(MediaDecodeError, match="missing moov"):
        mp4_sample_table(b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00\x00\x00\x00\x08mdat")


def test_mp4_sample_table_multi_chunk():
    """The stsc expansion handles MULTIPLE chunks with run-length
    sample counts — build a two-chunk layout by hand."""
    import struct

    from cdc_pipe_line_spark.multimodal import mp4_sample_table

    def box(name, body):
        return struct.pack(">I", 8 + len(body)) + name + body

    sizes = [5, 6, 7, 8]
    # chunk 1 holds 3 samples, chunk 2 holds 1
    stsz = box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, 4)
               + b"".join(struct.pack(">I", s) for s in sizes))
    # offsets chosen after computing header length: place mdat at 200
    stco = box(b"stco", b"\x00" * 4 + struct.pack(">III", 2, 200, 230))
    stsc = box(b"stsc", b"\x00" * 4 + struct.pack(">I", 2)
               + struct.pack(">III", 1, 3, 1) + struct.pack(">III", 2, 1, 1))
    stbl = box(b"stbl", stsz + stco + stsc)
    moov = box(b"moov", box(b"trak", box(b"mdia", box(b"minf", stbl))))
    payload = moov + b"\x00" * (240 - len(moov))
    t = mp4_sample_table(payload)
    assert t == [(200, 5), (205, 6), (211, 7), (230, 8)]


# ---------------------------------------------------------------- resize

def _media_df(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_resize_nearest_exact_math(spark):
    from cdc_pipe_line_spark.multimodal import resize_image_nearest

    # 2x2 RGB -> 4x4 upscale: every dst quadrant repeats its src pixel
    pix = bytes([10, 11, 12,  20, 21, 22,
                 30, 31, 32,  40, 41, 42])
    ppm = b"P6\n2 2\n255\n" + pix
    out = resize_image_nearest(
        _media_df(spark, [(1, bytearray(ppm))]), 4, 4
    ).collect()[0]
    assert (out.src_w, out.src_h, out.n_out_bytes) == (2, 2, 48)
    # sum = each src pixel appears 4x
    assert out.pix_sum == 4 * sum(pix)
    assert out.corner_tl == 10 and out.corner_br == 42
    assert out.resize_err is None


def test_resize_downscale_picks_floor_indices(spark):
    from cdc_pipe_line_spark.multimodal import resize_image_nearest

    # 4x1 gray (P5) -> 2x1: dst x=0 -> src 0, x=1 -> src 2
    ppm = b"P5\n4 1\n255\n" + bytes([5, 6, 7, 8])
    out = resize_image_nearest(
        _media_df(spark, [(1, bytearray(ppm))]), 2, 1
    ).collect()[0]
    assert out.pix_sum == 5 + 7
    assert out.corner_tl == 5 and out.corner_br == 7


def test_resize_quarantines_malformed(spark):
    from cdc_pipe_line_spark.multimodal import resize_image_nearest

    rows = [
        (1, bytearray(b"P6")),                        # truncated header
        (2, bytearray(b"BM" + b"\x00" * 60)),         # not netpbm
        (3, bytearray(b"P6\n2 2\n255\n" + b"\x00" * 5)),  # pixels truncated
        (4, None),                                    # null payload
        (5, bytearray(b"P6\n1 1\n65535\n" + b"\x00" * 6)),  # 16-bit
    ]
    got = {r.media_id: r for r in resize_image_nearest(
        _media_df(spark, rows), 4, 4).collect()}
    assert all(got[i].resize_err is not None for i in (1, 2, 3, 4, 5))
    assert all(got[i].pix_sum is None for i in (1, 2, 3, 4, 5))
    assert "truncated header" in got[1].resize_err
    assert "raw pixels" in got[2].resize_err
    assert "truncated" in got[3].resize_err
    assert "null payload" in got[4].resize_err
    assert "16-bit" in got[5].resize_err


# --------------------------------------------------- JPEG baseline DCT decode


def _jpeg_reference_roundtrip(arr, quant=16):
    """Independent decode reference: what ANY correct baseline codec
    must return for make_jpeg_gray output — DCT -> round/quantize ->
    dequantize -> IDCT -> clip, with no huffman/bitstream involvement,
    so an exact match proves the entropy layer is lossless and the
    transform math is right."""
    import numpy as np

    from cdc_pipe_line_spark.multimodal import _JPEG_A

    h, w = arr.shape
    out = np.zeros_like(arr)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = (
                arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                    np.float64
                )
                - 128.0
            )
            q = np.round(_JPEG_A @ blk @ _JPEG_A.T / quant)
            rec = _JPEG_A.T @ (q * quant) @ _JPEG_A + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.round(rec), 0, 255
            ).astype(np.uint8)
    return out


def test_jpeg_constant_blocks_decode_losslessly():
    """Even per-block constants with quant=16 quantize losslessly:
    decode must return the encoded raster EXACTLY (the property the
    mm_jpeg_decode oracle builds on)."""
    import numpy as np

    from cdc_pipe_line_spark.multimodal import (
        _jpeg_gray_pixels,
        make_jpeg_gray,
    )

    arr = np.zeros((16, 24), dtype=np.uint8)
    blk = 0
    for by in range(2):
        for bx in range(3):
            arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 100 + 2 * (
                blk % 5
            )
            blk += 1
    w, h, dec = _jpeg_gray_pixels(make_jpeg_gray(arr))
    assert (w, h) == (24, 16)
    assert np.array_equal(dec, arr)


def test_jpeg_general_content_matches_independent_reference():
    """Noise (dense ACs, all magnitude categories), gradients,
    sparse impulses (ZRL long-zero runs) and checkerboards (extreme
    ACs + clipping) must all decode bit-identically to the
    numpy quant-roundtrip reference — proving huffman AC/DC decode,
    byte unstuffing, inverse zigzag and IDCT end to end."""
    import numpy as np

    from cdc_pipe_line_spark.multimodal import (
        _jpeg_gray_pixels,
        make_jpeg_gray,
    )

    rng = np.random.default_rng(7)
    for trial in range(12):
        h, w = 8 * int(rng.integers(1, 9)), 8 * int(rng.integers(1, 9))
        kind = trial % 4
        if kind == 0:
            arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
        elif kind == 1:
            arr = np.tile(
                np.linspace(0, 255, w, dtype=np.uint8), (h, 1)
            )
        elif kind == 2:
            arr = np.full((h, w), 128, np.uint8)
            arr[int(rng.integers(0, h)), int(rng.integers(0, w))] = 255
        else:
            arr = (
                (np.add.outer(np.arange(h), np.arange(w)) % 2) * 255
            ).astype(np.uint8)
        w2, h2, dec = _jpeg_gray_pixels(make_jpeg_gray(arr))
        assert (w2, h2) == (w, h)
        assert np.array_equal(dec, _jpeg_reference_roundtrip(arr)), (
            trial,
            kind,
        )


def test_jpeg_adversarial_quarantines_cleanly():
    """Every truncation prefix and the unsupported-feature cases must
    raise MediaDecodeError (quarantine), never decode garbage or
    crash with a foreign exception."""
    import numpy as np
    import pytest

    from cdc_pipe_line_spark.multimodal import (
        MediaDecodeError,
        _jpeg_gray_pixels,
        make_jpeg_gray,
    )

    rng = np.random.default_rng(3)
    enc = make_jpeg_gray(rng.integers(0, 256, (16, 16)).astype(np.uint8))
    for cut in range(2, len(enc) - 1, 5):
        with pytest.raises(MediaDecodeError):
            _jpeg_gray_pixels(enc[:cut])
    with pytest.raises(MediaDecodeError, match="bad SOI"):
        _jpeg_gray_pixels(b"\x00\x00" + enc[2:])
    # progressive SOF2 must quarantine, not mis-decode
    sof0 = enc.find(b"\xff\xc0")
    prog = enc[:sof0] + b"\xff\xc2" + enc[sof0 + 2 :]
    with pytest.raises(MediaDecodeError, match="progressive"):
        _jpeg_gray_pixels(prog)


def test_jpeg_color_constant_mcus_decode_losslessly():
    """Per-MCU constant even YCbCr planes with quant=16 quantize
    losslessly; the decoded RGB must equal the direct BT.601
    conversion of the input planes (the property the
    mm_jpeg_color_decode oracle builds on)."""
    import numpy as np

    from cdc_pipe_line_spark.multimodal import (
        _jpeg_color_pixels,
        _jpeg_ycbcr_to_rgb,
        make_jpeg_color,
    )

    h, w = 32, 48
    y = np.zeros((h, w), np.uint8)
    cb = np.zeros((h // 2, w // 2), np.uint8)
    cr = np.zeros((h // 2, w // 2), np.uint8)
    m = 0
    for my in range(h // 16):
        for mx in range(w // 16):
            y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = 100 + 2 * (m % 20)
            cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = 90 + 4 * (m % 10)
            cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = 120 + 2 * (m % 15)
            m += 1
    w2, h2, rgb = _jpeg_color_pixels(make_jpeg_color(y, cb, cr))
    assert (w2, h2) == (w, h)
    expect = _jpeg_ycbcr_to_rgb(
        y, cb.repeat(2, 0).repeat(2, 1), cr.repeat(2, 0).repeat(2, 1)
    )
    assert np.array_equal(rgb, expect)


def test_jpeg_color_general_content_matches_independent_reference():
    """Random/gradient/impulse planes must decode bit-identically to an
    independent numpy quant-roundtrip of each plane followed by the
    same BT.601 conversion — proving the MCU-interleaved entropy
    decode, per-component DC prediction, chroma upsample and
    conversion end to end."""
    import numpy as np

    from cdc_pipe_line_spark.multimodal import (
        _JPEG_A,
        _jpeg_color_pixels,
        _jpeg_ycbcr_to_rgb,
        make_jpeg_color,
    )

    def quant_roundtrip(plane, q=16):
        hh, ww = plane.shape
        out = np.zeros_like(plane)
        for by in range(hh // 8):
            for bx in range(ww // 8):
                blk = (
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                        np.float64
                    )
                    - 128.0
                )
                coef = _JPEG_A @ blk @ _JPEG_A.T
                rec = _JPEG_A.T @ (np.round(coef / q) * q) @ _JPEG_A + 128.0
                out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.round(rec), 0, 255
                )
        return out

    rng = np.random.default_rng(11)
    for trial in range(6):
        h = 16 * int(rng.integers(1, 4))
        w = 16 * int(rng.integers(1, 4))
        if trial % 3 == 0:
            y = rng.integers(0, 256, (h, w), dtype=np.uint8)
            cb = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
            cr = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        elif trial % 3 == 1:
            y = np.tile(np.linspace(0, 255, w, dtype=np.uint8), (h, 1))
            cb = np.full((h // 2, w // 2), 128, np.uint8)
            cr = np.tile(
                np.linspace(0, 255, w // 2, dtype=np.uint8), (h // 2, 1)
            )
        else:
            y = np.full((h, w), 128, np.uint8)
            y[int(rng.integers(0, h)), int(rng.integers(0, w))] = 255
            cb = np.full((h // 2, w // 2), 255, np.uint8)
            cr = np.zeros((h // 2, w // 2), np.uint8)
        w2, h2, rgb = _jpeg_color_pixels(make_jpeg_color(y, cb, cr))
        assert (w2, h2) == (w, h)
        expect = _jpeg_ycbcr_to_rgb(
            quant_roundtrip(y),
            quant_roundtrip(cb).repeat(2, 0).repeat(2, 1),
            quant_roundtrip(cr).repeat(2, 0).repeat(2, 1),
        )
        assert np.array_equal(rgb, expect), f"trial {trial} diverged"


def test_jpeg_color_adversarial_quarantines_cleanly():
    """Malformed color payloads raise MediaDecodeError (quarantine
    path), never crash: truncations, grayscale fed to the color
    decoder, unsupported subsampling."""
    import numpy as np
    import pytest

    from cdc_pipe_line_spark.multimodal import (
        MediaDecodeError,
        _jpeg_color_pixels,
        make_jpeg_color,
        make_jpeg_gray,
    )

    y = np.full((16, 16), 128, np.uint8)
    c = np.full((8, 8), 128, np.uint8)
    good = make_jpeg_color(y, c, c)
    for cut in (2, 20, len(good) // 2, len(good) - 3):
        with pytest.raises(MediaDecodeError):
            _jpeg_color_pixels(good[:cut])
    with pytest.raises(MediaDecodeError):
        _jpeg_color_pixels(make_jpeg_gray(np.full((8, 8), 128, np.uint8)))
    bad_samp = bytearray(good)
    i = bad_samp.find(b"\x01\x22\x00")
    bad_samp[i + 1] = 0x21  # claim 2x1 subsampling
    with pytest.raises(MediaDecodeError):
        _jpeg_color_pixels(bytes(bad_samp))


def test_dhash_brightness_invariant_and_pattern_sensitive(spark):
    """dHash must ignore uniform brightness shifts (same comparisons)
    but distinguish different gradients; malformed payloads
    quarantine."""
    import numpy as np

    from cdc_pipe_line_spark.multimodal import as_media_table, dhash_images
    from pyspark.sql import functions as F

    def ppm(a, b, c, trunc=False):
        x = np.arange(36)
        y = np.arange(24)
        v = ((a * x[None, :] + b * y[:, None]) % 16) * 12 + c
        rgb = np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)
        p = b"P6\n36 24\n255\n" + rgb.tobytes()
        return p[: len(p) // 2] if trunc else p

    rows = [
        (1, ppm(2, 3, 0)),
        (2, ppm(2, 3, 40)),   # same pattern, brighter
        (3, ppm(3, 1, 0)),    # different pattern
        (4, ppm(2, 3, 0, trunc=True)),  # malformed
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = as_media_table(
        df, id_col="media_id", payload_col=F.col("payload"),
        media_type="image/x-portable-pixmap",
    )
    got = {r.media_id: r for r in dhash_images(media).collect()}
    assert got[1].dhash == got[2].dhash          # brightness-invariant
    assert got[1].dhash != got[3].dhash          # pattern-sensitive
    assert got[4].dhash is None and got[4].decode_err


def test_jpeg_restart_intervals_decode_and_validate():
    """DRI/RSTn scans (VERDICT r7 item 7) must decode identically to
    the same image without restarts — segment split, D0..D7 cycling,
    per-segment DC reset — and structural violations must quarantine
    with precise reasons, never mis-decode."""
    import numpy as np
    import pytest

    from cdc_pipe_line_spark.multimodal import (
        MediaDecodeError,
        _jpeg_color_pixels,
        _jpeg_gray_pixels,
        make_jpeg_color,
        make_jpeg_gray,
    )

    rng = np.random.RandomState(11)
    arr = (rng.randint(0, 128, (24, 32)) * 2).astype(np.uint8)
    _, _, base = _jpeg_gray_pixels(make_jpeg_gray(arr))
    # intervals spanning: every MCU, mid-row, exactly one row (4
    # blocks/row x 3 rows = 12 MCUs), > #MCUs (no RSTs emitted)
    for ri in (1, 3, 4, 5, 12, 100):
        enc = make_jpeg_gray(arr, restart_interval=ri)
        w, h, out = _jpeg_gray_pixels(enc)
        assert (w, h) == (32, 24)
        assert (out == base).all(), f"restart decode differs at ri={ri}"

    # constant blocks stay lossless through the restart path
    carr = np.kron(
        rng.randint(0, 128, (2, 3)) * 2, np.ones((8, 8), dtype=int)
    ).astype(np.uint8)
    _, _, cout = _jpeg_gray_pixels(make_jpeg_gray(carr, restart_interval=2))
    assert (cout == carr).all()

    enc2 = make_jpeg_gray(arr, restart_interval=2)
    # out-of-order restart marker
    idx = enc2.find(b"\xff\xd0")
    with pytest.raises(MediaDecodeError, match="out of order"):
        _jpeg_gray_pixels(enc2[:idx] + b"\xff\xd3" + enc2[idx + 2 :])
    # RST in the scan of a DRI-less image
    plain = make_jpeg_gray(arr)
    sos = plain.find(b"\xff\xda")
    with pytest.raises(MediaDecodeError, match="without DRI"):
        _jpeg_gray_pixels(plain[: sos + 20] + b"\xff\xd0" + plain[sos + 20 :])
    # segment-count mismatch: claim a smaller interval than encoded
    dri = enc2.find(b"\xff\xdd")
    lied = enc2[: dri + 4] + b"\x00\x01" + enc2[dri + 6 :]
    with pytest.raises(MediaDecodeError, match="restart segments"):
        _jpeg_gray_pixels(lied)

    # color path: DRI still quarantines with a precise reason
    y = (rng.randint(0, 128, (32, 32)) * 2).astype(np.uint8)
    cb = (rng.randint(0, 128, (16, 16)) * 2).astype(np.uint8)
    cr = (rng.randint(0, 128, (16, 16)) * 2).astype(np.uint8)
    color = make_jpeg_color(y, cb, cr)
    sos = color.find(b"\xff\xda")
    with_dri = color[:sos] + b"\xff\xdd\x00\x04\x00\x02" + color[sos:]
    with pytest.raises(MediaDecodeError, match="restart intervals"):
        _jpeg_color_pixels(with_dri)


def test_png_unfilter_all_five_types_roundtrip():
    """The PNG pixel path must invert every filter type (the fixture
    encoder cycles None/Sub/Up/Average/Paeth by row) exactly, for
    random content and edge dims; corrupted chunk CRCs and non-gray
    color types must quarantine."""
    import numpy as np
    import pytest

    from cdc_pipe_line_spark.multimodal import (
        MediaDecodeError,
        _png_gray_pixels,
        make_png_gray,
    )

    rng = np.random.RandomState(17)
    for shape in [(16, 24), (5, 7), (1, 1), (10, 3), (6, 1)]:
        arr = rng.randint(0, 256, shape).astype(np.uint8)
        w, h, out = _png_gray_pixels(make_png_gray(arr))
        assert (w, h) == (shape[1], shape[0])
        assert (out == arr).all(), shape
    enc = make_png_gray(rng.randint(0, 256, (8, 8)).astype(np.uint8))
    i = 33 + 8
    bad = enc[:i] + bytes([enc[i] ^ 0xFF]) + enc[i + 1 :]
    with pytest.raises(MediaDecodeError, match="CRC mismatch"):
        _png_gray_pixels(bad)


# ------------------------------------------- progressive DC-scan decode (r11)


class TestJpegProgressiveDc:
    def _pattern(self, w, h, base):
        import numpy as np

        arr = np.zeros((h, w), dtype=np.uint8)
        blk = 0
        for by in range(h // 8):
            for bx in range(w // 8):
                arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    base + 2 * (blk % 5)
                )
                blk += 1
        return arr

    def test_dc_preview_exact_on_lossless_blocks(self):
        from cdc_pipe_line_spark.multimodal import (
            _jpeg_progressive_dc_pixels,
            make_jpeg_gray_progressive,
        )

        arr = self._pattern(24, 16, 100)
        w, h, al, pv = _jpeg_progressive_dc_pixels(
            make_jpeg_gray_progressive(arr)
        )
        assert (w, h, al) == (24, 16, 0)
        assert pv.shape == (2, 3)
        # even values + quant 16: DC quantizes losslessly, so each
        # preview pixel is exactly its block's constant
        expect = [[100, 102, 104], [106, 108, 100]]
        assert pv.tolist() == expect

    def test_point_transform_al1_floor4(self):
        from cdc_pipe_line_spark.multimodal import (
            _jpeg_progressive_dc_pixels,
            make_jpeg_gray_progressive,
        )

        arr = self._pattern(16, 8, 101)  # odd base: dc_q odd/even mix
        w, h, al, pv = _jpeg_progressive_dc_pixels(
            make_jpeg_gray_progressive(arr, al=1)
        )
        assert al == 1
        # dc_q = round_half_even((v-128)/2) (numpy quantize), coded =
        # dc_q >> 1, recon = coded << 1: pixel = 128 + 4*(dc_q >> 1)
        import numpy as np

        for got, v in zip(pv.flatten().tolist(), (101, 103, 101, 103)):
            dc_q = int(np.round((v - 128) / 2.0))
            assert got == 128 + 4 * (dc_q >> 1)

    def test_baseline_frame_routes_away(self):
        import pytest

        from cdc_pipe_line_spark.multimodal import (
            MediaDecodeError,
            _jpeg_progressive_dc_pixels,
            make_jpeg_gray,
        )

        with pytest.raises(MediaDecodeError, match="not progressive"):
            _jpeg_progressive_dc_pixels(
                make_jpeg_gray(self._pattern(8, 8, 100))
            )

    def test_baseline_decoder_still_rejects_progressive(self):
        import pytest

        from cdc_pipe_line_spark.multimodal import (
            MediaDecodeError,
            _jpeg_gray_pixels,
            make_jpeg_gray_progressive,
        )

        with pytest.raises(MediaDecodeError, match="progressive"):
            _jpeg_gray_pixels(
                make_jpeg_gray_progressive(self._pattern(8, 8, 100))
            )

    def test_truncation_quarantines(self):
        import pytest

        from cdc_pipe_line_spark.multimodal import (
            MediaDecodeError,
            _jpeg_progressive_dc_pixels,
            make_jpeg_gray_progressive,
        )

        enc = make_jpeg_gray_progressive(self._pattern(16, 16, 100))
        with pytest.raises(MediaDecodeError, match="truncated"):
            _jpeg_progressive_dc_pixels(enc[:20])

    def test_ac_first_scan_rejected(self):
        import pytest

        from cdc_pipe_line_spark.multimodal import (
            MediaDecodeError,
            _jpeg_progressive_dc_pixels,
            make_jpeg_gray_progressive,
        )

        enc = bytearray(make_jpeg_gray_progressive(self._pattern(8, 8, 100)))
        # rewrite the SOS spectral selection to an AC band (Ss=1,Se=5)
        sos = enc.find(b"\xff\xda")
        assert sos > 0
        enc[sos + 7], enc[sos + 8] = 1, 5
        with pytest.raises(MediaDecodeError, match="not the DC scan"):
            _jpeg_progressive_dc_pixels(bytes(enc))

    def test_dc_scan_followed_by_next_sos_still_decodes(self):
        from cdc_pipe_line_spark.multimodal import (
            _jpeg_progressive_dc_pixels,
            make_jpeg_gray_progressive,
        )

        enc = make_jpeg_gray_progressive(self._pattern(16, 8, 110))
        # splice a (never-decoded) second SOS header before EOI, the
        # multi-scan layout a real progressive file has
        body = enc[:-2] + b"\xff\xda\x00\x08\x01\x01\x00\x01\x05\x00" + enc[-2:]
        w, h, al, pv = _jpeg_progressive_dc_pixels(body)
        assert (w, h) == (16, 8)
        assert pv.tolist() == [[110, 112]]


class TestJpegProgressiveFull:
    def test_full_progressive_equals_baseline_decode(self):
        """General content (gradients, clipping, dense ACs, ZRL runs):
        the four-scan progressive file must decode to exactly the
        raster the baseline codec produces for the same array — both
        quantize identically, so spectral selection + DC successive
        approximation + EOB runs must be collectively lossless."""
        import numpy as np

        from cdc_pipe_line_spark.multimodal import (
            _jpeg_gray_pixels,
            _jpeg_progressive_pixels,
            make_jpeg_gray,
            make_jpeg_gray_progressive_full,
        )

        rng = np.random.RandomState(11)
        for trial in range(4):
            h, w = 8 * rng.randint(1, 4), 8 * rng.randint(1, 5)
            arr = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
            base_w, base_h, base_px = _jpeg_gray_pixels(
                make_jpeg_gray(arr)
            )
            pw, ph, ppx = _jpeg_progressive_pixels(
                make_jpeg_gray_progressive_full(arr)
            )
            assert (pw, ph) == (base_w, base_h)
            assert np.array_equal(ppx, base_px), f"trial {trial}"

    def test_constant_blocks_roundtrip_exact(self):
        import numpy as np

        from cdc_pipe_line_spark.multimodal import (
            _jpeg_progressive_pixels,
            make_jpeg_gray_progressive_full,
        )

        arr = np.zeros((16, 24), dtype=np.uint8)
        blk = 0
        for by in range(2):
            for bx in range(3):
                arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    100 + 2 * (blk % 5)
                )
                blk += 1
        w, h, px = _jpeg_progressive_pixels(
            make_jpeg_gray_progressive_full(arr)
        )
        assert (w, h) == (24, 16)
        assert np.array_equal(px, arr)

    def test_dc_preview_reads_full_progressive_first_scan(self):
        """The preview decoder consumes the full file's FIRST scan
        (Al=1) — coarse but valid: pixel lattice 128 + 4*(dc_q>>1)."""
        import numpy as np

        from cdc_pipe_line_spark.multimodal import (
            _jpeg_progressive_dc_pixels,
            make_jpeg_gray_progressive_full,
        )

        arr = np.full((8, 16), 102, dtype=np.uint8)
        arr[:, 8:] = 110
        w, h, al, pv = _jpeg_progressive_dc_pixels(
            make_jpeg_gray_progressive_full(arr)
        )
        assert (w, h, al) == (16, 8, 1)
        for got, v in zip(pv.flatten().tolist(), (102, 110)):
            dc_q = int(np.round((v - 128) / 2.0))
            assert got == 128 + 4 * (dc_q >> 1)

    def test_ac_refinement_with_inconsistent_ah_al_rejected(self):
        """Since round 11 AC refinement DECODES (see
        TestJpegAcSuccessiveApproximation); what must still fail
        precisely is a successive-approximation ladder that skips a
        bit plane (Ah != Al+1 — T.81 §G.1.1.1.2)."""
        import numpy as np
        import pytest

        from cdc_pipe_line_spark.multimodal import (
            MediaDecodeError,
            _jpeg_progressive_pixels,
            make_jpeg_gray_progressive_full,
        )

        enc = bytearray(
            make_jpeg_gray_progressive_full(
                np.full((8, 8), 120, dtype=np.uint8)
            )
        )
        # find the third SOS (first AC scan) and mark it Ah=3, Al=1
        pos = -1
        for _ in range(3):
            pos = enc.find(b"\xff\xda", pos + 1)
        assert pos > 0
        enc[pos + 9] = 0x31  # AhAl byte of the AC scan
        with pytest.raises(MediaDecodeError, match="Ah=Al\\+1"):
            _jpeg_progressive_pixels(bytes(enc))

    def test_baseline_frame_rejected(self):
        import numpy as np
        import pytest

        from cdc_pipe_line_spark.multimodal import (
            MediaDecodeError,
            _jpeg_progressive_pixels,
            make_jpeg_gray,
        )

        with pytest.raises(MediaDecodeError, match="not progressive"):
            _jpeg_progressive_pixels(
                make_jpeg_gray(np.full((8, 8), 99, dtype=np.uint8))
            )

    def test_truncation_quarantines(self):
        import numpy as np
        import pytest

        from cdc_pipe_line_spark.multimodal import (
            MediaDecodeError,
            _jpeg_progressive_pixels,
            make_jpeg_gray_progressive_full,
        )

        enc = make_jpeg_gray_progressive_full(
            np.full((8, 8), 99, dtype=np.uint8)
        )
        with pytest.raises(MediaDecodeError, match="missing EOI"):
            _jpeg_progressive_pixels(enc[:20])


class TestJpegAcSuccessiveApproximation:
    def test_six_scan_equals_baseline_decode(self):
        """AC successive approximation (first passes at Al=1 +
        refinement scans at Ah=1/Al=0 with newly-significant coding,
        buffered correction bits, ZRL-with-corrections and
        correction-sweeping EOB runs) must still reproduce the
        baseline raster exactly — random content drives every
        branch."""
        import numpy as np

        from cdc_pipe_line_spark.multimodal import (
            _jpeg_gray_pixels,
            _jpeg_progressive_pixels,
            make_jpeg_gray,
            make_jpeg_gray_progressive_full,
        )

        rng = np.random.RandomState(23)
        for trial in range(5):
            h, w = 8 * rng.randint(1, 4), 8 * rng.randint(1, 5)
            arr = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
            _, _, base_px = _jpeg_gray_pixels(make_jpeg_gray(arr))
            pw, ph, ppx = _jpeg_progressive_pixels(
                make_jpeg_gray_progressive_full(arr, ac_successive=True)
            )
            assert (pw, ph) == (w, h)
            assert np.array_equal(ppx, base_px), f"trial {trial}"

    def test_smooth_gradient_long_runs(self):
        """Smooth content: sparse high-frequency ACs → long
        zero-history runs, refinement ZRLs, corrections interleaved —
        the exact shapes that exposed the run-accounting traps."""
        import numpy as np

        from cdc_pipe_line_spark.multimodal import (
            _jpeg_gray_pixels,
            _jpeg_progressive_pixels,
            make_jpeg_gray,
            make_jpeg_gray_progressive_full,
        )

        x = np.linspace(0, 255, 48)
        arr = np.clip(
            np.add.outer(np.linspace(0, 120, 24), x) % 256, 0, 255
        ).astype(np.uint8)
        _, _, base_px = _jpeg_gray_pixels(make_jpeg_gray(arr))
        _, _, ppx = _jpeg_progressive_pixels(
            make_jpeg_gray_progressive_full(arr, ac_successive=True)
        )
        assert np.array_equal(ppx, base_px)

    def test_refinement_with_wrong_ah_rejected(self):
        import numpy as np
        import pytest

        from cdc_pipe_line_spark.multimodal import (
            MediaDecodeError,
            _jpeg_progressive_pixels,
            make_jpeg_gray_progressive_full,
        )

        enc = bytearray(
            make_jpeg_gray_progressive_full(
                np.full((8, 8), 120, dtype=np.uint8), ac_successive=True
            )
        )
        # fifth SOS = first AC refinement scan; corrupt Ah to 2
        pos = -1
        for _ in range(5):
            pos = enc.find(b"\xff\xda", pos + 1)
        assert pos > 0
        assert enc[pos + 9] == 0x10
        enc[pos + 9] = 0x20
        with pytest.raises(MediaDecodeError, match="Ah=Al\\+1"):
            _jpeg_progressive_pixels(bytes(enc))
