"""decode_wav: the real RIFF/WAVE chunk walker — round-trip against the
synthesizer, unknown-chunk skipping, pad-byte handling, and loud failure
on malformed structure.
"""

from __future__ import annotations

import struct

import pytest

from prueba_tecnica_http_client_etl_spark.operators.multimodal import (
    _SAMPLE_RATES,
    _WAV_BITS8_MOD,
    _WAV_FRAMES_MOD,
    _WAV_FRAMES_OFF,
    _WAV_LIST_MOD,
    build_audio_payload,
    decode_wav,
)


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 11, 22, 33, 44, 977, 1001])
def test_round_trip_matches_synthesis_parameters(doc_id):
    meta = decode_wav(build_audio_payload(doc_id))
    assert meta["sample_rate"] == _SAMPLE_RATES[doc_id % 4]
    assert meta["channels"] == 1 + doc_id % 2
    assert meta["bits"] == (8 if doc_id % _WAV_BITS8_MOD == 0 else 16)
    frames = doc_id % _WAV_FRAMES_MOD + _WAV_FRAMES_OFF
    assert meta["n_frames"] == frames
    assert meta["duration_ms"] == frames * 1000 // meta["sample_rate"]


def test_list_chunk_is_skipped_and_pad_byte_honored():
    # doc_id 0: LIST chunk present (0 % 11 == 0); 8-bit mono (0 % 3 == 0,
    # channels 1) with odd frame count would need the pad byte
    with_list = build_audio_payload(0)
    assert b"LIST" in with_list
    assert decode_wav(with_list)["n_frames"] == _WAV_FRAMES_OFF
    # odd data size: 8-bit mono, frames odd -> payload carries a pad byte
    # doc_id 33: 33%3==0 -> 8-bit, 33%2 -> 2 channels... find an odd case
    # below doc_id=977 the frame count for (8-bit, mono) ids is always
    # even (divisible-by-6 id + 100); the modulus wrap makes odd counts
    for doc_id in range(0, 1200):
        bits8 = doc_id % _WAV_BITS8_MOD == 0
        mono = doc_id % 2 == 0
        frames = doc_id % _WAV_FRAMES_MOD + _WAV_FRAMES_OFF
        if bits8 and mono and frames % 2 == 1:
            meta = decode_wav(build_audio_payload(doc_id))
            assert meta["n_frames"] == frames
            break
    else:
        pytest.fail("no odd-sized-data case in range")


def test_malformed_payloads_fail_loudly():
    good = build_audio_payload(7)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="size mismatch"):
        decode_wav(good[:-2])  # truncation breaks the RIFF size
    # non-PCM format code
    bad = bytearray(good)
    fmt_at = bad.index(b"fmt ") + 8
    bad[fmt_at : fmt_at + 2] = struct.pack("<H", 3)  # IEEE float
    # restore RIFF size (unchanged length) — only the format code differs
    with pytest.raises(ValueError, match="not PCM"):
        decode_wav(bytes(bad))


def test_chunk_size_overrunning_payload_raises_value_error():
    """A chunk whose declared size exceeds the remaining bytes must raise
    ValueError (not struct.error from a truncated unpack), even when the
    outer RIFF size is made consistent with the truncated payload."""
    good = build_audio_payload(7)
    # inflate the data chunk's declared size without adding bytes
    bad = bytearray(good)
    data_at = bad.index(b"data") + 4
    declared = struct.unpack("<I", bytes(bad[data_at : data_at + 4]))[0]
    bad[data_at : data_at + 4] = struct.pack("<I", declared + 64)
    with pytest.raises(ValueError, match="overruns payload"):
        decode_wav(bytes(bad))
    # truncate mid-fmt with a fixed-up RIFF size: fmt declares 16 bytes
    # but fewer remain — the walk must reject it, not unpack garbage
    fmt_at = good.index(b"fmt ")
    cut = good[: fmt_at + 12]  # chunk header + 4 of 16 declared bytes
    fixed = b"RIFF" + struct.pack("<I", len(cut) - 8) + cut[8:]
    with pytest.raises(ValueError, match="overruns payload"):
        decode_wav(fixed)
