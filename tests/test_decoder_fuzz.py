"""Fuzz pins for the real binary parsers' error contract: for ANY byte
string — arbitrary garbage, or a valid synthesized payload mutated by
truncation / bit flips / header-field corruption — decode_image and
decode_wav must either return a metadata dict or raise ValueError.
struct.error / IndexError / UnicodeDecodeError leaking out of a decoder
is the bug class the round-6 ADVICE chunk-overrun fix closed; these
tests pin that the WHOLE surface holds it, not just the fixed site.
Pure Python (no Spark session) — hypothesis can afford thousands of
examples."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from prueba_tecnica_http_client_etl_spark.operators.multimodal import (
    build_audio_payload,
    build_image_payload,
    decode_image,
    decode_wav,
)


def _decode_or_valueerror(decode, payload: bytes):
    """The contract: a dict back, or ValueError — nothing else."""
    try:
        meta = decode(payload)
    except ValueError:
        return None
    assert isinstance(meta, dict) and meta, meta
    return meta


# arbitrary bytes, biased toward the magic prefixes so the parsers'
# interior paths (not just the magic check) get exercised
_garbage = st.one_of(
    st.binary(max_size=256),
    st.binary(max_size=250).map(lambda b: b"P6" + b),
    st.binary(max_size=250).map(lambda b: b"P5" + b),
    st.binary(max_size=250).map(lambda b: b"BM" + b),
    st.binary(max_size=250).map(lambda b: b"RIFF" + b),
    st.binary(max_size=242).map(lambda b: b"RIFF\x00\x00\x00\x00WAVE" + b),
)


@given(payload=_garbage)
@settings(max_examples=2000, deadline=None)
def test_decoders_never_leak_non_valueerror_on_garbage(payload):
    _decode_or_valueerror(decode_image, payload)
    _decode_or_valueerror(decode_wav, payload)


def _mutate(payload: bytes, cut: int, pos: int, byte: int) -> bytes:
    """Truncate to `cut` bytes, then overwrite one byte — the two
    corruption classes a torn write / bad disk actually produces."""
    p = payload[: max(1, cut % (len(payload) + 1))]
    if p:
        pos %= len(p)
        p = p[:pos] + bytes([byte]) + p[pos + 1 :]
    return p


@given(
    doc_id=st.integers(min_value=0, max_value=10_000),
    cut=st.integers(min_value=1, max_value=1 << 20),
    pos=st.integers(min_value=0, max_value=1 << 20),
    byte=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=1500, deadline=None)
def test_image_decoder_contract_under_mutation(doc_id, cut, pos, byte):
    _decode_or_valueerror(decode_image, _mutate(build_image_payload(doc_id), cut, pos, byte))


@given(
    doc_id=st.integers(min_value=0, max_value=10_000),
    cut=st.integers(min_value=1, max_value=1 << 20),
    pos=st.integers(min_value=0, max_value=1 << 20),
    byte=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=1500, deadline=None)
def test_wav_decoder_contract_under_mutation(doc_id, cut, pos, byte):
    _decode_or_valueerror(decode_wav, _mutate(build_audio_payload(doc_id), cut, pos, byte))


@given(doc_id=st.integers(min_value=0, max_value=100_000))
@settings(max_examples=500, deadline=None)
def test_valid_payloads_always_decode(doc_id):
    """The positive half of the contract at any doc_id (the oracle-checked
    queries only exercise the corpus's id range): a payload the builders
    emit always parses, and the parsed geometry matches the arithmetic
    the builders used."""
    img = decode_image(build_image_payload(doc_id))
    assert img["width"] == doc_id % 29 + 2 and img["height"] == doc_id % 17 + 2
    wav = decode_wav(build_audio_payload(doc_id))
    assert wav["n_frames"] == doc_id % 977 + 100
    assert wav["channels"] == 1 + doc_id % 2


# --- round 16: the perceptual-hash parsers join the same contract ------------

from prueba_tecnica_http_client_etl_spark.operators.multimodal import (  # noqa: E402
    audio_fingerprint_of_payload,
    build_grid_image_payload,
    build_tone_wav_payload,
    phash_of_payload,
)


def _hash_or_valueerror(fn, payload: bytes):
    """The fingerprint contract: a non-negative int back, or ValueError
    — never struct.error/IndexError/numpy exceptions."""
    try:
        h = fn(payload)
    except ValueError:
        return None
    assert isinstance(h, int) and h >= 0, h
    return h


@given(payload=_garbage)
@settings(max_examples=2000, deadline=None)
def test_fingerprint_parsers_never_leak_on_garbage(payload):
    _hash_or_valueerror(phash_of_payload, payload)
    _hash_or_valueerror(audio_fingerprint_of_payload, payload)


@given(
    doc_id=st.integers(min_value=0, max_value=10_000),
    cut=st.integers(min_value=1, max_value=1 << 20),
    pos=st.integers(min_value=0, max_value=1 << 20),
    byte=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=1000, deadline=None)
def test_phash_contract_under_mutation(doc_id, cut, pos, byte):
    _hash_or_valueerror(
        phash_of_payload, _mutate(build_grid_image_payload(doc_id), cut, pos, byte)
    )


@given(
    doc_id=st.integers(min_value=0, max_value=10_000),
    cut=st.integers(min_value=1, max_value=1 << 20),
    pos=st.integers(min_value=0, max_value=1 << 20),
    byte=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=1000, deadline=None)
def test_audio_fingerprint_contract_under_mutation(doc_id, cut, pos, byte):
    _hash_or_valueerror(
        audio_fingerprint_of_payload,
        _mutate(build_tone_wav_payload(doc_id), cut, pos, byte),
    )
