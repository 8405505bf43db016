"""The decode dispatch (real codec when importable, byte-stat stub
otherwise) must work in WHICHEVER environment runs it — the round-5 verdict
asked that the deploy-time codec swap itself be tested, not just documented.

In this container (no PIL) the fallback path runs; in a codec-equipped
deployment the same tests exercise the real path. Both paths share the
FEATURE_DIM output contract, so the Spark schema never changes.
"""

from __future__ import annotations

import pytest

from fpl_data_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    _pil_image_module,
    decode_payload,
    decode_stub,
)

# 1x1 red PNG, the smallest well-formed image payload (public domain bytes)
_TINY_PNG = bytes.fromhex(
    "89504e470d0a1a0a0000000d4948445200000001000000010802000000907753de"
    "0000000c4944415408d763f8cfc000000301010018dd8db00000000049454e44ae426082"
)


def test_decode_dispatch_runs_available_path():
    feats = decode_payload(_TINY_PNG, "image/png")
    assert len(feats) == FEATURE_DIM
    assert all(isinstance(x, float) for x in feats)
    if _pil_image_module() is None:
        # codec-less container: dispatch must equal the stub exactly
        assert feats == decode_stub(_TINY_PNG)
    else:
        # real path: a 1x1 red pixel -> width == height == 1.0, and the
        # result is NOT the stub's byte statistics
        assert feats[5] == 1.0 and feats[6] == 1.0
        assert feats != decode_stub(_TINY_PNG)


def test_decode_dispatch_corrupt_bytes_fall_back():
    """Corrupt image bytes must degrade to the stub, never raise — one bad
    asset cannot kill an Arrow batch."""
    junk = b"not an image at all"
    assert decode_payload(junk, "image/png") == decode_stub(junk)


def test_decode_dispatch_non_image_uses_stub():
    wav = b"RIFF....WAVEfmt "
    assert decode_payload(wav, "audio/wav") == decode_stub(wav)
    assert decode_payload(b"", "image/png") == decode_stub(b"")


def test_mapinpandas_features_unchanged_by_dispatch(spark):
    """The registered pipeline over synthetic payloads (text bytes labeled
    image/*) produces identical features under the dispatch in any
    environment: PIL cannot open text bytes, so the real path falls back to
    the stub — pinning that this container's oracle values are
    deploy-portable."""
    from fpl_data_pipeline_spark.operators.multimodal import (
        extract_features,
        media_table,
    )

    media = media_table(spark, "/root/testdata/sf0.001")
    sample = media.orderBy("asset_id").limit(5).collect()
    got = {
        r["asset_id"]: r["features"]
        for r in extract_features(media).filter("asset_id < 5").collect()
    }
    assert len(sample) == 5 and len(got) == 5
    for m in sample:
        expected = decode_stub(bytes(m["media"]))
        assert got[m["asset_id"]] == pytest.approx(expected, rel=1e-6)


def test_decode_dispatch_null_media_type_uses_stub():
    """A NULL media_type (absent metadata) must take the stub path — never
    raise outside the decode try and kill the batch."""
    payload = b"some bytes"
    assert decode_payload(payload, None) == decode_stub(payload)
