"""Property tests for the round-7 primitives.

1. The count-agg pre-pass engine half (_set_overlap_stats) must equal a
   brute-force Python set-overlap computation with the same df cap on
   arbitrary corpora — pinning that the post-collect -> pre-pass migration
   changed the PLAN, not the semantics.
2. The winnowing pre-pass pair set must equal the brute-force fingerprint
   model (hash every 3-gram, window-min, per-doc distinct, cap by document
   frequency, count shared fps per pair).
3. The pure-Python PGM/PPM decoder must decode arbitrary valid images to
   the exact nearest-neighbor/ITU-601 stats, and must never raise — and
   never return a non-stub result — on arbitrary mutated/garbage bytes.
"""

from __future__ import annotations

import hashlib
import itertools

from hypothesis import given, settings, strategies as st

from fpl_data_pipeline_spark.operators.multimodal import (
    _ppm_gray8x8,
    decode_payload,
    decode_stub,
)

# --- brute-force reference models -------------------------------------------


def _norm_words(text: str) -> list[str]:
    return [w for w in " ".join(text.split()).lower().split(" ") if w]


def _shingle_set(text: str, n: int = 3) -> set[str]:
    ws = _norm_words(text)
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def _overlap_reference(texts: list[str], df_cap: int):
    """(a, b) -> (n_common, na, nb) with keys df-capped, sizes counted over
    surviving keys (incl. singletons), pairs needing >= 1 shared key."""
    sets = {i: _shingle_set(t) for i, t in enumerate(texts)}
    df: dict[str, int] = {}
    for s in sets.values():
        for k in s:
            df[k] = df.get(k, 0) + 1
    keep = {k for k, c in df.items() if c <= df_cap}
    capped = {i: s & keep for i, s in sets.items()}
    out = {}
    for a, b in itertools.combinations(sorted(capped), 2):
        common = len(capped[a] & capped[b])
        if common >= 1:
            out[(a, b)] = (common, len(capped[a]), len(capped[b]))
    return out


def _winnow_fps(text: str, w: int = 4) -> set[str]:
    ws = _norm_words(text)
    hs = [
        hashlib.md5(" ".join(ws[i : i + 3]).encode()).hexdigest()[:15]
        for i in range(len(ws) - 2)
    ]
    return {min(hs[i : i + w]) for i in range(len(hs))}


# a tiny word pool makes shared shingles (and boilerplate keys) likely
_WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"])
_TEXT = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8), st.integers(min_value=1, max_value=6))
def test_set_overlap_prepass_matches_bruteforce(spark, texts, df_cap):
    from fpl_data_pipeline_spark.operators.dedup import _set_overlap_stats, shingles

    d = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = _set_overlap_stats(shingles(d), "shingle", df_cap=df_cap).collect()
    got = {
        (r["doc_id_a"], r["doc_id_b"]): (r["n_common"], r["na"], r["nb"])
        for r in rows
    }
    assert got == _overlap_reference(texts, df_cap)


@settings(max_examples=8, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8), st.integers(min_value=1, max_value=6))
def test_winnow_prepass_matches_bruteforce(spark, texts, fp_cap):
    from fpl_data_pipeline_spark.operators.dedup import winnowing_candidate_pairs

    fps = {i: _winnow_fps(t) for i, t in enumerate(texts)}
    df: dict[str, int] = {}
    for s in fps.values():
        for f in s:
            df[f] = df.get(f, 0) + 1
    keep = {f for f, c in df.items() if 2 <= c <= fp_cap}
    expected = {}
    for a, b in itertools.combinations(sorted(fps), 2):
        shared = len(fps[a] & fps[b] & keep)
        if shared:
            expected[(a, b)] = shared
    d = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = winnowing_candidate_pairs(d, fp_cap=fp_cap).collect()
    got = {(r["doc_id_a"], r["doc_id_b"]): r["shared_fps"] for r in rows}
    assert got == expected


# --- PPM decoder properties ---------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.booleans(),
    st.data(),
)
def test_ppm_decoder_exact_on_valid_images(w, h, color, data):
    ch = 3 if color else 1
    raster = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h * ch,
                max_size=w * h * ch,
            )
        )
    )
    magic = b"P6" if color else b"P5"
    payload = magic + b" %d %d 255\n" % (w, h) + raster
    feats = _ppm_gray8x8(payload)
    assert feats is not None

    def lum(x, y):
        o = (y * w + x) * ch
        if ch == 3:
            return (raster[o] * 299 + raster[o + 1] * 587 + raster[o + 2] * 114) // 1000
        return raster[o]

    px = [lum((c * w) // 8, (r * h) // 8) for r in range(8) for c in range(8)]
    assert feats == [
        sum(px) / 64.0,
        float(min(px)),
        float(max(px)),
        float(px[0]),
        float(px[-1]),
        float(w),
        float(h),
        float(len(payload)),
    ]


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=200))
def test_ppm_decoder_never_raises_on_garbage(payload):
    """Arbitrary bytes: the dispatch must return SOME 8-float vector and
    never raise — the 'one bad asset must not kill the batch' contract."""
    feats = decode_payload(payload, "image/x-portable-pixmap")
    assert len(feats) == 8
    if _ppm_gray8x8(bytes(payload)) is None:
        assert feats == decode_stub(payload)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_ppm_decoder_rejects_any_truncation(data):
    """Every strict prefix of a valid PPM must fall back to the stub —
    the byte-exact raster-length rule."""
    w, h = data.draw(st.integers(1, 5)), data.draw(st.integers(1, 5))
    raster = bytes(data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)))
    payload = b"P6 %d %d 255\n" % (w, h) + raster
    cut = data.draw(st.integers(min_value=1, max_value=len(payload) - 1))
    assert _ppm_gray8x8(payload[:cut]) is None
