"""Property-based tests (hypothesis) for the engine's pure-Python kernels:
the canonicalizer batch, the FNV frontier hash, the cuckoo filter's
no-false-negative contract, and the codec/phash invariants. These run
without a SparkSession, so hypothesis can afford many examples."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from facebook_crawler_spark.functions.urls import _canonicalize_batch, fnv64_signed

# URL alphabet kept printable-ASCII: the frontier generator only emits such
# URLs, and the canonicalizer's contract is defined over them
_host = st.from_regex(r"[A-Za-z][A-Za-z0-9.-]{0,20}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9_.~-]{0,10}){0,3}", fullmatch=True)
_param = st.from_regex(r"[a-z][a-z0-9]{0,5}=[A-Za-z0-9]{0,6}", fullmatch=True)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["https://", "http://", ""]))
    host = draw(_host)
    path = draw(_path)
    params = draw(st.lists(_param, max_size=4))
    tracking = draw(st.lists(st.sampled_from(
        ["utm_source=x", "utm_campaign=1", "fbclid=Z", "gclid=q", "ref=feed"]), max_size=2))
    q = "&".join(params + tracking)
    frag = draw(st.sampled_from(["", "#frag"]))
    return f"{scheme}{host}{path}" + (f"?{q}" if q else "") + frag


@settings(max_examples=300, deadline=None)
@given(st.lists(urls(), min_size=1, max_size=20))
def test_canonicalize_idempotent_and_clean(batch):
    out = _canonicalize_batch(pd.Series(batch))
    # idempotence: canonical form is a fixed point
    again = _canonicalize_batch(out)
    assert list(out) == list(again)
    for c in out:
        assert c.split("://", 1)[0] in ("http", "https")
        assert "#" not in c
        assert "utm_" not in c and "fbclid=" not in c and "gclid=" not in c
        # query params sorted
        if "?" in c:
            ps = c.split("?", 1)[1].split("&")
            assert ps == sorted(ps) and all(ps)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=64))
def test_fnv_stable_and_signed(s):
    h = fnv64_signed(s)
    assert -(1 << 63) <= h < (1 << 63)
    assert h == fnv64_signed(s)  # process-stable by construction


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=-(1 << 62), max_value=1 << 62), min_size=1, max_size=800, unique=True),
    st.lists(st.integers(min_value=-(1 << 62), max_value=1 << 62), min_size=1, max_size=200, unique=True),
)
def test_cuckoo_kernel_never_false_negative(seen, probes):
    """Driver-side kernel check (bypasses Spark): every inserted key must
    probe positive; the filter may only err toward 'maybe'."""
    from facebook_crawler_spark.streaming.seenset import (
        _alt_bucket,
        _cuckoo_parts,
    )

    n_buckets = 1 << 10
    # build a table the same way build_cuckoo's driver side does
    i1, fp = _cuckoo_parts(np.array(seen, dtype=np.int64), n_buckets)
    table = np.zeros((n_buckets, 4), dtype=np.uint16)
    counts = np.zeros(n_buckets, dtype=np.int32)
    for i, f in zip(i1, fp):
        cur_i, cur_f = int(i), int(f)
        placed = False
        for _ in range(1000):
            if counts[cur_i] < 4:
                table[cur_i, counts[cur_i]] = cur_f
                counts[cur_i] += 1
                placed = True
                break
            alt = int(_alt_bucket(np.int64(cur_i), np.uint16(cur_f), n_buckets))
            if counts[alt] < 4:
                table[alt, counts[alt]] = cur_f
                counts[alt] += 1
                placed = True
                break
            v = cur_f % 4
            cur_f, table[alt, v] = int(table[alt, v]), int(cur_f)
            cur_i = alt
        assert placed

    def probe(keys):
        pi1, pfp = _cuckoo_parts(np.array(keys, dtype=np.int64), n_buckets)
        pi2 = _alt_bucket(pi1, pfp, n_buckets)
        return (table[pi1] == pfp[:, None]).any(axis=1) | (table[pi2] == pfp[:, None]).any(axis=1)

    assert probe(seen).all()  # NO false negatives, ever


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10**9), st.integers(min_value=32, max_value=160),
       st.integers(min_value=32, max_value=160))
def test_codec_roundtrip_and_phash_properties(idx, w, h):
    # The old "lossy hamming ≤ 2" bound was FALSIFIED at 32x33 jpeg
    # (hamming 3, within the ≥32px contract it claimed to cover). The fix
    # is exactness, not recalibration: the generator stamps the phash of
    # the decoded-after-encode pixels (synthetic.image_row), and the codec
    # is deterministic, so the verifier's recomputed phash must match
    # bit-for-bit for every format.
    from facebook_crawler_spark.functions import images as img

    arr = img.pixels_for(idx, w, h)
    # lossless roundtrip exact
    fmt, dec = img.decode(img.encode(arr, "png"))
    assert fmt == "png" and np.array_equal(dec, arr)
    # lossy roundtrip within the codec's error bound → PSNR ≥ 40
    fmt, decj = img.decode(img.encode(arr, "jpeg"))
    assert fmt == "jpeg" and img.psnr(arr, decj) >= 40.0
    # phash: int64-safe and stable
    ph = img.phash64(arr)
    assert -(1 << 63) <= ph < (1 << 63) and ph == img.phash64(arr)
    # generation-stamp semantics: the stored phash (post-roundtrip pixels)
    # equals the verifier's recomputation of the same decode, exactly —
    # deterministic codec, no tolerance needed
    assert img.phash64(decj) == img.phash64(img.decode(img.encode(arr, "jpeg"))[1])
    assert img.phash64(dec) == ph
