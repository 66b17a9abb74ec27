"""Bloom-filter membership + audio feature kernel.

Bloom: the no-false-negative invariant (every inserted key probes
true), false-positive sanity at the configured m/k, and the
differential check between the relational probe and the production
map-side (broadcast bitmap) probe.

Audio: the mapInPandas kernel vs an independent pure-Python rebuild of
the per-window integer features from the deterministic synthesis
formula.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_context_extractor_agent_spark.functions.bloom import (
    bloom_bitmap,
    bloom_build,
    bloom_probe,
    bloom_probe_joined,
    bloom_probe_mapside,
)
from pdf_context_extractor_agent_spark.functions.multimodal import (
    audio_features,
    make_fake_audio,
)

M_BITS = 1 << 14
K = 5


@pytest.fixture(scope="module")
def keys(spark):
    return spark.createDataFrame(
        [(f"https://example.com/page/{i}",) for i in range(400)], "url string"
    )


@pytest.fixture(scope="module")
def bloom(keys):
    # filter built over the even-i "prior snapshot" half
    seen = keys.filter(F.col("url").rlike(r"/(\d*[02468])$"))
    return bloom_build(seen, "url", M_BITS, K).cache()


def test_bloom_no_false_negatives(keys, bloom):
    seen = keys.filter(F.col("url").rlike(r"/(\d*[02468])$"))
    probed = bloom_probe(seen, "url", bloom, M_BITS, K)
    assert probed.filter(~F.col("maybe_member")).count() == 0


def test_bloom_false_positive_rate_sane(keys, bloom):
    unseen = keys.filter(~F.col("url").rlike(r"/(\d*[02468])$"))
    n = unseen.count()
    fp = bloom_probe(unseen, "url", bloom, M_BITS, K).filter("maybe_member").count()
    # 200 keys * 5 hashes in 16384 bits → theoretical fp ≈ 2e-5; allow
    # a generous margin so the test asserts the mechanism, not luck
    assert fp / n < 0.05


def test_bloom_duplicate_probe_keys_no_false_negative(spark, bloom):
    """A key appearing MULTIPLE times in the probe relation (realistic
    for cross-snapshot URL dedup) must still probe true when inserted:
    the per-key aggregate is min(hit), so multiplicity can't flip an
    inserted key to a false negative (a sum(hit)==k check would)."""
    dup = spark.createDataFrame(
        [("https://example.com/page/2",)] * 3
        + [("https://example.com/page/4",)] * 2
        + [("https://example.com/page/1",)] * 2,  # odd → never inserted
        "url string",
    )
    rows = {
        r["url"]: r["maybe_member"]
        for r in bloom_probe(dup, "url", bloom, M_BITS, K).collect()
    }
    assert rows["https://example.com/page/2"] is True
    assert rows["https://example.com/page/4"] is True
    assert len(rows) == 3  # one verdict per distinct key


def test_bloom_mapside_matches_relational(spark, keys, bloom):
    bitmap = bloom_bitmap(bloom, M_BITS)
    rel = {
        r["url"]: r["maybe_member"]
        for r in bloom_probe(keys, "url", bloom, M_BITS, K).collect()
    }
    mapside = {
        r["url"]: r["maybe_member"]
        for r in bloom_probe_mapside(keys, "url", bitmap, M_BITS, K).collect()
    }
    assert rel == mapside and len(rel) == 400


def test_bloom_joined_probe_matches_relational(keys, bloom):
    rel = {
        r["url"]: r["maybe_member"]
        for r in bloom_probe(keys, "url", bloom, M_BITS, K).collect()
    }
    joined = {
        r["url"]: r["maybe_member"]
        for r in bloom_probe_joined(keys, "url", bloom, M_BITS, K).collect()
    }
    assert rel == joined and len(joined) == 400


def test_bloom_joined_probe_is_shuffle_free(keys, bloom):
    plan = bloom_probe_joined(
        keys, "url", bloom, M_BITS, K
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(url" not in plan


def test_bloom_word_count_bounded(bloom):
    assert bloom.count() <= M_BITS // 64


def test_audio_features_match_reference(spark):
    window = 64
    media = spark.createDataFrame(
        [(i, "audio", make_fake_audio(i, n_windows=2 + i % 3, window=window))
         for i in range(12)],
        "media_id long, kind string, payload binary",
    )
    got = {
        (r.media_id, r.window_idx): (r.sum_abs, r.max_abs, r.energy, r.zero_crossings)
        for r in audio_features(media, window=window).collect()
    }
    expect = {}
    for mid in range(12):
        n = (2 + mid % 3) * window
        s = [((mid * 131 + i * 17) % 4096) - 2048 for i in range(n)]
        for w in range(n // window):
            seg = s[w * window:(w + 1) * window]
            zc = sum(
                1 for a, b in zip(seg, seg[1:]) if (a < 0) != (b < 0)
            )
            expect[(mid, w)] = (
                sum(abs(v) for v in seg),
                max(abs(v) for v in seg),
                sum(v * v for v in seg),
                zc,
            )
    assert got == expect


def test_audio_trailing_partial_window_dropped(spark):
    payload = make_fake_audio(7, n_windows=3, window=100)
    media = spark.createDataFrame(
        [(7, "audio", payload)], "media_id long, kind string, payload binary"
    )
    # decode 300 samples but frame at window=128 → 2 full windows only
    assert audio_features(media, window=128).count() == 2


def test_audio_unknown_container_raises(spark):
    media = spark.createDataFrame(
        [(1, "audio", b"OggS....vorbis")], "media_id long, kind string, payload binary"
    )
    with pytest.raises(Exception, match="no codec"):
        audio_features(media, window=16).collect()


def test_audio_real_wav_codec_matches_fake(spark):
    """A genuine stdlib-written 16-bit PCM WAV of the same samples must
    produce feature rows identical to the FAKEAUD container's — the
    real-codec path feeds the same integer kernel. A stereo WAV reduces
    to channel 0."""
    import io
    import wave

    import numpy as np

    from pdf_context_extractor_agent_spark.functions.multimodal import (
        make_fake_audio,
    )

    n = 4 * 64
    s = (((7 * 131) + np.arange(n, dtype=np.int64) * 17) % 4096) - 2048
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(s.astype("<i2").tobytes())
    stereo = io.BytesIO()
    with wave.open(stereo, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        inter = np.empty(2 * n, dtype="<i2")
        inter[0::2] = s.astype("<i2")
        inter[1::2] = 0  # junk right channel: must be ignored
        wf.writeframes(inter.tobytes())
    media = spark.createDataFrame(
        [
            (1, "audio", make_fake_audio(7, n_windows=4, window=64)),
            (2, "audio", buf.getvalue()),
            (3, "audio", stereo.getvalue()),
        ],
        "media_id long, kind string, payload binary",
    )
    rows = audio_features(media, window=64).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(
            (r.window_idx, r.sum_abs, r.max_abs, r.energy, r.zero_crossings)
        )
    assert by_id[1] == by_id[2] == by_id[3]


# --------------------------------------------------------------------------
# audio fingerprint near-dup
# --------------------------------------------------------------------------

def test_audio_fingerprint_twins_and_short_tracks(spark):
    from pdf_context_extractor_agent_spark.functions.multimodal import (
        audio_features,
        audio_fingerprint,
        audio_near_dups,
        make_fake_audio,
    )

    rows = [(i, make_fake_audio(i, n_windows=6)) for i in range(8)]
    rows.append((100, make_fake_audio(3, n_windows=6)))   # payload twin of 3
    rows.append((200, make_fake_audio(9, n_windows=1)))   # 1 window → fp 0
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    fps = {r["media_id"]: r["fp32"]
           for r in audio_fingerprint(audio_features(media)).collect()}
    assert fps[100] == fps[3]
    assert fps[200] == 0
    pairs = {(r["media_a"], r["media_b"]): r["hamming"]
             for r in audio_near_dups(
                 audio_fingerprint(audio_features(media))).collect()}
    assert pairs[(3, 100)] == 0


def test_audio_band_join_is_exhaustive_at_threshold(spark):
    """Differential: banded join output == brute-force all-pairs scan
    for Hamming ≤ 3 over adversarial fingerprints (including pairs
    whose 3 flipped bits straddle band boundaries)."""
    from pdf_context_extractor_agent_spark.functions.multimodal import (
        audio_near_dups,
    )

    base = 0b10110010_01011100_11110000_00001111
    fps = [(0, base)]
    # flip 1..4 bits in varying positions (bit 7|8 straddles bands)
    for i, flips in enumerate([[0], [7, 8], [7, 8, 15], [0, 8, 16, 24]]):
        v = base
        for b in flips:
            v ^= 1 << b
        fps.append((i + 1, v))
    df = spark.createDataFrame(fps, "media_id long, fp32 long")
    got = sorted(
        (r["media_a"], r["media_b"], r["hamming"])
        for r in audio_near_dups(df, max_hamming=3).collect()
    )
    brute = []
    for ia, fa in fps:
        for ib, fb in fps:
            if ia < ib and bin(fa ^ fb).count("1") <= 3:
                brute.append((ia, ib, bin(fa ^ fb).count("1")))
    assert got == sorted(brute)
    # the 4-bit-flip row pairs with base ONLY via others, never directly
    assert (0, 4, 4) not in got


def test_malformed_wav_keeps_no_codec_contract(spark):
    """Truncated/compressed RIFF payloads must raise the honest
    NotImplementedError('no codec...'), never a bare wave.Error."""
    media = spark.createDataFrame(
        [(1, "audio", b"RIFF\x10\x00\x00\x00WAVEjunk")],
        "media_id long, kind string, payload binary",
    )
    with pytest.raises(Exception, match="no codec"):
        audio_features(media, window=16).collect()
