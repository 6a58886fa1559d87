"""As-of / range joins (operators/asof.py) and multimodal plumbing
(operators/multimodal.py): semantics on hand-built frames, determinism of
the fake decode kernel, and fan-out arithmetic of the frame sampler."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from fluvio_duck_spark.operators.asof import asof_join, range_band_join
from fluvio_duck_spark.operators.multimodal import (
    attach_binary_content,
    decode_image,
    extract_features,
    sample_frames,
)


def _t(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _t("2024-01-01T00:00:05")),
            (2, 10, _t("2024-01-01T00:00:10")),
            (3, 10, _t("2024-01-01T00:00:02")),
            (4, 20, _t("2024-01-01T00:00:10")),
            (5, 30, _t("2024-01-01T00:00:10")),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _t("2024-01-01T00:00:04"), 100, 1.5),
            (10, _t("2024-01-01T00:00:07"), 101, 2.5),
            (20, _t("2024-01-01T00:00:10"), 200, 9.0),
        ],
        "user_id long, ts timestamp, purchase_event long, purchase_value double",
    )
    return left, right


def test_asof_backward_semantics(asof_frames):
    left, right = asof_frames
    out = asof_join(
        left, right, "user_id", "user_id", "ts", "ts",
        ["purchase_event", "purchase_value"],
    )
    got = {r.event_id: (r.purchase_event, r.purchase_value) for r in out.collect()}
    assert got == {
        1: (100, 1.5),   # most recent at-or-before :05 is :04
        2: (101, 2.5),   # :07 wins over :04
        3: (None, None), # nothing before :02 → left-outer nulls
        4: (200, 9.0),   # equal timestamps match (inclusive <=)
        5: (None, None), # key with no right rows at all
    }
    assert out.count() == left.count()  # as-of never duplicates left rows


def test_asof_forward_semantics(asof_frames):
    left, right = asof_frames
    out = asof_join(
        left, right, "user_id", "user_id", "ts", "ts",
        ["purchase_event", "purchase_value"],
        direction="forward",
    )
    got = {r.event_id: (r.purchase_event, r.purchase_value) for r in out.collect()}
    assert got == {
        1: (101, 2.5),   # earliest at-or-after :05 is :07
        2: (None, None), # nothing at-or-after :10 for key 10
        3: (100, 1.5),   # earliest at-or-after :02 is :04
        4: (200, 9.0),   # equal timestamps match (inclusive >=)
        5: (None, None), # key with no right rows at all
    }
    assert out.count() == left.count()


def test_asof_unknown_direction(asof_frames):
    left, right = asof_frames
    with pytest.raises(ValueError):
        asof_join(left, right, "user_id", "user_id", "ts", "ts", [], direction="nearest")


def test_range_band_join_is_broadcast(spark):
    fact = spark.range(100).select(F.col("id").cast("double").alias("v"))
    bands = spark.createDataFrame(
        [("lo", 0.0, 50.0), ("hi", 50.0, 1000.0)], "band string, lo double, hi double"
    )
    out = range_band_join(fact, bands, "v")
    counts = {r.band: r.n for r in out.groupBy("band").agg(F.count("*").alias("n")).collect()}
    assert counts == {"lo": 50, "hi": 50}
    # the band side must be broadcast: fact never shuffles for the join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_extract_features_deterministic(spark, sf_dir):
    from fluvio_duck_spark.sources.tables import load

    d = attach_binary_content(load(spark, sf_dir, "documents").limit(20))
    a = {r.doc_id: r.features for r in extract_features(d, n_features=16).collect()}
    b = {r.doc_id: r.features for r in extract_features(d, n_features=16).collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())
    assert all(0.0 <= x < 1.0 for v in a.values() for x in v)


def test_sample_frames_fanout_and_bytes(spark, sf_dir):
    from fluvio_duck_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").limit(20)
    d = attach_binary_content(docs)
    frames = sample_frames(d, every_n_bytes=64, max_frames=8).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in texts.items():
        data = text.encode()
        expect_n = min(8, max(1, len(data) // 64))
        rows = sorted(by_doc[doc_id], key=lambda r: r.frame_no)
        assert [r.frame_no for r in rows] == list(range(expect_n))
        # frames re-assemble a prefix of the payload byte-exactly
        assert b"".join(bytes(r.frame) for r in rows) == data[: expect_n * 64]


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8")


def test_winnow_shared_run_guarantee(spark):
    """Winnowing invariant: two docs sharing a run of >= k+w-1 tokens
    (here 5+4-1=8) share at least one fingerprint."""
    from fluvio_duck_spark.functions.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"{shared} completely different tail words here"),
            (3, "nothing in common with the others at all whatsoever today"),
        ],
        "doc_id long, text string",
    )
    fps = {
        r.doc_id: set(r.fps)
        for r in df.select(
            "doc_id", winnow_fingerprints("text", k=5, w=4).alias("fps")
        ).collect()
    }
    assert fps[1] & fps[2], "docs sharing an 8-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_resize_content_shapes_and_meta(spark, sf_dir):
    from fluvio_duck_spark.operators.multimodal import resize_content
    from fluvio_duck_spark.sources.tables import load

    d = attach_binary_content(load(spark, sf_dir, "documents").limit(10))
    out = resize_content(d, target_w=64, target_h=64).collect()
    assert len(out) == 10
    for r in out:
        assert len(bytes(r.content)) == 64 * 64 // 64  # deterministic fake size
        assert r.meta.width == 64 and r.meta.height == 64
        assert r.meta.format == "utf8"  # passthrough of untouched meta fields
    # chains with the feature extractor (same column convention)
    from fluvio_duck_spark.operators.multimodal import extract_features

    d2 = resize_content(d, target_w=64, target_h=64)
    feats = extract_features(d2, n_features=8).collect()
    assert all(len(r.features) == 8 for r in feats)


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized cross-check: asof_join vs pandas.merge_asof (backward,
    inclusive) on 300 left x 200 right rows over 25 keys, fixed seed."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    left_pd = pd.DataFrame(
        {
            "event_id": np.arange(300),
            "user_id": rng.integers(0, 25, 300),
            "t": rng.integers(0, 10_000, 300),
        }
    )
    right_pd = pd.DataFrame(
        {
            "user_id": rng.integers(0, 25, 200),
            "t": rng.integers(0, 10_000, 200),
            "val": rng.integers(0, 1_000_000, 200),
        }
    # merge_asof requires uniqueness per (key, time) on the right for a
    # deterministic answer — same precondition asof_join documents
    ).drop_duplicates(subset=["user_id", "t"])

    expected = pd.merge_asof(
        left_pd.assign(ts=pd.to_datetime(left_pd.t, unit="s")).sort_values("ts"),
        right_pd.assign(ts=pd.to_datetime(right_pd.t, unit="s")).sort_values("ts")[
            ["user_id", "ts", "val"]
        ],
        on="ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    want = {
        int(r.event_id): (None if pd.isna(r.val) else int(r.val))
        for r in expected.itertuples()
    }

    left = spark.createDataFrame(
        left_pd.assign(ts=pd.to_datetime(left_pd.t, unit="s"))[
            ["event_id", "user_id", "ts"]
        ]
    )
    right = spark.createDataFrame(
        right_pd.assign(ts=pd.to_datetime(right_pd.t, unit="s"))[
            ["user_id", "ts", "val"]
        ]
    )
    out = asof_join(left, right, "user_id", "user_id", "ts", "ts", ["val"])
    got = {int(r.event_id): (None if r.val is None else int(r.val)) for r in out.collect()}
    assert got == want

    # same frames, forward direction, vs merge_asof direction='forward'
    expected_fwd = pd.merge_asof(
        left_pd.assign(ts=pd.to_datetime(left_pd.t, unit="s")).sort_values("ts"),
        right_pd.assign(ts=pd.to_datetime(right_pd.t, unit="s")).sort_values("ts")[
            ["user_id", "ts", "val"]
        ],
        on="ts",
        by="user_id",
        direction="forward",
        allow_exact_matches=True,
    )
    want_fwd = {
        int(r.event_id): (None if pd.isna(r.val) else int(r.val))
        for r in expected_fwd.itertuples()
    }
    out_fwd = asof_join(
        left, right, "user_id", "user_id", "ts", "ts", ["val"], direction="forward"
    )
    got_fwd = {
        int(r.event_id): (None if r.val is None else int(r.val))
        for r in out_fwd.collect()
    }
    assert got_fwd == want_fwd


def test_asof_tolerance_masks_stale_matches(spark):
    from fluvio_duck_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100.0, "l1"), (1, 500.0, "l2"), (2, 50.0, "l3")],
        "k long, t double, lname string",
    )
    right = spark.createDataFrame(
        [(1, 90.0, "fresh"), (1, 200.0, "stale-for-l2"), (2, 49.0, "ok")],
        "k long, t double, rname string",
    )
    # numeric time axis: tolerance in column units
    got = {
        r.lname: r.rname
        for r in asof_join(
            left, right, "k", "k", "t", "t", ["rname"], tolerance_seconds=20
        ).collect()
    }
    # l1: match at 90 (gap 10 <= 20) kept; l2: nearest-before is 200
    # (gap 300) -> masked to NULL; l3: gap 1 kept
    assert got == {"l1": "fresh", "l2": None, "l3": "ok"}


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized parity vs pandas.merge_asof (the de-facto as-of
    reference implementation): backward/forward, with and without
    tolerance, over several seeded random datasets."""
    import numpy as np
    import pandas as pd

    from fluvio_duck_spark.operators.asof import asof_join

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        nl, nr = 120, 80
        lpd = pd.DataFrame({
            "k": rng.integers(0, 5, nl),
            "t": rng.integers(0, 1000, nl).astype("float64"),
            "lid": np.arange(nl),
        }).sort_values(["t", "lid"]).reset_index(drop=True)
        rpd = pd.DataFrame({
            "k": rng.integers(0, 5, nr),
            "t": np.sort(rng.choice(np.arange(0.0, 1000.0), nr, replace=False)),
            "rv": np.arange(nr).astype("float64"),
        })
        for direction in ("backward", "forward"):
            for tol in (None, 50):
                want = pd.merge_asof(
                    lpd, rpd, on="t", by="k", direction=direction,
                    suffixes=("", "_r"),
                    tolerance=None if tol is None else float(tol),
                )
                got = asof_join(
                    spark.createDataFrame(lpd), spark.createDataFrame(rpd),
                    "k", "k", "t", "t", ["rv"],
                    direction=direction, tolerance_seconds=tol,
                ).toPandas().sort_values("lid").reset_index(drop=True)
                w = want.sort_values("lid").reset_index(drop=True)
                assert got["rv"].fillna(-1).tolist() == w["rv"].fillna(-1).tolist(), (
                    seed, direction, tol)


def test_interval_overlap_join_matches_naive_and_counts_once(spark):
    """Grid-bucketed overlap join vs the naive inequality join on a
    constructed set with multi-cell spans, exact-boundary touches, and
    pairs sharing many cells (the dedupe-once property)."""
    from pyspark.sql import functions as F

    from fluvio_duck_spark.operators.intervals import interval_overlap_join

    def mk(rows, pre):
        return spark.createDataFrame(
            [(i, k, f"2024-01-01 {s}", f"2024-01-01 {e}") for i, (k, s, e) in enumerate(rows)],
            f"{pre}_id long, {pre}_k long, {pre}_s string, {pre}_e string",
        ).select(
            f"{pre}_id", f"{pre}_k",
            F.col(f"{pre}_s").cast("timestamp").alias(f"{pre}_s"),
            F.col(f"{pre}_e").cast("timestamp").alias(f"{pre}_e"),
        )

    a = mk([(1, "00:00:00", "05:00:00"),   # long: spans many 15-min cells
            (1, "06:00:00", "06:10:00"),
            (2, "01:00:00", "02:00:00")], "a")
    b = mk([(1, "04:59:00", "07:00:00"),   # overlaps both of key 1's
            (1, "05:00:00", "05:30:00"),   # touches a0's end exactly
            (2, "02:00:00", "03:00:00"),   # touches a2's end exactly
            (3, "00:00:00", "23:00:00")], "b")  # different key: never joins

    got_open = {
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", cell_seconds=900,
            keys=[("a_k", "b_k")],
        ).collect()
    }
    naive_open = {
        (r.a_id, r.b_id)
        for r in a.join(
            b,
            (a.a_k == b.b_k) & (a.a_s < b.b_e) & (b.b_s < a.a_e),
        ).collect()
    }
    assert got_open == naive_open  # incl. NO boundary-touch pairs

    got_closed = {
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", cell_seconds=900,
            keys=[("a_k", "b_k")], closed=True,
        ).collect()
    }
    naive_closed = {
        (r.a_id, r.b_id)
        for r in a.join(
            b,
            (a.a_k == b.b_k) & (a.a_s <= b.b_e) & (b.b_s <= a.a_e),
        ).collect()
    }
    assert got_closed == naive_closed
    assert (0, 1) in got_closed and (0, 1) not in got_open  # the touch pair
    # count-once: collect() sets above would hide dupes — assert row counts
    n_rows = interval_overlap_join(
        a, b, "a_s", "a_e", "b_s", "b_e", cell_seconds=900,
        keys=[("a_k", "b_k")], closed=True,
    ).count()
    assert n_rows == len(got_closed)


def test_interval_overlap_join_fuzz_vs_naive(spark):
    """Randomized parity: random interval sets (varied lengths incl.
    zero-width and many-cell spans, random keys) must match the naive
    inequality join exactly — row-for-row, both open and closed — across
    several seeds and cell widths."""
    import random

    from fluvio_duck_spark.operators.intervals import interval_overlap_join

    base = 1_700_000_000  # fixed epoch anchor
    for seed, cell in [(0, 60), (1, 3600), (2, 240)]:
        rng = random.Random(seed)

        def mk(n, pre):
            rows = []
            for i in range(n):
                s = base + rng.randrange(0, 86_400)
                e = s + rng.randrange(0, 7_200)  # zero-width allowed
                rows.append((i, rng.randrange(3), s, e))
            return spark.createDataFrame(
                rows, f"{pre}_id long, {pre}_k long, {pre}_su long, {pre}_eu long"
            ).selectExpr(
                f"{pre}_id", f"{pre}_k",
                f"timestamp_seconds({pre}_su) AS {pre}_s",
                f"timestamp_seconds({pre}_eu) AS {pre}_e",
            )

        a, b = mk(60, "a"), mk(60, "b")
        for closed in (False, True):
            got = interval_overlap_join(
                a, b, "a_s", "a_e", "b_s", "b_e", cell_seconds=cell,
                keys=[("a_k", "b_k")], closed=closed,
            )
            op = (lambda x, y: x <= y) if closed else (lambda x, y: x < y)
            naive = a.join(
                b,
                (a.a_k == b.b_k) & op(a.a_s, b.b_e) & op(b.b_s, a.a_e),
            )
            got_pairs = sorted((r.a_id, r.b_id) for r in got.collect())
            naive_pairs = sorted((r.a_id, r.b_id) for r in naive.collect())
            assert got_pairs == naive_pairs, (seed, cell, closed)


def test_sniff_media_magic_and_fields(spark):
    from fluvio_duck_spark.operators.multimodal import (
        sniff_media,
        synthesize_media_headers,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, "abc"), (1, "defg"), (2, "hi"), (99, "plain")],
        "doc_id long, text string",
    )
    wrapped = synthesize_media_headers(docs.filter("doc_id < 3"))
    # an unwrapped payload must fall through to 'bin' with NULL fields
    plain = docs.filter("doc_id = 99").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    out = {r.doc_id: r for r in sniff_media(wrapped.unionByName(plain)).collect()}
    assert out[0].fmt == "png" and out[0].width == 320 and out[0].height == 240
    assert out[1].fmt == "jpeg" and out[1].width is None
    assert out[2].fmt == "wav" and out[2].sample_rate == 8002
    assert out[99].fmt == "bin" and out[99].width is None and out[99].sample_rate is None
    assert out[0].n_bytes == 24 + 3 and out[1].n_bytes == 11 + 4 and out[2].n_bytes == 28 + 2


def test_phash_neardup_finds_near_not_just_exact(spark):
    """The banding plumbing must surface genuinely NEAR media, not only
    byte-identical payloads: with a controlled decode kernel (length-
    driven ramp — near-length payloads → near feature vectors → few bit
    flips), a 1-byte-longer copy lands within Hamming ≤ 3 while an
    unrelated payload does not."""
    import numpy as np
    from pyspark.sql import functions as F

    from fluvio_duck_spark.operators.multimodal import mm_phash_neardup

    def kernel(b: bytes) -> np.ndarray:
        # features: smooth ramp whose slope depends weakly on length —
        # stands in for a real image embed where a small edit moves few
        # adjacent-difference comparisons
        n = len(b)
        base = np.arange(61, dtype=np.float32)
        wob = np.sin(base * (1.0 + n / 1000.0)).astype(np.float32)
        return base + wob

    rows = [
        (1, b"x" * 100),   # anchor
        (2, b"x" * 101),   # near: 1 byte longer
        (3, b"y" * 400),   # far: very different length
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in mm_phash_neardup(
            df, max_hamming=3, decode_fn=kernel
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] <= 3
    assert (1, 3) not in got and (2, 3) not in got


def test_phash_candidates_complete_by_pigeonhole(spark):
    """Any pair within Hamming < n_bands MUST share a band (pigeonhole),
    so banded candidates = brute-force pairs at the verify threshold.
    Checked by comparing against an exhaustive XOR popcount over all
    hashes on a planted-duplicate corpus."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from fluvio_duck_spark.operators.multimodal import (
        attach_binary_content,
        extract_features,
        mm_phash_neardup,
        phash_bits,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.limit(60).unionByName(
        docs.limit(6).withColumn("doc_id", F.col("doc_id") + 500)
    )
    withc = attach_binary_content(corpus)
    hashed = {
        r.doc_id: r.ph
        for r in extract_features(withc, n_features=61)
        .select("doc_id", phash_bits("features").alias("ph"))
        .collect()
    }
    brute = {
        (a, b): bin(hashed[a] ^ hashed[b]).count("1")
        for a, b in combinations(sorted(hashed), 2)
        if bin(hashed[a] ^ hashed[b]).count("1") <= 3
    }
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in mm_phash_neardup(withc, max_hamming=3).collect()
    }
    assert got == brute


def test_extract_features_portable_matches_pure_python(spark, sf_dir):
    """The mapInPandas path reproduces a driver-side recomputation of the
    portable kernel — and the kernel itself matches the documented
    md5-ascii-fold construction (the same family the oracle generates)."""
    import hashlib

    from fluvio_duck_spark.operators.dsir import _HASH_WEIGHTS
    from fluvio_duck_spark.operators.multimodal import (
        attach_binary_content,
        extract_features_portable,
        portable_decode_kernel,
    )
    from fluvio_duck_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d = attach_binary_content(docs)
    got = {
        r.doc_id: list(r.features)
        for r in extract_features_portable(d, n_features=16).collect()
    }
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert set(got) == set(texts)
    for did, text in texts.items():
        b = text.encode()
        expect = []
        for j in range(16):
            h = hashlib.md5(b + f":{j}".encode()).hexdigest()
            expect.append(
                sum(ord(h[i]) * w for i, w in enumerate(_HASH_WEIGHTS))
                % 1_000_000
            )
        assert got[did] == expect == portable_decode_kernel(b, 16)
        assert all(0 <= v < 1_000_000 for v in expect)


def test_audio_energy_segments_hand_example(spark):
    """Hand-checked VAD: payload built from 16-byte frames of known
    energy — loud('x'*16 = 1920) / quiet(' '*16 = 512) — must merge
    exactly the consecutive loud frames, with byte-exact bounds and
    energy sums, and drop the partial tail frame."""
    from fluvio_duck_spark.operators.multimodal import audio_energy_segments

    loud = b"x" * 16     # 120*16 = 1920 >= 1536
    quiet = b" " * 16    # 32*16 = 512 < 1536
    payload = loud + loud + quiet + loud + quiet + quiet + loud + b"zz"
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(quiet * 3)), (3, None)],
        "doc_id long, content binary",
    )
    got = sorted(
        (r.doc_id, r.seg_no, r.start_byte, r.end_byte, r.n_windows, r.energy)
        for r in audio_energy_segments(df).collect()
    )
    assert got == [
        (1, 1, 0, 32, 2, 3840),   # frames 0-1 merged
        (1, 2, 48, 64, 1, 1920),  # frame 3
        (1, 3, 96, 112, 1, 1920),  # frame 6; trailing 'zz' partial dropped
    ]


def test_audio_energy_custom_kernel_seam(spark):
    """energy_fn is the real-decoder seam: a squared-sample kernel flips
    which frames clear the threshold without touching the plumbing."""
    from fluvio_duck_spark.operators.multimodal import audio_energy_segments

    payload = (b"\x00" * 16) + (b"\x0c" * 16)  # byte-sum: 0 and 192, both quiet
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, content binary"
    )
    # byte-sum kernel: nothing voiced
    assert audio_energy_segments(df).count() == 0
    # squared kernel: 16*144 = 2304 >= 1536 — second frame is voiced
    rows = audio_energy_segments(
        df, energy_fn=lambda fr: sum(b * b for b in fr)
    ).collect()
    assert [(r.start_byte, r.end_byte, r.energy) for r in rows] == [(16, 32, 2304)]
