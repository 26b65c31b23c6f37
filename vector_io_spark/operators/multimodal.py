"""Multimodal (image/audio/video) column plumbing.

The reference DROPS image columns with a warning (cleanup_df,
util.py:363-367) — the one place we deliberately do better: media travels
as opaque ``binary`` columns with a typed metadata struct, and
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.

The decode kernel is pluggable: ``decoder='fake'`` produces deterministic
features from the raw bytes (length, byte-histogram moments) so the
Spark-side plumbing — schema, batch shape, partitioning — is real and
tested end-to-end; ``decoder='pil'`` is a real image kernel (import-gated
pillow); ``decoder='wav'`` is a real audio kernel (pure struct/numpy
RIFF/WAVE parse — PCM 8/16/24/32-bit + float32, amplitude stats,
energy-contour fingerprint; r12). ``decoder='stub'`` raises a
clearly-marked NotImplementedError for the one remaining gap — video /
compressed audio, whose codecs (ffmpeg/torchaudio) are not in this
container. Swapping in a real codec changes only the kernel function,
not the plan.

Scale notes: media bytes are the widest column by far — every operator
here projects metadata/features WITHOUT carrying bytes through shuffles
(features first, then join back by id if needed). Batch memory is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch``; set it low (e.g. 64)
for video-sized blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 8


def attach_media_meta(
    df: DataFrame, binary_col: str, media_type: str, fmt: str | None = None
) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct (the schema
    contract every downstream multimodal op relies on)."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).cast("string").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def _fake_features(data: bytes | None) -> list[float] | None:
    """Deterministic stand-in for a decoder+encoder: 8 features from raw
    bytes (length, first/last bytes, simple byte-histogram moments)."""
    if data is None:
        return None
    n = len(data)
    if n == 0:
        return [0.0] * FEATURE_DIM
    total = sum(data)
    mean = total / n
    var = sum((b - mean) ** 2 for b in data) / n
    return [
        float(n),
        float(data[0]),
        float(data[-1]),
        float(total % 256),
        round(mean, 4),
        round(var, 4),
        float(max(data)),
        float(min(data)),
    ]


def _parse_wav(data: bytes | None):
    """Pure struct/numpy RIFF/WAVE parser (public container format —
    no codec library needed): returns (mono float64 samples in [-1, 1],
    sample_rate, channels, bits) or None when the blob is not a WAV this
    kernel can decode. Handles PCM int 8/16/24/32 and IEEE float32,
    any channel count (downmixed by mean), word-aligned chunk walking
    (LIST/fact/cue chunks skipped). Malformed blobs return None rather
    than raising — at 100 TB a poison row must become a NULL feature,
    not a dead stage."""
    if data is None or len(data) < 44:
        return None
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    import struct

    import numpy as np

    fmt = raw = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or raw is None or len(fmt) < 16:
        return None
    audio_fmt, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    (bits,) = struct.unpack_from("<H", fmt, 14)
    if channels == 0 or rate == 0:
        return None
    if audio_fmt == 1 and bits == 16:
        arr = np.frombuffer(raw[: len(raw) // 2 * 2], "<i2")
        x = arr.astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(raw, "u1").astype(np.float64) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 32:
        arr = np.frombuffer(raw[: len(raw) // 4 * 4], "<i4")
        x = arr.astype(np.float64) / 2147483648.0
    elif audio_fmt == 1 and bits == 24:
        b = np.frombuffer(raw[: len(raw) // 3 * 3], "u1").reshape(-1, 3)
        vals = (
            b[:, 0].astype(np.int64)
            | (b[:, 1].astype(np.int64) << 8)
            | (b[:, 2].astype(np.int64) << 16)
        )
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        x = vals.astype(np.float64) / float(1 << 23)
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(raw[: len(raw) // 4 * 4], "<f4").astype(np.float64)
    else:
        return None  # compressed (mp3-in-wav, a-law, ...) stays stubbed
    if channels > 1:
        x = x[: len(x) // channels * channels].reshape(-1, channels)
        x = x.mean(axis=1)
    return x, int(rate), int(channels), int(bits)


def _wav_features(data: bytes | None) -> list[float] | None:
    """Real audio kernel (r12, VERDICT r11 Next #5): WAV header parse +
    amplitude stats. 8 features = sample count, sample rate, channels,
    duration_ms, RMS, peak |amplitude|, zero-crossing rate, byte length
    — enough to drive silence/clipping quality filters and duration
    bucketing on real audio corpora. All numpy over one decoded buffer;
    no Python per-sample loop."""
    parsed = _parse_wav(data)
    if parsed is None:
        return None
    import numpy as np

    x, rate, channels, _bits = parsed
    n = len(x)
    if n == 0:
        return [0.0, float(rate), float(channels), 0.0, 0.0, 0.0, 0.0,
                float(len(data))]
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return [
        float(n),
        float(rate),
        float(channels),
        round(n * 1000.0 / rate, 3),
        round(rms, 6),
        round(peak, 6),
        round(zcr, 6),
        float(len(data)),
    ]


def _wav_ahash(data: bytes | None) -> int | None:
    """Spectral-free audio fingerprint: split the mono signal into 64
    equal windows, take RMS energy per window, set bit i when
    energy[i+1] > energy[i] (the energy-contour sign pattern). Invariant
    to uniform gain (comparisons are scale-free) and robust to small
    edits — near-dup clips sit within a small Hamming radius, composing
    with the same xor+popcount machinery as the image aHash."""
    parsed = _parse_wav(data)
    if parsed is None:
        return None
    import numpy as np

    x, _rate, _channels, _bits = parsed
    if len(x) == 0:
        return 0
    idx = np.linspace(0, len(x), 65, dtype=np.int64)
    e = np.array([
        float(np.sqrt(np.mean(x[idx[i]: idx[i + 1]] ** 2)))
        if idx[i + 1] > idx[i] else 0.0
        for i in range(64)
    ])
    h = 0
    for i in range(63):
        if e[i + 1] > e[i]:
            h |= 1 << i
    return h & 0x7FFFFFFFFFFFFFFF


def _import_pil():
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as e:
        raise ImportError(
            "decoder='pil' requires pillow (pip install pillow); it is not "
            "installed in this environment — use decoder='fake' for the "
            "deterministic byte-level kernel"
        ) from e
    return Image


def _pil_features(image_mod, data: bytes | None) -> list[float] | None:
    """Real image kernel: decode with PIL, 8 features = width, height,
    channel count, per-channel means (first 3), global pixel std, and
    byte length — enough to drive dedup/quality filters on real images.

    Stats come from ``img.histogram()`` (256 ints per band, constant
    memory) — NEVER from materializing pixels as Python objects, which
    for a 12 MP photo would build tens of millions of boxed floats per
    row inside the Arrow batch."""
    if data is None:
        return None
    import io
    import math

    img = image_mod.open(io.BytesIO(data))
    img.load()
    bands = img.getbands()
    hist = img.histogram()  # 256 bins per band, concatenated
    means = [0.0, 0.0, 0.0]
    tot_n = tot_s = tot_sq = 0
    for i in range(min(len(bands), 3)):
        bins = hist[i * 256 : (i + 1) * 256]
        n = sum(bins)
        s = sum(v * c for v, c in enumerate(bins))
        sq = sum(v * v * c for v, c in enumerate(bins))
        means[i] = s / max(n, 1)
        tot_n += n
        tot_s += s
        tot_sq += sq
    std = (
        math.sqrt(max(tot_sq / tot_n - (tot_s / tot_n) ** 2, 0.0))
        if tot_n
        else 0.0
    )
    return [
        float(img.width),
        float(img.height),
        float(len(bands)),
        round(means[0], 4),
        round(means[1], 4),
        round(means[2], 4),
        round(std, 4),
        float(len(data)),
    ]


def extract_media_features(
    df: DataFrame,
    binary_col: str,
    out_col: str = "media_features",
    decoder: str = "fake",
) -> DataFrame:
    """Decode + feature-extract as one ``mapInPandas`` stage.

    decoder='fake'  -> deterministic byte-level features (testable now)
    decoder='pil'   -> real image decode via pillow (import-gated; the
                       executor imports PIL lazily inside the kernel so
                       the driver needs no codec)
    decoder='wav'   -> real audio decode: pure struct/numpy RIFF/WAVE
                       parser (no codec library), amplitude stats —
                       un-parseable blobs yield NULL features
    decoder='stub'  -> NotImplementedError placeholder for the remaining
                       codecs (video / compressed audio via ffmpeg),
                       marking exactly where those kernels plug in
    """
    if decoder == "pil":
        _import_pil()  # fail fast on the driver, not per-task

    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField(out_col, T.ArrayType(T.FloatType()), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = _import_pil() if decoder == "pil" else None
        for pdf in batches:
            if decoder == "stub":
                raise NotImplementedError(
                    "real video / compressed-audio decode requires "
                    "ffmpeg/torchaudio — not available in this "
                    "environment; use decoder='fake', 'pil', or 'wav'"
                )
            out = pdf.copy()
            if decoder == "pil":
                out[out_col] = [
                    _pil_features(image_mod, bytes(b) if b is not None else None)
                    for b in pdf[binary_col]
                ]
            elif decoder == "wav":
                out[out_col] = [
                    _wav_features(bytes(b) if b is not None else None)
                    for b in pdf[binary_col]
                ]
            else:
                out[out_col] = [
                    _fake_features(bytes(b) if b is not None else None)
                    for b in pdf[binary_col]
                ]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    out_col: str = "frames",
) -> DataFrame:
    """Frame-sampling plumbing: emit up to ``max_frames`` byte-slices per
    blob (with a real decoder these would be decoded video frames; the
    slicing stands in for keyframe extraction). Output is one row per
    frame with the source row's other columns carried through INSIDE the
    one Arrow pass — no join at all, so (a) nothing shuffles (the
    original frames⋈metadata self-join both shuffled AND keyed on
    monotonically_increasing_id, whose value is not stable across the
    two scans of a shuffled upstream plan — silent frame/metadata
    mispairing), and (b) the heavy bytes still never cross a stage
    boundary: rows with NULL blobs are dropped, matching the inner-join
    semantics of the original shape."""
    other = [f for f in df.schema.fields if f.name != binary_col]
    other_names = [f.name for f in other]
    out_schema = T.StructType(
        list(other)
        + [
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField(out_col, T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            counts: list[int] = []
            idxs: list[int] = []
            slices: list[bytes] = []
            for blob in pdf[binary_col]:
                if blob is None:
                    counts.append(0)
                    continue
                b = bytes(blob)
                k_n = min(max_frames, max(1, len(b) // every_n_bytes))
                counts.append(k_n)
                for k in range(k_n):
                    idxs.append(k)
                    slices.append(
                        b[k * every_n_bytes : (k + 1) * every_n_bytes]
                    )
            out = (
                pdf[other_names]
                .iloc[np.repeat(np.arange(len(pdf)), counts)]
                .reset_index(drop=True)
            )
            out["frame_idx"] = pd.Series(idxs, dtype="int32")
            out[out_col] = slices
            yield out

    return df.mapInPandas(run, schema=out_schema)


def resize_media(
    df: DataFrame,
    binary_col: str,
    target_width: int = 64,
    target_height: int = 64,
    out_col: str | None = None,
    decoder: str = "fake",
) -> DataFrame:
    """Resize plumbing (image thumbnailing / audio downsampling): the
    fake kernel deterministically subsamples the byte stream to
    ``target_width*target_height`` bytes (stride sampling — stands in
    for bilinear resize); ``decoder='pil'`` does a REAL bilinear
    ``Image.resize`` and re-encodes to PNG (import-gated pillow, lazy
    executor-side import); ``decoder='stub'`` marks where the remaining
    codecs plug in. The metadata struct is updated so downstream ops see
    the new dimensions. Same no-bytes-through-shuffle rule: resize
    BEFORE any join/groupBy so shuffles carry thumbnails, not
    originals."""
    out_col = out_col or f"{binary_col}_resized"
    target = target_width * target_height
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.BinaryType(), True)]
    )
    if decoder == "pil":
        _import_pil()  # fail fast on the driver, not per-task

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = _import_pil() if decoder == "pil" else None
        for pdf in batches:
            if decoder == "stub":
                raise NotImplementedError(
                    "real resize requires PIL/ffmpeg — not available in "
                    "this environment; use decoder='fake'"
                )
            out = pdf.copy()
            resized = []
            for blob in pdf[binary_col]:
                if blob is None:
                    resized.append(None)
                    continue
                b = bytes(blob)
                if decoder == "pil":
                    import io

                    img = image_mod.open(io.BytesIO(b))
                    small = img.resize(
                        (target_width, target_height),
                        image_mod.Resampling.BILINEAR,
                    )
                    buf = io.BytesIO()
                    small.save(buf, format="PNG")
                    resized.append(buf.getvalue())
                elif len(b) <= target:
                    resized.append(b)
                else:
                    stride = len(b) / target
                    resized.append(bytes(b[int(i * stride)] for i in range(target)))
            out[out_col] = resized
            yield out

    meta_col = f"{binary_col}_meta"
    resized_df = df.mapInPandas(run, schema=out_schema)
    if meta_col in df.columns:
        resized_df = resized_df.withColumn(
            meta_col,
            F.col(meta_col).withField("width", F.lit(target_width)).withField(
                "height", F.lit(target_height)
            ),
        )
    return resized_df


def _fake_ahash(data: bytes | None) -> int | None:
    """Byte-level stand-in for the perceptual average-hash: 64 evenly
    spaced byte samples thresholded against their mean -> 64-bit
    fingerprint. Deterministic, locality-preserving on byte edits (a
    small payload change flips few sampled bits) — exercises the exact
    plumbing the real kernel uses."""
    if data is None:
        return None
    n = len(data)
    if n == 0:
        return 0
    samples = [data[(i * n) // 64] for i in range(64)]
    mean = sum(samples) / 64.0
    h = 0
    for i, s in enumerate(samples):
        if s >= mean:
            h |= 1 << i
    # keep the top bit clear so the value fits signed int64 everywhere
    return h & 0x7FFFFFFFFFFFFFFF


def _pil_ahash(image_mod, data: bytes | None) -> int | None:
    """Real average-hash: decode, resize to 8x8 grayscale (bilinear),
    threshold each pixel against the mean -> 64-bit fingerprint. The
    classic aHash; robust to recompression/resizing, so near-dup images
    sit within a small Hamming radius."""
    if data is None:
        return None
    import io

    img = image_mod.open(io.BytesIO(data)).convert("L").resize(
        (8, 8), image_mod.BILINEAR
    )
    px = list(img.getdata())
    mean = sum(px) / 64.0
    h = 0
    for i, p in enumerate(px):
        if p >= mean:
            h |= 1 << i
    return h & 0x7FFFFFFFFFFFFFFF


def media_perceptual_hash(
    df: DataFrame,
    binary_col: str,
    out_col: str = "phash",
    decoder: str = "fake",
) -> DataFrame:
    """Perceptual average-hash per media row (64-bit LongType column).

    Near-dup media detection then composes with the EXISTING binary
    machinery: exact dedup = groupBy(phash); near-dup = Hamming distance
    over the hash (same xor+popcount scan as ann_topk_hamming_packed),
    banding by hash prefix for the LSH-style candidate cut. Same
    decoder gate as :func:`extract_media_features` ('fake' byte kernel /
    'pil' real image decode, import-gated / 'wav' real audio decode:
    gain-invariant energy-contour fingerprint, no library needed). Zero
    shuffle: one mapInPandas projection; the 8-byte hash is what any
    downstream join moves, never the media payload."""
    if decoder == "pil":
        _import_pil()

    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.LongType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = _import_pil() if decoder == "pil" else None
        for pdf in batches:
            out = pdf.copy()
            if decoder == "pil":
                out[out_col] = [
                    _pil_ahash(image_mod, bytes(b) if b is not None else None)
                    for b in pdf[binary_col]
                ]
            elif decoder == "wav":
                out[out_col] = [
                    _wav_ahash(bytes(b) if b is not None else None)
                    for b in pdf[binary_col]
                ]
            else:
                out[out_col] = [
                    _fake_ahash(bytes(b) if b is not None else None)
                    for b in pdf[binary_col]
                ]
            yield out

    return df.mapInPandas(run, schema=out_schema)
