"""Connector round-trip, resilience policies, multimodal plumbing,
streaming incremental export."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import load
from vector_io_spark.sources.connectors import (
    BatchShrinkPolicy,
    RateLimiter,
    RetryPolicy,
    paginated_read,
    partitioned_upsert,
)
from vector_io_spark.sources.embedded import EmbeddedVectorDB
from vector_io_spark.sources.parquet_util import (
    count_rows_dataset,
    get_id_list,
    missing_ids,
)


def test_batch_shrink_policy():
    calls = []

    def flaky_send(batch):
        calls.append(len(batch))
        if len(batch) > 3:
            raise RuntimeError("too big")

    sent = BatchShrinkPolicy(initial=10).run(list(range(20)), flaky_send)
    assert sent == 20
    assert max(c for c in calls if c <= 3 or True) == 10  # first try at 10
    # shrink path: 10 -> 6 -> 4 -> 2 (2/3 factor, int)
    assert 2 in calls or 3 in calls

    with pytest.raises(RuntimeError):
        BatchShrinkPolicy(initial=10, min_fraction=0.5).run(
            list(range(20)), lambda b: (_ for _ in ()).throw(RuntimeError("always"))
        )


def test_retry_policy():
    attempts = []

    def works_third_time():
        attempts.append(1)
        if len(attempts) < 3:
            raise ConnectionError("transient")
        return "ok"

    assert RetryPolicy(max_attempts=5, base_wait=0.01).run(works_third_time) == "ok"
    assert len(attempts) == 3
    with pytest.raises(ConnectionError):
        RetryPolicy(max_attempts=2, base_wait=0.01).run(
            lambda: (_ for _ in ()).throw(ConnectionError("always"))
        )


def test_rate_limiter_throttles():
    import time

    rl = RateLimiter(calls_per_minute=600)  # 10/sec
    t0 = time.monotonic()
    for _ in range(5):
        rl.acquire()
    elapsed = time.monotonic() - t0
    assert elapsed >= 0.3  # ~0.1s per call after the first

def test_connector_roundtrip(spark, sf_dir, tmp_path):
    root = str(tmp_path / "vdb")
    db = EmbeddedVectorDB(root)
    db.create_collection("emb", dimensions=64, metric="Cosine")
    assert db.list_collections() == ["emb"]
    assert db.collection_config("emb")["metric"] == "Cosine"

    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("id"), "embedding", "label"
    )
    n = partitioned_upsert(
        emb,
        lambda: EmbeddedVectorDB(root),
        "emb",
        batch_size=64,
        num_partitions=4,
    )
    assert n == 500
    assert db.count("emb") == 500

    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    df = paginated_read(spark, lambda: EmbeddedVectorDB(root), "emb", schema)
    assert df.count() == 500
    back = {r["id"]: r["label"] for r in df.collect()}
    orig = {r["id"]: r["label"] for r in emb.collect()}
    assert back == orig


def test_connector_upsert_missing_collection(spark, sf_dir, tmp_path):
    root = str(tmp_path / "vdb2")
    EmbeddedVectorDB(root)  # no collection created
    emb = load(spark, sf_dir, "embeddings").limit(10).select(
        F.col("vec_id").cast("string").alias("id"), "label"
    )
    with pytest.raises(Exception):
        partitioned_upsert(
            emb, lambda: EmbeddedVectorDB(root), "nope", batch_size=8
        )


def test_multimodal_features(spark, sf_dir):
    from vector_io_spark.operators.multimodal import (
        attach_media_meta,
        extract_media_features,
        sample_frames,
    )

    docs = load(spark, sf_dir, "documents").limit(40).select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    tagged = attach_media_meta(docs, "blob", media_type="image", fmt="raw")
    assert "blob_meta" in tagged.columns
    feat = extract_media_features(tagged, "blob", decoder="fake")
    rows = feat.select("doc_id", "media_features").collect()
    assert all(len(r["media_features"]) == 8 for r in rows)
    # deterministic: feature[0] == byte length of utf-8 text
    lens = {
        r["doc_id"]: r["media_features"][0]
        for r in rows
    }
    for r in docs.collect():
        assert lens[r["doc_id"]] == float(len(bytes(r["blob"])))

    frames = sample_frames(tagged, "blob", every_n_bytes=64, max_frames=3)
    fr = frames.groupBy("doc_id").count().collect()
    assert all(1 <= r["count"] <= 3 for r in fr)

    # stub decoder marks the real-codec plug point
    with pytest.raises(Exception):
        extract_media_features(tagged, "blob", decoder="stub").collect()


def test_parquet_utils(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    p = str(tmp_path / "ds")
    emb.where(F.col("vec_id") % 7 != 0).write.parquet(p)
    total = count_rows_dataset(spark, p)
    assert total == emb.where(F.col("vec_id") % 7 != 0).count()
    ids = get_id_list(spark, p, "vec_id")
    assert ids.count() == total
    gaps = missing_ids(spark, p, "vec_id")
    # every dropped id inside the range is reported
    expected_gaps = emb.where(
        (F.col("vec_id") % 7 == 0) & (F.col("vec_id") > 0) & (F.col("vec_id") < 499)
    ).count()
    assert gaps.count() == expected_gaps


def test_streaming_incremental_export(spark, sf_dir, tmp_path):
    from vector_io_spark.format.reader import read_vdf
    from vector_io_spark.streaming.incremental import incremental_vdf_export

    landing = str(tmp_path / "landing")
    dataset = str(tmp_path / "vdf_stream")
    emb = load(spark, sf_dir, "embeddings").withColumnRenamed("vec_id", "id")
    emb.where(F.col("id") < 100).write.mode("append").parquet(landing)
    schema = spark.read.parquet(landing).schema

    q = incremental_vdf_export(
        spark, landing, dataset, "emb", schema,
        vector_columns=["embedding"], available_now=True,
    )
    q.awaitTermination(120)
    ds = read_vdf(spark, dataset)
    assert ds.df("emb").count() == 100
    assert ds.meta.indexes["emb"][0].dimensions == 64

    # second batch of files -> incremental append, counts refresh
    emb.where((F.col("id") >= 100) & (F.col("id") < 150)).write.mode(
        "append"
    ).parquet(landing)
    q2 = incremental_vdf_export(
        spark, landing, dataset, "emb", schema,
        vector_columns=["embedding"], available_now=True,
    )
    q2.awaitTermination(120)
    ds2 = read_vdf(spark, dataset)
    assert ds2.df("emb").count() == 150
    assert ds2.meta.indexes["emb"][0].total_vector_count == 150


def test_streaming_windowed_counts_with_watermark(spark, sf_dir, tmp_path):
    """Event-time windowed aggregation with watermark over a file stream,
    cross-checked against the identical batch computation."""
    from vector_io_spark.streaming.incremental import windowed_event_counts

    ev = load(spark, sf_dir, "events")
    landing = str(tmp_path / "ev_landing")
    ev.write.parquet(landing)
    batch_result = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_event_counts(spark.read.parquet(landing)).collect()
    }
    assert len(batch_result) > 0

    stream = spark.readStream.schema(spark.read.parquet(landing).schema).parquet(landing)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_result = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert stream_result == batch_result


def test_csv_id_list_semi_join(spark, sf_dir, tmp_path):
    """CSV id-list source (header-less single column, get_id_list.py:37
    format) feeding the semi-join subset filter (pinecone_import.py:189-196)."""
    from vector_io_spark.operators.joins import semi_join_id_list

    emb = load(spark, sf_dir, "embeddings")
    wanted = emb.where(F.col("vec_id") % 9 == 0).select("vec_id")
    csv_path = str(tmp_path / "ids.csv")
    wanted.coalesce(1).write.csv(csv_path)
    ids = spark.read.csv(csv_path).select(
        F.col("_c0").cast("long").alias("vec_id")
    )
    sub = semi_join_id_list(emb, ids, id_col="vec_id")
    assert sub.count() == wanted.count()
    assert sub.where(F.col("vec_id") % 9 != 0).count() == 0


def test_flaky_connector_retry_recovers(spark, sf_dir, tmp_path):
    """Transient upsert failures are absorbed by the retry policy — the
    write completes and counts match (the reference's shrink/retry loops,
    exercised for real through foreachPartition)."""
    from vector_io_spark.sources.connectors import RetryPolicy
    from vector_io_spark.sources.embedded import FlakyEmbeddedVectorDB

    root = str(tmp_path / "flaky")
    db = FlakyEmbeddedVectorDB(root, fail_first=2)
    db.create_collection("emb", dimensions=64, metric="Cosine")
    emb = load(spark, sf_dir, "embeddings").limit(100).select(
        F.col("vec_id").cast("string").alias("id"), "label"
    )
    n = partitioned_upsert(
        emb,
        lambda: FlakyEmbeddedVectorDB(root, fail_first=2),
        "emb",
        batch_size=32,
        num_partitions=2,
        retry=RetryPolicy(max_attempts=4, base_wait=0.01),
    )
    assert n == 100
    assert db.count("emb") == 100


def test_resize_media_fake_kernel(spark, sf_dir):
    import pytest as _pytest

    from vector_io_spark.operators.multimodal import attach_media_meta, resize_media

    docs = load(spark, sf_dir, "documents").limit(20).select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    with_meta = attach_media_meta(docs, "blob", "image", "png")
    resized = resize_media(with_meta, "blob", target_width=8, target_height=8)
    rows = resized.select("doc_id", "blob", "blob_resized", "blob_meta").collect()
    for r in rows:
        assert len(r["blob_resized"]) <= 64
        if len(r["blob"]) <= 64:
            assert bytes(r["blob_resized"]) == bytes(r["blob"])
        assert r["blob_meta"]["width"] == 8 and r["blob_meta"]["height"] == 8
    # deterministic: same input -> same output
    again = resize_media(with_meta, "blob", target_width=8, target_height=8)
    a = {r["doc_id"]: bytes(r["blob_resized"]) for r in rows}
    b = {r["doc_id"]: bytes(r["blob_resized"]) for r in again.collect()}
    assert a == b

    with _pytest.raises(Exception, match="NotImplementedError|real resize"):
        resize_media(with_meta, "blob", decoder="stub").collect()


def test_pil_decoder_gate_raises_without_pillow(spark, sf_dir):
    """decoder='pil' must fail fast on the driver with an actionable
    ImportError when pillow is absent (this container), never a
    per-task executor failure."""
    import importlib.util

    import pytest

    from vector_io_spark.operators.multimodal import extract_media_features

    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("pillow installed — covered by test_pil_real_decode")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    with pytest.raises(ImportError, match="pillow"):
        extract_media_features(docs, "blob", decoder="pil")


def test_pil_real_decode_features_and_resize(spark):
    """Real-codec path: decode a generated PNG, extract true
    width/height/channel features, bilinear-resize, and verify the
    output re-decodes at the target size. Skips where pillow is not
    installed; everything upstream of the kernel is identical to the
    fake-kernel path already tested."""
    import pytest

    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    from vector_io_spark.operators.multimodal import (
        extract_media_features,
        resize_media,
    )

    def png(w, h, color):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, png(32, 16, (255, 0, 0))), (2, png(8, 8, (0, 128, 0)))],
        "id long, blob binary",
    )
    feats = {
        r["id"]: r["f"]
        for r in extract_media_features(df, "blob", out_col="f", decoder="pil")
        .select("id", "f")
        .collect()
    }
    assert feats[1][:3] == [32.0, 16.0, 3.0]  # width, height, channels
    assert feats[1][3] == 255.0 and feats[1][4] == 0.0  # R mean, G mean
    assert feats[2][:3] == [8.0, 8.0, 3.0]

    out = resize_media(df, "blob", target_width=4, target_height=4, decoder="pil")
    for r in out.select("blob_resized").collect():
        img = Image.open(io.BytesIO(bytes(r["blob_resized"])))
        assert img.size == (4, 4)


def test_media_perceptual_hash_fake_kernel_dedup_and_locality(spark):
    """aHash plumbing on the fake byte kernel: identical payloads hash
    identically (exact dedup by groupBy(phash)), a small byte edit stays
    within a small Hamming radius, and unrelated payloads are far."""
    from vector_io_spark.operators.multimodal import media_perceptual_hash

    base = bytes(range(256)) * 8
    tweaked = bytearray(base)
    tweaked[100] = 255  # single-byte edit
    other = bytes(reversed(base))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, bytes(tweaked)), (4, other), (5, None)],
        "id long, blob binary",
    )
    got = {r["id"]: r["phash"] for r in media_perceptual_hash(df, "blob").collect()}
    assert got[1] == got[2]            # exact dup -> identical hash
    assert got[5] is None              # null payload passthrough
    d_small = bin(got[1] ^ got[3]).count("1")
    d_far = bin(got[1] ^ got[4]).count("1")
    assert d_small <= 4, d_small       # single-byte edit flips few bits
    assert d_far > d_small, (d_far, d_small)


def test_media_perceptual_hash_pil_kernel_resize_invariance(spark):
    """Real aHash: the same image re-encoded at a different size hashes
    within a small Hamming radius (the property that makes aHash a
    near-dup key); a structurally different image lands far away. Skips
    without pillow."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from vector_io_spark.operators.multimodal import media_perceptual_hash

    def gradient_png(w, h, flip=False):
        img = Image.new("L", (w, h))
        img.putdata(
            [
                (255 - (255 * x) // w if flip else (255 * x) // w)
                for y in range(h)
                for x in range(w)
            ]
        )
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [
            (1, gradient_png(64, 64)),
            (2, gradient_png(128, 128)),   # same content, 2x size
            (3, gradient_png(64, 64, flip=True)),  # mirrored gradient
        ],
        "id long, blob binary",
    )
    got = {
        r["id"]: r["phash"]
        for r in media_perceptual_hash(df, "blob", decoder="pil").collect()
    }
    d_same = bin(got[1] ^ got[2]).count("1")
    d_diff = bin(got[1] ^ got[3]).count("1")
    assert d_same <= 6, d_same
    assert d_diff >= 20, d_diff


# --------------------------------------------------------------- WAV kernel

def _make_wav(
    samples, rate=8000, channels=1, bits=16, audio_fmt=1, extra_chunk=False
):
    """Deterministic WAV writer for the test corpus — pure struct, the
    same public RIFF layout the kernel parses. ``samples`` is a list of
    floats in [-1, 1] (already interleaved when channels > 1)."""
    import struct

    if audio_fmt == 3:  # IEEE float32
        payload = b"".join(struct.pack("<f", s) for s in samples)
    elif bits == 16:
        payload = b"".join(
            struct.pack("<h", max(-32768, min(32767, round(s * 32767))))
            for s in samples
        )
    elif bits == 8:
        payload = bytes(
            max(0, min(255, round(s * 127) + 128)) for s in samples
        )
    elif bits == 24:
        out = bytearray()
        for s in samples:
            v = max(-(1 << 23), min((1 << 23) - 1, round(s * ((1 << 23) - 1))))
            out += (v & 0xFFFFFF).to_bytes(3, "little")
        payload = bytes(out)
    elif bits == 32:
        payload = b"".join(
            struct.pack(
                "<i",
                max(-(1 << 31), min((1 << 31) - 1, round(s * ((1 << 31) - 1)))),
            )
            for s in samples
        )
    else:
        raise ValueError(bits)
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", audio_fmt, channels, rate, rate * block, block, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # LIST chunk the parser must skip (odd size -> pad)
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _sine(n, freq, rate, amp=0.5):
    import math

    return [amp * math.sin(2 * math.pi * freq * i / rate) for i in range(n)]


def test_wav_parse_all_sample_widths():
    import numpy as np

    from vector_io_spark.operators.multimodal import _parse_wav

    sig = _sine(800, 440, 8000)
    for bits, fmt in [(8, 1), (16, 1), (24, 1), (32, 1), (32, 3)]:
        x, rate, ch, b = _parse_wav(
            _make_wav(sig, bits=bits if fmt == 1 else 32, audio_fmt=fmt)
        )
        assert (rate, ch) == (8000, 1)
        assert len(x) == 800
        # reconstruction matches the source signal within quantization
        tol = {8: 2e-2, 16: 1e-3, 24: 1e-5, 32: 1e-6}[bits]
        assert float(np.max(np.abs(np.array(x) - np.array(sig)))) < tol


def test_wav_parse_stereo_downmix_and_chunk_walk():
    import numpy as np

    from vector_io_spark.operators.multimodal import _parse_wav

    left = _sine(400, 440, 8000, amp=0.8)
    right = [0.0] * 400
    interleaved = [v for pair in zip(left, right) for v in pair]
    x, rate, ch, _ = _parse_wav(
        _make_wav(interleaved, channels=2, extra_chunk=True)
    )
    assert ch == 2 and len(x) == 400
    # downmix = mean(L, R) = L/2
    assert float(np.max(np.abs(x - np.array(left) / 2))) < 1e-3


def test_wav_parse_rejects_non_wav_and_truncated():
    from vector_io_spark.operators.multimodal import _parse_wav

    assert _parse_wav(None) is None
    assert _parse_wav(b"\x89PNG" + b"\x00" * 100) is None
    assert _parse_wav(_make_wav(_sine(100, 440, 8000))[:30]) is None
    # compressed format code (2 = ADPCM) stays stubbed -> None
    import struct

    blob = bytearray(_make_wav(_sine(100, 440, 8000)))
    struct.pack_into("<H", blob, 20, 2)
    assert _parse_wav(bytes(blob)) is None


def test_wav_features_amplitude_stats():
    import math

    from vector_io_spark.operators.multimodal import _wav_features

    rate, n, amp, freq = 8000, 8000, 0.5, 440
    blob = _make_wav(_sine(n, freq, rate, amp=amp), rate=rate)
    f = _wav_features(blob)
    n_samples, srate, ch, dur_ms, rms, peak, zcr, blen = f
    assert (n_samples, srate, ch) == (n, rate, 1)
    assert dur_ms == 1000.0
    assert abs(rms - amp / math.sqrt(2)) < 1e-3   # sine RMS = A/sqrt(2)
    assert abs(peak - amp) < 1e-3
    # sine crosses zero 2*freq times per second
    assert abs(zcr - 2 * freq / rate) < 2e-3
    assert blen == len(blob)
    assert _wav_features(b"junk") is None


def test_wav_ahash_gain_invariant_and_discriminative():
    from vector_io_spark.operators.multimodal import _wav_ahash

    rate = 8000
    # amplitude-modulated tone -> non-trivial energy contour
    sig = [
        (0.2 + 0.6 * ((i // 500) % 2)) * s
        for i, s in enumerate(_sine(8000, 440, rate, amp=1.0))
    ]
    h1 = _wav_ahash(_make_wav(sig, rate=rate))
    h_gain = _wav_ahash(_make_wav([0.5 * s for s in sig], rate=rate))
    assert h1 == h_gain  # uniform gain never flips a contour comparison
    other = _wav_ahash(
        _make_wav(
            [
                (0.8 - 0.6 * ((i // 500) % 2)) * s
                for i, s in enumerate(_sine(8000, 440, rate, amp=1.0))
            ],
            rate=rate,
        )
    )
    assert h1 != other  # inverted contour -> different fingerprint
    assert _wav_ahash(b"not audio") is None
    assert 0 <= h1 < 1 << 63


def test_wav_decoder_end_to_end_spark(spark):
    """Spark-side plumbing for the real audio kernel: features + phash
    via mapInPandas, NULL rows for undecodable blobs, and gain-dup
    detection by groupBy(phash) — the dedup composition the kernel
    exists for."""
    from pyspark.sql import functions as F

    from vector_io_spark.operators.multimodal import (
        extract_media_features,
        media_perceptual_hash,
    )

    rate = 8000
    sig = [
        (0.2 + 0.6 * ((i // 500) % 2)) * s
        for i, s in enumerate(_sine(4000, 440, rate, amp=1.0))
    ]
    rows = [
        (1, _make_wav(sig, rate=rate)),
        (2, _make_wav([0.5 * s for s in sig], rate=rate)),  # gain dup of 1
        (3, _make_wav(_sine(2000, 100, rate), rate=rate)),
        (4, b"definitely not a wav file"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")

    feats = {
        r["id"]: r["f"]
        for r in extract_media_features(
            df, "blob", out_col="f", decoder="wav"
        ).collect()
    }
    assert feats[4] is None and feats[5] is None
    assert feats[1][0] == 4000.0 and feats[1][1] == float(rate)
    assert feats[3][3] == 250.0  # 2000 samples @ 8 kHz = 250 ms

    hashes = {
        r["id"]: r["phash"]
        for r in media_perceptual_hash(df, "blob", decoder="wav").collect()
    }
    assert hashes[1] == hashes[2] != hashes[3]
    assert hashes[4] is None and hashes[5] is None
    dup_groups = (
        media_perceptual_hash(df, "blob", decoder="wav")
        .where(F.col("phash").isNotNull())
        .groupBy("phash")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert dup_groups == 1
