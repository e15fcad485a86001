"""binaryFile blob ingestion: the files->columns bridge (round 5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ddspark.io import read_blob_files
from ddspark.pipeline.multimodal import audio_stats, decode_stats, encode_png, encode_wav


@pytest.fixture()
def blob_dir(tmp_path):
    rng = np.random.default_rng(7)
    imgs = {i: rng.integers(0, 256, (9, 7, 3), dtype=np.uint8) for i in range(3)}
    for i, a in imgs.items():
        (tmp_path / f"{i}.png").write_bytes(encode_png(a))
    (tmp_path / "999.png").write_bytes(b"\x89PNG" + bytes(200_000))  # oversized
    (tmp_path / "readme.txt").write_text("not a blob")  # glob-pruned
    return tmp_path, imgs


def test_read_blob_files_pushdown_and_ids(spark, blob_dir):
    d, imgs = blob_dir
    blobs = read_blob_files(
        spark, str(d), glob="*.png", max_bytes=150_000, with_meta=True
    )
    plan = blobs._jdf.queryExecution().executedPlan().toString()
    # the length guard reaches the binaryFile scan, so oversized blobs are
    # pruned without reading a byte
    assert "LessThanOrEqual(length" in plan
    rows = blobs.orderBy("doc_id").collect()
    assert [r.doc_id for r in rows] == [0, 1, 2]
    assert all(r.length > 0 and r.path.endswith(".png") for r in rows)


def test_blob_file_bridge_feeds_decode_stats(spark, blob_dir):
    """Files read via binaryFile produce bit-identical stats to the
    blob-column path — the whole decode pipeline works on file corpora."""
    d, imgs = blob_dir
    blobs = read_blob_files(spark, str(d), glob="[0-9].png")
    stats = {r.doc_id: r for r in decode_stats(blobs).collect()}
    assert set(stats) == {0, 1, 2}
    for i, a in imgs.items():
        s = stats[i]
        assert (s.width, s.height) == (7, 9)
        assert s.sum_r == int(a[:, :, 0].astype(np.int64).sum())
        assert s.sum_b == int(a[:, :, 2].astype(np.int64).sum())


def test_blob_file_bridge_feeds_audio_stats(spark, tmp_path):
    sr = 8000
    samples = (np.arange(100) * 37 % 65536 - 32768).astype(np.int16)
    (tmp_path / "5.wav").write_bytes(encode_wav(samples, sr))
    wavs = read_blob_files(spark, str(tmp_path), glob="*.wav", blob_col="wav")
    r = audio_stats(wavs, "doc_id", "wav").collect()[0]
    assert (r.doc_id, r.n_samples, r.sample_rate) == (5, 100, sr)
    assert r.sum_abs == int(np.abs(samples.astype(np.int64)).sum())


def test_read_blob_files_metadata_only_prunes_content(spark, blob_dir):
    """Selecting only metadata prunes the content column from the scan —
    a pure file inventory reads no blob bytes."""
    d, _ = blob_dir
    meta = read_blob_files(spark, str(d), with_meta=True).select(
        "path", "length"
    )
    plan = meta._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan binaryFile" in l)
    assert "content" not in scan
    assert meta.count() == 5


def test_read_blob_files_non_numeric_stem_is_null(spark, tmp_path):
    (tmp_path / "notanid.png").write_bytes(b"x")
    out = read_blob_files(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].doc_id is None
