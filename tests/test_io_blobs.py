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


# ---------------------------------------------------------------------------
# Audio feature extraction (round 5)
# ---------------------------------------------------------------------------


def test_audio_features_closed_form(spark):
    """Square wave: crossings and silence framing have closed forms."""
    from ddspark.pipeline.multimodal import audio_features

    # 400 samples: 100 silent, then a +-1000 square wave flipping every 10
    x = np.zeros(400, dtype=np.int16)
    wave = np.where((np.arange(300) // 10) % 2 == 0, 1000, -1000)
    x[100:] = wave
    from ddspark.pipeline.multimodal import encode_wav

    df = spark.createDataFrame([(1, bytearray(encode_wav(x, 8000)))],
                               "doc_id long, wav binary")
    r = audio_features(df, frame=100, silence_thresh=500).collect()[0]
    assert r.n_samples == 400
    # flips: 30 blocks of 10 -> 29 sign changes; the 0->1000 edge is not a
    # crossing (0 counts as non-negative)
    assert r.zero_crossings == 29
    assert r.n_frames == 4
    assert r.silence_frames == 1  # only the first frame is silent
    assert abs(r.silence_frac - 0.25) < 1e-12
    assert abs(r.rms - np.sqrt((wave.astype(np.int64) ** 2).sum() / 400)) < 1e-9


def test_downmix_mono_integer_mean(spark):
    from ddspark.pipeline.multimodal import decode_audio, downmix_mono, encode_wav
    import struct

    # stereo WAV: L = i*100, R = -i*50  -> floor mean
    n = 50
    inter = np.empty(2 * n, dtype=np.int16)
    inter[0::2] = (np.arange(n) * 100) % 30000
    inter[1::2] = -((np.arange(n) * 50) % 30000)
    stereo = inter.reshape(n, 2)
    # encode_wav writes mono; build a stereo RIFF by hand
    data = inter.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 8000 * 4, 4, 16)
    blob = hdr + fmt + b"data" + struct.pack("<I", len(data)) + data
    df = spark.createDataFrame([(3, bytearray(blob))], "doc_id long, wav binary")
    out = downmix_mono(df).collect()[0]
    mono, rate = decode_audio(bytes(out.wav))
    assert rate == 8000 and mono.shape == (n, 1)
    want = stereo.astype(np.int64).sum(axis=1) // 2
    assert (mono[:, 0].astype(np.int64) == want).all()


def test_resample_audio_linear_interp(spark):
    from ddspark.pipeline.multimodal import decode_audio, encode_wav, resample_audio

    x = ((np.arange(200) * 37) % 2000 - 1000).astype(np.int16)
    df = spark.createDataFrame([(7, bytearray(encode_wav(x, 8000)))],
                               "doc_id long, wav binary")
    # identity resample: bit-equal samples
    same, rate = decode_audio(
        bytes(resample_audio(df, 8000).collect()[0].wav)
    )
    assert rate == 8000 and (same[:, 0] == x).all()
    # 2x upsample: numpy.interp replay
    up, rate2 = decode_audio(bytes(resample_audio(df, 16000).collect()[0].wav))
    assert rate2 == 16000 and up.shape[0] == 400
    pos = np.arange(400) * 0.5
    want = np.interp(pos, np.arange(200), x.astype(np.float64))
    want = np.where(want >= 0, np.floor(want + 0.5), np.ceil(want - 0.5))
    assert (up[:, 0].astype(np.float64) == want).all()


# ---------------------------------------------------------------------------
# Embedding int8 quantization (round 5)
# ---------------------------------------------------------------------------


def test_quantize_roundtrip_error_bound(spark):
    from ddspark.pipeline.ann import dequantize_embeddings, quantize_embeddings

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = quantize_embeddings(emb)
    rows = q.collect()
    assert all(-127 <= min(r.qvec) and max(r.qvec) <= 127 for r in rows)
    back = {r.vec_id: r.vec for r in dequantize_embeddings(q).collect()}
    orig = {r.vec_id: r.embedding for r in emb.collect()}
    scales = {r.vec_id: r.scale for r in rows}
    for vid, v in orig.items():
        bound = scales[vid] / 254 + 1e-12  # half a quantization step
        assert all(abs(a - b) <= bound for a, b in zip(v, back[vid])), vid


def test_quantize_zero_vector(spark):
    from ddspark.pipeline.ann import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert out[1].scale == 0.0 and out[1].qvec == [0, 0, 0]
    assert out[2].scale == 2.0 and out[2].qvec == [64, -127, 32]


def test_quantize_is_shuffle_free(spark):
    from ddspark.pipeline.ann import quantize_embeddings

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = (
        quantize_embeddings(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_quantized_search_agrees_on_top1(spark):
    """cosine_topk over dequantized vectors finds the same top-1 neighbor
    as over the originals (int8 noise is far below the neighbor margin)."""
    from ddspark.pipeline.ann import (
        cosine_topk,
        dequantize_embeddings,
        quantize_embeddings,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    deq = dequantize_embeddings(quantize_embeddings(emb)).withColumnRenamed(
        "vec", "embedding"
    )
    qs = emb.where(F.col("vec_id") < 3)
    qs_deq = deq.where(F.col("vec_id") < 3)
    top_orig = {
        r.qid: r.nid
        for r in cosine_topk(emb, qs, k=1).where(F.col("rank") == 1).collect()
    }
    top_deq = {
        r.qid: r.nid
        for r in cosine_topk(deq, qs_deq, k=1).where(F.col("rank") == 1).collect()
    }
    assert top_orig == top_deq


# ---------------------------------------------------------------------------
# Exact substring-span dedup (round 5)
# ---------------------------------------------------------------------------


def test_duplicated_spans_cross_doc(spark):
    """Two docs share an exact 6-word run inside distinct text; with n=4
    the 3 duplicated windows merge into one span at the right offsets."""
    from ddspark.pipeline.dedup import duplicated_spans

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, "one two three " + shared + " four five six"),
        (2, "seven eight " + shared + " nine ten eleven twelve"),
        (3, "totally unrelated words only here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in duplicated_spans(df, n=4).collect()}
    assert set(out) == {1, 2}
    # doc 1: shared run at tokens [3, 9) -> windows at 3,4,5 merge
    assert (out[1].span_start, out[1].span_end, out[1].n_windows) == (3, 9, 3)
    # doc 2: shared run at tokens [2, 8)
    assert (out[2].span_start, out[2].span_end, out[2].n_windows) == (2, 8, 3)


def test_duplicated_spans_within_doc_and_islands(spark):
    """A doc repeating its own phrase twice produces two separate spans
    (the gap breaks the island)."""
    from ddspark.pipeline.dedup import duplicated_spans

    phrase = "red green blue yellow"
    df = spark.createDataFrame(
        [(9, phrase + " w1 w2 w3 w4 w5 " + phrase)],
        "doc_id long, text string",
    )
    out = sorted(
        duplicated_spans(df, n=4).collect(), key=lambda r: r.span_start
    )
    assert len(out) == 2
    assert (out[0].span_start, out[0].span_end) == (0, 4)
    assert (out[1].span_start, out[1].span_end) == (9, 13)


def test_duplicated_spans_parallelism_invariant(spark):
    from ddspark.pipeline.dedup import duplicated_spans

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    a = sorted(map(tuple, duplicated_spans(docs, n=6).collect()))
    b = sorted(map(tuple, duplicated_spans(docs.repartition(13), n=6).collect()))
    assert a == b and len(a) > 0


def test_duplicated_spans_matches_duckdb_twin(spark):
    import duckdb
    from ddspark.pipeline.dedup import duplicated_spans, duplicated_spans_oracle_sql

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        map(tuple, duplicated_spans(docs, n=6, portable=True).collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(duplicated_spans_oracle_sql("documents", n=6)).fetchall())
    )
    assert got == want


# ---------------------------------------------------------------------------
# PCA over embeddings (round 5)
# ---------------------------------------------------------------------------


def test_pca_matches_numpy(spark):
    """Distributed one-pass covariance + driver eig == local numpy PCA."""
    from ddspark.pipeline.ann import pca_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    mean, comps, evals = pca_fit(emb, k=5)
    m = np.array([r.embedding for r in emb.collect()], dtype=np.float64)
    assert np.allclose(mean, m.mean(axis=0), atol=1e-9)
    cov = np.cov(m, rowvar=False, bias=True)
    ev, evec = np.linalg.eigh(cov)
    order = np.argsort(ev)[::-1][:5]
    assert np.allclose(evals, ev[order], rtol=1e-8)
    for i, col in enumerate(order):  # same subspace up to sign
        want = evec[:, col]
        assert np.allclose(np.abs(comps[i] @ want), 1.0, atol=1e-8)


def test_pca_project_reduces_and_preserves_variance(spark):
    from ddspark.pipeline.ann import pca_fit, pca_project

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    mean, comps, evals = pca_fit(emb, k=5)
    proj = pca_project(emb, mean, comps)
    rows = proj.collect()
    assert all(len(r.pvec) == 5 for r in rows)
    p = np.array([r.pvec for r in rows])
    # per-axis variance of the projection equals the eigenvalue
    assert np.allclose(p.var(axis=0), evals, rtol=1e-6)
    # axes are uncorrelated
    c = np.cov(p, rowvar=False, bias=True)
    assert np.allclose(c - np.diag(np.diag(c)), 0, atol=1e-8)


def test_pca_fit_parallelism_stable(spark):
    from ddspark.pipeline.ann import pca_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    m1, c1, e1 = pca_fit(emb, k=3)
    m2, c2, e2 = pca_fit(emb.repartition(7), k=3)
    assert np.allclose(m1, m2, atol=1e-12)
    assert np.allclose(e1, e2, rtol=1e-9)
    assert np.allclose(np.abs((c1 * c2).sum(axis=1)), 1.0, atol=1e-9)


def test_write_corpus_jsonl_roundtrip(spark, tmp_path):
    from ddspark.io import read_corpus_jsonl, write_corpus_jsonl

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "export")
    write_corpus_jsonl(docs, out, compression="gzip", partitions=4)
    import glob

    shards = glob.glob(out + "/part-*.json.gz")
    assert len(shards) == 4
    back = read_corpus_jsonl(spark, out + "/*.json.gz", schema=docs.schema)
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_hashed_bow_score_properties(spark):
    """Deterministic, order-exact, shuffle-free, and score == closed-form
    replay of the weight table."""
    from ddspark.pipeline.hashing import portable_hash63
    from ddspark.pipeline.textops import hashed_bow_score
    import hashlib
    import math

    rows = [(0, "alpha beta alpha"), (1, ""), (2, "gamma")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in hashed_bow_score(df, dim=64, salt="s").collect()}

    def w(tok):
        h = int(hashlib.md5(f"{tok}:s".encode()).hexdigest()[:15], 16)
        return (h % 64) * 2654435761 % 2000 - 1000

    assert out[0].raw_milli == 2 * w("alpha") + w("beta")
    assert out[0].token_count == 3
    assert out[1].raw_milli == 0 and out[1].token_count == 0
    assert out[1].score_e6 == 500000  # sigmoid(0) = 0.5
    assert out[2].raw_milli == w("gamma")
    sig = 1.0 / (1.0 + math.exp(-out[0].raw_milli / 1000.0))
    assert out[0].score_e6 == math.floor(sig * 1e6)
    plan = hashed_bow_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_image_dhash_near_dup_detection(spark):
    """Crops/brightness shifts move a few bits; unrelated images ~32."""
    from ddspark.pipeline.dedup import hamming_pairs
    from ddspark.pipeline.multimodal import encode_png, image_dhash

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    bright = np.clip(base.astype(np.int32) + 25, 0, 255).astype(np.uint8)
    far = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    rows = [
        (0, bytearray(encode_png(base))),
        (1, bytearray(encode_png(bright))),
        (2, bytearray(encode_png(far))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, img binary")
    fp = image_dhash(df)
    vals = {r.doc_id: r.dhash for r in fp.collect()}

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(vals[0], vals[1]) <= 6  # brightness shift: gradients survive
    assert ham(vals[0], vals[2]) > 15  # unrelated content
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_pairs(fp, "doc_id", "dhash", max_hamming=6).collect()
    }
    assert set(pairs) == {(0, 1)}


def test_image_dhash_closed_form(spark):
    """9x8 synth images: every bit replayable by hand."""
    from ddspark.pipeline.multimodal import image_dhash, synth_images

    ids = spark.createDataFrame([(7,)], "doc_id long")
    got = image_dhash(synth_images(ids, width=9, height=8)).collect()[0].dhash
    want = 0
    for k in range(64):
        y, x = divmod(k, 8)

        def gray(xx):
            i = (y * 9 + xx) * 3
            return ((7 + i) % 256 + (7 + i + 1) % 256 + (7 + i + 2) % 256) // 3

        if gray(x + 1) > gray(x):
            want |= 1 << k
    if want >= 1 << 63:
        want -= 1 << 64
    assert got == want


def test_audio_fingerprint_near_dup(spark):
    from ddspark.pipeline.dedup import hamming_pairs
    from ddspark.pipeline.multimodal import audio_fingerprint, encode_wav

    rng = np.random.default_rng(11)
    t = np.arange(16384)
    # structured signal: sum of tones with a slow sweep
    sig = (
        8000 * np.sin(2 * np.pi * 440 * t / 8000)
        + 4000 * np.sin(2 * np.pi * (880 + t / 50) * t / 8000)
    )
    base = np.clip(sig, -32768, 32767).astype(np.int16)
    quiet = (base * 0.7).astype(np.int16)  # amplitude scale
    noise = (rng.integers(-20000, 20000, t.shape)).astype(np.int16)
    rows = [
        (0, bytearray(encode_wav(base, 8000))),
        (1, bytearray(encode_wav(quiet, 8000))),
        (2, bytearray(encode_wav(noise, 8000))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, wav binary")
    fp = audio_fingerprint(df)
    vals = {r.doc_id: (r.fingerprint, r.n_windows) for r in fp.collect()}
    assert all(v[1] == 16 for v in vals.values())

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(vals[0][0], vals[1][0]) <= 8  # scaling preserves transitions
    assert ham(vals[0][0], vals[2][0]) > 15  # unrelated audio
    pairs = {(r.id_a, r.id_b) for r in
             hamming_pairs(fp, "doc_id", "fingerprint", max_hamming=8).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_audio_fingerprint_short_blob(spark):
    from ddspark.pipeline.multimodal import audio_fingerprint, encode_wav

    df = spark.createDataFrame(
        [(9, bytearray(encode_wav(np.zeros(100, dtype=np.int16), 8000)))],
        "doc_id long, wav binary",
    )
    r = audio_fingerprint(df).collect()[0]
    assert (r.n_windows, r.fingerprint) == (0, 0)


# --------------------------------------------------------------------- TIFF


def test_tiff_roundtrip_all_variants():
    import numpy as np

    from ddspark.pipeline.multimodal import _decode_tiff, decode_image, encode_tiff

    a = (np.arange(9 * 7 * 3) % 256).astype(np.uint8).reshape(7, 9, 3)
    for pb in (False, True):
        for be in (False, True):
            for rps in (1, 2, 7, 100):
                blob = encode_tiff(a, packbits=pb, big_endian=be, rows_per_strip=rps)
                assert (_decode_tiff(blob) == a).all(), (pb, be, rps)
    assert (decode_image(encode_tiff(a)) == a).all()


def test_tiff_packbits_codec():
    from ddspark.pipeline.multimodal import _packbits_decode, _packbits_encode

    cases = [
        b"",
        b"\x00",
        b"aaaa",
        b"abcd",
        b"aaabccccdd" * 13,
        bytes(range(256)),
        b"x" * 1000,
    ]
    for raw in cases:
        enc = _packbits_encode(raw)
        assert _packbits_decode(enc, len(raw)) == raw
    # spec example semantics: repeat run 257-n
    assert _packbits_decode(b"\xfe\x61", 3) == b"aaa"
    assert _packbits_decode(b"\x02abc", 3) == b"abc"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="PackBits"):
        _packbits_decode(b"\x05ab", 6)  # literal run past end


def test_tiff_gray_and_inverted_gray():
    import struct

    import numpy as np

    from ddspark.pipeline.multimodal import _decode_tiff, encode_tiff

    # hand-build a 2x2 gray TIFF (spp=1), photometric 1 then 0 (inverted)
    def gray_tiff(photometric: int) -> bytes:
        px = bytes([10, 20, 30, 40])
        entries = [
            (256, 4, 1, 2), (257, 4, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, photometric), (273, 4, 1, 8), (277, 3, 1, 1),
            (278, 4, 1, 2), (279, 4, 1, 4), (284, 3, 1, 1),
        ]
        ifd = struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            ifd += struct.pack("<HHII", tag, typ, cnt, val)
        ifd += struct.pack("<I", 0)
        return struct.pack("<2sHI", b"II", 42, 12) + px + ifd

    out = _decode_tiff(gray_tiff(1))
    assert out.shape == (2, 2, 3)
    assert (out[:, :, 0] == [[10, 20], [30, 40]]).all()
    inv = _decode_tiff(gray_tiff(0))
    assert (inv[:, :, 0] == [[245, 235], [225, 215]]).all()


def test_tiff_rejects_unsupported():
    import numpy as np
    import pytest as _pytest

    from ddspark.pipeline.multimodal import _decode_tiff, encode_tiff

    a = np.zeros((2, 2, 3), np.uint8)
    good = bytearray(encode_tiff(a))
    with _pytest.raises(ValueError, match="byte-order"):
        _decode_tiff(b"XX" + bytes(good[2:]))
    bad_magic = bytearray(good)
    bad_magic[2] = 43
    with _pytest.raises(ValueError, match="magic"):
        _decode_tiff(bytes(bad_magic))
    from ddspark.pipeline.multimodal import decode_image

    # truncation hits the struct layer; decode_image's uniform corrupt-blob
    # contract turns it into a ValueError like every other codec
    with _pytest.raises(ValueError, match="corrupt image blob"):
        decode_image(bytes(good[:20]))


def test_qoi_roundtrip_all_chunk_types():
    """Every QOI op must be exercised and roundtrip exactly: RUN
    (including the 62 cap), INDEX, DIFF, LUMA, literal RGB, and
    wraparound diffs."""
    import numpy as np

    from ddspark.pipeline.multimodal import _decode_qoi, encode_qoi

    # flat image: header + runs only
    flat = np.full((3, 50, 3), 9, np.uint8)
    blob = encode_qoi(flat)
    assert np.array_equal(_decode_qoi(blob), flat)
    # 150 identical px -> runs of 62+62+25(+first literal): tiny blob
    assert len(blob) < 30

    # alternating two colors -> INDEX chunks after first occurrences
    alt = np.zeros((2, 40, 3), np.uint8)
    alt[:, 1::2] = (200, 100, 50)
    assert np.array_equal(_decode_qoi(encode_qoi(alt)), alt)

    # +1 ramp -> DIFF chunks; +3 ramp -> LUMA; 255->0 wraparound
    ramp = np.zeros((1, 256, 3), np.uint8)
    ramp[0, :, 0] = np.arange(255, -1, -1, dtype=np.uint8)  # -1 steps
    ramp[0, :, 1] = (np.arange(256) * 3).astype(np.uint8)
    assert np.array_equal(_decode_qoi(encode_qoi(ramp)), ramp)

    # random stress incl. repeated colors
    rng = np.random.default_rng(42)
    noisy = rng.integers(0, 8, (11, 13, 3), dtype=np.uint8) * 37
    assert np.array_equal(_decode_qoi(encode_qoi(noisy)), noisy)


def test_qoi_corrupt_blobs_raise_valueerror():
    import numpy as np
    import pytest

    from ddspark.pipeline.multimodal import decode_image, encode_qoi

    good = encode_qoi(np.full((4, 4, 3), 77, np.uint8))
    # truncated stream
    with pytest.raises(ValueError):
        decode_image(good[:-10])
    # bad end marker
    with pytest.raises(ValueError):
        decode_image(good[:-1] + b"\x02")
    # decompression-bomb dims
    import struct

    bomb = b"qoif" + struct.pack(">IIBB", 1 << 16, 1 << 16, 3, 0) + good[14:]
    with pytest.raises(ValueError, match="cap"):
        decode_image(bomb)
    # 2-channel header
    two = good[:12] + bytes([2]) + good[13:]
    with pytest.raises(ValueError, match="channel"):
        decode_image(two)


def test_qoi_rgba_decodes_with_alpha_dropped():
    """A hand-built channels=4 stream with an RGBA literal decodes; the
    alpha participates in the index hash but drops from the output."""
    import struct

    import numpy as np

    from ddspark.pipeline.multimodal import _decode_qoi

    head = b"qoif" + struct.pack(">IIBB", 2, 1, 4, 0)
    body = bytes([0xFF, 10, 20, 30, 128])      # RGBA literal
    body += bytes([0xC0 | 0])                   # run 1 (repeat)
    blob = head + body + b"\x00" * 7 + b"\x01"
    out = _decode_qoi(blob)
    assert out.shape == (1, 2, 3)
    assert np.array_equal(out, [[[10, 20, 30], [10, 20, 30]]])
