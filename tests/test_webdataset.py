"""WebDataset-style tar shard I/O (ddspark/io.py)."""
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from ddspark.io import read_webdataset, webdataset_samples, write_webdataset


def _mk(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text for "), F.col("id").cast("string")).alias("text"),
        F.encode(
            F.concat(F.lit("IMG"), F.col("id").cast("string")), "utf-8"
        ).alias("img"),
    )


def test_webdataset_roundtrip_bytes_exact(spark, tmp_path):
    out = str(tmp_path / "wds")
    df = _mk(spark)
    manifest = write_webdataset(
        df, out, "doc_id", {"txt": "text", "jpg": "img"}, num_shards=4
    ).collect()
    assert sorted(m["shard"] for m in manifest) == [
        f"shard-{i:05d}.tar" for i in range(4)
    ]
    assert sum(m["n_samples"] for m in manifest) == 40
    for m in manifest:
        assert os.path.getsize(os.path.join(out, m["shard"])) == m["n_bytes"]

    back = read_webdataset(spark, out)
    samples = webdataset_samples(back, ["txt", "jpg"]).collect()
    assert len(samples) == 40
    for s in samples:
        i = int(s["key"])
        assert bytes(s["txt"]).decode() == f"text for {i}"
        assert bytes(s["jpg"]) == f"IMG{i}".encode()

    # deterministic bytes: rewriting the same data produces identical shards
    out2 = str(tmp_path / "wds2")
    write_webdataset(
        df, out2, "doc_id", {"txt": "text", "jpg": "img"}, num_shards=4
    ).collect()
    for i in range(4):
        a = open(os.path.join(out, f"shard-{i:05d}.tar"), "rb").read()
        b = open(os.path.join(out2, f"shard-{i:05d}.tar"), "rb").read()
        assert a == b


def test_webdataset_members_sorted_and_standard_layout(spark, tmp_path):
    out = str(tmp_path / "wds")
    write_webdataset(_mk(spark, 12), out, "doc_id", {"txt": "text"},
                     num_shards=1).collect()
    with tarfile.open(os.path.join(out, "shard-00000.tar")) as tar:
        names = tar.getnames()
    assert names == sorted(names)
    assert all(n.endswith(".txt") for n in names)
    # readable by plain tarfile consumers (the point of the format)
    with tarfile.open(os.path.join(out, "shard-00000.tar")) as tar:
        m = tar.getmember("3.txt")
        assert tar.extractfile(m).read() == b"text for 3"


def test_webdataset_null_handling_and_guards(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", b"x"), (None, "b", b"y"), (3, None, b"z")],
        "doc_id long, text string, img binary",
    )
    out = str(tmp_path / "wds")
    man = write_webdataset(df, out, "doc_id", {"txt": "text", "jpg": "img"},
                           num_shards=1).collect()
    assert sum(m["n_samples"] for m in man) == 2  # null key skipped
    rows = read_webdataset(spark, out).collect()
    got = sorted((r["key"], r["ext"]) for r in rows)
    assert got == [("1", "jpg"), ("1", "txt"), ("3", "jpg")]  # null member skipped

    with pytest.raises(ValueError, match="not in DataFrame"):
        write_webdataset(df, out, "doc_id", {"txt": "nope"})
    with pytest.raises(ValueError, match="bad extension"):
        write_webdataset(df, out, "doc_id", {"a.b": "text"})
    with pytest.raises(ValueError, match="at least one"):
        write_webdataset(df, out, "doc_id", {})
