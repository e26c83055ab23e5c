"""S3LogStore: the commit protocol against real S3 API *shapes*.

A fake boto3-surface client (conditional PutObject with 412/409,
paginated ListObjectsV2 with StartAfter, GetObject/HeadObject/
DeleteObject, errors duck-typed via ``e.response``) drives the SAME
protocol battery `test_logstore.py` runs on the in-memory contract —
plus the S3-only behaviors: pagination across the listing loop, the
bounded 409 retry, and 412 = lost-the-race.
"""

from __future__ import annotations

import json

import pytest

from lamindb_spark.catalog.commitlog import CommitConflictError, CommitLog
from lamindb_spark.catalog.logstore import S3LogStore
from lamindb_spark.streaming.source import (
    _change_files,
    _check_offset_retained,
    _latest_version,
)


class _ClientError(Exception):
    """Duck-typed botocore ClientError: only `.response` is consulted."""

    def __init__(self, code: str):
        super().__init__(code)
        self.response = {"Error": {"Code": code}}


class _Body:
    def __init__(self, data: bytes):
        self._data = data

    def read(self) -> bytes:
        return self._data


class FakeS3Client:
    """Enough of the boto3 S3 client for S3LogStore, with a tiny page
    size so every multi-object listing exercises the pagination loop."""

    def __init__(self, page_size: int = 2):
        self.objects: dict[str, bytes] = {}
        self.page_size = page_size
        self.conditional_puts = 0

    def put_object(self, *, Bucket, Key, Body, ContentType=None, IfNoneMatch=None):
        assert Bucket == "bkt"
        if IfNoneMatch is not None:
            assert IfNoneMatch == "*"
            self.conditional_puts += 1
            if Key in self.objects:
                raise _ClientError("PreconditionFailed")
        self.objects[Key] = Body
        return {}

    def get_object(self, *, Bucket, Key):
        if Key not in self.objects:
            raise _ClientError("NoSuchKey")
        return {"Body": _Body(self.objects[Key])}

    def head_object(self, *, Bucket, Key):
        if Key not in self.objects:
            raise _ClientError("404")
        return {}

    def delete_object(self, *, Bucket, Key):
        self.objects.pop(Key, None)
        return {}

    def list_objects_v2(
        self,
        *,
        Bucket,
        Prefix,
        Delimiter=None,
        StartAfter=None,
        ContinuationToken=None,
    ):
        keys = sorted(
            k
            for k in self.objects
            if k.startswith(Prefix)
            and (Delimiter is None or Delimiter not in k[len(Prefix):])
        )
        if StartAfter is not None:
            keys = [k for k in keys if k > StartAfter]
        if ContinuationToken is not None:
            keys = [k for k in keys if k > ContinuationToken]
        page, rest = keys[: self.page_size], keys[self.page_size :]
        resp = {"Contents": [{"Key": k} for k in page]}
        if rest:
            resp["IsTruncated"] = True
            resp["NextContinuationToken"] = page[-1]
        return resp


def _store(**kw):
    client = FakeS3Client(**kw)
    return S3LogStore("bkt", prefix="warehouse", client=client), client


def test_protocol_runs_on_s3_shapes():
    store, client = _store()
    t = "/tbl"
    log = CommitLog(t, store=store)
    assert log.commit(add=["a.parquet"]) == 0
    assert log.commit(add=["b.parquet"], metadata={"txn_app": "q", "txn_version": 7}) == 1
    v, files = log.snapshot()
    assert v == 1 and sorted(files) == [f"{t}/a.parquet", f"{t}/b.parquet"]

    assert log.write_checkpoint() == 1
    assert log.last_checkpoint_version() == 1
    assert log.expire_log() == 2
    assert log.versions() == []
    assert log.snapshot()[0] == 1
    assert ("q", 7) in log.known_txns()

    assert log.commit(add=["c.parquet"]) == 2
    assert log.commit(remove=["a.parquet"], add=["d.parquet"]) == 3
    with pytest.raises(CommitConflictError):
        log.commit(remove=["a.parquet"])
    v, files = log.snapshot()
    assert v == 3 and sorted(files) == [
        f"{t}/b.parquet",
        f"{t}/c.parquet",
        f"{t}/d.parquet",
    ]

    # CDC stream helpers on the same client
    assert _latest_version(t, store) == 3
    assert [v for v, _ in _change_files(t, 1, 3, store)] == [2, 3]
    with pytest.raises(ValueError, match="expired"):
        _change_files(t, -1, 3, store)
    _check_offset_retained(t, 1, store)

    # keys actually live under the bucket prefix, and every commit went
    # through the conditional-put path
    assert all(k.startswith("warehouse/tbl/_commits/") for k in client.objects)
    assert client.conditional_puts == 4  # one per committed version
    # page_size=2 with >2 retained files means the listing loop paginated
    assert len(client.objects) > 2


def test_race_resolves_via_412():
    store, client = _store()
    t = "/race"
    victim = CommitLog(t, store=store)
    rival = CommitLog(t, store=store)

    fired = {"done": False}
    orig = client.put_object

    def racing_put(*, Bucket, Key, Body, ContentType=None, IfNoneMatch=None):
        if (
            IfNoneMatch is not None
            and not fired["done"]
            and b'"who": "victim"' in Body
        ):
            fired["done"] = True
            rival.commit(add=["rival.parquet"], metadata={"who": "rival"})
        return orig(Bucket=Bucket, Key=Key, Body=Body, ContentType=ContentType, IfNoneMatch=IfNoneMatch)

    client.put_object = racing_put
    victim.commit(add=["seed.parquet"], metadata={"who": "seed"})  # v0
    assert victim.commit(add=["victim.parquet"], metadata={"who": "victim"}) == 2
    v, files = CommitLog(t, store=store).snapshot()
    assert v == 2 and sorted(files) == [
        f"{t}/rival.parquet",
        f"{t}/seed.parquet",
        f"{t}/victim.parquet",
    ]


def test_conditional_conflict_409_retries_then_wins():
    store, client = _store()
    orig = client.put_object
    state = {"raised": 0}

    def flaky_put(**kw):
        if kw.get("IfNoneMatch") is not None and state["raised"] < 2:
            state["raised"] += 1
            raise _ClientError("ConditionalRequestConflict")
        return orig(**kw)

    client.put_object = flaky_put
    assert store.put_json_if_absent("/t/_commits/0.json", {"x": 1}) is True
    assert state["raised"] == 2
    assert store.read_json("/t/_commits/0.json") == {"x": 1}


def test_conditional_conflict_409_with_winner_is_false():
    store, client = _store()
    orig = client.put_object

    def conflicted_put(**kw):
        if kw.get("IfNoneMatch") is not None:
            # the concurrent writer landed; S3 surfaced 409 to us
            client.objects[kw["Key"]] = json.dumps({"winner": True}).encode()
            raise _ClientError("ConditionalRequestConflict")
        return orig(**kw)

    client.put_object = conflicted_put
    assert store.put_json_if_absent("/t/_commits/0.json", {"x": 1}) is False
    assert store.read_json("/t/_commits/0.json") == {"winner": True}


def test_list_start_after_is_server_side():
    store, client = _store()
    for n in ("00.json", "01.json", "02.json", "03.json", "04.json"):
        store.write_json_atomic(f"/d/{n}", {})
    assert store.list("/d", start_after="02.json") == ["03.json", "04.json"]
    assert store.list("/d") == [f"0{i}.json" for i in range(5)]
    assert store.list("/missing") == []
    # read/delete round trip
    store.delete("/d/00.json")
    with pytest.raises(FileNotFoundError):
        store.read_json("/d/00.json")
