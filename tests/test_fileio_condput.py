"""ConditionalPutFileIO: the object-store manifest path.

The race/crash matrix LocalFileIO passes must hold through the
conditional-PUT protocol (dexspark/fileio.py), and manifest GET
round-trips must stay O(1) per version (the LRU text cache) — on an
object store every extra read_text is a billable, latency-bearing
GET. The FULL lake suite also runs through this FileIO via
``DEXSPARK_FILEIO=condput python -m pytest tests/test_lake.py``
(see BENCH.md round-4 notes)."""

import concurrent.futures
import os

import pytest
from pyspark.sql import functions as F

from dexspark.fileio import (
    ConditionalPutFileIO,
    FsObjectClient,
    ObjectMissing,
    PreconditionFailed,
)
from dexspark.lake import ConcurrentCommitError, LakeTable
from dexspark.schema import sequences_schema


def _io(tmp_path=None):
    # root "/": absolute FileIO paths round-trip to the same real
    # location Spark writes data to (the deployment shape — one
    # bucket holds data written by Spark and manifests PUT by the io)
    return ConditionalPutFileIO(FsObjectClient("/"))


def _seq(spark, rows):
    return spark.createDataFrame(rows, schema=sequences_schema())


def _ids(table):
    return {r["doc_id"] for r in table.read().collect()}


# ------------------------------------------------------------ client level


def test_client_conditional_put_single_winner(tmp_path):
    """16 threads racing one key through the client: exactly one
    winner, 15 PreconditionFailed, surviving body is the winner's."""
    c = FsObjectClient(str(tmp_path))

    def attempt(i):
        try:
            c.put_object("snap/k.json", b"w%d" % i, if_none_match=True)
            return ("won", i)
        except PreconditionFailed:
            return ("lost", i)

    with concurrent.futures.ThreadPoolExecutor(max_workers=16) as pool:
        results = list(pool.map(attempt, range(16)))
    winners = [i for s, i in results if s == "won"]
    assert len(winners) == 1, results
    assert c.get_object("snap/k.json") == b"w%d" % winners[0]
    # no temp litter
    assert not [
        k for k in c.list_keys("snap/") if os.path.basename(k).startswith(".put-")
    ]


def test_client_contract_missing_and_overwrite(tmp_path):
    c = FsObjectClient(str(tmp_path))
    with pytest.raises(ObjectMissing):
        c.get_object("nope")
    with pytest.raises(ObjectMissing):
        c.delete_object("nope")
    with pytest.raises(ObjectMissing):
        c.head_object("nope")
    c.put_object("a/b", b"1")
    c.put_object("a/b", b"2")  # unconditional = last-writer-wins
    assert c.get_object("a/b") == b"2"
    with pytest.raises(PreconditionFailed):
        c.put_object("a/b", b"3", if_none_match=True)
    assert c.get_object("a/b") == b"2"  # loser wrote nothing
    assert c.head_object("a/b")["last_modified"] > 0


def test_relative_paths_rejected(tmp_path):
    """A relative table root would key objects by the process CWD —
    refused loudly rather than silently splitting a table's history
    across prefixes."""
    io_ = _io(tmp_path)
    with pytest.raises(ValueError, match="absolute"):
        io_.read_text("warehouse/t/snap.json")
    with pytest.raises(ValueError, match="absolute"):
        io_.put_if_absent("warehouse/t/snap.json", "{}")


def test_fileio_dir_semantics(tmp_path):
    io_ = _io(tmp_path)
    io_.put_if_absent(str(tmp_path / "d" / "sub" / "x.json"), "1")
    io_.put_if_absent(str(tmp_path / "d" / "y.json"), "2")
    assert io_.list_dir(str(tmp_path / "d")) == ["sub", "y.json"]
    assert io_.is_dir(str(tmp_path / "d" / "sub"))
    assert not io_.is_dir(str(tmp_path / "d" / "none"))
    io_.remove_tree(str(tmp_path / "d"))
    assert io_.list_dir(str(tmp_path / "d")) == []
    with pytest.raises(FileNotFoundError):
        io_.read_text(str(tmp_path / "d" / "y.json"))
    with pytest.raises(FileNotFoundError):
        io_.delete(str(tmp_path / "d" / "y.json"))
    with pytest.raises(FileNotFoundError):
        io_.mtime(str(tmp_path / "d" / "y.json"))


# ------------------------------------------------------------ table level


def test_lifecycle_through_condput(spark, tmp_path):
    """create/overwrite/merge/time-travel/branch/rollback/vacuum all
    through the conditional-put FileIO."""
    io_ = _io(tmp_path)
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=4, io=io_)
    t.overwrite(_seq(spark, [("a", [1], 1, "web"), ("b", [2], 1, "books")]))
    t.merge(_seq(spark, [("c", [3], 1, "code")]), epochs=[0], mode="mor")
    assert _ids(t) == {"a", "b", "c"}
    v = t.current_version()
    assert {r["doc_id"] for r in t.read(version=v - 1).collect()} == {"a", "b"}
    # losing commit through the seam
    m = t.manifest()
    t._commit({**m, "version": m["version"] + 1})
    with pytest.raises(ConcurrentCommitError):
        t._commit({**m, "version": m["version"] + 1})
    # branch + publish (same io)
    t2 = LakeTable(spark, root, io=io_)
    t2.create_branch("wap")
    br = LakeTable(spark, root, io=io_, branch="wap")
    br.merge(_seq(spark, [("d", [4], 1, "web")]), epochs=[1], mode="mor")
    assert "d" not in _ids(LakeTable(spark, root, io=io_))
    LakeTable(spark, root, io=io_).publish_branch("wap")
    assert "d" in _ids(LakeTable(spark, root, io=io_))
    # rollback + vacuum through the seam
    t3 = LakeTable(spark, root, io=io_)
    head = t3.current_version()
    t3.rollback(head - 1)
    assert "d" not in _ids(t3)
    t3.vacuum(keep_last=2, min_age_seconds=0)
    assert "d" not in _ids(LakeTable(spark, root, io=io_))


def test_epoch_bookkeeping_through_condput(spark, tmp_path):
    """Epoch markers (the exactly-once predicate the engine consults
    before re-applying a batch) survive the object-store manifest
    path, including out-of-order tails and watermark compaction."""
    io_ = _io(tmp_path)
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=2, io=io_)
    t.merge(_seq(spark, [("a", [1], 1, "web")]), epochs=[0, 1, 5])
    w, tail = t.epoch_state()
    assert (w, tail) == (1, [5])
    assert t.is_epoch_committed(5) and not t.is_epoch_committed(2)
    t.merge(_seq(spark, []), epochs=[2, 3, 4])
    assert LakeTable(spark, root, io=_io()).epoch_state() == (5, [])
    assert t.read().filter(F.col("doc_id") == "a").count() == 1


def test_merge_rebases_over_raced_commit_condput(spark, tmp_path):
    """RaceOnce matrix through the object client: a commit landing
    mid-merge forces a rebase, not an abort (mirrors
    test_lake.test_merge_rebases_over_alter_properties)."""
    root = str(tmp_path / "t")
    t = LakeTable.create(
        spark, root, sequences_schema(), num_buckets=4, io=_io(tmp_path)
    )
    t.overwrite(_seq(spark, [("a", [1], 1, "web")]))

    class RaceOnceIO(ConditionalPutFileIO):
        def __init__(self, client, race):
            super().__init__(client)
            self._race, self._armed = race, True

        def put_if_absent(self, path, data):
            if self._armed and os.sep + "snap-" in path:
                self._armed = False
                self._race()
            return super().put_if_absent(path, data)

    other = LakeTable(spark, root, io=_io(tmp_path))
    racer = LakeTable(
        spark,
        root,
        io=RaceOnceIO(
            FsObjectClient("/"),
            lambda: other.alter_properties({"note": "raced"}),
        ),
    )
    racer.merge(_seq(spark, [("r", [7], 1, "web")]), epochs=[5])
    t2 = LakeTable(spark, root, io=_io(tmp_path))
    assert t2.manifest()["properties"]["note"] == "raced"
    assert "r" in _ids(t2)


def test_crash_before_commit_invisible_condput(spark, tmp_path):
    """Data written but commit never PUT: readers see nothing (mirrors
    test_crash_between_data_write_and_commit_is_invisible)."""
    root = str(tmp_path / "t")
    io_ = _io(tmp_path)
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=2, io=io_)
    t.overwrite(_seq(spark, [("a", [1], 1, "web")]))

    class CrashIO(ConditionalPutFileIO):
        def put_if_absent(self, path, data):
            if os.sep + "snap-" in path:
                raise RuntimeError("crashed before commit")
            return super().put_if_absent(path, data)

    crasher = LakeTable(
        spark, root, io=CrashIO(FsObjectClient("/"))
    )
    with pytest.raises(RuntimeError, match="crashed"):
        crasher.merge(_seq(spark, [("z", [9], 1, "web")]), epochs=[3])
    t2 = LakeTable(spark, root, io=io_)
    assert _ids(t2) == {"a"}
    assert t2.current_version() == t.current_version()


class _FakeS3:
    """In-memory stand-in speaking the slice of the boto3 S3 client
    surface Boto3Client uses — including the IfNoneMatch=\"*\"
    conditional-put refusal (412) and list_objects_v2 pagination."""

    class _NoSuchKey(Exception):
        pass

    def __init__(self):
        self.store: dict[str, bytes] = {}
        self.exceptions = type("E", (), {"NoSuchKey": self._NoSuchKey})

    def get_object(self, Bucket, Key):
        import io as _io

        if Key not in self.store:
            raise self._NoSuchKey(Key)
        return {"Body": _io.BytesIO(self.store[Key])}

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        if IfNoneMatch == "*" and Key in self.store:
            e = RuntimeError("precondition")
            e.response = {"Error": {"Code": "PreconditionFailed"}}
            raise e
        self.store[Key] = Body

    def head_object(self, Bucket, Key):
        import datetime

        if Key not in self.store:
            raise self._NoSuchKey(Key)
        return {
            "LastModified": datetime.datetime.now(datetime.timezone.utc)
        }

    def delete_object(self, Bucket, Key):
        self.store.pop(Key, None)

    def list_objects_v2(self, Bucket, Prefix, ContinuationToken=None):
        keys = sorted(k for k in self.store if k.startswith(Prefix))
        page = 2  # tiny page size: force the pagination loop
        start = int(ContinuationToken or 0)
        chunk = keys[start : start + page]
        out = {"Contents": [{"Key": k} for k in chunk]}
        if start + page < len(keys):
            out["IsTruncated"] = True
            out["NextContinuationToken"] = str(start + page)
        return out


def test_boto3client_mapping_against_fake_s3():
    """Boto3Client's option mapping over an injected fake client:
    conditional put -> PreconditionFailed -> ConcurrentCommitError,
    prefix handling, pagination, missing-key contract."""
    from dexspark.fileio import Boto3Client
    from dexspark.lake import ConcurrentCommitError

    fake = _FakeS3()
    c = Boto3Client("bucket", prefix="lake/meta", client=fake)
    io_ = ConditionalPutFileIO(c)
    io_.put_if_absent("/t/_snapshots/snap-00000001.json", '{"v": 1}')
    assert io_.read_text("/t/_snapshots/snap-00000001.json") == '{"v": 1}'
    # the bucket key carries the prefix
    assert "lake/meta/t/_snapshots/snap-00000001.json" in fake.store
    with pytest.raises(ConcurrentCommitError):
        io_.put_if_absent("/t/_snapshots/snap-00000001.json", '{"v": 9}')
    assert io_.read_text("/t/_snapshots/snap-00000001.json") == '{"v": 1}'
    # pagination: 5 keys with page size 2 forces 3 LIST round-trips
    for i in range(2, 7):
        io_.put_if_absent(f"/t/_snapshots/snap-{i:08d}.json", "{}")
    assert io_.list_dir("/t/_snapshots") == [
        f"snap-{i:08d}.json" for i in range(1, 7)
    ]
    assert io_.is_dir("/t/_snapshots")
    assert io_.mtime("/t/_snapshots/snap-00000001.json") > 0
    io_.delete("/t/_snapshots/snap-00000001.json")
    with pytest.raises(FileNotFoundError):
        io_.read_text("/t/_snapshots/snap-00000001.json")
    with pytest.raises(FileNotFoundError):
        io_.delete("/t/_snapshots/snap-00000001.json")
    io_.remove_tree("/t/_snapshots")
    assert io_.list_dir("/t/_snapshots") == []
    assert not io_.is_dir("/t/_snapshots")


def test_default_io_env_selection(monkeypatch):
    from dexspark import lake

    monkeypatch.delenv("DEXSPARK_FILEIO", raising=False)
    assert isinstance(lake.default_io(), lake.LocalFileIO)
    monkeypatch.setenv("DEXSPARK_FILEIO", "local")
    assert isinstance(lake.default_io(), lake.LocalFileIO)
    monkeypatch.setenv("DEXSPARK_FILEIO", "condput")
    io_ = lake.default_io()
    assert isinstance(io_, ConditionalPutFileIO)
    assert isinstance(io_.client, FsObjectClient)
    monkeypatch.setenv("DEXSPARK_FILEIO", "bogus")
    with pytest.raises(ValueError, match="bogus"):
        lake.default_io()


def test_manifest_get_roundtrips_bounded(spark, tmp_path):
    """Manifest GETs through the client stay O(1) per version per
    LakeTable instance (the text cache) — the object-store cost
    contract from lake.py MANIFEST_CACHE."""

    class CountingClient(FsObjectClient):
        def __init__(self, root):
            super().__init__(root)
            self.gets = 0

        def get_object(self, key):
            if "/snap-" in key or key.startswith("snap-"):
                self.gets += 1
            return super().get_object(key)

    c = CountingClient("/")
    io_ = ConditionalPutFileIO(c)
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=2, io=io_)
    t.overwrite(_seq(spark, [("a", [1], 1, "web")]))
    t.merge(_seq(spark, [("b", [2], 1, "books")]), epochs=[0])
    versions = t.current_version()
    c.gets = 0
    for _ in range(10):
        t.manifest()  # hot path: repeated manifest access, one version
    assert c.gets <= 1
    c.gets = 0
    for _ in range(5):
        t.read().count()
    assert c.gets <= versions  # at most one GET per distinct version


# ------------------------------------------------------------ azure client


class _AzureError(Exception):
    """Shape of azure.core.exceptions.HttpResponseError: carries
    status_code + error_code (REST error string)."""

    def __init__(self, status_code, error_code):
        super().__init__(f"{status_code} {error_code}")
        self.status_code = status_code
        self.error_code = error_code


class _FakeDownload:
    def __init__(self, body):
        self._body = body

    def readall(self):
        return self._body


class _FakeBlobProps:
    def __init__(self, last_modified):
        self.last_modified = last_modified


class _FakeBlobHandle:
    def __init__(self, container, name):
        self._c, self._name = container, name

    def get_blob_properties(self):
        if self._name not in self._c.store:
            raise _AzureError(404, "BlobNotFound")
        return _FakeBlobProps(self._c.mtimes[self._name])


class _FakeAzureContainer:
    """ContainerClient fake honoring Azure's status-code semantics:
    upload_blob(overwrite=False) on an existing blob -> 409
    BlobAlreadyExists (the SDK's If-None-Match:* translation); missing
    blob -> 404 BlobNotFound. The conditional upload is made atomic
    under a lock, mirroring the service-side ETag machinery."""

    def __init__(self):
        import threading

        self.store: dict[str, bytes] = {}
        self.mtimes: dict[str, object] = {}
        self._lock = threading.Lock()

    def _touch(self, name):
        import datetime

        self.mtimes[name] = datetime.datetime.now(datetime.timezone.utc)

    def upload_blob(self, name, data, overwrite):
        with self._lock:
            if not overwrite and name in self.store:
                raise _AzureError(409, "BlobAlreadyExists")
            self.store[name] = bytes(data)
            self._touch(name)

    def download_blob(self, name):
        if name not in self.store:
            raise _AzureError(404, "BlobNotFound")
        return _FakeDownload(self.store[name])

    def delete_blob(self, name):
        if name not in self.store:
            raise _AzureError(404, "BlobNotFound")
        del self.store[name]
        self.mtimes.pop(name, None)

    def list_blobs(self, name_starts_with):
        class _B:
            def __init__(self, name):
                self.name = name

        return [
            _B(k) for k in sorted(self.store)
            if k.startswith(name_starts_with)
        ]

    def get_blob_client(self, name):
        return _FakeBlobHandle(self, name)


def test_azure_client_mapping_against_fake_container():
    """AzureBlobClient's error mapping over a fake with Azure
    status-code semantics: 409 BlobAlreadyExists -> PreconditionFailed
    -> ConcurrentCommitError, 404 BlobNotFound -> ObjectMissing ->
    FileNotFoundError, prefix handling, list/mtime/delete contract."""
    from dexspark.fileio import AzureBlobClient
    from dexspark.lake import ConcurrentCommitError

    fake = _FakeAzureContainer()
    c = AzureBlobClient(fake, prefix="lake/meta")
    io_ = ConditionalPutFileIO(c)
    io_.put_if_absent("/t/_snapshots/snap-00000001.json", '{"v": 1}')
    assert io_.read_text("/t/_snapshots/snap-00000001.json") == '{"v": 1}'
    # the blob name carries the prefix
    assert "lake/meta/t/_snapshots/snap-00000001.json" in fake.store
    with pytest.raises(ConcurrentCommitError):
        io_.put_if_absent("/t/_snapshots/snap-00000001.json", '{"v": 9}')
    assert io_.read_text("/t/_snapshots/snap-00000001.json") == '{"v": 1}'
    for i in range(2, 7):
        io_.put_if_absent(f"/t/_snapshots/snap-{i:08d}.json", "{}")
    assert io_.list_dir("/t/_snapshots") == [
        f"snap-{i:08d}.json" for i in range(1, 7)
    ]
    assert io_.is_dir("/t/_snapshots")
    assert io_.mtime("/t/_snapshots/snap-00000001.json") > 0
    io_.delete("/t/_snapshots/snap-00000001.json")
    with pytest.raises(FileNotFoundError):
        io_.read_text("/t/_snapshots/snap-00000001.json")
    with pytest.raises(FileNotFoundError):
        io_.delete("/t/_snapshots/snap-00000001.json")
    with pytest.raises(FileNotFoundError):
        io_.mtime("/t/_snapshots/snap-00000001.json")
    io_.remove_tree("/t/_snapshots")
    assert io_.list_dir("/t/_snapshots") == []
    assert not io_.is_dir("/t/_snapshots")


def test_azure_client_412_condition_not_met_maps_to_loss():
    """Some Azure layers surface the conditional-upload loss as 412
    ConditionNotMet rather than 409 — both are a clean loss."""
    from dexspark.fileio import AzureBlobClient

    class Cond412Container(_FakeAzureContainer):
        def upload_blob(self, name, data, overwrite):
            if not overwrite and name in self.store:
                raise _AzureError(412, "ConditionNotMet")
            super().upload_blob(name, data, overwrite)

    c = AzureBlobClient(Cond412Container())
    c.put_object("k", b"1", if_none_match=True)
    with pytest.raises(PreconditionFailed):
        c.put_object("k", b"2", if_none_match=True)
    assert c.get_object("k") == b"1"


def test_azure_client_operational_errors_propagate():
    """Throttles/auth errors must NOT map to missing/loss: a 503
    treated as 'missing' would make retention skip live snapshots."""
    from dexspark.fileio import AzureBlobClient

    class Throttling(_FakeAzureContainer):
        def download_blob(self, name):
            raise _AzureError(503, "ServerBusy")

        def upload_blob(self, name, data, overwrite):
            raise _AzureError(403, "AuthorizationFailure")

        def delete_blob(self, name):
            raise _AzureError(500, "InternalError")

    c = AzureBlobClient(Throttling())
    with pytest.raises(_AzureError):
        c.get_object("k")
    with pytest.raises(_AzureError):
        c.put_object("k", b"1", if_none_match=True)
    with pytest.raises(_AzureError):
        c.delete_object("k")
    # unconditional-path 409 (e.g. lease conflict) propagates too:
    # only the CONDITIONAL path's 409 is a clean loss

    class Lease409(_FakeAzureContainer):
        def upload_blob(self, name, data, overwrite):
            raise _AzureError(409, "LeaseIdMissing")

    with pytest.raises(_AzureError):
        AzureBlobClient(Lease409()).put_object("k", b"1")


def test_azure_client_conditional_put_single_winner():
    """16 threads racing one key through the Azure client: exactly one
    winner (the fake's lock mirrors the service-side ETag atomicity)."""
    from dexspark.fileio import AzureBlobClient

    c = AzureBlobClient(_FakeAzureContainer())

    def attempt(i):
        try:
            c.put_object("snap/k.json", b"w%d" % i, if_none_match=True)
            return ("won", i)
        except PreconditionFailed:
            return ("lost", i)

    with concurrent.futures.ThreadPoolExecutor(max_workers=16) as pool:
        results = list(pool.map(attempt, range(16)))
    winners = [i for s, i in results if s == "won"]
    assert len(winners) == 1, results
    assert c.get_object("snap/k.json") == b"w%d" % winners[0]


class _FsAzureContainer:
    """Azure-semantics container backed by the real filesystem via
    FsObjectClient('/') — the deployment shape (one store holds both
    Spark-written data files and io-PUT manifests), with the SDK's
    status-code surface on top. Conditional-upload atomicity is
    link(2)'s, mirroring the service-side ETag machinery."""

    def __init__(self):
        self._fs = FsObjectClient("/")

    def upload_blob(self, name, data, overwrite):
        try:
            self._fs.put_object(
                name, bytes(data), if_none_match=not overwrite
            )
        except PreconditionFailed:
            raise _AzureError(409, "BlobAlreadyExists") from None

    def download_blob(self, name):
        try:
            return _FakeDownload(self._fs.get_object(name))
        except ObjectMissing:
            raise _AzureError(404, "BlobNotFound") from None

    def delete_blob(self, name):
        try:
            self._fs.delete_object(name)
        except ObjectMissing:
            raise _AzureError(404, "BlobNotFound") from None

    def list_blobs(self, name_starts_with):
        class _B:
            def __init__(self, name):
                self.name = name

        return [_B(k) for k in self._fs.list_keys(name_starts_with)]

    def get_blob_client(self, name):
        fs = self._fs

        class _H:
            def get_blob_properties(self):
                import datetime

                try:
                    ts = fs.head_object(name)["last_modified"]
                except ObjectMissing:
                    raise _AzureError(404, "BlobNotFound") from None
                return _FakeBlobProps(
                    datetime.datetime.fromtimestamp(
                        ts, datetime.timezone.utc
                    )
                )

        return _H()


def test_lake_lifecycle_through_azure_fake(spark, tmp_path):
    """The full table lifecycle (create/merge/epoch markers/replay
    no-op/time-travel) with manifests on the Azure client — the race
    matrix's table-level shape, through Azure status-code semantics."""
    from dexspark.fileio import AzureBlobClient

    io_ = ConditionalPutFileIO(AzureBlobClient(_FsAzureContainer()))
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=2, io=io_)
    t.merge(_seq(spark, [("a", [1], 1, "web"), ("b", [2], 1, "books")]),
            epochs=[0])
    v1 = t.current_version()
    t.merge(_seq(spark, [("b", [9], 1, "books"), ("c", [3], 1, "web")]),
            epochs=[1])
    assert _ids(t) == {"a", "b", "c"}
    assert t.is_epoch_committed(0) and t.is_epoch_committed(1)
    # marker-only commit (merge-noop snapshot): no data change
    t.mark_epochs([2])
    assert t.is_epoch_committed(2)
    assert _ids(t) == {"a", "b", "c"}
    # time travel reads the old manifest through the azure client
    assert {r["doc_id"] for r in t.read(version=v1).collect()} == {"a", "b"}
    assert t.read(version=v1).filter("doc_id = 'b'").collect()[0]["tokens"] == [2]
    assert t.read().filter("doc_id = 'b'").collect()[0]["tokens"] == [9]
    # losing a manifest race surfaces as ConcurrentCommitError ->
    # LakeTable's rebase machinery (exercised via direct put)
    from dexspark.lake import ConcurrentCommitError

    snap = io_.list_dir(root + "/_snapshots")[0]
    with pytest.raises(ConcurrentCommitError):
        io_.put_if_absent(root + "/_snapshots/" + snap, "{}")
