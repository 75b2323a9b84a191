"""Object-store FileIO: the manifest layer over conditional PUT.

``ConditionalPutFileIO`` implements the :class:`~dexspark.lake.FileIO`
seam against any object store exposing an S3-compatible conditional
PUT (``If-None-Match: *`` — the create-if-absent the commit protocol
needs; GCS spells it ``x-goog-if-generation-match: 0``). The store is
injected as a small client object so the table logic never touches an
SDK directly:

    client  duck type (all keys are ``str``, bodies are ``bytes``):
      get_object(key) -> bytes            missing -> ObjectMissing
      put_object(key, body, *, if_none_match=False) -> None
                                          exists + cond -> PreconditionFailed
      delete_object(key) -> None          missing -> ObjectMissing
      list_keys(prefix) -> list[str]      full keys, any order
      head_object(key) -> dict            {"last_modified": float-epoch};
                                          missing -> ObjectMissing

Three clients ship here:

- :class:`FsObjectClient` — a filesystem-backed client with REAL
  conditional-put atomicity (``os.link``), used by the test race
  matrix and usable as a local emulation of the store.
- :class:`Boto3Client` — a thin adapter over boto3's S3 API using
  ``IfNoneMatch="*"`` (supported by S3 since 2024-08, and by MinIO/
  R2/GCS-XML-compat endpoints). Import-gated: the sandbox has no
  boto3, so only the mapping is expressed; the protocol it speaks is
  exactly what FsObjectClient fakes.
- :class:`AzureBlobClient` — azure-storage-blob adapter for the
  reference's actual deployment target (AzureBlobServiceImpl.kt),
  conditional put via ``upload_blob(overwrite=False)`` = Azure's
  ``If-None-Match: *`` ETag condition. Import-gated like Boto3Client;
  the test suite drives the full protocol through a fake honoring
  Azure's status-code semantics (409 BlobAlreadyExists / 412
  ConditionNotMet / 404 BlobNotFound).

Reference analogue: the reference pipeline keeps every artifact on
object storage and routes I/O through one service class
(fns-csv-pipeline AzureBlobServiceImpl.kt:26-48); this module is that
seam, Spark-first: only MANIFESTS flow through it (data files are
written by Spark's own committers), and the one primitive carrying
correctness is the conditional put.

Object-store cost model (why the shapes look like this):
- ``read_text`` is a GET: LakeTable's per-version manifest text cache
  (lake.py MANIFEST_CACHE) makes manifest reads O(1) GETs per
  version per process — test_fileio_condput pins the round-trip
  counts with a counting client.
- ``list_dir`` is a LIST with a prefix; callers only list snapshot /
  refs directories (bounded by retained versions, not data size).
- There are no renames anywhere: object stores have none. Publish is
  a single conditional PUT of an immutable manifest.
"""

from __future__ import annotations

import os
import time
import uuid

from .lake import ConcurrentCommitError, FileIO

__all__ = [
    "ObjectMissing",
    "PreconditionFailed",
    "ConditionalPutFileIO",
    "FsObjectClient",
    "Boto3Client",
    "AzureBlobClient",
]


class ObjectMissing(KeyError):
    """GET/DELETE/HEAD of a key that does not exist (S3 NoSuchKey)."""


class PreconditionFailed(RuntimeError):
    """Conditional PUT lost: the key already exists (HTTP 412)."""


def _key(path: str) -> str:
    """FileIO paths arrive os.path-joined; object keys are /-separated
    with no leading slash.

    Relative paths are REJECTED rather than absolutized: a CWD-derived
    key would bake the process's working directory into object names
    (two processes with different CWDs — or one that chdir's — would
    split a table's history across prefixes with no error), while
    silently keying the relative string would detach manifests from
    the data Spark resolves against the CWD. Absolute paths and
    URI-style roots are unambiguous; use those."""
    if "://" not in path and not os.path.isabs(path):
        raise ValueError(
            f"ConditionalPutFileIO requires an absolute table path "
            f"(got {path!r}): relative roots would key objects by the "
            f"process CWD"
        )
    return path.replace(os.sep, "/").lstrip("/")


class ConditionalPutFileIO(FileIO):
    """Manifest I/O against an injected object-store client.

    A "directory" is a key prefix (object stores have no directories):
    ``list_dir`` returns the immediate children of the prefix,
    ``is_dir`` asks whether any key lives under it, ``remove_tree``
    deletes the prefix's keys. ``put_if_absent`` maps 1:1 onto the
    store's conditional PUT — the atomicity is the STORE's, not built
    from check-then-put, so two racing writers get exactly one winner
    no matter which machines they run on (the property LocalFileIO
    gets from link(2))."""

    def __init__(self, client):
        self.client = client

    def list_dir(self, path: str) -> list[str]:
        p = _key(path).rstrip("/")
        out = set()
        for k in self.client.list_keys(p + "/"):
            rest = k[len(p) + 1 :]
            if rest:
                out.add(rest.split("/", 1)[0])
        return sorted(out)

    def read_text(self, path: str) -> str:
        try:
            return self.client.get_object(_key(path)).decode("utf-8")
        except ObjectMissing:
            raise FileNotFoundError(path) from None

    def put_if_absent(self, path: str, data: str) -> None:
        try:
            self.client.put_object(
                _key(path), data.encode("utf-8"), if_none_match=True
            )
        except PreconditionFailed:
            raise ConcurrentCommitError(f"{path} already exists") from None

    def delete(self, path: str) -> None:
        try:
            self.client.delete_object(_key(path))
        except ObjectMissing:
            raise FileNotFoundError(path) from None

    def mtime(self, path: str) -> float:
        try:
            return float(self.client.head_object(_key(path))["last_modified"])
        except ObjectMissing:
            raise FileNotFoundError(path) from None

    def remove_tree(self, path: str) -> None:
        p = _key(path).rstrip("/")
        for k in list(self.client.list_keys(p + "/")):
            try:
                self.client.delete_object(k)
            except ObjectMissing:
                pass  # racing deleter: tree removal is idempotent

    def is_dir(self, path: str) -> bool:
        p = _key(path).rstrip("/")
        return bool(self.client.list_keys(p + "/"))


class FsObjectClient:
    """Filesystem-backed object-store client.

    Keys map to files under ``root``; conditional PUT is genuinely
    atomic (fsync'd temp + ``os.link`` — EEXIST means 412), so the
    race matrix exercised against LocalFileIO holds bit-for-bit here.
    Unconditional PUT is last-writer-wins via ``os.replace``, matching
    object-store overwrite semantics. Useful both as the test fake and
    as a local emulation of a bucket."""

    def __init__(self, root: str):
        self.root = root

    def _p(self, key: str) -> str:
        return os.path.join(self.root, *key.split("/"))

    def get_object(self, key: str) -> bytes:
        try:
            with open(self._p(key), "rb") as f:
                return f.read()
        except (FileNotFoundError, IsADirectoryError):
            raise ObjectMissing(key) from None

    def put_object(
        self, key: str, body: bytes, *, if_none_match: bool = False
    ) -> None:
        path = self._p(key)
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".put-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(body)
            f.flush()
            os.fsync(f.fileno())
        if not if_none_match:
            os.replace(tmp, path)
            return
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise PreconditionFailed(key) from None
        finally:
            os.unlink(tmp)

    def delete_object(self, key: str) -> None:
        try:
            os.unlink(self._p(key))
        except FileNotFoundError:
            raise ObjectMissing(key) from None

    def list_keys(self, prefix: str) -> list[str]:
        base = self._p(prefix.rstrip("/"))
        if not os.path.isdir(base):
            return []
        out = []
        for dirpath, _dirs, files in os.walk(base):
            for f in files:
                if f.startswith(".put-"):
                    continue  # in-flight temp: not a published object
                full = os.path.join(dirpath, f)
                rel = os.path.relpath(full, self.root)
                out.append(rel.replace(os.sep, "/"))
        return out

    def head_object(self, key: str) -> dict:
        try:
            return {"last_modified": os.path.getmtime(self._p(key))}
        except FileNotFoundError:
            raise ObjectMissing(key) from None


class Boto3Client:
    """boto3 S3 adapter for :class:`ConditionalPutFileIO`.

    Maps the client duck type onto the S3 API, with the conditional
    put expressed as ``IfNoneMatch="*"`` (S3 native since 2024-08;
    MinIO/R2 compatible). Import-gated — construct it only where boto3
    is installed; nothing else in the engine imports boto3."""

    def __init__(self, bucket: str, prefix: str = "", client=None):
        if client is None:  # pragma: no cover - no boto3 in sandbox
            import boto3

            client = boto3.client("s3")
        self.s3 = client
        self.bucket = bucket
        self.prefix = prefix.strip("/")

    def _k(self, key: str) -> str:
        return f"{self.prefix}/{key}" if self.prefix else key

    @staticmethod
    def _code(e) -> str:
        return str(
            getattr(e, "response", {}).get("Error", {}).get("Code", "")
        )

    def _is_missing(self, e) -> bool:
        # ONLY genuine not-found maps to ObjectMissing; throttles,
        # auth and network errors must propagate (a 503 treated as
        # "missing" would make retention skip live snapshots)
        if isinstance(e, self.s3.exceptions.NoSuchKey):
            return True
        return self._code(e) in ("404", "NoSuchKey", "NotFound")

    def get_object(self, key: str) -> bytes:
        try:
            return self.s3.get_object(Bucket=self.bucket, Key=self._k(key))[
                "Body"
            ].read()
        except self.s3.exceptions.NoSuchKey:
            raise ObjectMissing(key) from None

    def put_object(
        self, key: str, body: bytes, *, if_none_match: bool = False
    ) -> None:
        kw = {"Bucket": self.bucket, "Key": self._k(key), "Body": body}
        if if_none_match:
            kw["IfNoneMatch"] = "*"
        try:
            self.s3.put_object(**kw)
        except Exception as e:  # botocore ClientError
            # 412 = the key exists (clean loss). 409
            # ConditionalRequestConflict = another conditional write
            # on the same key is in flight — also a concurrency loss:
            # the caller rebases and retries against the then-current
            # head, which is correct whether the racer won or aborted.
            if self._code(e) in (
                "PreconditionFailed",
                "412",
                "ConditionalRequestConflict",
                "409",
            ):
                raise PreconditionFailed(key) from None
            raise

    def delete_object(self, key: str) -> None:
        # S3 DELETE of a missing key is a 204 no-op; probe first so the
        # FileIO contract (missing -> FileNotFoundError) holds
        try:
            self.s3.head_object(Bucket=self.bucket, Key=self._k(key))
        except Exception as e:
            if self._is_missing(e):
                raise ObjectMissing(key) from None
            raise
        self.s3.delete_object(Bucket=self.bucket, Key=self._k(key))

    def list_keys(self, prefix: str) -> list[str]:
        p = self._k(prefix)
        out = []
        token = None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": p}
            if token:
                kw["ContinuationToken"] = token
            resp = self.s3.list_objects_v2(**kw)
            base = f"{self.prefix}/" if self.prefix else ""
            out.extend(
                o["Key"][len(base):] for o in resp.get("Contents", [])
            )
            if not resp.get("IsTruncated"):
                return out
            token = resp.get("NextContinuationToken")

    def head_object(self, key: str) -> dict:
        try:
            h = self.s3.head_object(Bucket=self.bucket, Key=self._k(key))
        except Exception as e:
            if self._is_missing(e):
                raise ObjectMissing(key) from None
            raise
        lm = h.get("LastModified")
        return {
            "last_modified": lm.timestamp() if lm is not None else time.time()
        }


class AzureBlobClient:
    """azure-storage-blob adapter for :class:`ConditionalPutFileIO` —
    the reference's actual storage target (fns-csv-pipeline routes all
    blob I/O through one Azure service class,
    AzureBlobServiceImpl.kt:26-48).

    Maps the client duck type onto a ``ContainerClient``, with the
    conditional put expressed as ``upload_blob(..., overwrite=False)``
    — the SDK sends ``If-None-Match: *`` under the hood, so the
    atomicity is Azure's ETag machinery, exactly the property the
    commit protocol needs. Error mapping (by status/error code, so no
    azure types are imported here):

      409 ``BlobAlreadyExists`` / 412 ``ConditionNotMet``
          -> :class:`PreconditionFailed` (clean conditional loss)
      404 ``BlobNotFound``/``ResourceNotFound``
          -> :class:`ObjectMissing`
      anything else (throttles, auth, network) propagates — a 503
      treated as "missing" would make retention skip live snapshots.

    Import-gated like :class:`Boto3Client`: construct with an injected
    ``container`` (any object honoring the ContainerClient surface —
    the tests use a fake with Azure status-code semantics) or via
    :meth:`from_connection_string` where the SDK is installed."""

    def __init__(self, container, prefix: str = ""):
        self.container = container
        self.prefix = prefix.strip("/")

    @classmethod
    def from_connection_string(
        cls, conn_str: str, container_name: str, prefix: str = ""
    ):  # pragma: no cover - no azure sdk in sandbox
        from azure.storage.blob import ContainerClient

        return cls(
            ContainerClient.from_connection_string(conn_str, container_name),
            prefix=prefix,
        )

    def _k(self, key: str) -> str:
        return f"{self.prefix}/{key}" if self.prefix else key

    @staticmethod
    def _status(e) -> int | None:
        return getattr(e, "status_code", None)

    @staticmethod
    def _code(e) -> str:
        c = getattr(e, "error_code", None)
        # the SDK's error_code is an enum whose .value is the REST
        # code string ("BlobNotFound"); fakes may use plain strings
        return str(getattr(c, "value", c) or "")

    def _is_missing(self, e) -> bool:
        return self._status(e) == 404 or self._code(e) in (
            "BlobNotFound",
            "ContainerNotFound",
            "ResourceNotFound",
        )

    def _is_condition_lost(self, e) -> bool:
        return self._status(e) in (409, 412) or self._code(e) in (
            "BlobAlreadyExists",
            "ConditionNotMet",
        )

    def get_object(self, key: str) -> bytes:
        try:
            return self.container.download_blob(self._k(key)).readall()
        except Exception as e:
            if self._is_missing(e):
                raise ObjectMissing(key) from None
            raise

    def put_object(
        self, key: str, body: bytes, *, if_none_match: bool = False
    ) -> None:
        try:
            self.container.upload_blob(
                name=self._k(key), data=body, overwrite=not if_none_match
            )
        except Exception as e:
            # conflict mapping ONLY on the conditional path: an
            # overwrite=True 409 (e.g. container being deleted, lease
            # held) is an operational error, not a clean loss
            if if_none_match and self._is_condition_lost(e):
                raise PreconditionFailed(key) from None
            raise

    def delete_object(self, key: str) -> None:
        try:
            self.container.delete_blob(self._k(key))
        except Exception as e:
            if self._is_missing(e):
                raise ObjectMissing(key) from None
            raise

    def list_keys(self, prefix: str) -> list[str]:
        p = self._k(prefix)
        base = f"{self.prefix}/" if self.prefix else ""
        # list_blobs pages internally (the SDK iterator follows
        # continuation tokens), so this is already bounded-memory
        # per page like Boto3Client's explicit loop
        return [
            b.name[len(base):]
            for b in self.container.list_blobs(name_starts_with=p)
        ]

    def head_object(self, key: str) -> dict:
        try:
            props = self.container.get_blob_client(
                self._k(key)
            ).get_blob_properties()
        except Exception as e:
            if self._is_missing(e):
                raise ObjectMissing(key) from None
            raise
        lm = getattr(props, "last_modified", None)
        return {
            "last_modified": lm.timestamp() if lm is not None else time.time()
        }
