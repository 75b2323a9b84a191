"""LakeTable — a minimal bucketed copy-on-write table format.

Iceberg-shaped semantics (atomic snapshot commits, MERGE upsert,
schema evolution, idempotent epoch markers) over plain parquet, because
this sandbox has no Iceberg/Delta runtime jars. The module API is the
one the engine would use against Iceberg (`MERGE INTO t USING batch ON
t.doc_id = batch.doc_id`); swap this file for an Iceberg catalog in
production and nothing upstream changes.

Layout::

    <root>/_snapshots/snap-00000001.json    # versioned manifests
    <root>/data/commit-00000001/_bucket=<b>/part-*.parquet

Design for scale
----------------
* **Key-bucketed copy-on-write.** Rows are hash-bucketed on the merge
  key (``pmod(xxhash64(key), num_buckets)``). A MERGE only rewrites the
  buckets that contain changed keys — at 10^10 rows with, say, 4096
  buckets and a change batch touching 1% of keys, ~99% of data files
  are carried forward untouched in the new snapshot (same idea as
  Iceberg bucket partitioning + storage-partitioned joins).
* **One Spark job per merge, no driver-side row loops.** Survivors are
  computed with a single ``left_anti`` join of the affected-bucket scan
  against the (already per-key-deduped) change batch; AQE picks
  broadcast vs shuffle join and splits skewed partitions.
* **Atomic commit.** Data files are written first; the manifest is
  written to a temp file and ``os.rename``d into place (atomic on
  POSIX). Readers always see a complete snapshot. Mirrors the
  reference's atomic move-to-processed (AzureBlobServiceImpl.kt:26-48)
  and its idempotent id-prefixed output layout (FnDecompressor.kt:94-95).
* **Exactly-once.** Each commit records the change-log epochs it
  applied in the manifest; redelivery of an already-committed epoch is
  a no-op (north_star: "idempotent batch-epoch commit markers").
  Committed epochs are stored COMPACTED as a high watermark plus a
  small out-of-order tail (``epoch_watermark`` = every epoch <= W is
  committed; ``epoch_tail`` = committed epochs > W). A year of
  micro-batches (10^5-10^6 epochs) stays O(1) in both the manifest
  JSON and the engine's already-committed filter predicate — a flat
  epoch list would bloat every plan and every snapshot.

Reference parity notes: the 3-state blob lifecycle ingest->processed|
error (dtos/ConnectionNames.kt:14-18) maps to change-log -> LakeTable |
quarantine table.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .schema import SchemaEvolutionError, evolution_actions, reconcile

_SNAP_DIR = "_snapshots"
_DATA_DIR = "data"
_REFS_DIR = "_refs"
_TOMBSTONE = "_tombstone"  # MOR delete marker column inside commit files


class ConcurrentCommitError(RuntimeError):
    pass


def _json_scalar(v) -> bool:
    """True iff ``v`` round-trips through the JSON manifest with its
    ordering intact (zone-map bounds must survive serialization)."""
    return isinstance(v, (str, int)) and not isinstance(v, bool)


class FileIO:
    """Manifest/metadata I/O seam (the Iceberg ``FileIO`` idea).

    LakeTable routes every non-Spark filesystem operation through this
    interface, so the local-FS implementation below can be swapped for
    an object store without touching table logic. The one primitive
    that carries the correctness load is :meth:`put_if_absent` — the
    optimistic-concurrency commit. Object-store strategy: S3
    conditional PUT (``If-None-Match: *``) or a catalog pointer with
    compare-and-swap (the Iceberg catalog approach); GCS
    ``x-goog-if-generation-match: 0``. Everything else is plain
    list/read/delete.
    """

    def list_dir(self, path: str) -> list[str]:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def put_if_absent(self, path: str, data: str) -> None:
        """Durably create ``path`` with ``data`` iff it does not exist;
        raise :class:`ConcurrentCommitError` if it does (atomically —
        two racing writers must not both succeed)."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        raise NotImplementedError

    def remove_tree(self, path: str) -> None:
        raise NotImplementedError

    def is_dir(self, path: str) -> bool:
        raise NotImplementedError


class LocalFileIO(FileIO):
    """POSIX implementation. ``put_if_absent`` uses ``os.link`` of a
    fsynced temp file — link(2) fails with EEXIST if the target exists,
    making create-if-absent ATOMIC (no check-then-rename window)."""

    def list_dir(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return sorted(os.listdir(path))

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def put_if_absent(self, path: str, data: str) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise ConcurrentCommitError(f"{path} already exists") from None
        finally:
            os.unlink(tmp)

    def delete(self, path: str) -> None:
        os.unlink(path)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def remove_tree(self, path: str) -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)


def default_io() -> FileIO:
    """FileIO used when a table is opened without an explicit ``io``.

    Selected by ``DEXSPARK_FILEIO``:

    - unset / ``local`` — :class:`LocalFileIO` (POSIX link(2) commit).
    - ``condput`` — :class:`~dexspark.fileio.ConditionalPutFileIO`
      over a filesystem-backed object client rooted at
      ``DEXSPARK_FILEIO_ROOT`` (default ``/``): every manifest
      operation goes through object-store semantics (GET/LIST/
      conditional PUT, no renames). This is how the full lake test
      suite runs against the object-store code path.
    - ``s3://bucket[/prefix]`` — the boto3 adapter speaking S3
      conditional PUT (requires boto3 at runtime).
    """
    spec = os.environ.get("DEXSPARK_FILEIO", "local")
    if spec in ("", "local"):
        return LocalFileIO()
    from . import fileio as fio  # local import: fileio imports lake

    if spec == "condput":
        root = os.environ.get("DEXSPARK_FILEIO_ROOT", "/")
        return fio.ConditionalPutFileIO(fio.FsObjectClient(root))
    if spec.startswith("s3://"):
        rest = spec[5:]
        bucket, _, prefix = rest.partition("/")
        return fio.ConditionalPutFileIO(fio.Boto3Client(bucket, prefix))
    raise ValueError(f"unknown DEXSPARK_FILEIO: {spec!r}")


class LakeTable:
    # Per-instance manifest text cache size. Snapshot manifests are
    # immutable once published (a version is written exactly once via
    # conditional put), so caching their TEXT by version is always
    # safe; 64 covers the working set of any read/merge/rebase path
    # while bounding memory on 10^6-trigger streams.
    MANIFEST_CACHE = 64

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        io: FileIO | None = None,
        branch: str | None = None,
    ):
        """``branch``: operate on a named branch (see
        :meth:`create_branch`) instead of main. Branch snapshots live
        in their own namespace (``_snapshots/branch-<name>/``) but
        share the table's data directory, so staging a batch on a
        branch writes each byte once and publishing is manifest-only."""
        self.spark = spark
        self.root = root
        self.io = io or default_io()
        self.branch = branch
        if branch is None:
            self._fork_version = 0
        else:
            ref = json.loads(self.io.read_text(self._branch_ref_path(branch)))
            self._fork_version = int(ref["fork_version"])
        from collections import OrderedDict

        self._mcache: "OrderedDict[int, str]" = OrderedDict()

    # ------------------------------------------------------------ manifest

    def _branch_ref_path(self, name: str) -> str:
        return os.path.join(self.root, _REFS_DIR, f"branch-{name}.json")

    def _branch_snap_dir(self, name: str) -> str:
        return os.path.join(self.root, _SNAP_DIR, f"branch-{name}")

    def _snap_path(self, version: int) -> str:
        # versions <= the fork point resolve to MAIN's chain: a branch
        # shares its ancestry with main rather than copying it
        if self.branch is not None and version > self._fork_version:
            return os.path.join(
                self._branch_snap_dir(self.branch), f"snap-{version:08d}.json"
            )
        return os.path.join(self.root, _SNAP_DIR, f"snap-{version:08d}.json")

    def current_version(self) -> int:
        if self.branch is not None:
            d = self._branch_snap_dir(self.branch)
            versions = [
                int(n[5:13])
                for n in self.io.list_dir(d)
                if n.startswith("snap-") and n.endswith(".json")
            ]
            # an empty branch's head IS the fork point (read-through)
            return max(versions, default=self._fork_version)
        d = os.path.join(self.root, _SNAP_DIR)
        versions = [
            int(n[5:13])
            for n in self.io.list_dir(d)
            if n.startswith("snap-") and n.endswith(".json")
        ]
        return max(versions, default=0)

    def manifest(self, version: int | None = None) -> dict:
        """Parsed snapshot manifest (default: current).

        The manifest TEXT is cached per version — manifests are
        immutable once their conditional put wins, so a version read
        once never needs another FileIO round trip (on an object
        store every property access would otherwise be a GET; a
        stream batch touches key/num_buckets/schema/epochs several
        times). Parsing stays per-call: writers mutate the returned
        dict when building the next manifest, so handing out a shared
        parsed object would let one caller corrupt another's view."""
        if isinstance(version, str):
            version = self.ref_version(version)
        v = self.current_version() if version is None else version
        if v == 0:
            raise FileNotFoundError(f"no snapshot at {self.root}")
        text = self._mcache.get(v)
        if text is None:
            text = self.io.read_text(self._snap_path(v))
            self._mcache[v] = text
            if len(self._mcache) > self.MANIFEST_CACHE:
                self._mcache.popitem(last=False)
        else:
            self._mcache.move_to_end(v)
        return json.loads(text)

    def _commit(self, manifest: dict) -> int:
        """Atomically publish ``manifest`` as the next snapshot
        (conditional put: exactly one writer wins a version)."""
        version = manifest["version"]
        self.io.put_if_absent(self._snap_path(version), json.dumps(manifest))
        return version

    @staticmethod
    def _next_version(base: dict) -> int:
        """Allocate the next snapshot version: one past the manifest's
        VERSION HIGH-WATER MARK, not necessarily version+1. A branch
        publish references data dirs whose names carry branch-local
        version numbers that can run AHEAD of main's head; allocating
        below the hwm would let a later commit reuse one of those
        numbers inside the same bucket and scramble the MOR merge
        order. Version numbers are therefore unique but not dense;
        every writer derives the same next number from the same head,
        so the conditional put still serializes racers."""
        return max(int(base["version"]), int(base.get("version_hwm", 0))) + 1

    # Optimistic-concurrency retry budget (the Iceberg commit.retry
    # idea): how many times a merge that lost the conditional-put race
    # re-reads the latest snapshot and rebases its manifest before
    # giving up. Each retry costs one JSON read + one conditional put
    # — data files are never rewritten.
    COMMIT_RETRIES = 3

    def _publish_with_rebase(self, parent: int, touched, rebuild) -> dict:
        """Commit ``rebuild(parent_manifest)``; on losing the
        optimistic race, rebase onto the latest snapshot when every
        intervening commit is provably non-conflicting, else raise
        :class:`ConcurrentCommitError`.

        Bucket-level conflict detection (snapshot isolation, the
        Iceberg ``commit.retry`` + validation idea — at cluster scale
        the stream tailer races the compact/vacuum maintenance crons,
        and without this the loser throws away a fully-written batch):

        * ``compact`` and ``merge-noop`` interveners are state-identity
          for every bucket: always safe to rebase over.
        * ``merge-cow``/``merge-mor`` interveners are safe iff their
          ``touched`` bucket set is disjoint from ours — our rewrite/
          append was computed against a state of our buckets that is
          still current.
        * ``rebucket``/``overwrite`` (and legacy commits without a
          ``touched`` field) invalidate the written files: raise, the
          caller must re-run the merge.

        ``rebuild(base)`` returns a manifest built on ``base``,
        re-applying the caller's bucket deltas and epoch state; the
        first attempt is ``rebuild(manifest(parent))`` so all manifest
        construction lives in one place."""
        ours = set(touched)
        mm = rebuild(self.manifest(parent))
        for attempt in range(self.COMMIT_RETRIES + 1):
            try:
                self._commit(mm)
                return mm
            except ConcurrentCommitError:
                if attempt == self.COMMIT_RETRIES:
                    raise
                latest = self.manifest()
                # walk PARENT pointers, not a dense range: versions are
                # unique but not contiguous (publish raises the hwm)
                interveners = []
                v = latest["version"]
                while v > parent:
                    try:
                        mi = self.manifest(v)
                    except FileNotFoundError:
                        raise ConcurrentCommitError(
                            f"cannot rebase: intervening snapshot {v} expired"
                        ) from None
                    interveners.append(mi)
                    v = int(mi.get("parent", v - 1))
                for mi in interveners:
                    op = mi.get("operation", "")
                    # state-identity commits for every bucket's DATA:
                    # compact rewrites content-equal files, noop and
                    # alter-properties touch only manifest metadata
                    if op in ("compact", "merge-noop", "alter-properties"):
                        continue
                    t = mi.get("touched")
                    # a branch publish records exactly the buckets it
                    # overlaid, so like a merge it is safe to rebase
                    # over iff those buckets are disjoint from ours
                    if (
                        (op.startswith("merge-") or op == "publish")
                        and t is not None
                        and ours.isdisjoint(str(b) for b in t)
                    ):
                        continue
                    raise ConcurrentCommitError(
                        f"cannot rebase merge over v{mi['version']} "
                        f"({op or 'unknown'}: bucket conflict or table-wide rewrite)"
                    ) from None
                parent = latest["version"]
                mm = rebuild(latest)
        raise AssertionError("unreachable")

    @staticmethod
    def _map_commit_version(
        cv: dict, written: dict, logical: int, buckets: dict | None = None
    ) -> dict:
        """Record ``logical`` as the commit version of ``written``'s
        data dir when the dir NAME encodes a different (race-lost)
        version — readers resolve merge order through this map. Entries
        for dirs no longer referenced by ``buckets`` are dropped so the
        map stays O(live rebased commits), which is O(races), not
        O(history)."""
        out = dict(cv)
        for files in written.values():
            d = files[0].split("/")[1]
            if int(d.split("-")[1]) != logical:
                out[d] = logical
            break
        if buckets is not None and out:
            live = {rel.split("/")[1] for fs in buckets.values() for rel in fs}
            out = {d: v for d, v in out.items() if d in live}
        return out

    def _noop_manifest(self, base: dict, epochs) -> dict:
        """Manifest-only commit recording ``epochs`` (empty change
        batch): no data changes, so it rebases over anything."""
        mm = dict(base)
        mm.pop("committed_epochs", None)
        nv = self._next_version(base)
        mm.update(
            version=nv,
            version_hwm=nv,
            parent=base["version"],
            operation="merge-noop",
            touched=[],
            **self._next_epoch_state(base, epochs),
        )
        return mm

    # ------------------------------------------------------------ properties

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.manifest()["schema"])

    @property
    def key(self) -> str:
        return self.manifest()["key"]

    @property
    def num_buckets(self) -> int:
        return self.manifest()["num_buckets"]

    @staticmethod
    def _compact_epochs(watermark: int, epochs) -> tuple[int, list[int]]:
        """Fold ``epochs`` into (watermark, tail): advance the watermark
        through contiguous epochs, keep out-of-order stragglers in the
        (small, bounded-by-reordering) tail."""
        tail = {int(e) for e in epochs if int(e) > watermark}
        while watermark + 1 in tail:
            watermark += 1
            tail.discard(watermark)
        return watermark, sorted(tail)

    def _next_epoch_state(self, m: dict, epochs) -> dict:
        """Manifest epoch fields after committing ``epochs``.

        Epoch spaces need not start at 0 (Kafka offsets,
        timestamp-derived epochs): the FIRST commit with epochs seeds
        the watermark base at ``min(epochs) - 1``, so the watermark can
        advance contiguously from wherever the producer's numbering
        begins — otherwise a stream starting at offset 10^9 would pin
        the watermark at -1 forever and grow the tail unboundedly,
        reintroducing the O(#epochs) manifest bloat this compaction
        exists to remove.

        The base is a compaction ANCHOR, not a correctness contract:
        the committed set is exactly ``(base, watermark] | tail``, and
        the tail may hold stragglers on EITHER side — above the
        watermark (a gap not yet filled) or at/below the base (an
        out-of-order epoch the source delivered AFTER the seeding
        batch, e.g. maxFilesPerTrigger picking up files out of epoch
        order). Below-base stragglers shrink the base through
        contiguous entries, so state stays O(reordering window)."""
        w, tail = self._epoch_state_of(m)
        base = int(m.get("epoch_base", -1))
        new = sorted(int(e) for e in (epochs or []))
        # seed iff NOTHING has ever been committed (an epoch-less
        # initial overwrite must not pin the base at -1)
        if w == -1 and not tail and base == -1 and new:
            base = new[0] - 1
            w = base
        folded = set(tail) | set(new)
        # epochs in (base, w] are already committed (idempotent
        # re-commit); epochs <= base are genuine below-base stragglers
        low = {int(e) for e in folded if int(e) <= base}
        w, hi_tail = self._compact_epochs(w, {e for e in folded if e > base})
        while base in low:
            low.discard(base)
            base -= 1
        tail = sorted(set(hi_tail) | low)
        return {"epoch_watermark": w, "epoch_tail": tail, "epoch_base": base}

    @staticmethod
    def _epoch_state_of(m: dict) -> tuple[int, list[int]]:
        if "epoch_watermark" in m:
            return int(m["epoch_watermark"]), list(m.get("epoch_tail", []))
        # legacy manifests carried a flat committed_epochs list
        return LakeTable._compact_epochs(-1, m.get("committed_epochs", []))

    def epoch_state(self) -> tuple[int, list[int]]:
        """(watermark, tail): every epoch in ``(epoch_base, watermark]``
        is committed, plus the out-of-order committed epochs in
        ``tail`` (either side of that range). O(1)-sized regardless of
        how many epochs the table has ever applied."""
        return self._epoch_state_of(self.manifest())

    def epoch_base(self) -> int:
        """Seeded watermark base: epochs <= base are NOT committed
        (they are either from before the stream started, or out-of-
        order stragglers that will land in the tail when committed)."""
        return int(self.manifest().get("epoch_base", -1))

    def committed_epochs(self) -> set[int]:
        """Materialized committed-epoch set (test/CLI convenience —
        O(#epochs); hot paths use ``epoch_state`` instead). Starts at
        the seeded base for non-zero-based epoch spaces."""
        m = self.manifest()
        w, tail = self._epoch_state_of(m)
        base = int(m.get("epoch_base", -1))
        return set(range(base + 1, w + 1)) | set(tail)

    def is_epoch_committed(self, epoch: int) -> bool:
        m = self.manifest()
        w, tail = self._epoch_state_of(m)
        base = int(m.get("epoch_base", -1))
        return base < epoch <= w or epoch in tail

    # ------------------------------------------------------- MOR state

    @staticmethod
    def _mor_buckets_of(m: dict) -> dict[str, int]:
        """Per-bucket merge-on-read delta depth: bucket id (string, the
        ``buckets`` key space) -> number of un-compacted MOR commits
        whose files that bucket still carries. Buckets absent from the
        map are CLEAN (exactly one row per key across their files) and
        read shuffle-free. Legacy manifests recorded only a table-wide
        ``mor`` flag + depth; for those, every bucket is conservatively
        treated as MOR at the recorded depth."""
        if "mor_buckets" in m:
            return {str(b): int(d) for b, d in m["mor_buckets"].items()}
        if m.get("mor"):
            d = int(m.get("mor_depth", 1)) or 1
            return {b: d for b in m.get("buckets", {})}
        return {}

    def mor_buckets(self) -> dict[str, int]:
        """Current per-bucket MOR depth (empty when fully compacted)."""
        return self._mor_buckets_of(self.manifest())

    # ------------------------------------------------------------ create

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key: str = "doc_id",
        num_buckets: int = 16,
        properties: dict | None = None,
        io: FileIO | None = None,
    ) -> "LakeTable":
        t = cls(spark, root, io=io)
        if t.current_version() != 0:
            raise FileExistsError(f"table already exists at {root}")
        t._commit(
            {
                "version": 1,
                "parent": 0,
                "operation": "create",
                "key": key,
                "num_buckets": num_buckets,
                "schema": schema.jsonValue(),
                "buckets": {},
                "file_bounds": {},
                "file_rows": {},
                "epoch_watermark": -1,
                "epoch_tail": [],
                "properties": properties or {},
                "evolution": [],
            }
        )
        return t

    # ------------------------------------------------------------ read

    def _bucket_col(self, df: DataFrame, key: str, n: int) -> DataFrame:
        return df.withColumn("_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n)).cast("int"))

    # ------------------------------------------- column identity (renames)
    # Iceberg tracks columns by FIELD ID so renames are metadata-only
    # and a re-added name never resurrects dropped data. The manifest
    # equivalent here is ``columns_meta``:
    #   {canonical_name: {"added_at": version, "aliases": [old names]}}
    # Absent entries mean added_at=0 / no aliases (legacy manifests
    # read unchanged). ``aliases`` resolve a column's FORMER names in
    # old data files (and in stale producers' frames); ``added_at``
    # suppresses same-named bytes in files written before the column's
    # identity existed (the drop-then-re-add case).

    @staticmethod
    def _aliases_of(m: dict) -> dict[str, str]:
        """lowercased former name -> canonical current name."""
        out: dict[str, str] = {}
        for name, e in (m.get("columns_meta") or {}).items():
            for a in e.get("aliases", []):
                out[a.lower()] = name
        return out

    @staticmethod
    def _columns_meta_after(
        base: dict, schema2: T.StructType, logical: int
    ) -> dict:
        """columns_meta after an additive evolution at ``logical``:
        brand-new columns get added_at=logical (files from earlier
        commits must null-fill them even if same-named bytes exist)."""
        cm = {k: dict(v) for k, v in (base.get("columns_meta") or {}).items()}
        old_names = {f.name for f in T.StructType.fromJson(base["schema"]).fields}
        for f in schema2.fields:
            if f.name not in old_names and f.name not in cm:
                cm[f.name] = {"added_at": logical, "aliases": []}
        return cm

    def _align(
        self,
        df: DataFrame,
        schema: T.StructType,
        aliases: dict[str, str] | None = None,
        cmeta: dict | None = None,
        file_version: int | None = None,
    ) -> DataFrame:
        """Project ``df`` to ``schema``: cast matching columns (int
        widening), null-fill missing ones (additive evolution).
        Matching is case-insensitive like Spark's own column resolution
        (and schema.reconcile): a case-variant incoming column must
        align onto the canonical table column, not be null-filled.

        ``aliases`` additionally resolve a renamed column's former
        names. ``file_version`` (the logical commit version the rows
        were written at) with ``cmeta`` suppresses columns whose
        identity postdates the file — a column dropped and re-added
        must read null from pre-re-add files even though the bytes are
        still there (Iceberg field-id semantics)."""
        cols = []
        have = {f.name.lower(): f.name for f in df.schema.fields}
        for f in schema.fields:
            src = have.get(f.name.lower())
            if src is None and aliases:
                for a_l, canon in aliases.items():
                    if canon == f.name and a_l in have:
                        src = have[a_l]
                        break
            added = ((cmeta or {}).get(f.name) or {}).get("added_at", 0)
            if src is not None and not (
                file_version is not None and added > file_version
            ):
                # F.col resolves case-insensitively under the default
                # spark.sql.caseSensitive=false
                cols.append(F.col(src).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(*cols)

    @staticmethod
    def _may_contain(bounds, lo, hi) -> bool:
        """Zone-map test: can a file with key ``bounds`` hold a key in
        [lo, hi]? Missing/invalid bounds conservatively keep the file."""
        if not bounds:
            return True
        try:
            mn, mx = bounds
            return not (hi < mn or lo > mx)
        except TypeError:  # cross-type comparison (e.g. post-widening)
            return True

    def read(
        self,
        buckets: list[int] | None = None,
        version: int | str | None = None,
        key_range: tuple | None = None,
    ) -> DataFrame:
        """Snapshot as a DataFrame (optionally bucket-pruned).

        ``version`` time-travels to an earlier snapshot: manifests are
        immutable and data files are content-addressed per commit, so
        any retained version reads exactly as it was (Iceberg
        ``VERSION AS OF``). A string is resolved as a tag name
        (:meth:`tag` — the pinned-dataset provenance read). Default:
        current.

        Files are grouped by commit (a commit's files share one schema)
        and each group is aligned to the table schema — this is how old
        int32 files coexist with a widened int64 column.

        Copy-on-write snapshots read shuffle-free (pure union of
        aligned scans). Buckets carrying merge-on-read deltas
        (``mor_buckets`` in the manifest, tracked PER BUCKET) are
        reconstructed: per key, the row from the LATEST commit wins,
        and tombstone rows (MOR deletes) drop the key — one keyed
        aggregate over ONLY those buckets' files. Clean buckets join
        the result through the shuffle-free union path, so at 10^10
        rows a day of MOR merges touching 1% of buckets costs a
        reconstruction shuffle of 1% of the table, not all of it.
        ``compact()`` folds MOR history back into plain files.

        ``key_range=(lo, hi)`` additionally drops files whose manifest
        zone map (``file_bounds``, see :meth:`_file_bounds_of`)
        excludes every key in [lo, hi] — driver-side, before Spark
        sees a path. Safe under MOR: any file holding a row (upsert OR
        tombstone) for an in-range key has that key inside its bounds,
        so every file relevant to an in-range key survives pruning and
        the per-key reconstruction over pruned files is exact for
        in-range keys. Callers still row-filter (pruning is per-file);
        out-of-range keys may surface with stale winners and MUST be
        filtered, as :meth:`lookup` / :meth:`scan_range` do."""
        m = self.manifest(version)
        schema = T.StructType.fromJson(m["schema"])
        file_lists = m["buckets"]
        wanted = {str(b) for b in buckets} if buckets is not None else None
        fb = m.get("file_bounds", {}) if key_range is not None else {}
        mor_b = self._mor_buckets_of(m)
        by_commit: dict[str, list[str]] = {}  # MOR buckets' files
        clean_by_commit: dict[str, list[str]] = {}  # clean buckets' files
        for b, files in file_lists.items():
            if wanted is not None and b not in wanted:
                continue
            target = by_commit if b in mor_b else clean_by_commit
            for rel in files:
                if key_range is not None and not self._may_contain(
                    fb.get(rel), *key_range
                ):
                    continue
                commit = rel.split("/")[1]  # data/commit-XXXX/...
                target.setdefault(commit, []).append(os.path.join(self.root, rel))
        if not by_commit and not clean_by_commit:
            return self.spark.createDataFrame([], schema)
        al, cm = self._aliases_of(m), m.get("columns_meta") or {}
        clean = None
        if clean_by_commit:
            parts = [
                self._align(
                    self.spark.read.parquet(*files),
                    schema,
                    aliases=al,
                    cmeta=cm,
                    file_version=self._dir_version(m, commit),
                )
                for commit, files in clean_by_commit.items()
            ]
            clean = parts[0]
            for p in parts[1:]:
                clean = clean.unionByName(p)
        if not by_commit:
            return clean
        # merge-on-read reconstruction, over ONLY the MOR buckets
        key = m["key"]
        schema_t = T.StructType(
            list(schema.fields) + [T.StructField(_TOMBSTONE, T.BooleanType(), True)]
        )
        parts = []
        # A rebased commit's dir NAME carries the version it lost the
        # optimistic race at; the manifest's commit_versions map holds
        # its true (logical) commit order.
        for commit, files in by_commit.items():
            df = self.spark.read.parquet(*files)
            tomb = (
                F.coalesce(F.col(_TOMBSTONE), F.lit(False))
                if _TOMBSTONE in df.columns
                else F.lit(False)
            )
            version = self._dir_version(m, commit)
            parts.append(
                self._align(
                    df.withColumn(_TOMBSTONE, tomb),
                    schema_t,
                    aliases=al,
                    cmeta=cm,
                    file_version=version,
                )
                .withColumn("_commit", F.lit(version))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        data_cols = [f.name for f in schema.fields]
        # Tie-break within one commit: a key appearing in BOTH upserts
        # and delete_keys of the same _merge_mor batch yields an upsert
        # row and a tombstone with the same _commit. Order by
        # (commit, NOT tombstone) so the upsert deterministically wins
        # — matching the COW merge, where the upsert survives because
        # deletes only drop rows absent from the upsert set.
        winner = F.max_by(
            F.struct(*data_cols, _TOMBSTONE),
            F.struct(F.col("_commit"), ~F.col(_TOMBSTONE)),
        ).alias("_w")
        recon = (
            out.groupBy(key)
            .agg(winner)
            .filter(~F.col(f"_w.{_TOMBSTONE}"))
            .select(*[F.col(f"_w.{c}").alias(c) for c in data_cols])
        )
        # keys are bucket-disjoint (bucket = hash(key) mod n), so the
        # clean-bucket union and the MOR reconstruction never overlap
        return recon if clean is None else clean.unionByName(recon)

    def lookup(self, value) -> DataFrame:
        """Point read by merge key: O(1/num_buckets) of the table.

        Computes the key's bucket with the SAME JVM expression the
        writer uses (a one-row Spark job — never a reimplementation of
        xxhash64 in Python, which could silently diverge), prunes the
        snapshot to that bucket, and filters. Catalyst pushes the
        equality through the MOR reconstruction aggregate (a filter on
        the grouping key) and the union down to the parquet scans,
        where row-group stats — and the key bloom filter, when the
        table carries the ``bloom_filter_key`` property — skip the
        files that cannot contain it. At 4096 buckets + blooms a point
        read touches a handful of row groups out of 10^10 rows.
        """
        return self.lookup_many([value])

    def lookup_many(self, values) -> DataFrame:
        """Batched point read: current rows whose key is in ``values``.

        The probe primitive for batch-vs-index workloads (a
        micro-batch checking itself against a persisted dedup/ANN
        index): ONE job computes every probe key's bucket with the
        writer's own JVM expression, the snapshot is pruned to exactly
        those buckets plus the probe set's [min, max] zone-map window,
        and the row filter keeps only the probed keys. Cost scales
        with |values| x (table fraction per bucket), independent of
        corpus size — never a full index scan per batch.

        ``values`` must be driver-sized (a batch's key set, not a
        table). Small sets filter via ``isin`` (pushed to parquet
        row-group stats + the key bloom filter when the table carries
        ``bloom_filter_key``); large sets switch to a broadcast
        semi-join to keep the filter expression tree bounded.
        """
        key = self.key
        vals = list(dict.fromkeys(values))  # dedupe, keep determinism
        if not vals:
            return self.read(buckets=[])
        key_type = next(f.dataType for f in self.schema.fields if f.name == key)
        probe = self.spark.createDataFrame(
            [(v,) for v in vals], T.StructType([T.StructField(key, key_type, False)])
        )
        nb = self.num_buckets
        buckets = sorted(
            r["b"]
            for r in probe.select(
                F.pmod(F.xxhash64(F.col(key).cast(key_type)), F.lit(nb))
                .cast("int")
                .alias("b")
            )
            .distinct()
            .collect()
        )
        rng = None
        if all(_json_scalar(v) and v is not None for v in vals):
            try:
                rng = (min(vals), max(vals))
            except TypeError:  # mixed types — skip zone-map pruning
                rng = None
        snap = self.read(buckets=buckets, key_range=rng)
        if len(vals) <= 256:
            return snap.filter(F.col(key).isin(vals))
        return snap.join(F.broadcast(probe), key, "left_semi")

    def probe(self, keys: DataFrame) -> DataFrame:
        """Distributed batched point read: current rows whose key
        appears in the single-column DataFrame ``keys``.

        The fully distributed sibling of :meth:`lookup_many`: the key
        set never materializes on the driver as rows. ONE bounded
        collect fetches the probe's distinct bucket ids plus its
        [min, max] key window (≤ ``num_buckets`` ints + 2 scalars —
        independent of probe size), the snapshot read is pruned to
        those buckets and that zone-map window, and the row filter is
        a broadcast LEFT SEMI join against the (deduplicated) keys.
        Cost scales with the probed buckets' data, never the corpus —
        the micro-batch-vs-index probe shape (band posting lists, ANN
        cells) at any batch size.
        """
        key = self.key
        key_type = next(f.dataType for f in self.schema.fields if f.name == key)
        kdf = (
            keys.toDF(key)
            .filter(F.col(key).isNotNull())
            .select(F.col(key).cast(key_type))
            .distinct()
        )
        stats = kdf.agg(
            F.collect_set(
                F.pmod(F.xxhash64(F.col(key)), F.lit(self.num_buckets)).cast("int")
            ).alias("bs"),
            F.min(key).alias("lo"),
            F.max(key).alias("hi"),
        ).collect()[0]
        if not stats["bs"]:
            return self.read(buckets=[])
        rng = None
        if _json_scalar(stats["lo"]) and stats["lo"] is not None:
            rng = (stats["lo"], stats["hi"])
        snap = self.read(buckets=sorted(stats["bs"]), key_range=rng)
        return snap.join(F.broadcast(kdf), key, "left_semi")

    def scan_range(self, lo, hi) -> DataFrame:
        """Key-range scan: all current rows with ``lo <= key <= hi``.

        File pruning happens at the driver from the manifest zone maps
        alone (no bucket pruning applies — hash bucketing scatters a
        key range across all buckets) — with ``sort_on_write`` each
        file covers a narrow key slice, so a narrow range touches a
        small, history-depth-bound set of files out of the whole
        table. Row-group stats then prune within the survivors."""
        rng = (lo, hi) if _json_scalar(lo) and _json_scalar(hi) else None
        return self.read(key_range=rng).filter(F.col(self.key).between(lo, hi))

    # ------------------------------------------------------------ write

    def _write_commit(
        self,
        df: DataFrame,
        version: int,
        n_buckets: int | None = None,
        clustered: bool = False,
    ) -> dict[str, list[str]]:
        """Write ``df`` (which must carry ``_bucket``) under a fresh
        commit dir, one directory per bucket; return bucket -> relpaths.

        The dir name carries a per-attempt nonce: a writer that crashed
        after writing data but before publishing its manifest leaves
        only orphaned files — it can never collide with (and block) a
        later attempt at the same version, and the optimistic manifest
        commit still decides the single winner."""
        commit_rel = os.path.join(
            _DATA_DIR, f"commit-{version:08d}-{uuid.uuid4().hex[:8]}"
        )
        commit_dir = os.path.join(self.root, commit_rel)
        # partitionBy gives parallel per-bucket files; repartition by
        # bucket first so each task writes few buckets (fewer small
        # files). The partition count is EXPLICIT (one per bucket):
        # with a bare repartition(col), AQE coalesces the small write
        # shuffle to ~output_bytes/64MB tasks, serializing the write at
        # bench scale (measured flat ~2.5s at any core count).
        # ``clustered=True`` skips the exchange: the caller asserts the
        # input is already bucket-clustered (a map-only transform of
        # per-bucket files — rewrite_payload), so shuffling the whole
        # table again would be pure waste; each task's rows span few
        # buckets and partitionBy's own per-task sort splits them.
        if clustered:
            data = df
        else:
            data = df.repartition(n_buckets or self.num_buckets, "_bucket")
        # Optional sort-on-write (table property, the Iceberg
        # write.sort-order idea): order rows by the merge key INSIDE
        # each bucket task so every parquet row group covers a narrow
        # key range. lookup() then skips non-matching row groups on
        # min/max stats alone — the zero-overhead complement to the
        # bloom option (blooms cost file size; sorting costs one
        # in-task sort of an already-bucket-sized partition).
        # _bucket must LEAD the sort: FileFormatWriter requires rows
        # ordered by the partitionBy columns and inserts its own
        # per-task sort on _bucket alone when the child ordering
        # doesn't satisfy that — which would destroy the key order.
        # Sorting (_bucket, key) satisfies the writer's requirement,
        # so it keeps our ordering and adds no extra sort.
        m = self.manifest() if self.current_version() else {}
        props = m.get("properties", {}) or {}
        if props.get("sort_on_write"):
            data = data.sortWithinPartitions("_bucket", m["key"])
        writer = data.write.partitionBy("_bucket")
        # Optional per-file bloom filter on the merge key (table
        # property): at 10^10 rows, lookup() prunes to one bucket
        # (1/num_buckets of the files) and the bloom then skips the
        # row groups inside that bucket that cannot contain the key —
        # the point-read path without any external index. ~1.2 bits/
        # key of extra file size at the default ndv.
        if props.get("bloom_filter_key"):
            key = m["key"]
            ndv = int(props.get("bloom_filter_ndv", 1_000_000))
            writer = writer.option(
                f"parquet.bloom.filter.enabled#{key}", "true"
            ).option(f"parquet.bloom.filter.expected.ndv#{key}", str(ndv))
        writer.parquet(commit_dir)
        out: dict[str, list[str]] = {}
        for entry in self.io.list_dir(commit_dir):
            if not entry.startswith("_bucket="):
                continue
            b = entry.split("=", 1)[1]
            files = [
                os.path.join(commit_rel, entry, f)
                for f in self.io.list_dir(os.path.join(commit_dir, entry))
                if f.endswith(".parquet")
            ]
            if files:
                out[b] = files
        return out

    # --------------------------------------------------- zone maps

    def _file_bounds_of(self, written: dict[str, list[str]]) -> dict[str, list]:
        """Per-file ``[min, max]`` of the merge key for just-written
        files, read from the parquet FOOTERS (driver-side, one small
        metadata read per file) — Iceberg's per-file column bounds in
        the manifest. No data is scanned and no Spark job runs.

        Readers use these as zone maps: :meth:`lookup` and
        :meth:`scan_range` drop whole files at the driver, BEFORE
        Spark lists or opens them — at 10^10 rows with deep
        merge-on-read history, a point read prunes to one bucket
        (hash), then to the handful of commits whose key range covers
        the value (bounds), then to matching row groups (parquet
        stats / bloom). With ``sort_on_write`` each file covers a
        narrow key range, making the bounds maximally selective.

        Files whose footer lacks key statistics are simply omitted
        (readers treat missing bounds as "may contain anything").
        An object-store FileIO would fetch footers with ranged GETs;
        the cost stays O(files-written) per commit either way.
        Disable with table property ``zone_maps: false``.

        The SAME footer pass also harvests per-file ROW COUNTS
        (``file_rows``, the Iceberg ``record_count`` manifest stat) —
        zero extra I/O — feeding :meth:`stats`: an exact ``count(*)``
        for clean tables costs one manifest read, no Spark job.
        Returns ``(bounds, rows)``."""
        rows: dict[str, int] = {}
        try:
            import pyarrow.parquet as pq
        except ImportError:  # pragma: no cover
            return {}, rows
        m = self.manifest() if self.current_version() else {}
        zone_maps = (m.get("properties") or {}).get("zone_maps") is not False
        key = m.get("key")
        out: dict[str, list] = {}
        for files in written.values():
            for rel in files:
                try:
                    md = pq.ParquetFile(os.path.join(self.root, rel)).metadata
                    rows[rel] = md.num_rows
                    if not zone_maps:
                        continue
                    idx = next(
                        i
                        for i in range(md.num_columns)
                        if md.schema.column(i).name == key
                    )
                    mn = mx = None
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            raise StopIteration
                        mn = st.min if mn is None else min(mn, st.min)
                        mx = st.max if mx is None else max(mx, st.max)
                    if mn is not None and _json_scalar(mn) and _json_scalar(mx):
                        out[rel] = [mn, mx]
                except (StopIteration, OSError, KeyError, TypeError):
                    continue
        return out, rows

    @staticmethod
    def _merged_bounds(
        base: dict, buckets: dict, new_bounds: dict, field: str = "file_bounds"
    ) -> dict:
        """Manifest per-file stat map (``file_bounds`` / ``file_rows``)
        after a commit: prior entries plus the new files', pruned to
        exactly the files ``buckets`` still references — stays O(live
        files), same order as the buckets map itself."""
        known = dict(base.get(field, {}))
        known.update(new_bounds)
        live = {rel for fs in buckets.values() for rel in fs}
        return {rel: b for rel, b in known.items() if rel in live}

    def overwrite(
        self,
        df: DataFrame,
        epochs: list[int] | None = None,
        _epoch_state: dict | None = None,
        _operation: str = "overwrite",
    ) -> int:
        """Replace the full table contents atomically (initial load).

        ``_epoch_state`` / ``_operation`` are internal hooks for
        :meth:`bootstrap`, which must publish a position handoff in
        the SAME commit as the data load."""
        m = self.manifest()
        version = self._next_version(m)
        al = self._aliases_of(m)
        schema = reconcile(T.StructType.fromJson(m["schema"]), df.schema, al)
        data = self._bucket_col(
            self._align(df, schema, aliases=al), m["key"], m["num_buckets"]
        )
        buckets = self._write_commit(data, version)
        fb, fr = self._file_bounds_of(buckets)
        epoch_fields = (
            _epoch_state
            if _epoch_state is not None
            else self._next_epoch_state(m, epochs)
        )
        m.pop("committed_epochs", None)
        m.update(
            version=version,
            version_hwm=version,
            parent=m["version"],
            operation=_operation,
            schema=schema.jsonValue(),
            columns_meta=self._columns_meta_after(m, schema, version),
            buckets=buckets,
            file_bounds=fb,
            file_rows=fr,
            # a full overwrite replaces every data file: any pending
            # merge-on-read history is gone with them, so reads must
            # NOT pay (or worse, apply) the MOR reconstruction — an
            # overwritten frame containing duplicate keys would be
            # silently collapsed to one row per key instead of read
            # back verbatim.
            mor=False,
            mor_depth=0,
            mor_buckets={},
            **epoch_fields,
        )
        return self._commit(m)

    def bootstrap(self, df: DataFrame, position: int) -> int:
        """Initial-snapshot load with a binlog-position handoff.

        The classic CDC bootstrap (Flink CDC "initial snapshot then
        incremental", Debezium snapshot mode): ``df`` is a consistent
        snapshot dump that already REFLECTS every change event with
        ``batch_epoch <= position``, so a subsequent binlog tail must
        apply only epochs ``> position``. Without the handoff the tail
        either re-applies the snapshot's entire history (O(history)
        wasted work, double-counted lineage) or the operator has to
        truncate the binlog at exactly the snapshot cut.

        One atomic commit publishes the data AND the epoch state
        ``(base=-1, watermark=position)`` — every non-negative epoch
        ``<= position`` reads as committed — so a crash between "data
        loaded" and "position stamped" cannot leave a table that
        replays from zero. Re-running the bootstrap is a plain
        overwrite: idempotent in content, new snapshot version.

        Reference parity: the reference re-validates whole files from
        scratch and has no incremental handoff; this is the piece a
        log-tailing engine needs instead (north_star: "replay from any
        checkpoint reconverges").
        """
        position = int(position)
        if position < 0:
            raise ValueError("bootstrap position must be >= 0")
        return self.overwrite(
            df,
            _epoch_state={
                "epoch_watermark": position,
                "epoch_tail": [],
                "epoch_base": -1,
            },
            _operation="bootstrap",
        )

    def export_snapshot(
        self, out_dir: str, version: int | str | None = None
    ) -> dict:
        """Consistent snapshot dump + binlog-position sidecar — the
        PRODUCER half of the bootstrap handoff (:meth:`bootstrap` is
        the consumer half, and previously required the operator to
        supply both the dump and its position by hand).

        Writes the snapshot's rows as plain parquet under
        ``out_dir/data`` and then ``out_dir/_position.json`` (written
        LAST, atomically via temp+rename: a sidecar implies a complete
        dump) recording the snapshot's epoch watermark — the binlog
        position the dump is consistent up to. A downstream table
        bootstraps with ``bootstrap(spark.read.parquet(dir/data),
        sidecar["position"])`` (the CLI does this automatically) and
        tails the SAME binlog, applying only newer epochs.

        Position contract: the exported position is the watermark W
        (every epoch <= W reflected). Out-of-order committed epochs
        ABOVE W (the tail) are also reflected in the data but sit
        above the handoff position, so a subsequent tail re-applies
        them — idempotent under the LWW merge, never lossy; they are
        listed in the sidecar for observability. ``version`` may be an
        int or a tag name (time-travel export, e.g. reproducing the
        exact dump a training run consumed)."""
        m = self.manifest(version)
        v = int(m["version"])
        w, tail = self._epoch_state_of(m)
        self.read(version=v).write.mode("overwrite").parquet(
            os.path.join(out_dir, "data")
        )
        sidecar = {
            "position": w,
            "source_version": v,
            "source_root": self.root,
            "key": m.get("key"),
            "epoch_tail_above_position": sorted(
                int(e) for e in tail if int(e) > w
            ),
        }
        tmp = os.path.join(out_dir, f"._position.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(sidecar, f)
        os.replace(tmp, os.path.join(out_dir, "_position.json"))
        return sidecar

    def mark_epochs(self, epochs) -> int:
        """Manifest-only epoch-marker commit: record ``epochs`` as
        applied with NO data change and NO Spark jobs (a ``merge-noop``
        snapshot, so concurrent merges rebase over it freely).

        The multi-table router uses this to advance a route's
        watermark past epochs that routed zero events to it — without
        the marker, every epoch a route never sees would sit in its
        out-of-order tail forever, growing the manifest and the
        already-committed predicate with stream lifetime."""
        epochs = sorted({int(e) for e in epochs if int(e) >= 0})
        if not epochs:
            return self.current_version()
        parent = self.current_version()
        return int(
            self._publish_with_rebase(
                parent, [], lambda base: self._noop_manifest(base, epochs)
            )["version"]
        )

    def merge(
        self,
        upserts: DataFrame,
        delete_keys: DataFrame | None = None,
        epochs: list[int] | None = None,
        affected_buckets: list[int] | None = None,
        mode: str = "cow",
        affected_buckets_nb: int | None = None,
    ) -> dict:
        """MERGE: last-writer-wins upsert + key deletes.

        ``upserts`` must contain at most one row per key (run
        dedup.latest_per_key first) and be alignable to the table schema
        (run schema reconcile first — this method evolves the manifest
        schema additively). ``delete_keys`` is a 1-column (key) frame.
        ``affected_buckets`` is an optional pre-computed bucket hint;
        pass ``affected_buckets_nb`` = the bucket count it was computed
        against, so a concurrent ``rebucket()`` landing between the
        caller's computation and this merge invalidates the hint
        (it is then recomputed) instead of silently dropping buckets.

        Equivalent SQL (Iceberg):
            MERGE INTO t USING batch ON t.k = batch.k
            WHEN MATCHED AND batch.op = 'delete' THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED AND batch.op != 'delete' THEN INSERT *

        ``mode`` picks the write amplification trade:

        * ``"cow"`` (copy-on-write, default): affected buckets are
          rewritten in full; reads stay shuffle-free. Right when a
          batch touches a large fraction of each bucket.
        * ``"mor"`` (merge-on-read): ONLY the change batch is written
          — upserts plus tombstone rows for deletes appended as new
          files in the affected buckets; no existing file is read or
          rewritten. Reads reconstruct last-writer-wins per key until
          ``compact()`` folds the history down. Right for small/
          frequent batches over huge buckets (at 10^10 rows a 0.1%
          change batch rewrites nothing instead of every touched
          bucket). Modes interleave freely commit-by-commit.

        Returns {"version", "rows_written", "buckets_rewritten"}.
        """
        if mode == "mor":
            return self._merge_mor(upserts, delete_keys, epochs)
        m = self.manifest()
        key, n_buckets = m["key"], m["num_buckets"]
        old_schema = T.StructType.fromJson(m["schema"])
        al = self._aliases_of(m)
        schema = reconcile(old_schema, upserts.schema, al)
        evo = evolution_actions(old_schema, upserts.schema, al)
        version = self._next_version(m)

        ups = self._bucket_col(
            self._align(upserts, schema, aliases=al), key, n_buckets
        )
        all_keys = ups.select(key, "_bucket")
        if delete_keys is not None:
            # cast to the table key type BEFORE hashing: xxhash64 of an
            # int and of the same value as long differ, so an unaligned
            # delete frame would bucket to the wrong file and the
            # delete would be silently missed (the MOR path _aligns its
            # tombstones; COW must match)
            key_type = schema[key].dataType
            dels = self._bucket_col(
                delete_keys.select(F.col(key).cast(key_type).alias(key)),
                key,
                n_buckets,
            )
            all_keys = all_keys.unionByName(dels)
        all_keys = all_keys.select(key, "_bucket").dropDuplicates([key])

        # Bucket pruning: only buckets containing changed keys are read
        # and rewritten. The distinct-bucket list is tiny (<= num_buckets)
        # so collecting it to the driver is scale-safe. Callers that
        # already aggregated the change set (CdcEngine) pass the bucket
        # list in, saving this job's round trip — but the hint is only
        # valid in THIS manifest's bucket space: a rebucket that landed
        # after the caller computed it silently invalidates every id.
        if affected_buckets is not None and (
            affected_buckets_nb is None or affected_buckets_nb == n_buckets
        ):
            affected = list(affected_buckets)
        else:
            affected = [
                r["_bucket"] for r in all_keys.select("_bucket").distinct().collect()
            ]
        if not affected:
            mm = self._publish_with_rebase(
                m["version"], [], lambda base: self._noop_manifest(base, epochs)
            )
            return {
                "version": mm["version"],
                "rows_written": 0,
                "buckets_rewritten": 0,
            }

        current = self._bucket_col(
            self._align(self.read(buckets=affected), schema), key, n_buckets
        )
        # Survivors: current rows of affected buckets whose key is NOT in
        # the change set. Anti-join on the key; AQE broadcasts the change
        # keys when small and splits skew otherwise.
        survivors = current.join(all_keys.select(key), on=key, how="left_anti")
        survivors = self._bucket_col(self._align(survivors, schema), key, n_buckets)
        new_state = survivors.unionByName(ups)

        written = self._write_commit(new_state, version)
        new_bounds, new_rows = self._file_bounds_of(written)
        touched = [str(b) for b in affected]

        def rebuild(base: dict) -> dict:
            logical = self._next_version(base)
            # corruption guard: every written bucket must be one we
            # declared touched, or the manifest would silently drop the
            # stray bucket's rows (possible only if the bucket hint was
            # computed in a different bucket space — see merge() docs)
            stray = sorted(set(written) - set(touched))
            if stray:
                raise ConcurrentCommitError(
                    f"merge wrote buckets {stray} outside its declared "
                    f"touched set (stale affected_buckets hint after a "
                    f"concurrent rebucket?) — aborting instead of "
                    f"dropping their rows"
                )
            al2 = self._aliases_of(base)
            schema2 = reconcile(T.StructType.fromJson(base["schema"]), schema, al2)
            evo2 = evolution_actions(T.StructType.fromJson(base["schema"]), schema, al2)
            buckets = dict(base["buckets"])
            for bs in touched:
                if bs in written:
                    buckets[bs] = written[bs]
                else:
                    buckets.pop(bs, None)  # bucket emptied by deletes
            # a COW rewrite materializes reconstructed state for its
            # buckets: they leave the MOR set (reads go shuffle-free)
            morb = self._mor_buckets_of(base)
            for bs in touched:
                morb.pop(bs, None)
            mm = dict(base)
            mm.pop("committed_epochs", None)
            mm.update(
                version=logical,
                version_hwm=logical,
                parent=base["version"],
                operation="merge-cow",
                mor=bool(morb),
                mor_depth=max(morb.values(), default=0),
                mor_buckets=morb,
                schema=schema2.jsonValue(),
                columns_meta=self._columns_meta_after(base, schema2, logical),
                buckets=buckets,
                file_bounds=self._merged_bounds(base, buckets, new_bounds),
                file_rows=self._merged_bounds(base, buckets, new_rows, "file_rows"),
                touched=touched,
                commit_versions=self._map_commit_version(
                    base.get("commit_versions", {}), written, logical, buckets
                ),
                evolution=base.get("evolution", []) + [{"version": logical, "actions": evo2}] if evo2 else base.get("evolution", []),
                **self._next_epoch_state(base, epochs),
            )
            return mm

        mm = self._publish_with_rebase(m["version"], touched, rebuild)
        return {
            "version": mm["version"],
            "buckets_rewritten": len(touched),
            "evolution": evo,
        }

    def delete_where(self, condition, mode: str = "mor") -> dict:
        """Predicate delete: remove every current row matching
        ``condition`` (a Column or SQL string) — the takedown /
        retention / poisoned-source purge a training-data lake needs
        (``DELETE FROM t WHERE src = 'bad-crawl'``).

        Composed over MERGE: one scan finds the matching keys, then
        the standard delete path applies them — ``mor`` (default)
        appends O(matches) tombstones and rewrites nothing, ``cow``
        rewrites only the buckets containing matches. The scan is a
        plain snapshot read, so Catalyst pushes ``condition`` down to
        the parquet scans (and zone maps/bucket pruning apply when the
        predicate is on the key). Keys are never collected to the
        driver. Returns the merge result plus ``keys_deleted``."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        # One scan total: the matching keys (O(matches), small) are
        # materialized once and reused by the count AND the merge.
        keys = self.read().filter(cond).select(self.key).localCheckpoint(eager=True)
        n = keys.count()
        if n == 0:
            return {"version": self.manifest()["version"], "keys_deleted": 0}
        empty = self.spark.createDataFrame([], self.schema)
        out = self.merge(empty, delete_keys=keys, mode=mode)
        out["keys_deleted"] = n
        return out

    def _merge_mor(
        self,
        upserts: DataFrame,
        delete_keys: DataFrame | None,
        epochs: list[int] | None,
    ) -> dict:
        """Merge-on-read MERGE: append the change batch (upserts +
        delete tombstones) as new bucket files; no existing file is
        read or rewritten. See :meth:`merge` for when to pick this."""
        m = self.manifest()
        key, n_buckets = m["key"], m["num_buckets"]
        old_schema = T.StructType.fromJson(m["schema"])
        al = self._aliases_of(m)
        schema = reconcile(old_schema, upserts.schema, al)
        evo = evolution_actions(old_schema, upserts.schema, al)
        version = self._next_version(m)

        ups = self._align(upserts, schema, aliases=al).withColumn(
            _TOMBSTONE, F.lit(False)
        )
        batch = ups
        if delete_keys is not None:
            tombs = self._align(delete_keys.select(key), schema).withColumn(
                _TOMBSTONE, F.lit(True)
            )
            batch = batch.unionByName(tombs)
        batch = self._bucket_col(batch, key, n_buckets)
        written = self._write_commit(batch, version)
        if not written:  # empty change batch: manifest-only commit
            mm = self._publish_with_rebase(
                m["version"], [], lambda base: self._noop_manifest(base, epochs)
            )
            return {
                "version": mm["version"],
                "rows_written": 0,
                "buckets_appended": 0,
            }

        new_bounds, new_rows = self._file_bounds_of(written)
        touched = sorted(written)

        def rebuild(base: dict) -> dict:
            logical = self._next_version(base)
            al2 = self._aliases_of(base)
            schema2 = reconcile(T.StructType.fromJson(base["schema"]), schema, al2)
            evo2 = evolution_actions(T.StructType.fromJson(base["schema"]), schema, al2)
            buckets = dict(base["buckets"])
            morb = self._mor_buckets_of(base)
            for b, files in written.items():
                buckets[b] = buckets.get(b, []) + files
                morb[b] = morb.get(b, 0) + 1
            mm = dict(base)
            mm.pop("committed_epochs", None)
            mm.update(
                version=logical,
                version_hwm=logical,
                parent=base["version"],
                operation="merge-mor",
                schema=schema2.jsonValue(),
                columns_meta=self._columns_meta_after(base, schema2, logical),
                buckets=buckets,
                file_bounds=self._merged_bounds(base, buckets, new_bounds),
                file_rows=self._merged_bounds(base, buckets, new_rows, "file_rows"),
                mor=True,
                mor_depth=max(morb.values(), default=0),
                mor_buckets=morb,
                touched=touched,
                commit_versions=self._map_commit_version(
                    base.get("commit_versions", {}), written, logical, buckets
                ),
                evolution=base.get("evolution", []) + [{"version": logical, "actions": evo2}] if evo2 else base.get("evolution", []),
                **self._next_epoch_state(base, epochs),
            )
            return mm

        mm = self._publish_with_rebase(m["version"], touched, rebuild)
        return {
            "version": mm["version"],
            "buckets_appended": len(written),
            "mor_depth": mm["mor_depth"],
            "evolution": evo,
        }

    # Safe default orphan age: a commit dir younger than this is
    # assumed to belong to an IN-FLIGHT writer (data written, manifest
    # not yet published — a state the optimistic _commit explicitly
    # supports) and must not be swept, or the writer's subsequent
    # manifest would reference deleted files and corrupt the snapshot.
    DEFAULT_VACUUM_MIN_AGE = 3600.0

    def vacuum(
        self,
        keep_last: int = 1,
        min_age_seconds: float = DEFAULT_VACUUM_MIN_AGE,
        dry_run: bool = False,
    ) -> dict:
        """Expire old snapshots and remove unreferenced data dirs.

        Keeps the newest ``keep_last`` snapshot manifests (time-travel
        window) PLUS every snapshot pinned by a tag (``tag()`` — a
        training run's dataset pin must survive any retention policy),
        and deletes every data commit dir referenced by NONE of
        them — expired history and crash orphans alike. Dirs younger
        than ``min_age_seconds`` are spared so an in-flight writer's
        not-yet-committed files survive (the Iceberg
        expire_snapshots + remove_orphan_files pair in one pass).
        ``min_age_seconds`` defaults to an hour; pass 0 ONLY when no
        concurrent writer can exist (tests, single-writer shutdown) —
        _commit never re-validates that referenced data files exist.

        ``dry_run=True`` deletes nothing and additionally returns the
        doomed snapshot versions and data dirs — the operator preview
        before pointing a retention cron at a production table.

        Live branches are protected: their fork-point manifest is
        retained and every data dir their head references is kept
        (see :meth:`create_branch`). Retention is a whole-table
        operation, so it must run from the MAIN table handle."""
        import time as _time

        if self.branch is not None:
            raise ValueError("vacuum must run on the main table")

        snap_dir = os.path.join(self.root, _SNAP_DIR)
        versions = sorted(
            int(n[5:13])
            for n in self.io.list_dir(snap_dir)
            if n.startswith("snap-") and n.endswith(".json")
        )
        if not versions:
            # Fail-safe: a valid table always has >= 1 manifest. An
            # empty/missing _snapshots dir (mistyped root, lost
            # metadata) would make EVERY data dir look orphaned and
            # delete the whole table — refuse instead.
            raise FileNotFoundError(
                f"no snapshots at {snap_dir}: not a LakeTable root, "
                "refusing to vacuum (everything would be treated as orphan)"
            )
        retained = set(versions[-max(1, keep_last):])
        retained |= {v for v in self.tags().values() if v in set(versions)}
        referenced: set[str] = set()
        # live branches pin their ancestry and their staged data: the
        # fork-point manifest stays readable (branch reads below the
        # fork fall through to main) and every data dir the branch
        # HEAD references survives orphan GC until the branch is
        # published or dropped
        for name, info in self.branches().items():
            if info["fork_version"] in set(versions):
                retained.add(info["fork_version"])
            bhead = LakeTable(
                self.spark, self.root, io=self.io, branch=name
            ).manifest()
            for files in bhead["buckets"].values():
                for rel in files:
                    referenced.add(rel.split("/")[1])
        for v in retained:
            for files in self.manifest(v)["buckets"].values():
                for rel in files:
                    referenced.add(rel.split("/")[1])
        doomed_dirs: list[str] = []
        data_root = os.path.join(self.root, _DATA_DIR)
        now = _time.time()
        for d in self.io.list_dir(data_root):
            p = os.path.join(data_root, d)
            if d in referenced or not self.io.is_dir(p):
                continue
            if now - self.io.mtime(p) < min_age_seconds:
                continue
            if not dry_run:
                self.io.remove_tree(p)
            doomed_dirs.append(d)
        doomed_versions = [v for v in versions if v not in retained]
        if not dry_run:
            for v in doomed_versions:
                self.io.delete(self._snap_path(v))
                # keep expiry observable through THIS instance:
                # time-travel to an expired version must fail rather
                # than serve a snapshot whose data dirs are gone
                self._mcache.pop(v, None)
        out = {
            "snapshots_expired": len(doomed_versions),
            "data_dirs_removed": len(doomed_dirs),
        }
        if dry_run:
            out.update(
                dry_run=True,
                doomed_versions=doomed_versions,
                doomed_dirs=doomed_dirs,
            )
        return out

    def compact(
        self,
        buckets: list[int] | None = None,
        min_depth: int = 1,
        max_buckets: int | None = None,
    ) -> dict:
        """Fold merge-on-read history down — PER BUCKET: rewrite only
        the buckets carrying MOR deltas (per-key winners kept,
        tombstones dropped) as one fresh commit; clean buckets' files
        are carried forward untouched. The MOR analogue of Iceberg's
        ``rewrite_data_files`` with a filter: at 10^10 rows, a day of
        merges touching 1% of buckets compacts 1% of the table, not
        a full-table rewrite.

        ``buckets`` restricts candidates; ``min_depth`` skips buckets
        whose delta depth is still shallow (reads there pay only a
        small reconstruction); ``max_buckets`` bounds one maintenance
        pass's work, deepest buckets first — together they make
        compaction an incremental background job with a bounded pause,
        not a stop-the-world rewrite.

        Publishes through the optimistic rebase path with the
        compacted buckets as the touched set: concurrent merges to
        OTHER buckets interleave freely; a merge landing in a bucket
        being compacted aborts the compaction (ConcurrentCommitError)
        rather than losing its delta — compaction is retryable
        maintenance, the merge is data."""
        m = self.manifest()
        morb = self._mor_buckets_of(m)
        cand = {b: d for b, d in morb.items() if d >= min_depth}
        if buckets is not None:
            wanted = {str(b) for b in buckets}
            cand = {b: d for b, d in cand.items() if b in wanted}
        order = sorted(cand, key=lambda b: (-cand[b], int(b)))
        if max_buckets is not None:
            order = order[:max_buckets]
        if not order:
            return {"version": m["version"], "compacted": False}
        schema = T.StructType.fromJson(m["schema"])
        # MOR reconstruction over ONLY the candidate buckets' files
        state = self.read(buckets=[int(b) for b in order])
        version = self._next_version(m)
        data = self._bucket_col(self._align(state, schema), m["key"], m["num_buckets"])
        written = self._write_commit(data, version)
        new_bounds, new_rows = self._file_bounds_of(written)
        touched = list(order)

        def rebuild(base: dict) -> dict:
            logical = self._next_version(base)
            bmap = dict(base["buckets"])
            bmorb = self._mor_buckets_of(base)
            for b in touched:
                if b in written:
                    bmap[b] = written[b]
                else:
                    bmap.pop(b, None)  # bucket fully tombstoned away
                bmorb.pop(b, None)
            mm = dict(base)
            mm.update(
                version=logical,
                version_hwm=logical,
                parent=base["version"],
                operation="compact",
                buckets=bmap,
                file_bounds=self._merged_bounds(base, bmap, new_bounds),
                file_rows=self._merged_bounds(base, bmap, new_rows, "file_rows"),
                mor=bool(bmorb),
                mor_depth=max(bmorb.values(), default=0),
                mor_buckets=bmorb,
                touched=touched,
                commit_versions=self._map_commit_version(
                    base.get("commit_versions", {}), written, logical, bmap
                ),
            )
            return mm

        mm = self._publish_with_rebase(m["version"], touched, rebuild)
        return {
            "version": mm["version"],
            "compacted": True,
            "buckets_compacted": len(touched),
            "mor_buckets_remaining": len(mm.get("mor_buckets", {})),
        }

    def rebucket(self, new_num_buckets: int) -> dict:
        """Migrate the table to a different bucket count as one special
        commit: full read -> re-hash on the key -> rewrite -> manifest
        with the new ``num_buckets``.

        This is the scale-evolution path the bucketed layout needs
        (module docstring: 10^10 rows want ~4096 buckets, but tables
        are usually created small): without it, bucket count is frozen
        at create time and the 1%-of-files MERGE pruning story stops
        holding as the table grows. One full rewrite — O(table) like
        Iceberg's ``REPLACE PARTITION FIELD`` + rewrite_data_files —
        after which every merge prunes against the new bucket space.
        MOR history folds down in the same pass (the read reconstructs
        it). Old commits remain for time travel until vacuum()."""
        m = self.manifest()
        if new_num_buckets == m["num_buckets"]:
            return {"version": m["version"], "rebucketed": False}
        schema = T.StructType.fromJson(m["schema"])
        state = self.read()
        version = self._next_version(m)
        data = self._bucket_col(
            self._align(state, schema), m["key"], new_num_buckets
        )
        written = self._write_commit(data, version, n_buckets=new_num_buckets)
        fb, fr = self._file_bounds_of(written)
        mm = dict(m)
        mm.update(
            version=version,
            version_hwm=version,
            parent=m["version"],
            operation="rebucket",
            num_buckets=new_num_buckets,
            buckets=written,
            file_bounds=fb,
            file_rows=fr,
            mor=False,
            mor_depth=0,
            mor_buckets={},
        )
        self._commit(mm)
        return {
            "version": version,
            "rebucketed": True,
            "num_buckets": new_num_buckets,
        }

    def rewrite_payload(self, exprs: dict) -> dict:
        """Full-corpus map-only transform as ONE commit: rewrite every
        row's payload columns through ``exprs`` (column name ->
        pyspark Column or SQL string) without ever shuffling the table.

        The 10^10-row migration path (retokenize under a new vocab,
        re-normalize text, re-quantize embeddings): the merge key may
        NOT be transformed, so every row's bucket assignment is
        unchanged — the read is already bucket-clustered files, the
        transform is a projection, and the write skips the exchange
        (``_write_commit(clustered=True)``): scan + map + write, zero
        shuffle. Compare ``overwrite(read().withColumn(...))``, which
        pays a full-table exchange for the same result.

        Types must stay schema-compatible (the result is aligned to
        the table schema — widen the schema first for type changes).
        MOR history folds down in the same pass (the read reconstructs
        it; reconstruction shuffles only the MOR-dirty buckets —
        ``compact()`` first for a perfectly clustered rewrite).
        Publishes as ``rewrite-payload``, a table-wide commit:
        concurrent merges never rebase over it (and it never rebases),
        exactly like ``rebucket``. Epoch state is preserved — the
        rewrite is not a change-apply, replay semantics are untouched.
        Old commits remain time-travelable until ``vacuum()``;
        ``changes()`` emits the rewrite as ordinary per-row upserts
        (parent-vs-child diff), so changelog consumers reconverge.
        """
        m = self.manifest()
        if m["key"] in exprs:
            raise ValueError(
                f"rewrite_payload cannot transform the merge key "
                f"{m['key']!r} (bucket assignment must be preserved; "
                f"use merge/delete for key changes)"
            )
        schema = T.StructType.fromJson(m["schema"])
        names = {f.name for f in schema.fields}
        unknown = set(exprs) - names
        if unknown:
            raise ValueError(f"unknown columns: {sorted(unknown)}")
        state = self.read()
        for c, e in exprs.items():
            state = state.withColumn(c, F.expr(e) if isinstance(e, str) else e)
        version = self._next_version(m)
        data = self._bucket_col(self._align(state, schema), m["key"], m["num_buckets"])
        written = self._write_commit(data, version, clustered=True)
        fb, fr = self._file_bounds_of(written)
        mm = dict(m)
        mm.update(
            version=version,
            version_hwm=version,
            parent=m["version"],
            operation="rewrite-payload",
            buckets=written,
            file_bounds=fb,
            file_rows=fr,
            mor=False,
            mor_depth=0,
            mor_buckets={},
        )
        self._commit(mm)
        return {
            "version": version,
            "rewritten_columns": sorted(exprs),
            "buckets": len(written),
        }

    # ------------------------------------------------------- properties

    def alter_properties(self, props: dict) -> dict:
        """Change table properties as a manifest-only commit (the
        Iceberg ``ALTER TABLE SET TBLPROPERTIES`` idea): merge
        ``props`` into the current set; a ``None`` value unsets a key.

        Properties steer FUTURE writes only (``sort_on_write``,
        ``bloom_filter_key``, ``zone_maps``), so flipping one on a
        live 10^10-row table costs one conditional put — existing
        files pick the feature up as merges/compaction naturally
        rewrite them, no stop-the-world rewrite. Publishes through the
        rebase path with an empty touched set: concurrent merges and
        this commit never conflict in either direction."""
        m = self.manifest()

        def rebuild(base: dict) -> dict:
            merged = dict(base.get("properties", {}) or {})
            for k, v in props.items():
                if v is None:
                    merged.pop(k, None)
                else:
                    merged[k] = v
            mm = dict(base)
            nv = self._next_version(base)
            mm.update(
                version=nv,
                version_hwm=nv,
                parent=base["version"],
                operation="alter-properties",
                properties=merged,
                touched=[],
            )
            return mm

        mm = self._publish_with_rebase(m["version"], [], rebuild)
        return {"version": mm["version"], "properties": mm["properties"]}

    def rename_column(self, old: str, new: str) -> dict:
        """Rename a column as a manifest-only commit — no data file is
        touched (Iceberg ``ALTER TABLE ... RENAME COLUMN``; renames
        are metadata because columns are tracked by identity, not
        name). The former name is recorded as an ALIAS in
        ``columns_meta``: old data files (and stale producers still
        emitting the old name) resolve onto the renamed column at
        read/merge time, time travel to pre-rename versions shows the
        old name, and ``changes()`` across the rename emits under the
        final name. Renaming the merge key is allowed (bucket hashes
        are over values, not names). Publishes through the rebase path
        with an empty touched set — concurrent merges interleave."""
        m = self.manifest()

        def rebuild(base: dict) -> dict:
            bschema = T.StructType.fromJson(base["schema"])
            names = {f.name.lower(): f.name for f in bschema.fields}
            if old.lower() not in names:
                raise SchemaEvolutionError(f"no column {old!r} to rename")
            old_c = names[old.lower()]
            if new.lower() in names and names[new.lower()] != old_c:
                raise SchemaEvolutionError(
                    f"cannot rename {old_c!r} to {new!r}: column exists"
                )
            al = self._aliases_of(base)
            if new.lower() in al:
                raise SchemaEvolutionError(
                    f"cannot rename {old_c!r} to {new!r}: it is a former "
                    f"name of {al[new.lower()]!r} (old data files would "
                    f"become ambiguous)"
                )
            fields = [
                T.StructField(new, f.dataType, f.nullable)
                if f.name == old_c
                else f
                for f in bschema.fields
            ]
            cm = {k: dict(v) for k, v in (base.get("columns_meta") or {}).items()}
            entry = cm.pop(old_c, {"added_at": 0, "aliases": []})
            entry["aliases"] = sorted(set(entry.get("aliases", [])) | {old_c})
            cm[new] = entry
            nv = self._next_version(base)
            mm = dict(base)
            mm.update(
                version=nv,
                version_hwm=nv,
                parent=base["version"],
                operation="rename-column",
                schema=T.StructType(fields).jsonValue(),
                columns_meta=cm,
                key=(new if base["key"] == old_c else base["key"]),
                evolution=base.get("evolution", [])
                + [{"version": nv, "actions": [f"rename {old_c} -> {new}"]}],
                touched=[],
            )
            return mm

        mm = self._publish_with_rebase(m["version"], [], rebuild)
        return {"version": mm["version"], "key": mm["key"]}

    def drop_column(self, name: str) -> dict:
        """Drop a column as a manifest-only commit. Data files keep
        the bytes (Iceberg semantics — space comes back as compaction
        / COW merges naturally rewrite files); reads project the
        column away. A LATER re-add of the same name is a NEW column
        identity: ``columns_meta.added_at`` makes pre-re-add files
        read null for it instead of resurrecting dropped data."""
        m = self.manifest()

        def rebuild(base: dict) -> dict:
            bschema = T.StructType.fromJson(base["schema"])
            names = {f.name.lower(): f.name for f in bschema.fields}
            if name.lower() not in names:
                raise SchemaEvolutionError(f"no column {name!r} to drop")
            c = names[name.lower()]
            if c == base["key"]:
                raise SchemaEvolutionError("cannot drop the merge key")
            cm = {
                k: dict(v)
                for k, v in (base.get("columns_meta") or {}).items()
                if k != c
            }
            nv = self._next_version(base)
            mm = dict(base)
            mm.update(
                version=nv,
                version_hwm=nv,
                parent=base["version"],
                operation="drop-column",
                schema=T.StructType(
                    [f for f in bschema.fields if f.name != c]
                ).jsonValue(),
                columns_meta=cm,
                evolution=base.get("evolution", [])
                + [{"version": nv, "actions": [f"drop column {c}"]}],
                touched=[],
            )
            return mm

        mm = self._publish_with_rebase(m["version"], [], rebuild)
        return {"version": mm["version"]}

    # -------------------------------------------------------- rollback

    def rollback(self, version: int | str) -> dict:
        """Restore the table to snapshot ``version``'s state as a NEW
        commit (the Iceberg ``rollback_to_snapshot`` idea): history
        only ever grows, so the bad commits stay inspectable and
        time-travelable until vacuum expires them, and downstream
        ``changes()`` consumers see the restore as ordinary row-level
        deltas (the generic parent-vs-child diff) instead of a
        history rewrite they cannot replay.

        The whole target manifest is copied — buckets, schema, zone
        maps, MOR state, properties AND the epoch watermark/tail — so
        exactly-once accounting rewinds with the data: epochs applied
        after the target are no longer marked committed, and
        re-tailing the binlog (with a fresh checkpoint) re-applies
        exactly those epochs. That is the CDC recovery story: bad
        batch landed → ``rollback`` → replay from the log reconverges.

        No rebase on a lost race, deliberately: restoring state while
        another writer lands would silently discard that writer's
        commit without the operator ever seeing it — the loser must
        look at the new head and re-issue. Conversely a concurrent
        merge can never rebase OVER a rollback (table-wide rewrite,
        same class as ``overwrite``), so no batch is half-kept.

        Reference parity: the DEX service has no snapshot restore —
        recovery there is re-uploading the source file; this is the
        lake-native equivalent for the CDC sink."""
        if isinstance(version, str):
            version = self.ref_version(version)
        head = self.manifest()
        if version == head["version"]:
            return {
                "version": head["version"],
                "restored_from": version,
                "noop": True,
            }
        target = self.manifest(version)  # raises if expired
        mm = dict(target)
        mm.pop("committed_epochs", None)
        nv = self._next_version(head)
        mm.update(
            version=nv,
            version_hwm=nv,
            parent=head["version"],
            operation="rollback",
            restored_from=version,
            touched=sorted(
                int(b)
                for b in set(head["buckets"]) | set(target["buckets"])
                if head["buckets"].get(b) != target["buckets"].get(b)
            ),
        )
        self._commit(mm)
        return {
            "version": mm["version"],
            "restored_from": version,
            "noop": False,
        }

    # ------------------------------------------------------------ refs

    @staticmethod
    def _ref_name_ok(name: str) -> bool:
        return bool(name) and all(c.isalnum() or c in "-_." for c in name)

    def _ref_path(self, name: str) -> str:
        return os.path.join(self.root, _REFS_DIR, f"tag-{name}.json")

    def tag(self, name: str, version: int | None = None) -> dict:
        """Pin a snapshot under an immutable named ref (the Iceberg
        tag idea): ``read(version="train-run-17")`` then reproduces
        the exact dataset state forever — the provenance surface a
        training-data lake needs ("which table state did run X see?").

        Tags are IMMUTABLE and concurrent-safe: the ref file is
        published with the same conditional put as manifests, so two
        writers racing the same name get exactly one winner. Re-pointing
        requires an explicit ``drop_tag`` first (mirroring Iceberg's
        replace-tag being a distinct, deliberate operation).
        ``vacuum()`` retains every tagged snapshot and its data files
        regardless of ``keep_last``."""
        if self.branch is not None:
            # a tag is a pin into MAIN's version chain; a branch-local
            # version number would silently re-resolve to a different
            # snapshot once the branch is dropped
            raise ValueError("tag must run on the main table")
        if not self._ref_name_ok(name):
            raise ValueError(
                f"invalid tag name {name!r}: use alphanumerics, '-', '_', '.'"
            )
        v = self.current_version() if version is None else int(version)
        # fail fast on a dangling pin: the manifest must exist NOW
        # (expired or never-committed versions can't be tagged)
        self.manifest(v)
        self.io.put_if_absent(
            self._ref_path(name), json.dumps({"name": name, "version": v})
        )
        return {"name": name, "version": v}

    def drop_tag(self, name: str) -> None:
        self.io.delete(self._ref_path(name))

    def tags(self) -> dict[str, int]:
        """name -> pinned snapshot version, for every live tag."""
        refs_dir = os.path.join(self.root, _REFS_DIR)
        out: dict[str, int] = {}
        for n in self.io.list_dir(refs_dir):
            if n.startswith("tag-") and n.endswith(".json"):
                doc = json.loads(self.io.read_text(os.path.join(refs_dir, n)))
                out[doc["name"]] = int(doc["version"])
        return out

    def ref_version(self, name: str) -> int:
        try:
            doc = json.loads(self.io.read_text(self._ref_path(name)))
        except (FileNotFoundError, OSError):
            raise FileNotFoundError(
                f"no tag {name!r} at {self.root}"
            ) from None
        return int(doc["version"])

    # ------------------------------------------------------- branches

    def create_branch(self, name: str, version: int | str | None = None) -> dict:
        """Fork a writable branch at ``version`` (default: current
        head) — the Iceberg branch ref, enabling WRITE-AUDIT-PUBLISH:
        stage a risky batch (a backfill, a new rule-set, a schema
        change) on the branch with the full engine — merges, MOR,
        compaction, exactly-once epochs — audit it with ``read()`` /
        ``stats()`` / ``changes()``, then :meth:`publish_branch` to
        promote atomically, or :meth:`drop_branch` to abandon. Main
        readers never see staged state.

        A branch shares main's ancestry (reads below the fork point
        fall through to main's manifests) and main's DATA directory
        (bytes are written once; publish is manifest-only). The ref is
        published with the same conditional put as manifests: two
        racers creating one name get exactly one winner."""
        if self.branch is not None:
            raise ValueError("create_branch must run on the main table")
        if not self._ref_name_ok(name):
            raise ValueError(
                f"invalid branch name {name!r}: use alphanumerics, '-', '_', '.'"
            )
        if version is None:
            v = self.current_version()
        elif isinstance(version, str):
            # fork at a tag: reproduce a pinned dataset state, repair
            # it on a branch, publish (publish will refuse if main has
            # since moved — the fix then lands via merge, not publish)
            v = self.ref_version(version)
        else:
            v = int(version)
        self.manifest(v)  # fail fast on a dangling fork point
        self.io.put_if_absent(
            self._branch_ref_path(name),
            json.dumps({"name": name, "fork_version": v}),
        )
        # we now own the name (conditional put won): any files in the
        # snapshot namespace are garbage from an interrupted drop of a
        # previous same-name branch — a fresh branch must start empty,
        # not inherit a dead branch's history
        d = self._branch_snap_dir(name)
        if self.io.is_dir(d):
            self.io.remove_tree(d)
        return {"name": name, "fork_version": v}

    def branches(self) -> dict[str, dict]:
        """name -> {fork_version, head} for every live branch
        (``head == fork_version`` means nothing staged yet)."""
        refs_dir = os.path.join(self.root, _REFS_DIR)
        out: dict[str, dict] = {}
        for n in self.io.list_dir(refs_dir):
            if n.startswith("branch-") and n.endswith(".json"):
                doc = json.loads(self.io.read_text(os.path.join(refs_dir, n)))
                name = doc["name"]
                fork = int(doc["fork_version"])
                heads = [
                    int(f[5:13])
                    for f in self.io.list_dir(self._branch_snap_dir(name))
                    if f.startswith("snap-") and f.endswith(".json")
                ]
                out[name] = {
                    "fork_version": fork,
                    "head": max(heads, default=fork),
                }
        return out

    def drop_branch(self, name: str) -> None:
        """Abandon a branch: delete its snapshot namespace, then its
        ref — in THAT order, so a crash between the two leaves a ref
        to an empty branch (harmless: reads fall through to the fork,
        re-drop finishes the job) rather than an unreferenced snapshot
        dir that a future same-name ``create_branch`` would silently
        inherit as its own history. Data files staged only by the
        branch become orphans and are reclaimed by the next age-gated
        :meth:`vacuum`."""
        d = self._branch_snap_dir(name)
        if self.io.is_dir(d):
            self.io.remove_tree(d)
        self.io.delete(self._branch_ref_path(name))

    def publish_branch(self, name: str) -> dict:
        """Promote branch ``name``'s head to main as ONE commit (the
        audit-passed half of write-audit-publish): main atomically
        becomes the branch's exact state — data, schema, zone maps,
        MOR state AND the branch's epoch watermark, so every epoch
        staged on the branch becomes committed on main in the same
        conditional put that exposes its data. Nothing is rewritten:
        the branch's files are already in the shared data directory.

        Main may have MOVED since the fork: publish rebases over any
        intervening commit that is data-identity (``compact``,
        ``merge-noop``, ``alter-properties`` — main's latest
        properties win) or a merge whose touched buckets are DISJOINT
        from the buckets the branch changed — the published manifest
        then overlays exactly the branch-owned buckets (with their MOR
        state, zone maps and row counts) onto main's head, reconciles
        the schemas additively, and folds the branch's staged epochs
        into main's watermark. Live traffic in other buckets is never
        lost, which is what makes WAP usable on a busy table — and a
        publish that loses the conditional put to a non-conflicting
        commit retries with the same optimistic budget as merges
        (another branch's disjoint publish rebases the same way). A
        conflicting intervener (same-bucket merge or publish,
        rebucket, overwrite, rollback — or the branch itself changed
        the bucket count) still refuses: the audited state was
        computed against data that changed under it — re-stage. The
        branch is left in place (re-publishable, inspectable);
        ``drop_branch`` when done."""
        if self.branch is not None:
            raise ValueError("publish_branch must run on the main table")
        ref = json.loads(self.io.read_text(self._branch_ref_path(name)))
        fork = int(ref["fork_version"])
        bt = LakeTable(self.spark, self.root, io=self.io, branch=name)
        bhead_v = bt.current_version()
        if bhead_v == fork:
            return {
                "version": self.current_version(),
                "branch": name,
                "published_from": fork,
                "noop": True,
            }
        bhead = bt.manifest()
        fork_m = self.manifest(fork)
        # buckets the branch OWNS: file list differs from the fork
        owned = {
            b
            for b in set(bhead["buckets"]) | set(fork_m["buckets"])
            if bhead["buckets"].get(b) != fork_m["buckets"].get(b)
        }
        # a branch-side bucket-count change makes the bucket spaces
        # incomparable: only a fast-forward (untouched main) is safe
        space_changed = bhead.get("num_buckets") != fork_m.get("num_buckets")
        # staged epochs relative to the fork (over-approximation is
        # fine: _next_epoch_state is idempotent for already-committed
        # epochs; the spans are O(staged batches + reorder window))
        fw, ftail = self._epoch_state_of(fork_m)
        fbase = int(fork_m.get("epoch_base", -1))
        bw, btail = self._epoch_state_of(bhead)
        bbase = int(bhead.get("epoch_base", -1))
        staged = set(range(fw + 1, bw + 1)) | set(btail)
        staged |= set(range(bbase + 1, fbase + 1))
        # Branch-side column-identity changes (rename/drop) cannot be
        # merged into a moved main by name-based reconcile — head still
        # has the old column, so the renamed one would duplicate. They
        # publish only as a FAST-FORWARD (main unmoved since fork:
        # adopt the branch schema wholesale); otherwise refuse with a
        # re-stage error. Main-side renames under an unrenamed branch
        # need no policy: head's aliases map the branch's old names.
        fork_fields = {
            f.name for f in T.StructType.fromJson(fork_m["schema"]).fields
        }
        b_fields = {f.name for f in T.StructType.fromJson(bhead["schema"]).fields}
        identity_changed = bool(
            self._aliases_of(bhead) != self._aliases_of(fork_m)
            or (fork_fields - b_fields)
        )
        # optimistic retry, same budget as merges: losing the put to a
        # non-conflicting commit (the tailer merging another bucket)
        # re-reads main and rebuilds — the rebase is manifest-only
        for attempt in range(self.COMMIT_RETRIES + 1):
            head = self.manifest()
            interveners = []
            v = head["version"]
            while v > fork:  # parent-pointer walk: versions are not dense
                mi = self.manifest(v)
                interveners.append(mi)
                v = int(mi.get("parent", v - 1))
            for mi in interveners:
                op = mi.get("operation", "")
                if op in (
                    "compact",
                    "merge-noop",
                    "alter-properties",
                    # a main-side RENAME is metadata-only and the
                    # publish reconcile maps the branch's old names
                    # through head's aliases; a main-side DROP stays a
                    # conflict — re-adding the column from the branch
                    # side would resurrect main's dropped bytes
                    "rename-column",
                ):
                    continue
                t = mi.get("touched")
                if (
                    # another branch's publish records exactly its
                    # overlaid buckets, so like a merge it conflicts
                    # iff it touched one of ours (and kept the bucket
                    # space unchanged)
                    (op.startswith("merge-") or op == "publish")
                    and t is not None
                    and not space_changed
                    and mi.get("num_buckets") == fork_m.get("num_buckets")
                    and owned.isdisjoint(str(b) for b in t)
                ):
                    continue
                raise ConcurrentCommitError(
                    f"cannot publish branch {name!r}: main's "
                    f"v{mi['version']} ({op or 'unknown'}) conflicts with "
                    f"the staged buckets — the audited state is stale; "
                    f"re-stage the branch"
                )
            # merged state: main head + the branch's owned buckets
            if head["version"] == fork:
                # fast-forward: adopt the branch schema + column
                # identity wholesale (covers branch-side rename/drop)
                schema = T.StructType.fromJson(bhead["schema"])
                evo = [
                    a
                    for e in bhead.get("evolution", [])
                    if int(e["version"]) > fork
                    for a in e.get("actions", [])
                ]
                pcm = {
                    k: dict(v)
                    for k, v in (bhead.get("columns_meta") or {}).items()
                }
                pkey = bhead["key"]
            elif identity_changed:
                raise ConcurrentCommitError(
                    f"cannot publish branch {name!r}: it renamed or "
                    f"dropped columns and main moved since the fork — "
                    f"apply the schema change on main (or re-stage the "
                    f"branch from main's head)"
                )
            else:
                pal = {**self._aliases_of(head), **self._aliases_of(bhead)}
                schema = reconcile(
                    T.StructType.fromJson(head["schema"]),
                    T.StructType.fromJson(bhead["schema"]),
                    pal,
                )
                evo = evolution_actions(
                    T.StructType.fromJson(head["schema"]),
                    T.StructType.fromJson(bhead["schema"]),
                    pal,
                )
                # column identity: main's entries win; branch-added
                # columns keep the added_at of their branch commit
                # (their data dirs carry branch-local version numbers)
                pcm = {
                    k: dict(v)
                    for k, v in {
                        **(bhead.get("columns_meta") or {}),
                        **(head.get("columns_meta") or {}),
                    }.items()
                    if k in {f.name for f in schema.fields}
                }
                pkey = head["key"]
            buckets = dict(head["buckets"])
            morb = self._mor_buckets_of(head)
            bmorb = self._mor_buckets_of(bhead)
            for b in owned:
                if b in bhead["buckets"]:
                    buckets[b] = bhead["buckets"][b]
                else:
                    buckets.pop(b, None)
                if b in bmorb:
                    morb[b] = bmorb[b]
                else:
                    morb.pop(b, None)
            live = {rel.split("/")[1] for fs in buckets.values() for rel in fs}
            cv = {
                d: v
                for d, v in {
                    **head.get("commit_versions", {}),
                    **bhead.get("commit_versions", {}),
                }.items()
                if d in live
            }
            # the publish allocates DENSELY from head (same next number
            # every concurrent writer derives, so the conditional put
            # serializes them) and raises the version high-water mark
            # past the branch-local version space: branch data dirs
            # carry their branch-local version numbers in their names
            # (MOR merge order within a bucket resolves through those),
            # so no later commit may reuse one of them — future
            # allocations skip the range, making version numbers unique
            # but not dense; readers walk parent pointers, never assume
            # v-1 exists
            nv = self._next_version(head)
            mm = dict(head)
            mm.pop("committed_epochs", None)
            mm.update(
                version=nv,
                version_hwm=max(nv, bhead_v),
                parent=head["version"],
                operation="publish",
                branch=name,
                fork_version=fork,
                key=pkey,
                schema=schema.jsonValue(),
                columns_meta=pcm,
                buckets=buckets,
                num_buckets=bhead["num_buckets"],
                mor=bool(morb),
                mor_depth=max(morb.values(), default=0),
                mor_buckets=morb,
                file_bounds=self._merged_bounds(
                    head, buckets, bhead.get("file_bounds", {})
                ),
                file_rows=self._merged_bounds(
                    head, buckets, bhead.get("file_rows", {}), "file_rows"
                ),
                commit_versions=cv,
                evolution=head.get("evolution", [])
                + ([{"version": nv, "actions": evo}] if evo else []),
                touched=sorted(int(b) for b in owned),
                **self._next_epoch_state(head, sorted(staged)),
            )
            try:
                self._commit(mm)
            except ConcurrentCommitError:
                if attempt == self.COMMIT_RETRIES:
                    raise
                continue
            return {
                "version": mm["version"],
                "branch": name,
                "published_from": bhead_v,
                "noop": False,
            }
        raise AssertionError("unreachable")

    # ------------------------------------------------------------ changelog

    def history(self) -> list[dict]:
        """Retained snapshot lineage, oldest first: one row per
        manifest still on disk with its operation, parent, epoch state
        and MOR depth (the Iceberg ``table.history()`` /
        ``snapshots`` metadata view)."""
        snap_dir = os.path.join(self.root, _SNAP_DIR)
        versions = [
            int(n[5:13])
            for n in self.io.list_dir(snap_dir)
            if n.startswith("snap-") and n.endswith(".json")
        ]
        if self.branch is not None:
            # a branch's history is main's chain up to the fork point
            # plus its own staged commits
            versions = [v for v in versions if v <= self._fork_version]
            versions += [
                int(n[5:13])
                for n in self.io.list_dir(self._branch_snap_dir(self.branch))
                if n.startswith("snap-") and n.endswith(".json")
            ]
        versions = sorted(versions)
        out = []
        for v in versions:
            m = self.manifest(v)
            w, tail = self._epoch_state_of(m)
            out.append(
                {
                    "version": v,
                    "parent": m.get("parent", 0),
                    "operation": m.get("operation", "unknown"),
                    "epoch_watermark": w,
                    "epoch_tail": tail,
                    "mor_depth": int(m.get("mor_depth", 0)),
                    "num_buckets": m.get("num_buckets"),
                }
            )
        return out

    @staticmethod
    def _dir_version(m: dict, commit_dir: str) -> int:
        """Logical version of a commit DIR: the dir name embeds the
        version, overridden by the manifest's commit_versions map for
        commits rebased after losing the optimistic race. Single
        resolution rule shared by read()'s MOR merge order, files()
        and _commit_files()."""
        return int(
            m.get("commit_versions", {}).get(commit_dir, commit_dir.split("-")[1])
        )

    @classmethod
    def _added_version(cls, m: dict, rel: str) -> int:
        """Version that ADDED data file ``rel`` (see _dir_version)."""
        return cls._dir_version(m, rel.split("/")[1])

    def files(self, version: int | None = None) -> DataFrame:
        """Data-file inventory of a snapshot (the Iceberg
        ``table.files`` metadata view): one row per live file with its
        bucket, the commit version that ADDED it (carried-forward
        files keep their original commit), and the manifest zone-map
        key bounds that drive driver-side pruning — typed as the
        table's merge key so bounds compare correctly for int keys
        too. Built from the manifest alone — no file-system listing,
        no Spark scan — so it stays O(#files) driver work through any
        FileIO backend."""
        m = self.manifest(version)
        fb = m.get("file_bounds", {})
        fr = m.get("file_rows", {})
        key_type = T.StructType.fromJson(m["schema"])[m["key"]].dataType
        rows = []
        for b, file_list in sorted(m["buckets"].items(), key=lambda kv: int(kv[0])):
            for rel in file_list:
                bounds = fb.get(rel) or (None, None)
                rows.append(
                    (
                        int(b),
                        rel,
                        self._added_version(m, rel),
                        bounds[0],
                        bounds[1],
                        fr.get(rel),
                    )
                )
        schema = T.StructType(
            [
                T.StructField("bucket", T.IntegerType()),
                T.StructField("path", T.StringType()),
                T.StructField("commit_version", T.IntegerType()),
                T.StructField("min_key", key_type),
                T.StructField("max_key", key_type),
                T.StructField("row_count", T.LongType()),
            ]
        )
        return self.spark.createDataFrame(rows, schema)

    def stats(self, version: int | str | None = None) -> dict:
        """Table statistics from the manifest alone — NO Spark job and
        no data I/O (the Iceberg snapshot-summary / ``record_count``
        idea). Per-file row counts are harvested from parquet footers
        at commit time (same pass as the zone maps), so at 10^10 rows
        a ``count(*)``-class question costs one manifest read.

        ``row_count`` is EXACT iff (a) every live file has a recorded
        count (``rows_complete``) and (b) no bucket carries pending
        merge-on-read deltas (``mor_buckets == 0`` — MOR files hold
        superseded duplicates and tombstones, so their physical rows
        over-count logical rows). Otherwise ``row_count`` is None and
        ``file_rows`` is the physical upper bound; ``compact()`` any
        dirty buckets to restore exactness."""
        m = self.manifest(version)
        fr = m.get("file_rows", {})
        total = 0
        complete = True
        n_files = 0
        for files in m["buckets"].values():
            for rel in files:
                n_files += 1
                n = fr.get(rel)
                if n is None:
                    complete = False
                else:
                    total += int(n)
        morb = self._mor_buckets_of(m)
        exact = complete and not morb
        return {
            "version": m["version"],
            "row_count": total if exact else None,
            "file_rows": total,
            "rows_complete": complete,
            "files": n_files,
            "buckets": len(m["buckets"]),
            "num_buckets": m["num_buckets"],
            "mor_buckets": len(morb),
            "exact": exact,
        }

    def _commit_files(self, m: dict, version: int) -> list[str]:
        """Absolute paths of the data files ADDED by ``version``'s
        commit (see :meth:`_added_version`)."""
        out = []
        for files in m["buckets"].values():
            for rel in files:
                if self._added_version(m, rel) == version:
                    out.append(os.path.join(self.root, rel))
        return out

    def changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Incremental changelog read (CDC *out* of the table): every
        row-level change committed AFTER ``from_version`` up to and
        including ``to_version`` (default: current), as a DataFrame of
        the table schema plus ``_change_type`` (``upsert`` | ``delete``)
        and ``_commit_version``.

        This is the Iceberg incremental scan / Delta CDF surface that
        lets downstream consumers (index builders, training-data
        samplers, replica tables) tail the lake instead of re-reading
        snapshots — the other half of a CDC engine. Cost model per
        commit, which is what makes it usable at 10^10 rows:

        * ``merge-mor`` — the appended files ARE the change batch;
          read exactly those files, O(change). Tombstones become
          ``delete`` rows (key-only pre-image, like Iceberg equality
          deletes); everything else is an ``upsert``.
        * ``merge-cow`` / ``overwrite`` — diff parent vs child
          restricted to the buckets whose file lists differ: one
          full-outer join per commit over only the touched buckets
          (exactly the data COW already rewrote). ``delete`` rows
          carry the full pre-image; unchanged rows are filtered with a
          null-safe struct comparison.
        * ``compact`` / ``rebucket`` / ``merge-noop`` — physical-only
          commits: no logical change, nothing emitted (and no I/O).

        ``upsert`` is deliberately not split into insert/update: the
        split requires probing the parent snapshot for key existence,
        which for MOR commits would turn an O(change) read into an
        O(bucket) one. Consumers that need it anti-join the parent
        snapshot themselves.

        Requires every manifest in ``(from_version, to_version]`` (and
        the parent data of any COW diff) to still be retained — run
        ``changes`` ahead of ``vacuum``'s retention horizon.
        """
        to_v = self.current_version() if to_version is None else to_version
        if from_version > to_v:
            raise ValueError(f"from_version {from_version} > to_version {to_v}")
        key = self.key
        # Walk PARENT pointers, not a dense range: version numbers are
        # unique but not contiguous (a branch publish skips past the
        # branch-local version space), and the parent chain is the
        # commit order. An expired manifest inside the window raises
        # honestly instead of silently dropping its changes.
        chain: list[dict] = []
        v = to_v
        while v > from_version:
            m = self.manifest(v)
            chain.append(m)
            p = int(m.get("parent", v - 1))
            if p >= v:
                raise ValueError(f"corrupt parent pointer at v{v}: {p}")
            v = p
        if v != from_version:
            raise ValueError(
                f"from_version {from_version} is not an ancestor of {to_v} "
                f"(the chain passes from v{chain[-1]['version']} to v{v})"
            )
        parts: list[DataFrame] = []
        for m in reversed(chain):
            v = m["version"]
            op = m.get("operation", "diff")
            schema = T.StructType.fromJson(m["schema"])
            data_cols = [f.name for f in schema.fields]
            if op in ("compact", "rebucket", "merge-noop", "create",
                      "alter-properties", "rename-column", "drop-column"):
                # physical- or metadata-only: no logical row change.
                # (A drop narrows the visible schema; consumers read
                # the final schema from the alignment below.)
                continue
            if op == "merge-mor":
                files = self._commit_files(m, v)
                if not files:
                    continue
                df = self.spark.read.parquet(*files)
                tomb = (
                    F.coalesce(F.col(_TOMBSTONE), F.lit(False))
                    if _TOMBSTONE in df.columns
                    else F.lit(False)
                )
                df = self._align(df.withColumn("_t", tomb), T.StructType(
                    list(schema.fields) + [T.StructField("_t", T.BooleanType(), True)]
                ))
                # Same-commit tie-break, matching read(): a key present
                # as both upsert and tombstone in ONE merge-mor batch
                # resolves to the upsert. Emitting both rows would let
                # a changelog consumer delete a key the snapshot keeps.
                # One keyed aggregate over O(change) rows.
                df = (
                    df.groupBy(key)
                    .agg(
                        F.max_by(
                            F.struct(*[c for c in data_cols if c != key], "_t"),
                            ~F.col("_t"),
                        ).alias("_r")
                    )
                    .select(key, F.col("_r.*"))
                )
                part = df.select(
                    *data_cols,
                    F.when(F.col("_t"), F.lit("delete"))
                    .otherwise(F.lit("upsert"))
                    .alias("_change_type"),
                    F.lit(v).alias("_commit_version"),
                )
            else:
                # generic parent-vs-child diff over the touched buckets
                pm = self.manifest(int(m.get("parent", v - 1)))
                touched = sorted(
                    int(b)
                    for b in set(m["buckets"]) | set(pm["buckets"])
                    if m["buckets"].get(b) != pm["buckets"].get(b)
                )
                if not touched:
                    continue
                # rebucket/compact upstream of the parent cannot occur
                # between a commit and its parent, so bucket numbering
                # is shared across the diff
                old = self._align(
                    self.read(buckets=touched, version=pm["version"]), schema
                )
                new = self._align(self.read(buckets=touched, version=v), schema)
                o = old.select(F.struct(*data_cols).alias("_o"), F.col(key).alias("_k"))
                n = new.select(F.struct(*data_cols).alias("_n"), F.col(key).alias("_k"))
                j = o.join(n, "_k", "full_outer")
                row = F.coalesce(F.col("_n"), F.col("_o"))
                part = (
                    j.filter(~F.col("_o").eqNullSafe(F.col("_n")))
                    .select(
                        *[row.getField(c).alias(c) for c in data_cols],
                        F.when(F.col("_n").isNull(), F.lit("delete"))
                        .otherwise(F.lit("upsert"))
                        .alias("_change_type"),
                        F.lit(v).alias("_commit_version"),
                    )
                )
            parts.append((v, part))
        final_schema = T.StructType(
            list(T.StructType.fromJson(self.manifest(to_v)["schema"]).fields)
            + [
                T.StructField("_change_type", T.StringType(), False),
                T.StructField("_commit_version", T.IntegerType(), False),
            ]
        )
        if not parts:
            return self.spark.createDataFrame([], final_schema)
        # commits before a schema evolution lack the new columns, and
        # commits before a rename carry the OLD name: align each part
        # (alias-aware) before the union, or a renamed column would
        # survive as two half-null columns
        fm = self.manifest(to_v)
        fal, fcm = self._aliases_of(fm), fm.get("columns_meta") or {}
        parts = [
            self._align(
                p, final_schema, aliases=fal, cmeta=fcm, file_version=pv
            )
            for pv, p in parts
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
