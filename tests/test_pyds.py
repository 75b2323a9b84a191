"""dexlake / dexlake-changes Python DataSources (dexspark/pyds.py).

Contract under test: a consumer using only
``spark.read.format("dexlake")`` sees exactly what
``LakeTable.read()`` returns — across COW, MOR (incl. the
same-commit upsert-beats-tombstone tie-break), time travel, tags,
branches and additive schema evolution — and the ``dexlake-changes``
batch/stream readers see exactly ``LakeTable.changes()``, with the
streaming checkpoint giving exactly-once delivery of each commit
range.
"""

import os

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from dexspark import pyds
from dexspark.lake import LakeTable
from dexspark.schema import sequences_schema


@pytest.fixture()
def registered(spark):
    pyds.register(spark)
    return spark


def _base(spark, n=30):
    return spark.range(n).select(
        F.concat(F.lit("doc-"), F.format_string("%03d", F.col("id"))).alias(
            "doc_id"
        ),
        F.array(F.col("id").cast("int"), F.lit(1)).alias("tokens"),
        F.lit(2).alias("n_tok"),
        F.lit("src-a").alias("source"),
    )


def _ups(spark, ids, source="src-b", tok=9):
    return spark.createDataFrame(
        [(f"doc-{i:03d}", [tok, tok], 2, source) for i in ids],
        schema=sequences_schema(),
    )


def _dels(spark, ids):
    return spark.createDataFrame(
        [(f"doc-{i:03d}",) for i in ids], "doc_id string"
    )


def _rows(df, cols=("doc_id", "tokens", "n_tok", "source")):
    return sorted(
        (
            tuple(
                tuple(r[c]) if isinstance(r[c], list) else r[c] for c in cols
            )
            for r in df.collect()
        ),
        key=repr,  # None-tolerant total order (delete rows null-fill)
    )


def _snap(spark, root, **opts):
    r = spark.read.format("dexlake")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(root)


# ------------------------------------------------------------------- snapshot


def test_snapshot_matches_read_cow_and_mor(registered, tmp_path):
    spark = registered
    for mode in ("cow", "mor"):
        root = str(tmp_path / mode)
        t = LakeTable.create(spark, root, sequences_schema(), num_buckets=4)
        t.overwrite(_base(spark))
        t.merge(_ups(spark, [1, 2, 40]), delete_keys=_dels(spark, [3]), mode=mode)
        # same-batch upsert+delete of one key: upsert must win (the
        # MOR tie-break read() implements)
        t.merge(
            _ups(spark, [5, 41], source="src-c"),
            delete_keys=_dels(spark, [5, 2]),
            mode=mode,
        )
        got = _rows(_snap(spark, root))
        want = _rows(t.read())
        assert got == want, mode
        assert ("doc-005", (9, 9), 2, "src-c") in got


def test_snapshot_time_travel_tag_and_buckets(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=4)
    t.overwrite(_base(spark))
    v0 = t.current_version()
    t.tag("pin0", v0)
    t.merge(_ups(spark, [0, 1]), mode="mor")
    assert _rows(_snap(spark, root, version=v0)) == _rows(t.read(version=v0))
    assert _rows(_snap(spark, root, version="pin0")) == _rows(
        t.read(version=v0)
    )
    assert _rows(_snap(spark, root)) == _rows(t.read())
    # bucket pruning option mirrors read(buckets=)
    assert _rows(_snap(spark, root, buckets="0,2")) == _rows(
        t.read(buckets=[0, 2])
    )


def test_snapshot_branch_read(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=4)
    t.overwrite(_base(spark, 10))
    t.create_branch("audit")
    bt = LakeTable(spark, root, branch="audit")
    bt.merge(_ups(spark, [0, 99]), mode="mor")
    assert _rows(_snap(spark, root, branch="audit")) == _rows(bt.read())
    # main unchanged
    assert _rows(_snap(spark, root)) == _rows(t.read())


def test_snapshot_schema_evolution_and_rename(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=2)
    t.overwrite(_base(spark, 8))
    # additive evolution: widen n_tok to bigint + add a column
    evolved = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("n_tok", T.LongType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    up = spark.createDataFrame(
        [("doc-001", [7, 7], 2, "src-b", "en")], schema=evolved
    )
    t.merge(up, mode="mor")
    got = spark.read.format("dexlake").load(root)
    assert [f.name for f in got.schema.fields] == [
        "doc_id",
        "tokens",
        "n_tok",
        "source",
        "lang",
    ]
    assert got.schema["n_tok"].dataType == T.LongType()
    assert _rows(got, cols=("doc_id", "tokens", "n_tok", "source", "lang")) == _rows(
        t.read(), cols=("doc_id", "tokens", "n_tok", "source", "lang")
    )
    # rename: old files resolve through the alias map
    t2 = LakeTable(spark, root)
    t2.rename_column("source", "origin")
    assert _rows(
        _snap(spark, root), cols=("doc_id", "origin")
    ) == _rows(t2.read(), cols=("doc_id", "origin"))


def test_pushdown_prunes_planned_files(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    t = LakeTable.create(
        spark,
        root,
        sequences_schema(),
        num_buckets=1,
        properties={"sort_on_write": "true"},
    )
    # several MOR commits, each appending a narrow doc_id slice ->
    # one delta file per commit with tight zone maps
    for lo in (0, 100, 200, 300):
        t.merge(_ups(spark, range(lo, lo + 20), source=f"s{lo}"), mode="mor")
    n_files = sum(len(fs) for fs in t.manifest()["buckets"].values())
    assert n_files >= 4

    from pyspark.sql.datasource import EqualTo

    rdr = pyds._SnapshotReaderPush({"path": root}, None)
    rdr.pushFilters([EqualTo(("doc_id",), "doc-205")])
    # the raw interval also reaches pyarrow's row-group filter
    assert rdr._key_interval == ("doc-205", "doc-205")
    pruned = rdr.partitions()
    planned_files = sum(
        len(p.files) if isinstance(p, pyds._MorBucketPart) else len(p.paths)
        for p in pruned
        if not isinstance(p, pyds._NoopPart)
    )
    assert planned_files < n_files  # zone maps dropped other slices
    # end-to-end through Spark (filter re-applied on top of pruning)
    got = _snap(spark, root).filter(F.col("doc_id") == "doc-205").collect()
    assert len(got) == 1 and got[0]["source"] == "s200"
    # range predicate prunes too, and stays correct
    rng = (
        _snap(spark, root)
        .filter((F.col("doc_id") >= "doc-300") & (F.col("doc_id") <= "doc-310"))
        .count()
    )
    assert rng == 11
    # one-sided range: zone maps need both bounds, but the row-group
    # filter takes the raw one-sided interval
    one = pyds._SnapshotReaderPush({"path": root}, None)
    from pyspark.sql.datasource import GreaterThanOrEqual

    one.pushFilters([GreaterThanOrEqual(("doc_id",), "doc-300")])
    assert one._key_interval == ("doc-300", None)
    assert (
        _snap(spark, root).filter(F.col("doc_id") >= "doc-300").count() == 20
    )
    # IN-list predicate: pyspark 4.1 stores the tuple in In.value
    from pyspark.sql.datasource import In

    inr = pyds._SnapshotReaderPush({"path": root}, None)
    inr.pushFilters([In(("doc_id",), ("doc-205", "doc-207", None))])
    assert inr._key_interval == ("doc-205", "doc-207")
    in_files = sum(
        len(p.files) if isinstance(p, pyds._MorBucketPart) else len(p.paths)
        for p in inr.partitions()
        if not isinstance(p, pyds._NoopPart)
    )
    assert in_files < n_files
    # end-to-end isin() through Spark (planning must not raise)
    got_in = (
        _snap(spark, root)
        .filter(F.col("doc_id").isin("doc-205", "doc-301"))
        .collect()
    )
    assert sorted(r["doc_id"] for r in got_in) == ["doc-205", "doc-301"]


def test_python_xxh64_matches_spark(spark):
    """The pure-Python xxh64 (bucket pruning's foundation) is
    bit-equal to Spark's xxhash64 for every key dtype the engine
    buckets on — strings (incl. empty, unicode, >32-byte), longs
    (incl. negative / extremes) and ints."""
    from dexspark.xxh64 import bucket_of, xxhash64

    strings = [
        "", "a", "doc-1", "q#42", "x" * 7, "y" * 8, "z" * 31, "w" * 32,
        "long-key-" + "0123456789" * 10, "ünïcødé-κλειδί-鍵",
    ]
    rows = spark.createDataFrame(
        [(s,) for s in strings], "k string"
    ).select("k", F.xxhash64("k").alias("h")).collect()
    for r in rows:
        assert xxhash64(r["k"], "string") == r["h"], r["k"]

    longs = [0, 1, -1, 42, 2**31, -(2**31) - 1, 2**63 - 1, -(2**63)]
    rows = spark.createDataFrame(
        [(v,) for v in longs], "k long"
    ).select("k", F.xxhash64("k").alias("h")).collect()
    for r in rows:
        assert xxhash64(r["k"], "long") == r["h"], r["k"]

    ints = [0, 1, -1, 1234567, -(2**31), 2**31 - 1]
    rows = spark.createDataFrame(
        [(v,) for v in ints], "k int"
    ).select("k", F.xxhash64("k").alias("h")).collect()
    for r in rows:
        assert xxhash64(r["k"], "int") == r["h"], r["k"]

    # bucket_of == pmod(xxhash64, nb) — the engine's bucket expr
    got = spark.createDataFrame([(s,) for s in strings], "k string").select(
        "k", F.pmod(F.xxhash64("k"), F.lit(16)).cast("int").alias("b")
    ).collect()
    for r in got:
        assert bucket_of(r["k"], 16, "string") == r["b"]


def test_point_read_plans_single_bucket(registered, tmp_path):
    """Automatic bucket pruning: a point predicate through the
    DataSource plans at most ONE bucket's files — no manual `buckets`
    option (plan-asserted via reader partitions)."""
    spark = registered
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=8)
    t.overwrite(_base(spark, n=64))
    m = t.manifest()
    n_buckets_with_files = len([b for b, fs in m["buckets"].items() if fs])
    assert n_buckets_with_files > 1

    from pyspark.sql.datasource import EqualTo, In

    rdr = pyds._SnapshotReaderPush({"path": root}, None)
    rdr.pushFilters([EqualTo(("doc_id",), "doc-007")])
    assert rdr._auto_buckets is not None and len(rdr._auto_buckets) == 1
    # every planned (bucket, file) pair belongs to the ONE bucket
    # doc-7 hashes to
    from dexspark.xxh64 import bucket_of

    want_bucket = str(bucket_of("doc-007", m["num_buckets"], "string"))
    planned_buckets = {b for b, rel, fv, is_mor in rdr._files()}
    assert planned_buckets <= {want_bucket}
    assert planned_buckets  # the key's bucket has files
    # end-to-end: the read returns exactly the right row
    got = _snap(spark, root).filter(F.col("doc_id") == "doc-007").collect()
    assert [r["doc_id"] for r in got] == ["doc-007"]
    # isin across two buckets plans exactly those buckets
    rdr2 = pyds._SnapshotReaderPush({"path": root}, None)
    rdr2.pushFilters([In(("doc_id",), ("doc-007", "doc-009"))])
    want = {
        str(bucket_of(k, m["num_buckets"], "string")) for k in ("doc-007", "doc-009")
    }
    assert rdr2._auto_buckets == want
    got2 = _snap(spark, root).filter(
        F.col("doc_id").isin("doc-007", "doc-009")
    ).collect()
    assert sorted(r["doc_id"] for r in got2) == ["doc-007", "doc-009"]


def test_last_per_run_zero_rows():
    """0-chunk / 0-row key columns must not crash the MOR fold."""
    import pyarrow as pa

    empty = pa.chunked_array([], type=pa.string())
    assert pyds._last_per_run(empty).to_pylist() == []
    assert pyds._last_per_run(pa.array([], type=pa.string())).to_pylist() == []
    multi = pa.chunked_array([pa.array(["a", "b"]), pa.array(["b"])])
    assert pyds._last_per_run(multi).to_pylist() == [True, False, True]


def test_sweep_staging_scoped_to_job_token(tmp_path):
    """The post-commit sweep removes THIS job's orphans immediately but
    leaves a concurrent job's young staged files alone (deleting them
    would fail that job's later commit rename)."""
    import time

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField(
                "payload",
                T.StructType([T.StructField("x", T.IntegerType())]),
            ),
            T.StructField("batch_epoch", T.LongType()),
        ]
    )
    w = pyds._BinlogBatchWriter(
        {"path": str(tmp_path)}, schema, job_token="job1"
    )
    d = os.path.join(w.staging, "batch_epoch=0")
    os.makedirs(d)
    mine = os.path.join(d, "part-job1-p0.parquet")
    other_young = os.path.join(d, "part-job2-p0.parquet")
    other_old = os.path.join(d, "part-job3-p0.parquet")
    for p in (mine, other_young, other_old):
        with open(p, "w") as f:
            f.write("x")
    past = time.time() - 200000  # older than the 24h default bound
    os.utime(other_old, (past, past))
    w._sweep_staging()
    assert not os.path.exists(mine)  # own orphan: swept
    assert os.path.exists(other_young)  # live foreign job: kept
    assert not os.path.exists(other_old)  # ancient orphan: swept


# ------------------------------------------------------------------- changes


def test_changes_batch_matches_lake_changes(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=4)
    t.overwrite(_base(spark))
    v0 = t.current_version()
    t.merge(_ups(spark, [1, 2, 50]), delete_keys=_dels(spark, [3]), mode="mor")
    t.merge(_ups(spark, [2, 4]), delete_keys=_dels(spark, [50]), mode="cow")
    t.compact()  # physical-only: must emit nothing
    v1 = t.current_version()

    cols = ("doc_id", "tokens", "n_tok", "source", "_change_type", "_commit_version")
    got = (
        spark.read.format("dexlake-changes")
        .option("fromVersion", v0)
        .option("toVersion", v1)
        .load(root)
    )
    assert _rows(got, cols=cols) == _rows(t.changes(v0, v1), cols=cols)
    # full-history read from the table's creation
    got_all = (
        spark.read.format("dexlake-changes").option("fromVersion", 1).load(root)
    )
    assert _rows(got_all, cols=cols) == _rows(t.changes(1), cols=cols)


def test_changes_stream_exactly_once(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out: list = []

    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=4)
    t.overwrite(_base(spark, 10))
    t.merge(_ups(spark, [1, 2]), delete_keys=_dels(spark, [3]), mode="mor")
    v1 = t.current_version()

    cols = ("doc_id", "tokens", "n_tok", "source", "_change_type", "_commit_version")

    def run_stream():
        q = (
            spark.readStream.format("dexlake-changes")
            .option("startingVersion", 1)
            .load(root)
            .writeStream.foreachBatch(
                lambda df, eid: out.extend(_rows(df, cols=cols))
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()
    assert sorted(out, key=repr) == _rows(t.changes(1, v1), cols=cols)

    # new commits after the first run: the checkpoint resumes from v1
    # and delivers ONLY (v1, v2] — exactly-once over the union
    out2: list = []
    t.merge(_ups(spark, [5, 11], source="src-z"), mode="mor")
    v2 = t.current_version()

    q = (
        spark.readStream.format("dexlake-changes")
        .option("startingVersion", 1)  # ignored: checkpoint wins
        .load(root)
        .writeStream.foreachBatch(
            lambda df, eid: out2.extend(_rows(df, cols=cols))
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(out2, key=repr) == _rows(t.changes(v1, v2), cols=cols)
    assert sorted(out + out2, key=repr) == _rows(t.changes(1, v2), cols=cols)


def test_stream_replays_to_final_state(registered, tmp_path):
    """Replica pattern: tail the changelog stream into a second
    LakeTable; the replica's final state equals the source's."""
    spark = registered
    root = str(tmp_path / "src")
    rep_root = str(tmp_path / "rep")
    ckpt = str(tmp_path / "ckpt")

    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=4)
    t.overwrite(_base(spark, 12))
    t.merge(_ups(spark, [1, 2, 30]), delete_keys=_dels(spark, [0]), mode="mor")
    t.merge(_ups(spark, [2, 5]), delete_keys=_dels(spark, [30]), mode="cow")

    rep = LakeTable.create(spark, rep_root, sequences_schema(), num_buckets=4)

    def apply_batch(df, eid):
        df = df.localCheckpoint(eager=True)
        for v in sorted(
            r[0] for r in df.select("_commit_version").distinct().collect()
        ):
            b = df.filter(F.col("_commit_version") == v)
            rep.merge(
                b.filter(F.col("_change_type") == "upsert").select(
                    "doc_id", "tokens", "n_tok", "source"
                ),
                delete_keys=b.filter(F.col("_change_type") == "delete").select(
                    "doc_id"
                ),
                mode="mor",
            )

    q = (
        spark.readStream.format("dexlake-changes")
        .option("startingVersion", 1)
        .load(root)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _rows(rep.read()) == _rows(t.read())


def test_sql_view_over_dexlake(registered, tmp_path):
    """Pure-SQL consumers: CREATE TEMPORARY VIEW ... USING dexlake
    gives the lake a zero-Python query surface (Spark DDL resolves
    the registered Python data source by name)."""
    spark = registered
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=2)
    t.overwrite(_base(spark, 7))
    t.merge(_ups(spark, [1]), delete_keys=_dels(spark, [2]), mode="mor")
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW lake_sql USING dexlake "
        f"OPTIONS (path '{root}')"
    )
    n = spark.sql("SELECT count(*) AS n FROM lake_sql").collect()[0]["n"]
    assert n == t.read().count() == 6
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW lake_ch USING `dexlake-changes` "
        f"OPTIONS (path '{root}', fromVersion '2')"
    )
    got = spark.sql(
        "SELECT _change_type, count(*) n FROM lake_ch GROUP BY 1 ORDER BY 1"
    ).collect()
    assert [(r["_change_type"], r["n"]) for r in got] == [
        ("delete", 1),
        ("upsert", 1),
    ]
    spark.catalog.dropTempView("lake_sql")
    spark.catalog.dropTempView("lake_ch")


# ---------------------------------------------------------------- binlog sink


def _envelopes(spark, rows):
    """rows: (op, doc_id, [tokens], epoch) -> envelope frame."""
    return spark.createDataFrame(
        [
            (
                op,
                d,
                (toks, len(toks) if toks else 0, "web"),
                ts,
                i,
                e,
            )
            for i, (op, d, toks, e, ts) in enumerate(rows)
        ],
        T.StructType(
            [
                T.StructField("op", T.StringType()),
                T.StructField("doc_id", T.StringType()),
                T.StructField(
                    "payload",
                    T.StructType(
                        [
                            T.StructField("tokens", T.ArrayType(T.IntegerType())),
                            T.StructField("n_tok", T.IntegerType()),
                            T.StructField("source", T.StringType()),
                        ]
                    ),
                ),
                T.StructField("commit_ts", T.TimestampType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("batch_epoch", T.LongType()),
            ]
        ),
    )


def test_binlog_sink_batch_roundtrip_and_engine_apply(registered, tmp_path):
    """Produce a binlog purely through the sink, then consume it with
    the standard structured reader AND the full CDC engine."""
    import datetime as dt

    from dexspark.config import EngineConfig
    from dexspark.events import read_binlog_parquet
    from dexspark.stream import CdcEngine

    spark = registered
    log = str(tmp_path / "binlog")
    ts = dt.datetime(2026, 1, 1)
    ev = _envelopes(
        spark,
        [
            ("insert", "a", [1, 2], 0, ts),
            ("insert", "b", [3], 0, ts),
            ("update", "a", [9, 9], 1, ts + dt.timedelta(seconds=1)),
            ("delete", "b", None, 1, ts + dt.timedelta(seconds=2)),
        ],
    )
    ev.write.format("dexlake-binlog").mode("append").save(log)
    # append-only contract
    with pytest.raises(Exception):
        ev.write.format("dexlake-binlog").mode("overwrite").save(log)
    # second append accumulates (same layout, new files)
    ev2 = _envelopes(
        spark, [("insert", "c", [5, 5, 5], 2, ts + dt.timedelta(seconds=3))]
    )
    ev2.write.format("dexlake-binlog").mode("append").save(log)

    back = read_binlog_parquet(spark, log)
    assert back.count() == 5
    assert back.filter("envelope_fail IS NOT NULL").count() == 0
    # payload schema arrived via the sidecar (source column intact)
    assert back.filter("payload.source = 'web'").count() == 5

    table = LakeTable.create(
        spark, str(tmp_path / "tbl"), sequences_schema(), num_buckets=4
    )
    eng = CdcEngine(
        spark, table, str(tmp_path / "wh"), EngineConfig(num_buckets=4)
    )
    eng.apply_binlog(log)
    assert _rows(table.read()) == [
        ("a", (9, 9), 2, "web"),
        ("c", (5, 5, 5), 3, "web"),
    ]
    # replay: epochs already committed -> version unchanged
    v = table.current_version()
    eng.apply_binlog(log)
    assert table.current_version() == v


def test_binlog_sink_streaming(registered, tmp_path):
    """writeStream.format('dexlake-binlog'): micro-batches land as
    epoch partitions; a second availableNow run with the same
    checkpoint appends only the new source files; batches of the SAME
    epoch across triggers coexist (no file collisions)."""
    import datetime as dt

    from dexspark.events import read_binlog_parquet

    spark = registered
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ck")
    ts = dt.datetime(2026, 1, 1)

    def emit(rows):
        _envelopes(spark, rows).coalesce(1).write.mode("append").parquet(src)

    emit([("insert", "a", [1], 0, ts), ("insert", "b", [2], 0, ts)])

    def run():
        q = (
            spark.readStream.schema(
                _envelopes(spark, [("insert", "x", [1], 0, ts)]).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("dexlake-binlog")
            .option("path", log)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert read_binlog_parquet(spark, log).count() == 2
    # same epoch again in a later trigger + a new epoch
    emit([("update", "a", [9], 0, ts + dt.timedelta(seconds=1))])
    emit([("insert", "c", [3], 1, ts + dt.timedelta(seconds=2))])
    run()
    back = read_binlog_parquet(spark, log)
    assert back.count() == 4
    assert sorted(
        (r["doc_id"], r["batch_epoch"]) for r in back.collect()
    ) == [("a", 0), ("a", 0), ("b", 0), ("c", 1)]


def test_binlog_sink_nonnullable_producer_schema(registered, tmp_path):
    """A producer frame with NOT NULL struct fields (spark.range
    derivations, NOT NULL table schemas) must yield a consumable log:
    the sidecar is normalized to nullable-everything, or the stream
    reader's cast to the envelope schema fails at analysis (caught by
    the CLI drive, fixed on both the write and read side)."""
    from dexspark.events import read_binlog_parquet, read_binlog_parquet_stream

    spark = registered
    log = str(tmp_path / "log")
    df = spark.range(10).select(
        F.lit("insert").alias("op"),
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.struct(
            F.array(F.col("id").cast("int")).alias("tokens"),
            F.lit(1).alias("n_tok"),
            F.lit("web").alias("source"),
        ).alias("payload"),
        F.timestamp_micros(F.col("id")).alias("commit_ts"),
        F.col("id").alias("lsn"),
        F.lit(0).cast("long").alias("batch_epoch"),
    )
    assert not df.schema["payload"].dataType["n_tok"].nullable  # the trap
    df.write.format("dexlake-binlog").mode("append").save(log)
    assert read_binlog_parquet(spark, log).count() == 10
    # the STREAM reader (the CLI tail path) must also analyze + run
    got: list = []
    q = (
        read_binlog_parquet_stream(spark, log)
        .writeStream.foreachBatch(lambda d, eid: got.append(d.count()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sum(got) == 10


def test_meta_views(registered, tmp_path):
    """option('meta', ...) — the Iceberg metadata-tables surface:
    files/history/stats/tags/branches from the manifest alone."""
    spark = registered
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=2)
    t.overwrite(_base(spark, 10))
    t.merge(_ups(spark, [1, 2]), mode="mor")
    t.tag("pin", t.current_version())
    t.create_branch("wip")

    def meta(name, **opts):
        r = spark.read.format("dexlake").option("meta", name)
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load(root)

    files = meta("files")
    want_files = t.files()
    assert files.count() == want_files.count()
    assert sorted(r["path"] for r in files.collect()) == sorted(
        r["path"] for r in want_files.collect()
    )
    # zone-map bounds present and typed like the key
    assert files.schema["min_key"].dataType == T.StringType()
    assert files.filter("min_key IS NOT NULL").count() == files.count()

    hist = meta("history").collect()
    assert [r["operation"] for r in hist] == [
        h["operation"] for h in t.history()
    ]

    stats = meta("stats").collect()[0].asDict()
    assert stats == {**t.stats(), "exact": stats["exact"]}

    assert [(r["name"], r["version"]) for r in meta("tags").collect()] == [
        ("pin", t.current_version())
    ]
    b = meta("branches").collect()
    assert [(r["name"], r["fork_version"], r["head"]) for r in b] == [
        ("wip", t.current_version(), t.current_version())
    ]
    # time travel applies to files/stats
    v0 = 2  # the overwrite commit
    assert meta("files", version=v0).count() == t.files(version=v0).count()


def test_binlog_sink_sidecar_schema_monotone(registered, tmp_path):
    """Producers evolve independently: an evolved producer's extra
    payload column survives in the sidecar even when a STALE producer
    appends afterwards (reconcile-on-write, additive union)."""
    import datetime as dt

    from dexspark.events import _sidecar_payload_schema

    spark = registered
    log = str(tmp_path / "log")
    ts = dt.datetime(2026, 1, 1)
    old = _envelopes(spark, [("insert", "a", [1], 0, ts)])
    evolved = old.withColumn(
        "payload",
        F.struct(
            F.col("payload.tokens").alias("tokens"),
            F.col("payload.n_tok").alias("n_tok"),
            F.col("payload.source").alias("source"),
            F.lit("en").alias("lang"),
        ),
    )
    evolved.write.format("dexlake-binlog").mode("append").save(log)
    assert "lang" in _sidecar_payload_schema(log).fieldNames()
    # stale producer appends WITHOUT lang: sidecar keeps it
    old.write.format("dexlake-binlog").mode("append").save(log)
    side = _sidecar_payload_schema(log)
    assert "lang" in side.fieldNames()
    from dexspark.events import read_binlog_parquet

    back = read_binlog_parquet(spark, log)
    assert back.count() == 2
    assert back.filter("payload.lang = 'en'").count() == 1



# ------------------------------------------------------------------ lake sink


def test_foreach_batch_merge_exactly_once(registered, tmp_path):
    """pyds.foreach_batch_merge: per-micro-batch MERGE with the batch
    id as epoch marker — checkpoint resume merges only new data, a
    replayed batch id is a no-op, and epoch_offset gives a fresh
    pipeline its own epoch space."""
    spark = registered
    root = str(tmp_path / "t")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=4)
    t.overwrite(_base(spark, 5))

    def emit(ids, source):
        _ups(spark, ids, source=source).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run(ck, offset=0):
        q = (
            spark.readStream.schema(sequences_schema())
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                pyds.foreach_batch_merge(root, epoch_offset=offset)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    emit([1, 2], "s1")
    run(ckpt)
    t = LakeTable(spark, root)
    got = dict((r[0], r[3]) for r in _rows(t.read()))
    assert got["doc-001"] == "s1" and got["doc-002"] == "s1"
    w0, _ = t.epoch_state()
    assert w0 >= 0  # batch 0 marked
    v0 = t.current_version()

    # replayed batch id: direct call with an already-committed id
    pyds.foreach_batch_merge(root)(_ups(spark, [9], source="dup"), 0)
    t = LakeTable(spark, root)
    assert t.current_version() == v0  # no-op
    assert "doc-009" not in dict((r[0], r[3]) for r in _rows(t.read()))

    # checkpoint resume: only the new file merges
    emit([3], "s2")
    run(ckpt)
    t = LakeTable(spark, root)
    assert dict((r[0], r[3]) for r in _rows(t.read()))["doc-003"] == "s2"

    # fresh checkpoint, fresh epoch space
    emit([4], "s3")
    w1, _ = t.epoch_state()
    run(str(tmp_path / "ck2"), offset=w1 + 1)
    t = LakeTable(spark, root)
    assert dict((r[0], r[3]) for r in _rows(t.read()))["doc-004"] == "s3"


def test_changes_format_over_gnarly_history(registered, tmp_path):
    """The format's CDF planner must mirror LakeTable.changes across
    the FULL operation zoo: MOR merge with deletes, COW merge,
    physical-only rebucket, delete_where (tombstone MERGE), rollback
    (manifest-copy restore) and rewrite_payload (in-place transform)
    — including reading the range THROUGH the rebucket's bucket-space
    change."""
    spark = registered
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=2)
    t.overwrite(_base(spark, 20))
    v0 = t.current_version()
    t.merge(_ups(spark, [1, 2, 30]), delete_keys=_dels(spark, [3]), mode="mor")
    t.merge(_ups(spark, [4], source="src-c"), mode="cow")
    t.rebucket(4)  # physical only: emits nothing
    t.delete_where("source = 'src-c'")  # tombstone merge
    bad_v = t.current_version()
    t.merge(_ups(spark, [5, 6], source="bad-batch"), mode="mor")
    t.rollback(bad_v)  # restore: bad batch rows retract
    t.rewrite_payload({"n_tok": "n_tok + 100"})  # in-place transform
    v1 = t.current_version()

    cols = ("doc_id", "tokens", "n_tok", "source", "_change_type", "_commit_version")
    got = (
        spark.read.format("dexlake-changes")
        .option("fromVersion", v0)
        .option("toVersion", v1)
        .load(root)
    )
    assert _rows(got, cols=cols) == _rows(t.changes(v0, v1), cols=cols)
    # and the final snapshot read through the format survives it all
    assert _rows(_snap(spark, root)) == _rows(t.read())
