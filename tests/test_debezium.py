"""Debezium-envelope source: wire-format parsing, ordering-key fallbacks,
envelope unwrap, tombstone handling, flattening, error modes — and
end-to-end convergence of a Debezium topic dump replayed through the engine
against the pure-Python LWW oracle."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.sources.debezium import read_debezium_changes
from tests.oracle import as_tuple_set, lww_fold


def _write_log(tmp_path, events, name="dbz.jsonl"):
    p = tmp_path / name
    with open(p, "w") as f:
        for ev in events:
            f.write(json.dumps(ev) + "\n")
    return str(p)


def _ev(op, key, lsn, before=None, after=None, ts_ms=None, source=None):
    src = {"lsn": lsn}
    if source:
        src.update(source)
    ev = {"op": op, "before": before, "after": after, "source": src}
    if ts_ms is not None:
        ev["ts_ms"] = ts_ms
    return ev


BASIC = [
    _ev("r", "a", 1, after={"doc_id": "a", "val": "snap", "n": 10}, ts_ms=1000),
    _ev("c", "b", 2, after={"doc_id": "b", "val": "new", "n": 20}, ts_ms=2000),
    _ev(
        "u",
        "a",
        3,
        before={"doc_id": "a", "val": "snap", "n": 10},
        after={"doc_id": "a", "val": "upd", "n": 11},
        ts_ms=3000,
    ),
    _ev("d", "b", 4, before={"doc_id": "b", "val": "new", "n": 20}, ts_ms=4000),
]


def test_basic_parse_and_op_map(spark, tmp_path):
    path = _write_log(tmp_path, BASIC)
    df = read_debezium_changes(spark, path)
    rows = {r["lsn"]: r.asDict() for r in df.collect()}
    assert set(df.columns) == {"lsn", "op", "doc_id", "val", "n", "commit_ts"}
    # c and r both map to I; u -> U; d -> D
    assert [rows[i]["op"] for i in (1, 2, 3, 4)] == ["I", "I", "U", "D"]
    # after-image for c/r/u
    assert rows[3]["val"] == "upd" and rows[3]["n"] == 11
    # delete carries the before-image (after is null in a Debezium delete)
    assert rows[4]["doc_id"] == "b" and rows[4]["val"] == "new"
    # commit_ts from ts_ms
    assert rows[1]["commit_ts"].timestamp() == 1.0


def test_tombstones_and_schema_lines_dropped(spark, tmp_path):
    events = list(BASIC) + [
        {"before": None, "after": None, "source": None, "op": None},  # tombstone
        {"schema": {"type": "struct"}},  # schema-only line
        # logical message: documented non-row event, no image — dropped
        {"before": None, "after": None, "source": {"lsn": 100}, "op": "m"},
    ]
    path = _write_log(tmp_path, events)
    df = read_debezium_changes(spark, path)
    assert df.count() == 4


def test_unknown_op_and_missing_op_flow_to_quarantine(spark, tmp_path):
    # an UNKNOWN op — or a row image with NO op at all — is not silently
    # dropped: it flows through as a null-op row for the engine's
    # malformed-event quarantine to catch
    weird = list(BASIC) + [
        {"before": None, "after": {"doc_id": "z", "val": "?", "n": 0},
         "source": {"lsn": 101}, "op": "x"},
        {"before": None, "after": {"doc_id": "w", "val": "!", "n": 1},
         "source": {"lsn": 102}},  # image but no op: producer bug
    ]
    df = read_debezium_changes(spark, _write_log(tmp_path, weird, "w.jsonl"))
    assert df.count() == 6
    assert df.filter("op is null").count() == 2
    assert {r["doc_id"] for r in df.filter("op is null").collect()} == {"z", "w"}


def test_truncate_event_raises_by_default(spark, tmp_path):
    # op='t' is a delete-all the engine cannot apply — loud by default
    events = list(BASIC) + [
        {"before": None, "after": None, "source": {"lsn": 99}, "op": "t"},
    ]
    path = _write_log(tmp_path, events, "trunc.jsonl")
    df = read_debezium_changes(spark, path)
    with pytest.raises(Exception, match="truncate"):
        df.collect()
    # explicit opt-in accepts the divergence and drops the event
    df2 = read_debezium_changes(spark, path, on_truncate="ignore")
    assert df2.count() == 4


def test_kafka_connect_envelope_unwrap(spark, tmp_path):
    wrapped = [{"schema": {"type": "struct"}, "payload": ev} for ev in BASIC]
    path = _write_log(tmp_path, wrapped)
    df = read_debezium_changes(spark, path)
    assert df.count() == 4
    assert {r["op"] for r in df.collect()} == {"I", "U", "D"}


def test_ordering_key_fallbacks(spark, tmp_path):
    # source.pos when source.lsn is absent (MySQL binlog)
    mysql = [
        {
            "op": "c",
            "after": {"doc_id": "x", "val": "1"},
            "before": None,
            "source": {"pos": 77, "file": "binlog.000001"},
        }
    ]
    df = read_debezium_changes(spark, _write_log(tmp_path, mysql, "my.jsonl"))
    assert df.first()["lsn"] == 77

    # MongoDB shape: source.ts_ms + source.ord — the in-second counter
    # breaks same-timestamp ties, so two same-ms updates stay ordered
    mongo = [
        {"op": "u", "after": {"doc_id": "m", "val": "v1"}, "before": None,
         "source": {"ts_ms": 1000, "ord": 1}},
        {"op": "u", "after": {"doc_id": "m", "val": "v2"}, "before": None,
         "source": {"ts_ms": 1000, "ord": 2}},
    ]
    df = read_debezium_changes(spark, _write_log(tmp_path, mongo, "mo.jsonl"))
    lsns = sorted(r["lsn"] for r in df.collect())
    assert lsns == [(1000 << 12) + 1, (1000 << 12) + 2]

    # ts_ms when source carries neither — lossy fallback, warned
    bare = [
        {"op": "c", "after": {"doc_id": "y", "val": "2"}, "before": None,
         "source": {"db": "d"}, "ts_ms": 5555}
    ]
    with pytest.warns(UserWarning, match="falls back to the envelope ts_ms"):
        df = read_debezium_changes(spark, _write_log(tmp_path, bare, "ts.jsonl"))
    assert df.first()["lsn"] == 5555

    # an image field named commit_ts is only a collision when the envelope
    # actually emits commit_ts (i.e. a top-level ts_ms exists)
    has_ct = [
        {"op": "c", "after": {"doc_id": "z", "commit_ts": "2020-01-01"},
         "before": None, "source": {"lsn": 3}}
    ]
    df = read_debezium_changes(spark, _write_log(tmp_path, has_ct, "ct.jsonl"))
    assert df.first()["commit_ts"] == "2020-01-01"
    clash = [dict(ev, ts_ms=123) for ev in has_ct]
    with pytest.raises(ValueError, match="collides"):
        read_debezium_changes(spark, _write_log(tmp_path, clash, "ct2.jsonl"))

    # explicit lsn_expr wins over everything (file+pos combined)
    df = read_debezium_changes(
        spark,
        _write_log(tmp_path, mysql, "my2.jsonl"),
        lsn_expr=F.regexp_extract("source.file", r"(\d+)$", 1).cast("long")
        * 1_000_000_000
        + F.col("source.pos"),
    )
    assert df.first()["lsn"] == 1_000_000_077

    # no ordering key at all -> loud error
    nokey = [{"op": "c", "after": {"doc_id": "z"}, "before": None,
              "source": {"db": "d"}}]
    with pytest.raises(ValueError, match="no ordering key"):
        read_debezium_changes(spark, _write_log(tmp_path, nokey, "nk.jsonl"))


def test_nested_struct_flatten(spark, tmp_path):
    events = [
        {
            "op": "c",
            "before": None,
            "after": {"doc_id": "a", "geo": {"lat": 1.5, "lon": 2.5}},
            "source": {"lsn": 1},
        }
    ]
    df = read_debezium_changes(spark, _write_log(tmp_path, events))
    row = df.first()
    assert row["geo__lat"] == 1.5 and row["geo__lon"] == 2.5
    # flatten=False keeps the struct (normalized)
    df2 = read_debezium_changes(
        spark, _write_log(tmp_path, events, "f2.jsonl"), flatten=False
    )
    assert isinstance(df2.schema["geo"].dataType, T.StructType)


def test_error_modes(spark, tmp_path):
    # no op field anywhere
    with pytest.raises(ValueError, match="no 'op' field"):
        read_debezium_changes(
            spark, _write_log(tmp_path, [{"x": 1}], "noop.jsonl")
        )
    # key field absent from the images
    with pytest.raises(ValueError, match="key field"):
        read_debezium_changes(
            spark,
            _write_log(
                tmp_path,
                [{"op": "c", "after": {"id": "a"}, "before": None,
                  "source": {"lsn": 1}}],
                "nokeyf.jsonl",
            ),
        )
    # image field colliding with an envelope column
    with pytest.raises(ValueError, match="collides"):
        read_debezium_changes(
            spark,
            _write_log(
                tmp_path,
                [{"op": "c",
                  "after": {"doc_id": "a", "lsn": 9}, "before": None,
                  "source": {"lsn": 1}}],
                "coll.jsonl",
            ),
        )


def test_custom_key_field(spark, tmp_path):
    events = [
        {"op": "c", "before": None,
         "after": {"order_id": 42, "status": "open"}, "source": {"lsn": 1}}
    ]
    df = read_debezium_changes(
        spark, _write_log(tmp_path, events), key_field="order_id"
    )
    row = df.first()
    # key is hoisted to doc_id as string; no duplicate order_id column
    assert row["doc_id"] == "42"
    assert "order_id" not in df.columns


def test_cli_replay_debezium_format(spark, tmp_path, capsys):
    """`replay --format debezium` ingests a topic dump from the CLI."""
    from dbimport_spark.cli import main

    path = _write_log(tmp_path, BASIC)
    payload_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("val", T.StringType(), True),
            T.StructField("n", T.LongType(), True),
        ]
    )
    root = str(tmp_path / "cli_table")
    CDCEngine.create_table(root, payload_schema=payload_schema, num_buckets=2)
    rc = main(["replay", root, path, "--format", "debezium", "--batches", "1"])
    assert rc in (0, None)
    out = json.loads(capsys.readouterr().out.strip())
    assert out["events"] == 4 and out["applied"] == 1
    from dbimport_spark.lake.table import LakeTable

    rows = {r["doc_id"]: r.asDict()
            for r in LakeTable.load(root).read(spark).collect()}
    assert set(rows) == {"a"}  # b was deleted at lsn 4
    assert rows["a"]["val"] == "upd"


def test_stream_debezium_tail(spark, tmp_path):
    """Tail a growing Debezium topic directory under Structured Streaming:
    initial segments apply, a later segment applies incrementally, and a
    restart over the same checkpoint re-applies nothing."""
    from dbimport_spark.sources.debezium import stream_debezium_changes
    from dbimport_spark.streaming.stream import run_stream

    log_dir = tmp_path / "topic"
    log_dir.mkdir()

    def seg(name, events):
        _write_log(log_dir, events, name)

    seg("000.jsonl", [
        _ev("r", "a", 1, after={"doc_id": "a", "val": "s1", "n": 1}, ts_ms=1),
        _ev("r", "b", 2, after={"doc_id": "b", "val": "s2", "n": 2}, ts_ms=2),
    ])
    seg("001.jsonl", [
        _ev("u", "a", 3, before={"doc_id": "a", "val": "s1", "n": 1},
            after={"doc_id": "a", "val": "u3", "n": 3}, ts_ms=3),
    ])

    payload_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("val", T.StringType(), True),
            T.StructField("n", T.LongType(), True),
        ]
    )
    root = str(tmp_path / "stream_table")
    table = CDCEngine.create_table(root, payload_schema=payload_schema,
                                   num_buckets=2)
    eng = CDCEngine(spark, table)
    ckpt = str(tmp_path / "ckpt")

    stream_df = stream_debezium_changes(spark, str(log_dir))
    run_stream(eng, stream_df, checkpoint_dir=ckpt).awaitTermination()
    state = {r["doc_id"]: r["val"] for r in table.read(spark).collect()}
    assert state == {"a": "u3", "b": "s2"}
    assert table.last_lsn() == 3

    # a new segment arrives: delete b, insert c
    seg("002.jsonl", [
        _ev("d", "b", 4, before={"doc_id": "b", "val": "s2", "n": 2}, ts_ms=4),
        _ev("c", "c", 5, after={"doc_id": "c", "val": "new", "n": 5}, ts_ms=5),
    ])
    stream_df = stream_debezium_changes(spark, str(log_dir))
    run_stream(eng, stream_df, checkpoint_dir=ckpt).awaitTermination()
    state = {r["doc_id"]: r["val"] for r in table.read(spark).collect()}
    assert state == {"a": "u3", "c": "new"}
    assert table.last_lsn() == 5
    v_done = table.current().version

    # restart with nothing new: exactly-once, no state or version change
    stream_df = stream_debezium_changes(spark, str(log_dir))
    run_stream(eng, stream_df, checkpoint_dir=ckpt).awaitTermination()
    assert table.current().version == v_done


def test_stream_schema_cache_persists_inference(spark, tmp_path):
    """With schema_cache set, the inferred raw schema is persisted and a
    restart loads it instead of re-scanning the archive for inference."""
    from dbimport_spark.sources.debezium import stream_debezium_changes

    log_dir = tmp_path / "topic"
    log_dir.mkdir()
    _write_log(log_dir, [
        _ev("c", "a", 1, after={"doc_id": "a", "val": "v", "n": 1}, ts_ms=1),
    ], "000.jsonl")
    cache = str(tmp_path / "ckpt" / "debezium_schema.json")

    df1 = stream_debezium_changes(spark, str(log_dir), schema_cache=cache)
    import os

    assert os.path.exists(cache)
    cached = T.StructType.fromJson(json.load(open(cache)))
    assert "after" in cached.fieldNames()

    # restart: the cache is authoritative — narrow it by hand and the
    # restarted stream reflects the cached schema, proving no re-inference
    narrowed = T.StructType([f for f in cached.fields if f.name != "ts_ms"])
    with open(cache, "w") as f:
        json.dump(narrowed.jsonValue(), f)
    df2 = stream_debezium_changes(spark, str(log_dir), schema_cache=cache)
    assert "commit_ts" in df1.columns and "commit_ts" not in df2.columns


def test_stream_recover_rereads_segments_as_debezium(spark, tmp_path):
    """A genuinely late JSONL segment under on_out_of_order='recover' with
    the Debezium re-reader: the authoritative fold re-reads the segments
    through the Debezium projection (the default parquet re-read would
    die on JSON-lines) and converges the late key."""
    from dbimport_spark.sources.debezium import (
        read_debezium_changes,
        stream_debezium_changes,
    )
    from dbimport_spark.streaming.stream import run_stream

    log_dir = tmp_path / "topic"
    log_dir.mkdir()
    _write_log(log_dir, [
        _ev("c", "a", 1, after={"doc_id": "a", "val": "a1", "n": 1}, ts_ms=1),
        _ev("c", "b", 2, after={"doc_id": "b", "val": "b2", "n": 2}, ts_ms=2),
    ], "000.jsonl")
    _write_log(log_dir, [
        _ev("u", "a", 5, before={"doc_id": "a", "val": "a1", "n": 1},
            after={"doc_id": "a", "val": "a5", "n": 5}, ts_ms=5),
    ], "001.jsonl")

    payload_schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
    ])
    root = str(tmp_path / "rec_table")
    table = CDCEngine.create_table(root, payload_schema=payload_schema,
                                   num_buckets=2)
    eng = CDCEngine(spark, table)
    ckpt = str(tmp_path / "ckpt")

    def reread(sp, paths):
        return read_debezium_changes(sp, list(paths))

    # one file per micro-batch so the last commit's window is [5,5] — a
    # late segment inside a wider single-batch window would hit the
    # documented first-batch re-delivery heuristic instead
    stream_df = stream_debezium_changes(spark, str(log_dir),
                                        max_files_per_trigger=1)
    run_stream(eng, stream_df, checkpoint_dir=ckpt,
               reread=reread).awaitTermination()
    assert table.last_lsn() == 5

    # a LATE segment arrives: lsn 3-4 below the watermark, never ledgered —
    # it updates b (lsn 3) and inserts c (lsn 4)
    _write_log(log_dir, [
        _ev("u", "b", 3, before={"doc_id": "b", "val": "b2", "n": 2},
            after={"doc_id": "b", "val": "b3", "n": 3}, ts_ms=3),
        _ev("c", "c", 4, after={"doc_id": "c", "val": "c4", "n": 4}, ts_ms=4),
    ], "00late.jsonl")
    stream_df = stream_debezium_changes(spark, str(log_dir))
    run_stream(eng, stream_df, checkpoint_dir=ckpt, on_out_of_order="recover",
               reread=reread).awaitTermination()
    state = {r["doc_id"]: r["val"] for r in table.read(spark).collect()}
    assert state == {"a": "a5", "b": "b3", "c": "c4"}


def test_debezium_schema_evolution_through_engine(spark, tmp_path):
    """Later Debezium events carrying a NEW image column evolve the table
    additively: the JSON reader infers the union schema, early events read
    the column as null, the engine adds it without a rewrite."""
    events = [
        _ev("c", "a", 1, after={"doc_id": "a", "val": "v1"}, ts_ms=1),
        _ev("c", "b", 2,
            after={"doc_id": "b", "val": "v2", "score": 0.5}, ts_ms=2),
        _ev("u", "a", 3, before={"doc_id": "a", "val": "v1"},
            after={"doc_id": "a", "val": "v3", "score": 0.9}, ts_ms=3),
    ]
    path = _write_log(tmp_path, events, "evo.jsonl")
    changes = read_debezium_changes(spark, path)
    assert "score" in changes.columns

    payload_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("val", T.StringType(), True),
        ]
    )
    root = str(tmp_path / "evo_table")
    table = CDCEngine.create_table(root, payload_schema=payload_schema,
                                   num_buckets=2)
    eng = CDCEngine(spark, table, checkpoint_dir=f"{root}/_ckpt")
    eng.replay(changes, num_batches=1)
    rows = {r["doc_id"]: r.asDict() for r in table.read(spark).collect()}
    assert rows["a"]["val"] == "v3" and rows["a"]["score"] == 0.9
    assert rows["b"]["score"] == 0.5


def test_end_to_end_engine_convergence(spark, tmp_path):
    """A Debezium topic dump (snapshot reads + inserts + updates + deletes,
    interleaved and out of order in the file) replayed through CDCEngine
    converges to the LWW oracle's state."""
    import random

    rng = random.Random(7)
    keys = [f"k{i}" for i in range(40)]
    events, lsn = [], 0
    live: dict[str, dict] = {}
    for k in keys[:20]:  # initial snapshot
        lsn += 1
        img = {"doc_id": k, "val": f"snap-{k}", "n": lsn}
        live[k] = img
        events.append(_ev("r", k, lsn, after=img, ts_ms=lsn * 1000))
    for _ in range(300):
        lsn += 1
        k = rng.choice(keys)
        if k in live:
            if rng.random() < 0.25:
                events.append(
                    _ev("d", k, lsn, before=live.pop(k), ts_ms=lsn * 1000)
                )
            else:
                new = {"doc_id": k, "val": f"v{lsn}", "n": lsn}
                events.append(
                    _ev("u", k, lsn, before=live[k], after=new,
                        ts_ms=lsn * 1000)
                )
                live[k] = new
        else:
            new = {"doc_id": k, "val": f"v{lsn}", "n": lsn}
            events.append(_ev("c", k, lsn, after=new, ts_ms=lsn * 1000))
            live[k] = new

    rng.shuffle(events)  # arrival order is NOT commit order
    path = _write_log(tmp_path, events, "topic.jsonl")
    changes = read_debezium_changes(spark, path)

    payload_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("val", T.StringType(), True),
            T.StructField("n", T.LongType(), True),
        ]
    )
    root = str(tmp_path / "dbz_table")
    table = CDCEngine.create_table(root, payload_schema=payload_schema,
                                   num_buckets=4)
    eng = CDCEngine(spark, table, checkpoint_dir=f"{root}/_ckpt")
    eng.replay(changes, num_batches=3)

    got = as_tuple_set(
        [r.asDict() for r in table.read(spark).collect()],
        ["doc_id", "val", "n"],
    )
    ora = lww_fold([r.asDict() for r in changes.collect()])
    want = as_tuple_set(list(ora.values()), ["doc_id", "val", "n"])
    assert got == want
    assert want == as_tuple_set(list(live.values()), ["doc_id", "val", "n"])


def test_stream_corrupt_line_quarantined_not_dropped(spark, tmp_path):
    """The stream's fixed schema is inferred from initially-CLEAN files,
    which lacks _corrupt_record — a later corrupt line then parsed to
    all-nulls and was dropped as a Kafka tombstone, violating the
    'unknown wire content is never silently lost' contract. The resolved
    stream schema must always carry the corrupt-record column so the
    line flows to the engine's malformed-event quarantine."""
    import os

    from dbimport_spark.sources.debezium import stream_debezium_changes
    from dbimport_spark.streaming.stream import run_stream

    log_dir = tmp_path / "topic"
    log_dir.mkdir()
    _write_log(log_dir, [
        _ev("r", "a", 1, after={"doc_id": "a", "val": "s1", "n": 1}, ts_ms=1),
    ], "000.jsonl")

    payload_schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
    ])
    table = CDCEngine.create_table(
        str(tmp_path / "t"), payload_schema=payload_schema, num_buckets=2
    )
    qdir = str(tmp_path / "q")
    eng = CDCEngine(spark, table, quarantine_dir=qdir)
    ckpt = str(tmp_path / "ckpt")

    stream_df = stream_debezium_changes(spark, str(log_dir))
    run_stream(eng, stream_df, checkpoint_dir=ckpt).awaitTermination()
    assert table.last_lsn() == 1

    # a later segment: one good event and one corrupt line
    with open(log_dir / "001.jsonl", "w") as f:
        f.write(json.dumps(_ev(
            "c", "b", 2, after={"doc_id": "b", "val": "s2", "n": 2}, ts_ms=2,
        )) + "\n")
        f.write('{"op": "c", "after": {"doc_id": "bro\n')  # truncated JSON

    stream_df = stream_debezium_changes(spark, str(log_dir))
    run_stream(eng, stream_df, checkpoint_dir=ckpt).awaitTermination()

    # the good event applied; the corrupt line is PARKED, not vanished
    state = {r["doc_id"]: r["val"] for r in table.read(spark).collect()}
    assert state == {"a": "s1", "b": "s2"}
    parked = eng.list_quarantine()
    assert parked, "corrupt wire line was silently dropped"
    q = spark.read.parquet(
        os.path.join(qdir, parked[0]["dir"])
    ).collect()
    assert len(q) == 1 and q[0]["lsn"] is None
    # the raw wire line rides along as repair evidence (dl_raw) — the
    # parsed payload columns are all null, so without it the parked row
    # would carry nothing to reconstruct the event from
    assert q[0]["dl_raw"] is not None and "bro" in q[0]["dl_raw"]
