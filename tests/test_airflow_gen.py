"""Airflow DAG generation over the registry (reference
Schedule/Airflow.py: generateDAG 288-428, createDAGfileWithHeader
1024-1170, addTasksToDAGfile 1737-2210, convertTimeToCron 1000-1010).

The emitted file is source text — airflow isn't installed here, so the
tests compile() it and walk the AST for structure (tasks, bash
commands, >> dependency edges) instead of importing it."""

import ast
import json

import pytest

from dbimport_spark.plans.airflow_gen import convert_time_to_cron, generate_dag
from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.plans.registry import TableEntry, TableRegistry, replay_all
from dbimport_spark.sources.loggen import generate_changes, write_changes


def _reg(tmp_path, names=("alpha", "beta"), **extra):
    reg = TableRegistry(str(tmp_path / "reg.json"))
    for n in names:
        reg.add(TableEntry(
            name=n, table_root=str(tmp_path / f"t-{n}"),
            log_path=str(tmp_path / f"log-{n}"), **extra,
        ))
    return reg


def _edges(src: str) -> set[tuple[str, str]]:
    """All `a >> b` dependency edges in the generated DAG source."""
    out = set()
    for node in ast.walk(ast.parse(src)):
        if (isinstance(node, ast.BinOp) and isinstance(node.op, ast.RShift)
                and isinstance(node.left, ast.Name)
                and isinstance(node.right, ast.Name)):
            out.add((node.left.id, node.right.id))
    return out


def _bash_commands(src: str) -> dict[str, str]:
    """task_id -> bash_command for every BashOperator call."""
    out = {}
    for node in ast.walk(ast.parse(src)):
        if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                and node.func.id == "BashOperator"):
            kw = {k.arg: k.value for k in node.keywords}
            out[kw["task_id"].value] = kw["bash_command"].value
    return out


def test_convert_time_to_cron():
    # HH:MM -> daily cron, minutes/hours int-stripped (reference
    # convertTimeToCron); everything else passes through verbatim
    assert convert_time_to_cron("07:30") == "30 7 * * *"
    assert convert_time_to_cron("00:05") == "5 0 * * *"
    assert convert_time_to_cron("23:59") == "59 23 * * *"
    assert convert_time_to_cron("@hourly") == "@hourly"
    assert convert_time_to_cron("*/15 * * * *") == "*/15 * * * *"
    # not a real clock time -> passthrough (Airflow will reject it
    # loudly, instead of us emitting a silently-wrong cron)
    assert convert_time_to_cron("24:00") == "24:00"


def test_generate_dag_single_task_per_table(tmp_path):
    reg = _reg(tmp_path)
    src = generate_dag(reg, "warehouse_daily", schedule="02:15",
                       pool="ingest", tags=("prod",))
    compile(src, "<dag>", "exec")  # emitted file is valid python
    cmds = _bash_commands(src)
    assert set(cmds) == {"table_alpha", "table_beta"}
    assert f"replay-all {reg.path} --only alpha" in cmds["table_alpha"]
    assert "--phase" not in cmds["table_alpha"]  # default sweep does all
    assert "'15 2 * * *'" in src
    assert "max_active_runs=1" in src  # overlapping sweeps serialized
    assert "pool='ingest'" in src
    assert "'dbimport_spark', 'prod'" in src
    assert _edges(src) == set()  # independent tables, no false ordering


def test_generate_dag_two_phase_barrier_and_sync_point(tmp_path):
    reg = _reg(tmp_path)
    src = generate_dag(
        reg, "warehouse_2phase", separate_phases=True,
        finish_replay_first=True, sync_point="nightly",
    )
    compile(src, "<dag>", "exec")
    cmds = _bash_commands(src)
    assert "--phase replay" in cmds["replay_alpha"]
    assert "--phase derived" in cmds["derived_beta"]
    assert "sync-point" in cmds["sync_point"]
    assert "--set nightly" in cmds["sync_point"]
    edges = _edges(src)
    # reference finish_all_stage1_first: every replay funnels through
    # the barrier before ANY derived sync; freeze cut last
    for n in ("alpha", "beta"):
        assert (f"replay_{n}", "replays_done") in edges
        assert ("replays_done", f"derived_{n}") in edges
        assert (f"derived_{n}", "cut_sync_point") in edges
    assert ("replay_alpha", "derived_alpha") not in edges


def test_generate_dag_paired_phases_without_barrier(tmp_path):
    src = generate_dag(_reg(tmp_path), "paired", separate_phases=True)
    edges = _edges(src)
    assert ("replay_alpha", "derived_alpha") in edges
    assert ("replay_beta", "derived_beta") in edges
    assert not any(v == "replays_done" for _, v in edges)


def test_generate_dag_schedule_group(tmp_path):
    """One DAG per cadence group: the registry 'schedule' hint selects
    members and supplies the DAG schedule (reference: one
    airflow_import_dags row per cadence, filter picks its imports)."""
    reg = TableRegistry(str(tmp_path / "reg.json"))
    reg.add(TableEntry(name="fast", table_root="/r/f", log_path="/l/f",
                       schedule="hourly"))
    reg.add(TableEntry(name="slow", table_root="/r/s", log_path="/l/s",
                       schedule="03:30"))
    src = generate_dag(reg, "hourly_dag", schedule_group="hourly")
    cmds = _bash_commands(src)
    assert set(cmds) == {"table_fast"}
    assert "'@hourly'" in src  # bare hint mapped to the Airflow preset
    src = generate_dag(reg, "night_dag", schedule_group="03:30")
    assert set(_bash_commands(src)) == {"table_slow"}
    assert "'30 3 * * *'" in src
    with pytest.raises(ValueError, match="no enabled tables"):
        generate_dag(reg, "empty", schedule_group="weekly")


def test_generate_dag_refuses_freeform_schedule(tmp_path):
    """A free-form cadence hint ('nightly') is a fine registry GROUP key
    but is not a schedule Airflow accepts — emitted verbatim the DAG
    file errors at Airflow import and silently schedules nothing, so the
    generator refuses at generation time (same stance as its task-id
    collision pre-check). An explicit valid --schedule unblocks it."""
    reg = TableRegistry(str(tmp_path / "reg.json"))
    reg.add(TableEntry(name="t1", table_root="/r/1", log_path="/l/1",
                       schedule="nightly"))
    with pytest.raises(ValueError, match="fail at Airflow import"):
        generate_dag(reg, "night", schedule_group="nightly")
    src = generate_dag(
        reg, "night", schedule_group="nightly", schedule="02:00"
    )
    assert "'0 2 * * *'" in src


def test_generate_dag_hostile_names_and_paths(tmp_path):
    """Table names that are valid registry keys but not Python
    identifiers must still emit a loadable DAG; colliding sanitizations
    fail at generation (not at Airflow import); the registry path is
    absolutized (BashOperator runs in a temp cwd)."""
    import os

    reg = TableRegistry(str(tmp_path / "reg.json"))
    reg.add(TableEntry(name="my-table", table_root="/r/a", log_path="/l/a"))
    reg.add(TableEntry(name="sales.orders", table_root="/r/b",
                       log_path="/l/b"))
    src = generate_dag(reg, "hostile")
    compile(src, "<dag>", "exec")
    cmds = _bash_commands(src)
    assert set(cmds) == {"table_my_table", "table_sales_orders"}
    assert "--only my-table" in cmds["table_my_table"]  # real name in cmd

    # relative registry path -> absolute in every bash_command
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rel = TableRegistry("reg.json")
        src = generate_dag(rel, "relpath")
    finally:
        os.chdir(cwd)
    assert str(tmp_path / "reg.json") in _bash_commands(src)["table_my_table"]

    reg.add(TableEntry(name="my_table", table_root="/r/c", log_path="/l/c"))
    with pytest.raises(ValueError, match="task id collision"):
        generate_dag(reg, "collide")


def test_generate_dag_refusals(tmp_path):
    reg = _reg(tmp_path)
    with pytest.raises(ValueError, match="separate_phases"):
        generate_dag(reg, "x", finish_replay_first=True)
    with pytest.raises(ValueError, match="not registered"):
        generate_dag(reg, "x", only=["nope"])
    with pytest.raises(ValueError, match="invalid dag_id"):
        generate_dag(reg, "bad id!")
    # an explicitly requested table silently dropped by a filter is the
    # replay_all --only rule: surface it, never emit a green DAG minus
    # the table
    entries = reg.load()
    entries["beta"].enabled = False
    reg.save(entries)
    with pytest.raises(ValueError, match="requested but excluded"):
        generate_dag(reg, "x", only=["alpha", "beta"])
    with pytest.raises(ValueError, match="requested but excluded"):
        generate_dag(reg, "x", only=["alpha"], schedule_group="hourly")
    # disabling everything must refuse, not emit an empty DAG
    entries = reg.load()
    for e in entries.values():
        e.enabled = False
    reg.save(entries)
    with pytest.raises(ValueError, match="no enabled tables"):
        generate_dag(reg, "empty")


def test_replay_all_phase_split(spark, tmp_path):
    """--phase replay ingests without touching derived targets;
    --phase derived then advances the mirror without re-reading the
    log — together they equal one combined sweep."""
    from dbimport_spark.lake.table import LakeTable
    from dbimport_spark.plans.mirror import verify_mirror

    log = generate_changes(spark, 600, n_keys=50, seed=7)
    write_changes(log, str(tmp_path / "log-t"), 2)
    CDCEngine.create_table(str(tmp_path / "t"), num_buckets=2)
    CDCEngine.create_table(str(tmp_path / "mir"), num_buckets=2)
    reg = TableRegistry(str(tmp_path / "reg.json"))
    reg.add(TableEntry(
        name="t", table_root=str(tmp_path / "t"),
        log_path=str(tmp_path / "log-t"),
        checkpoint=str(tmp_path / "ck"),
        mirror_root=str(tmp_path / "mir"),
    ))

    with pytest.raises(ValueError, match="phase"):
        replay_all(spark, reg, phase="etl")
    # a freeze cut before derived syncs would tag followers at stale
    # versions under a consistency-promising name
    with pytest.raises(ValueError, match="stale"):
        replay_all(spark, reg, phase="replay", sync_point="nightly")

    r1 = replay_all(spark, reg, phase="replay")
    assert r1["t"]["ok"] and r1["t"]["last_lsn"] == 600
    assert "mirror" not in r1["t"]  # derived untouched in phase 1
    mir = LakeTable.load(str(tmp_path / "mir"))
    assert mir.current().version == 0

    r2 = replay_all(spark, reg, phase="derived")
    assert r2["t"]["ok"]
    assert "batches_applied" not in r2["t"]  # no re-ingest in phase 2
    assert r2["t"]["mirror"]["ok"] and not r2["t"]["mirror"]["skipped"]
    src_t = LakeTable.load(str(tmp_path / "t"))
    assert verify_mirror(
        spark, src_t, LakeTable.load(str(tmp_path / "mir"))
    )["converged"]

    # idempotent: a second derived sweep with no new commits skips
    r3 = replay_all(spark, reg, phase="derived")
    assert r3["t"]["mirror"]["skipped"]


def test_cli_airflow_gen_writes_file(tmp_path, capsys):
    from dbimport_spark.cli import main

    _reg(tmp_path)
    out = str(tmp_path / "dag.py")
    rc = main([
        "airflow-gen", str(tmp_path / "reg.json"), "--dag-id", "wh",
        "--schedule", "06:00", "--separate-phases",
        "--finish-replay-first", "--sync-point", "nightly",
        "--out", out,
    ])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out)
    assert rec["written"] == out
    src = open(out).read()
    compile(src, out, "exec")
    assert "0 6 * * *" in src
    assert "--phase replay" in src and "--phase derived" in src
