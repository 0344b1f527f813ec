"""Airflow DAG-file generation from the table registry.

The reference renders Airflow DAG ``.py`` files from its config database
(``Schedule/Airflow.py``: ``generateDAG`` 288-428 reads the
``airflow_import_dags`` rows, ``createDAGfileWithHeader`` 1024-1170
writes the header with cron schedule / pools / retries,
``addTasksToDAGfile`` 1737-2210 emits one task pair per table with the
``finish_all_stage1_first`` two-phase barrier, and ``convertTimeToCron``
1000-1010 maps ``HH:MM`` to a cron line). Each generated reference task
shells out to the engine's own CLI (``import.sh``/``export.sh``).

This module is the Spark-first analogue: :class:`TableRegistry` IS the
config database, and every generated task invokes this repo's CLI
(``python -m dbimport_spark.cli replay-all <registry> --only <table>``)
so the registry stays the single source of truth — the DAG carries
orchestration shape only, never table config that could drift. The
emitted file is plain text: ``airflow`` is imported by the GENERATED
file, never by this repo (the reference generator works the same way —
it writes DAG source, it does not import Airflow).

Two-phase mode mirrors the reference's ``run_import_and_etl_separate``
+ ``finish_all_stage1_first`` (Schedule/Airflow.py:1737-1860): phase 1
is the table replay (``--phase replay``), phase 2 the derived syncs and
storage upkeep (``--phase derived``); ``finish_replay_first=True`` puts
an empty-operator barrier between ALL replays and ANY derived sync, so
a warehouse-wide freeze (sync point) sees every table's ingest complete
before any downstream copy starts.
"""

from __future__ import annotations

import os
import re
import shlex

__all__ = ["convert_time_to_cron", "generate_dag"]

# reference convertTimeToCron accepts [0-2][0-9]:[0-5][0-9] (letting
# 24:00-29:59 through as a bogus cron); we tighten to real clock times
# and pass anything else through verbatim, same as the reference passes
# through presets ("@daily") and explicit cron lines.
_HHMM = re.compile(r"^([01][0-9]|2[0-3]):([0-5][0-9])$")

# The generated task NAME doubles as the assigned Python VARIABLE in
# the emitted file, so it must be a valid identifier — a strict subset
# of Airflow's task_id charset (which also allows '.' and '-'; a table
# named 'sales.orders' or 'my-table' would otherwise emit a
# SyntaxError'ing DAG).
_IDENT_BAD = re.compile(r"[^A-Za-z0-9_]")


def convert_time_to_cron(value: str) -> str:
    """``"HH:MM"`` -> ``"M H * * *"`` (daily at that wall time); bare
    registry cadence hints (``hourly``/``daily``/``weekly``/``monthly``)
    -> the ``@``-preset; any other string — a preset or full cron line —
    passes through verbatim. Reference: Schedule/Airflow.py:1000-1010."""
    m = _HHMM.match(value or "")
    if m:
        return f"{int(m.group(2))} {int(m.group(1))} * * *"
    if value in ("hourly", "daily", "weekly", "monthly"):
        return f"@{value}"
    return value


_PRESETS = {
    "@once", "@continuous", "@hourly", "@daily", "@weekly",
    "@monthly", "@quarterly", "@yearly", "@annually",
}
# permissive per-field charset (numbers, ranges, steps, lists, day/month
# names, L/W/#/? extensions) — the goal is catching free-form cadence
# hints ('nightly'), not re-implementing a cron parser
_CRON_FIELD = re.compile(r"^[0-9A-Za-z*/,\-#?LW]+$")


def _validate_schedule(cron: str, origin: str) -> str:
    """Refuse a resolved schedule Airflow would reject at DAG import —
    the generator's stance is failing at GENERATION time (same reason it
    pre-validates task-id collisions): an invalid schedule emitted
    verbatim produces a file that errors on import and silently
    schedules nothing. Free-form registry cadence hints ('nightly') land
    here; use a preset, 'HH:MM', or a 5-field cron line instead."""
    if cron in _PRESETS:
        return cron
    fields = cron.split()
    if len(fields) == 5 and all(_CRON_FIELD.match(f) for f in fields):
        return cron
    raise ValueError(
        f"schedule {cron!r} (from {origin}) is neither an Airflow "
        f"@-preset ({', '.join(sorted(_PRESETS))}), an 'HH:MM' time, "
        "nor a 5-field cron line — the generated DAG would fail at "
        "Airflow import. Pass --schedule with a valid value."
    )


def _task_id(prefix: str, name: str) -> str:
    return f"{prefix}_{_IDENT_BAD.sub('_', name)}"


def _pylit(value) -> str:
    """Literal for the emitted source (strings/ints/lists of strings)."""
    return repr(value)


def generate_dag(
    registry,
    dag_id: str,
    *,
    schedule: str | None = None,
    schedule_group: str | None = None,
    only: list[str] | None = None,
    separate_phases: bool = False,
    finish_replay_first: bool = False,
    retries: int = 1,
    pool: str | None = None,
    tags: tuple[str, ...] = (),
    timezone: str | None = None,
    sync_point: str | None = None,
    python: str = "python",
) -> str:
    """Render one Airflow DAG source file over the registry's enabled
    entries and return it as a string.

    One ``BashOperator`` per table runs ``replay-all <registry> --only
    <table>`` (replay + derived syncs + upkeep, failure-isolated by the
    sweep itself). With ``separate_phases`` the table splits into
    ``replay_<t> >> derived_<t>`` (``--phase replay`` / ``--phase
    derived``); ``finish_replay_first`` additionally funnels every
    replay through a barrier before any derived task (reference
    ``finish_all_stage1_first``). ``sync_point`` appends a final task
    that cuts a named cross-table freeze once everything is green.

    ``schedule_group`` selects the entries whose registry ``schedule``
    hint equals it (one DAG per cadence group — the reference's
    one-DAG-per-``airflow_import_dags``-row shape, where each DAG row's
    table filter picks its member imports) and doubles as the DAG's
    schedule unless ``schedule`` overrides it; with neither set the
    DAG runs ``@daily``.
    """
    if finish_replay_first and not separate_phases:
        raise ValueError("finish_replay_first requires separate_phases")
    if not re.match(r"^[A-Za-z0-9_.-]+$", dag_id):
        raise ValueError(f"invalid dag_id {dag_id!r}")

    entries = registry.load()
    unknown = sorted(set(only or []) - set(entries))
    if unknown:
        raise ValueError(f"not registered: {', '.join(unknown)}")
    names = [
        n for n, e in sorted(entries.items())
        if e.enabled
        and (only is None or n in only)
        and (schedule_group is None or e.schedule == schedule_group)
    ]
    # an EXPLICITLY requested table that the filters drop must surface,
    # not silently stop being scheduled (same rule as replay_all --only
    # over a disabled entry)
    dropped = sorted(set(only or []) - set(names))
    if dropped:
        raise ValueError(
            f"requested but excluded (disabled or outside "
            f"schedule_group): {', '.join(dropped)}"
        )
    if not names:
        raise ValueError("no enabled tables selected — refusing to emit "
                         "a DAG that schedules nothing")

    # distinct table names may sanitize to one identifier ('a b' and
    # 'a_b'); Airflow would reject the duplicate task_id only at DAG
    # import — fail here, at generation, with the culprits named
    seen: dict[str, str] = {}
    for n in names:
        for p in ("replay", "derived") if separate_phases else ("table",):
            tid = _task_id(p, n)
            if tid in seen:
                raise ValueError(
                    f"task id collision: tables {seen[tid]!r} and {n!r} "
                    f"both sanitize to {tid!r} — rename one"
                )
            seen[tid] = n

    # BashOperator runs in a temp cwd — a relative registry path would
    # make every scheduled task fail (or read some OTHER reg.json)
    reg_arg = shlex.quote(os.path.abspath(registry.path))
    # quoted like every other operand: a venv path with a space or shell
    # metacharacter must not split into a broken bash_command
    cli = f"{shlex.quote(python)} -m dbimport_spark.cli"
    origin = (
        "--schedule" if schedule
        else f"registry schedule group {schedule_group!r}" if schedule_group
        else "default"
    )
    cron = _validate_schedule(
        convert_time_to_cron(schedule or schedule_group or "@daily"), origin
    )

    lines: list[str] = []
    w = lines.append
    w("# Generated by dbimport_spark airflow-gen — do not edit; "
      "regenerate from the registry.")
    w(f"# Registry: {registry.path}")
    w("import pendulum")
    w("from airflow import DAG")
    w("from airflow.operators.bash import BashOperator")
    w("from airflow.operators.empty import EmptyOperator")
    w("")
    tz = timezone or "UTC"
    w("with DAG(")
    w(f"    dag_id={_pylit(dag_id)},")
    w(f"    schedule={_pylit(cron)},")
    w(f"    start_date=pendulum.datetime(2024, 1, 1, tz={_pylit(tz)}),")
    w("    catchup=False,")
    # overlapping sweeps are safe (the table commit CAS arbitrates) but
    # wasteful — the loser rebases or retries; serialize runs instead
    w("    max_active_runs=1,")
    w(f"    tags={_pylit(['dbimport_spark', *tags])},")
    w(f"    default_args={{'retries': {int(retries)}}},")
    w(") as dag:")

    pool_kw = f", pool={_pylit(pool)}" if pool else ""

    def bash_task(var: str, task_id: str, command: str) -> None:
        w(f"    {var} = BashOperator(")
        w(f"        task_id={_pylit(task_id)},")
        w(f"        bash_command={_pylit(command)}{pool_kw},")
        w("    )")

    replay_vars: list[str] = []
    tail_vars: list[str] = []  # last task per table (feeds sync point)
    for n in names:
        qn = shlex.quote(n)
        if separate_phases:
            rv, dv = _task_id("replay", n), _task_id("derived", n)
            bash_task(rv, rv,
                      f"{cli} replay-all {reg_arg} --only {qn} "
                      f"--phase replay")
            bash_task(dv, dv,
                      f"{cli} replay-all {reg_arg} --only {qn} "
                      f"--phase derived")
            replay_vars.append(rv)
            tail_vars.append(dv)
            if not finish_replay_first:
                w(f"    {rv} >> {dv}")
        else:
            tv = _task_id("table", n)
            bash_task(tv, tv, f"{cli} replay-all {reg_arg} --only {qn}")
            tail_vars.append(tv)

    if finish_replay_first:
        w("    replays_done = EmptyOperator(task_id='replays_done')")
        for rv in replay_vars:
            w(f"    {rv} >> replays_done")
        for dv in tail_vars:
            w(f"    replays_done >> {dv}")

    if sync_point:
        # --replace: the DAG recurs, so each run RE-CUTS the freeze —
        # without it the second scheduled run would fail on the
        # already-exists guard and the task would stay red forever
        bash_task(
            "cut_sync_point", "sync_point",
            f"{cli} sync-point {reg_arg} --set {shlex.quote(sync_point)} "
            "--replace",
        )
        for dv in tail_vars:
            w(f"    {dv} >> cut_sync_point")

    w("")
    return "\n".join(lines)
