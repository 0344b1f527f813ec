"""Metadata-only consistency audit (lake/fsck.py): a healthy replayed
table is clean; every corrupted invariant is reported at the right
severity without scanning data."""

import json
import os
import subprocess
import sys

from dbimport_spark.lake.catalog import SqliteCatalog
from dbimport_spark.lake.fsck import check_table
from dbimport_spark.lake.table import LakeTable
from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.sources.loggen import generate_changes


def _mk_table(spark, tmp_path, **kw):
    root = str(tmp_path / "t")
    CDCEngine.create_table(root, num_buckets=4)
    table = LakeTable.load(root, **kw)
    eng = CDCEngine(spark, table)
    eng.replay(generate_changes(spark, 1000, n_keys=60, seed=17), num_batches=2)
    return table


def test_fsck_clean_on_healthy_table(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    assert check_table(table) == []


def test_fsck_detects_missing_and_resized_files(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    files = table.current().files
    os.unlink(os.path.join(table.root, files[0].path))
    with open(os.path.join(table.root, files[1].path), "ab") as fh:
        fh.write(b"garbage")
    findings = check_table(table)
    errs = [f for f in findings if f["level"] == "error"]
    assert any("missing file" in f["detail"] for f in errs)
    assert any("on disk" in f["detail"] for f in errs)


def test_fsck_detects_orphans_and_stale_hint(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    # orphan: an unreferenced parquet in the data dir
    d = os.path.join(table.root, "data", "orphaned")
    os.makedirs(d)
    with open(os.path.join(d, "junk.parquet"), "wb") as fh:
        fh.write(b"x" * 64)
    # stale hint (behind): warn only
    with open(os.path.join(table.root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("0")
    findings = check_table(table)
    assert all(f["level"] == "warn" for f in findings), findings
    checks = {f["check"] for f in findings}
    assert checks == {"orphans", "hint"}


def test_fsck_detects_watermark_regression_and_catalog_drift(spark, tmp_path):
    table = _mk_table(spark, tmp_path, catalog=SqliteCatalog())
    # new commit through the sqlite catalog so the pointer exists
    table.commit([], set(), properties={"noop": "1"})
    assert check_table(table) == []

    # tamper: rewrite the NEWEST snapshot with a regressed watermark
    snaps = table.snapshots()
    meta = os.path.join(table.root, "metadata", f"v{snaps[-1]}.json")
    doc = json.load(open(meta))
    doc["properties"]["last_lsn"] = "5"
    json.dump(doc, open(meta, "w"))
    findings = check_table(LakeTable.load(table.root))
    assert any(
        f["level"] == "error" and f["check"] == "watermark" for f in findings
    )

    # pointer AHEAD of disk = lost metadata: error (hint updated too, or
    # the table would not even load — fsck audits loadable tables)
    os.unlink(meta)
    with open(os.path.join(table.root, "metadata", "version-hint.text"), "w") as fh:
        fh.write(str(snaps[-1] - 1))
    findings = check_table(LakeTable.load(table.root))
    assert any(
        f["level"] == "error" and f["check"] == "catalog" for f in findings
    ), findings


def test_fsck_cli_exit_codes(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    out = subprocess.run(
        [sys.executable, "-m", "dbimport_spark.cli", "fsck", table.root],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert json.loads(out.stdout.strip().splitlines()[-1])["clean"]

    os.unlink(os.path.join(table.root, table.current().files[0].path))
    out = subprocess.run(
        [sys.executable, "-m", "dbimport_spark.cli", "fsck", table.root],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 1


def test_fsck_clean_after_full_reload(spark, tmp_path):
    """A declared full reload resets the watermark to -1 mid-chain — fsck
    must treat the reload boundary as a baseline reset, not corruption."""
    root = str(tmp_path / "t")
    CDCEngine.create_table(root, num_buckets=4)
    table = LakeTable.load(root)
    eng = CDCEngine(spark, table)
    log = generate_changes(spark, 600, n_keys=40, seed=23)
    eng.replay(log, num_batches=1)
    eng.full_reload(log, num_batches=2)
    assert check_table(table) == []


def test_fsck_lost_newest_metadata_reported_not_crash(spark, tmp_path):
    """The REAL lost-metadata scenario (newest v*.json gone, hint and
    catalog pointer still ahead) must come back as error findings through
    the CLI — not a traceback (load()'s current() would raise; fsck uses
    the plain constructor)."""
    table = _mk_table(spark, tmp_path, catalog=SqliteCatalog())
    table.commit([], set(), properties={"noop": "1"})
    newest = table.snapshots()[-1]
    os.unlink(os.path.join(table.root, "metadata", f"v{newest}.json"))

    out = subprocess.run(
        [sys.executable, "-m", "dbimport_spark.cli", "fsck", table.root],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 1, (out.stdout, out.stderr)
    doc = json.loads(out.stdout.strip().splitlines()[-1])
    checks = {(f["check"], f["level"]) for f in doc["findings"]}
    assert ("hint", "error") in checks  # hint ahead of surviving metadata
    assert ("catalog", "error") in checks  # pointer ahead too


def test_fsck_malformed_metadata_is_finding(spark, tmp_path):
    """Corrupt snapshot JSON becomes an error finding, never an unhandled
    exception — the checker survives what it audits."""
    table = _mk_table(spark, tmp_path)
    v = table.snapshots()[0]
    with open(os.path.join(table.root, "metadata", f"v{v}.json"), "w") as fh:
        fh.write("{ not json")
    findings = check_table(LakeTable(table.root))
    assert any(
        f["check"] == "metadata" and f["level"] == "error" for f in findings
    ), findings


def test_fsck_watermark_check_survives_reload_marker_inheritance(spark, tmp_path):
    """code-review r4: the reload marker must NOT be inherited by later
    commits — otherwise every post-reload snapshot looks like a reload
    boundary and a genuine watermark regression would audit clean."""
    root = str(tmp_path / "t")
    CDCEngine.create_table(root, num_buckets=4)
    table = LakeTable.load(root)
    eng = CDCEngine(spark, table)
    log = generate_changes(spark, 600, n_keys=40, seed=27)
    eng.replay(log, num_batches=1)
    eng.full_reload(log, num_batches=1)
    eng.replay(
        generate_changes(spark, 200, n_keys=40, seed=28, first_lsn=601),
        num_batches=1,
    )
    assert check_table(table) == []
    # only the reload snapshot itself carries the marker
    marked = [
        v
        for v in table.snapshots()
        if table.snapshot(v).properties.get("reload") == "true"
    ]
    assert len(marked) == 1

    # a POST-reload watermark regression must still be caught
    newest = table.snapshots()[-1]
    meta = os.path.join(root, "metadata", f"v{newest}.json")
    doc = json.load(open(meta))
    doc["properties"]["last_lsn"] = "3"
    json.dump(doc, open(meta, "w"))
    findings = check_table(LakeTable(root))
    assert any(
        f["check"] == "watermark" and f["level"] == "error" for f in findings
    ), findings


def test_fsck_tolerates_missing_root_and_stray_files(tmp_path):
    """code-review r4: a missing table root or a stray v-junk metadata
    file yields findings, never a traceback."""
    findings = check_table(LakeTable(str(tmp_path / "nope")))
    assert findings and findings[0]["check"] == "metadata"

    root = str(tmp_path / "t")
    CDCEngine.create_table(root, num_buckets=2)
    with open(os.path.join(root, "metadata", "vJUNK.json"), "w") as fh:
        fh.write("{}")
    findings = check_table(LakeTable(root))
    assert any("stray" in f["detail"] for f in findings)


def test_fsck_reports_torn_pin_and_tag_files(tmp_path):
    """pins()/tags() silently skip unparsable JSON (readers must), so a
    torn pin has silently stopped protecting its follower's delta base —
    fsck is where that must surface, as an error."""
    root = str(tmp_path / "t")
    CDCEngine.create_table(root, num_buckets=2)
    t = LakeTable.load(root)
    t.set_pin("mirror", 0)
    t.set_tag("freeze", 0)
    assert not [f for f in check_table(t) if f["check"] in ("pins", "tags")]
    # tear both files
    with open(os.path.join(root, "metadata", "pins", "mirror.json"), "w") as fh:
        fh.write('{"version":')
    with open(os.path.join(root, "metadata", "tags", "broke.json"), "w") as fh:
        fh.write("not json")
    findings = check_table(t)
    torn = [f for f in findings if "torn write" in f["detail"]]
    assert len(torn) == 2
    assert all(f["level"] == "error" for f in torn)
    assert {f["check"] for f in torn} == {"pins", "tags"}


# -- repair (the safe subset) ---------------------------------------------------


def test_repair_fixes_hint_strays_and_orphans(spark, tmp_path):
    """repair_table restores the pointer, quarantines stray metadata, and
    reclaims aged orphans — then the re-audit is clean. A second run is a
    no-op."""
    from dbimport_spark.lake.fsck import repair_table

    table = _mk_table(spark, tmp_path)
    meta = os.path.join(table.root, "metadata")
    # hint AHEAD of newest metadata (breaks load() outright)
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write("99")
    # stray metadata file
    with open(os.path.join(meta, "vgarbage.json"), "w") as fh:
        fh.write("{}")
    # aged orphan
    d = os.path.join(table.root, "data", "orphaned")
    os.makedirs(d)
    orphan = os.path.join(d, "junk.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"x" * 64)
    os.utime(orphan, (1, 1))  # ancient mtime: past any age gate

    before = check_table(table)
    assert any(f["check"] == "hint" and f["level"] == "error" for f in before)
    actions = repair_table(table)
    kinds = {a["action"] for a in actions}
    assert kinds == {
        "rewrite_version_hint",
        "quarantine_stray_metadata",
        "remove_orphan_files",
    }
    assert check_table(table) == []
    assert LakeTable.load(table.root)  # load() works again
    # stray preserved, not deleted
    assert os.path.isfile(os.path.join(meta, "_stray", "vgarbage.json"))
    assert not os.path.exists(orphan)
    assert repair_table(table) == []  # idempotent


def test_repair_age_gate_spares_fresh_orphans(spark, tmp_path):
    """A freshly written orphan (an in-flight commit's files) survives the
    repair's orphan sweep."""
    from dbimport_spark.lake.fsck import repair_table

    table = _mk_table(spark, tmp_path)
    d = os.path.join(table.root, "data", "inflight")
    os.makedirs(d)
    fresh = os.path.join(d, "part.parquet")
    with open(fresh, "wb") as fh:
        fh.write(b"x" * 64)
    actions = repair_table(table)
    assert not any(a["action"] == "remove_orphan_files" for a in actions)
    assert os.path.isfile(fresh)


def test_repair_never_touches_structural_corruption(spark, tmp_path):
    """A missing data file (structural: the table lies about its state)
    is reported before AND after repair — never 'fixed' away."""
    from dbimport_spark.lake.fsck import repair_table

    table = _mk_table(spark, tmp_path)
    victim = table.current().files[0].path
    os.unlink(os.path.join(table.root, victim))
    repair_table(table)
    after = check_table(table)
    assert any(
        f["level"] == "error" and "missing file" in f["detail"] for f in after
    )


def test_fsck_cli_repair(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    with open(os.path.join(table.root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("0")  # behind: warn
    out = subprocess.run(
        [sys.executable, "-m", "dbimport_spark.cli", "fsck", table.root,
         "--repair"],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["clean_after"] is True
    assert any(
        a["action"] == "rewrite_version_hint" for a in rep["repairs"]
    )


def test_fsck_null_pin_version_is_finding_not_crash(spark, tmp_path):
    """A pin file with "version": null (not int-coercible) must produce
    an error finding — the never-raise contract covers TypeError too."""
    table = _mk_table(spark, tmp_path)
    pins = os.path.join(table.root, "metadata", "pins")
    os.makedirs(pins, exist_ok=True)
    with open(os.path.join(pins, "bad.json"), "w") as fh:
        json.dump({"version": None}, fh)
    findings = check_table(table)
    assert any(
        f["check"] == "pins" and "bad.json" in f["detail"] for f in findings
    )
    # and pins() itself skips the torn entry instead of raising
    assert "bad" not in table.pins()


def test_fsck_tmp_turd_warned_and_repaired(spark, tmp_path):
    """A catalog commit tmp turd (writer died between tmp-write and
    publish) is warned about by fsck and age-gate-removed by repair —
    a fresh turd (possible live commit) is left alone."""
    from dbimport_spark.lake.fsck import repair_table

    table = _mk_table(spark, tmp_path)
    meta = os.path.join(table.root, "metadata")
    old = os.path.join(meta, "v99.json.tmp-123-456")
    fresh = os.path.join(meta, "v99.json.tmp-789-012")
    for p in (old, fresh):
        with open(p, "w") as fh:
            fh.write("{}")
    os.utime(old, (1, 1))  # ancient
    findings = check_table(table)
    turds = [f for f in findings if "tmp turd" in f["detail"]]
    assert len(turds) == 2 and all(f["level"] == "warn" for f in turds)
    actions = repair_table(table)
    removed = [
        a["detail"] for a in actions if a["action"] == "remove_commit_tmp_turd"
    ]
    assert removed == ["v99.json.tmp-123-456"]
    assert not os.path.exists(old) and os.path.exists(fresh)


def test_repair_stray_requarantine_keeps_both(spark, tmp_path):
    """A stray metadata name that reappears after being quarantined gets
    a numbered destination — previously-captured evidence is never
    deleted."""
    from dbimport_spark.lake.fsck import repair_table

    table = _mk_table(spark, tmp_path)
    meta = os.path.join(table.root, "metadata")
    stray = os.path.join(meta, "vjunk.json")
    with open(stray, "w") as fh:
        fh.write("first")
    repair_table(table)
    with open(stray, "w") as fh:
        fh.write("second")
    repair_table(table)
    sdir = os.path.join(meta, "_stray")
    captured = sorted(os.listdir(sdir))
    assert captured == ["vjunk.json", "vjunk.json.1"]
    assert open(os.path.join(sdir, "vjunk.json")).read() == "first"
    assert open(os.path.join(sdir, "vjunk.json.1")).read() == "second"


def test_fsck_sizechecks_historical_snapshot_files(spark, tmp_path):
    """A truncated data file referenced only by a RETAINED HISTORICAL
    snapshot is an error — time travel to that version would read
    corrupt data; the size check covers every retained snapshot."""
    table = _mk_table(spark, tmp_path)
    cur_paths = {f.path for f in table.current().files}
    old_only = None
    for v in table.snapshots()[:-1]:
        for f in table.snapshot(v).files:
            if f.path not in cur_paths and f.bytes > 4:
                old_only = f
                break
        if old_only:
            break
    assert old_only is not None, "need a file only historical snaps reference"
    p = os.path.join(table.root, old_only.path)
    with open(p, "r+b") as fh:
        fh.truncate(4)
    findings = check_table(table)
    assert any(
        f["check"] == "files" and old_only.path in f["detail"]
        and "recorded" in f["detail"]
        for f in findings
    )
