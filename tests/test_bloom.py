"""Declared parquet bloom filters (table properties ``bloom_columns`` /
``bloom_ndv``): point-lookup pruning on hash-distributed keys.

Min/max file stats prune range predicates on SORTED columns; a
hash-distributed key (doc_id) spans nearly the whole key range in every
incremental data file, so only a bloom filter can prune a point lookup.
Analogue of Iceberg's ``write.parquet.bloom-filter-enabled.column.*``
(the reference has no lake format of its own — its targets are RDBMS/
Hive tables, import_operations.py; this is lake-layout surface).
"""

import glob
import os

from dbimport_spark.plans.engine import CDCEngine
from dbimport_spark.sources.loggen import generate_changes


def _bloom_offsets(spark, path: str) -> dict[str, int]:
    """Per-column bloom-filter offset of every row group of one parquet
    file, read from the footer by parquet-mr (pyarrow doesn't expose
    it). -1 = no bloom filter written for that column chunk."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(os.path.abspath(path)), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        out: dict[str, int] = {}
        blocks = reader.getFooter().getBlocks()
        for bi in range(blocks.size()):
            cols = blocks.get(bi).getColumns()
            for ci in range(cols.size()):
                col = cols.get(ci)
                name = col.getPath().toDotString()
                off = col.getBloomFilterOffset()
                # a column has "a bloom filter" iff EVERY row group does
                out[name] = min(out.get(name, off), off)
        return out
    finally:
        reader.close()


def _make_table(spark, tmp_path, **props):
    table = CDCEngine.create_table(str(tmp_path / "t"), num_buckets=4)
    if props:
        table.commit([], set(), properties=props)
    eng = CDCEngine(spark, table)
    eng.replay(
        generate_changes(spark, 2000, n_keys=150, seed=29, tokens_min=1,
                         tokens_max=64),
        num_batches=2,
    )
    return table, eng


def _data_files(table):
    files = glob.glob(
        os.path.join(table.root, "data", "*", "bucket=*", "*.parquet")
    )
    assert files
    return files


def test_bloom_written_on_declared_column_only(spark, tmp_path):
    table, _ = _make_table(
        spark, tmp_path, bloom_columns="doc_id", bloom_ndv="50000"
    )
    for p in _data_files(table):
        offs = _bloom_offsets(spark, p)
        assert offs["doc_id"] >= 0, f"no bloom filter on doc_id in {p}"
        for col, off in offs.items():
            if col != "doc_id":
                assert off == -1, f"unexpected bloom filter on {col} in {p}"


def test_no_bloom_by_default(spark, tmp_path):
    table, _ = _make_table(spark, tmp_path)
    for p in _data_files(table):
        assert all(off == -1 for off in _bloom_offsets(spark, p).values())


def test_point_lookup_unaffected(spark, tmp_path):
    # the bloom filter is a pruning structure, not a semantic one: a
    # pushed equality predicate returns exactly the rows a plain filter
    # over the full read returns
    table, _ = _make_table(
        spark, tmp_path, bloom_columns="doc_id", bloom_ndv="50000"
    )
    full = {r["doc_id"]: r["n_tok"] for r in table.read(spark).collect()}
    some_key = sorted(full)[len(full) // 2]
    hit = table.read(spark).where(f"doc_id = '{some_key}'").collect()
    assert len(hit) == 1 and hit[0]["n_tok"] == full[some_key]
    miss = table.read(spark).where("doc_id = 'no-such-key'").collect()
    assert miss == []


def test_bloom_survives_compaction(spark, tmp_path):
    # compaction rewrites through the same write_data_files path, so the
    # rewritten files keep the declared blooms
    from dbimport_spark.lake.maintenance import compact

    table, _ = _make_table(
        spark, tmp_path, bloom_columns="doc_id", bloom_ndv="50000"
    )
    compact(spark, table, max_files_per_bucket=1)
    live = {f.path for f in table.current().files}
    for p in _data_files(table):
        if os.path.relpath(p, table.root) in live:
            assert _bloom_offsets(spark, p)["doc_id"] >= 0, p


def test_cli_init_bloom_flags(spark, tmp_path):
    # the CLI flags land as the table properties write_data_files reads
    from dbimport_spark.cli import main
    from dbimport_spark.lake.table import LakeTable

    root = str(tmp_path / "cli_t")
    rc = main([
        "init", root, "--buckets", "4",
        "--bloom-columns", "doc_id", "--bloom-ndv", "12345",
    ])
    assert rc == 0
    props = LakeTable(root).properties
    assert props["bloom_columns"] == "doc_id"
    assert props["bloom_ndv"] == "12345"


def test_cli_init_bloom_ndv_rejects_non_integer(spark, tmp_path, capsys):
    from dbimport_spark.cli import main

    root = str(tmp_path / "cli_bad")
    rc = main([
        "init", root, "--buckets", "4",
        "--bloom-columns", "doc_id", "--bloom-ndv", "lots",
    ])
    assert rc == 2
    assert "--bloom-ndv" in capsys.readouterr().err


def test_bloom_follows_rename(spark, tmp_path):
    """After rename_column, the remapped bloom_columns property keeps
    writing filters under the new name."""
    from dbimport_spark.plans.engine import CDCEngine
    from dbimport_spark.sources.loggen import generate_changes

    table = CDCEngine.create_table(str(tmp_path / "t"), num_buckets=2)
    table.commit([], set(), properties={"bloom_columns": "n_tok"})
    table.rename_column("n_tok", "tok_count")
    eng = CDCEngine(spark, table)
    eng.replay(
        generate_changes(spark, 300, n_keys=30, seed=7)
        .withColumnRenamed("n_tok", "tok_count"),
        num_batches=1,
    )
    data_files = [
        f"{table.root}/{f.path}" for f in table.current().files
    ]
    assert data_files
    offs = _bloom_offsets(spark, data_files[0])
    assert offs.get("tok_count", -1) >= 0
