"""Batch replay correctness vs an independent DuckDB oracle.

The ground truth is computed by DuckDB SQL directly over the written
WAL parquet — a fully independent implementation of the last-writer-
wins fold (FIXTURES.md §2: "ground-truth final table = last-writer-wins
batch fold, computable independently of the engine").
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from odibel_spark.cdc import WalConfig, current_state, gen_events, split_dead_letters

CFG = WalConfig(n_events=20_000, n_convs=300, seed=7)

ORACLE_SQL = """
WITH clean AS (
    SELECT * FROM read_parquet('{path}/*.parquet')
    WHERE op IN ('insert','update','delete')
      AND conv_id IS NOT NULL AND turn_idx IS NOT NULL AND lsn IS NOT NULL
      AND NOT (op <> 'delete' AND text IS NULL)
), dedup AS (
    SELECT DISTINCT lsn, op, conv_id, turn_idx, role, text, tool, ts FROM clean
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) rn
    FROM dedup
)
SELECT conv_id, turn_idx, role, text, tool, ts, lsn AS _lsn
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


@pytest.fixture(scope="module")
def wal_path(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wal"))
    gen_events(spark, CFG).drop("_feed_order").write.mode("overwrite").parquet(d)
    return d


def test_generator_determinism(spark):
    chk = F.sum(F.pmod(F.xxhash64("lsn", "op", "conv_id", "turn_idx", "text"), F.lit(1_000_000_007)))
    a = gen_events(spark, CFG).agg(chk).collect()[0][0]
    b = gen_events(spark, CFG).agg(chk).collect()[0][0]
    assert a == b


def test_generator_hazards_present(spark, wal_path):
    ev = spark.read.parquet(wal_path)
    n = ev.count()
    n_distinct = ev.dropDuplicates(["conv_id", "turn_idx", "lsn"]).count()
    assert n > n_distinct, "duplicate events must be injected"
    ops = {r["op"] for r in ev.select("op").distinct().collect()}
    assert {"insert", "update", "delete", "corrupt"} <= ops
    # schema evolution: meta + new tool variants only after marker
    assert ev.filter((F.col("lsn") < CFG.evolve_lsn) & F.col("meta").isNotNull()).count() == 0
    assert ev.filter(F.col("meta").isNotNull()).count() > 0
    assert ev.filter(F.col("tool") == "code_interpreter").count() > 0
    assert ev.filter((F.col("lsn") < CFG.evolve_lsn) & (F.col("tool") == "code_interpreter")).count() == 0


def test_dead_letter_policy(spark, wal_path):
    ev = spark.read.parquet(wal_path)
    ok, dead = split_dead_letters(ev)
    assert dead.count() > 0
    assert ok.filter(~F.col("op").isin("insert", "update", "delete")).count() == 0
    # corrupt events never delete: every corrupt (conv,turn) key with no
    # other events must be absent from the state, not deleted from it —
    # verified globally by the oracle equality below.


def test_replay_matches_duckdb_oracle(spark, wal_path):
    got = current_state(spark.read.parquet(wal_path))
    got_pdf = got.orderBy("conv_id", "turn_idx").toPandas()

    con = duckdb.connect()
    exp_pdf = con.execute(ORACLE_SQL.format(path=wal_path)).df()
    exp_pdf = exp_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    assert len(got_pdf) == len(exp_pdf) > 0
    got_pdf = got_pdf.reset_index(drop=True)
    for col in ["conv_id", "turn_idx", "role", "text", "tool", "_lsn"]:
        assert got_pdf[col].fillna("∅").tolist() == exp_pdf[col].fillna("∅").tolist(), col
    # per-turn text equality under stable (conv_id, turn_idx) ordering
    # is exactly the north-rule invariant.


def test_wal_files_schema_evolution(spark, tmpdir_path):
    from odibel_spark.cdc import write_wal_files

    cfg = WalConfig(n_events=5_000, n_convs=50, seed=11)
    write_wal_files(spark, cfg, tmpdir_path, n_files=8)
    v1 = spark.read.parquet(os.path.join(tmpdir_path, "v1"))
    v2 = spark.read.parquet(os.path.join(tmpdir_path, "v2"))
    assert "meta" not in v1.columns
    assert "meta" in v2.columns
    assert v1.count() > 0 and v2.count() > 0
