"""CLI parity smoke tests (reference cli/rdf_cmd.py:113-267).

The option-parsing contract (URI normalization, TYPE_URI=COUNT
targets, class CSV dedup, mode mutual exclusion) is tested in-process;
the full parse -> filter -> write pipeline runs once through
``python -m odibel_spark.cli`` in a subprocess so the CLI's own
session lifecycle (create + stop) cannot tear down the shared test
session.
"""

import os
import subprocess
import sys

import click
import pytest
from click.testing import CliRunner

from odibel_spark.cli import main, normalize_uri, parse_classes, parse_type_targets

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

NT = """\
<http://ex/a> <http://ex/knows> <http://ex/b> .
<http://ex/a> {t} <http://ex/Person> .
<http://ex/b> <http://ex/name> "Bee"@en .
<http://ex/b> {t} <http://ex/Person> .
<http://ex/c> <http://ex/knows> <http://ex/a> .
""".format(t=RDF_TYPE)


@pytest.fixture()
def nt_file(tmpdir_path):
    p = os.path.join(tmpdir_path, "cli-data.nt")
    with open(p, "w") as f:
        f.write(NT)
    return p


def test_uri_and_target_normalization():
    assert normalize_uri("http://ex/T") == "<http://ex/T>"
    assert normalize_uri("<http://ex/T>") == "<http://ex/T>"
    assert parse_type_targets(("http://ex/T=3", "<http://ex/U>=0")) == {
        "<http://ex/T>": 3,
        "<http://ex/U>": 0,
    }
    with pytest.raises(click.BadParameter):
        parse_type_targets(("no-equals",))
    with pytest.raises(click.BadParameter):
        parse_type_targets(("http://ex/T=-1",))
    with pytest.raises(click.BadParameter):
        parse_type_targets(("http://ex/T=x",))
    # --class repeats + --classes CSV merge, normalize, order-dedup
    assert parse_classes(("http://ex/A", "<http://ex/B>"), "http://ex/B, http://ex/C") == (
        "<http://ex/A>",
        "<http://ex/B>",
        "<http://ex/C>",
    )


def test_mode_mutual_exclusion(nt_file, tmpdir_path):
    """Exactly one sampling/filter mode per run (rdf_cmd.py:211-221) —
    rejected during argument validation, before any Spark work."""
    out = os.path.join(tmpdir_path, "out.nt")
    r = CliRunner().invoke(
        main,
        ["rdf", "run", "--input", nt_file, "--output", out,
         "--global-sample-size", "2", "--all-types-target", "1"],
    )
    assert r.exit_code != 0
    assert "only one sampling mode" in r.output
    assert not os.path.exists(out)


def test_negative_budgets_rejected(nt_file, tmpdir_path):
    out = os.path.join(tmpdir_path, "out.nt")
    r = CliRunner().invoke(
        main, ["rdf", "run", "--input", nt_file, "--output", out, "--global-sample-size", "-1"]
    )
    assert r.exit_code != 0


def test_cli_end_to_end_subject_type_filter(nt_file, tmpdir_path):
    """python -m odibel_spark.cli rdf run --filter-s-type: parse ->
    subject-type semi-join -> N-Triples write, in a fresh process."""
    out = os.path.join(tmpdir_path, "cli-out.nt")
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    r = subprocess.run(
        [sys.executable, "-m", "odibel_spark.cli", "rdf", "run",
         "--input", nt_file, "--output", out,
         "--filter-s-type", "http://ex/Person", "--cpus", "4"],
        capture_output=True, text=True, timeout=300, env=env, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert f"Wrote RDF output to: {out}" in r.stdout
    lines = []
    for fn in os.listdir(out):
        if fn.startswith("part-"):
            with open(os.path.join(out, fn)) as f:
                lines += [ln for ln in f.read().splitlines() if ln.strip()]
    # subjects a and b are Persons; c's triple is filtered out
    assert sorted(lines) == sorted(ln for ln in NT.splitlines() if not ln.startswith("<http://ex/c>"))
