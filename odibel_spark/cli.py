"""Composable CLI over the RDF pipeline operators — parity with the
reference's user-facing entry point (cli/rdf_cmd.py:113-267, the
picocli main/Main.scala equivalent).

Contract mirrored from the reference:

- URI normalization: raw URI or ``<URI>`` both accepted (rdf_cmd.py:14-19);
- ``--type-target TYPE_URI=COUNT`` repeated, count must be a
  non-negative int (rdf_cmd.py:22-42);
- ``--class`` repeated and/or ``--classes`` comma-CSV, deduplicated in
  order (rdf_cmd.py:46-57);
- MUTUAL EXCLUSION: exactly one sampling/filter mode per run —
  ``--filter-s-type`` OR ``--type-target`` OR ``--class/--classes`` OR
  ``--global-sample-size`` OR ``--all-types-target`` (rdf_cmd.py:211-221);
- ``--related-per-seed`` defaults to 5, except 0 under
  ``--all-types-target`` unless given explicitly (rdf_cmd.py:223-225);
- pipeline shape: parse -> selected mode -> write N-Triples
  (rdf_cmd.py:239-265).

Invoke as ``python -m odibel_spark.cli rdf run ...``.
"""

from __future__ import annotations

import click


def normalize_uri(uri: str) -> str:
    """Raw URI or <URI> -> N-Triples URI form (rdf_cmd.py:14-19)."""
    value = uri.strip()
    if value.startswith("<") and value.endswith(">"):
        return value
    return f"<{value}>"


def parse_type_targets(raw_targets: tuple[str, ...]) -> dict[str, int]:
    """TYPE_URI=COUNT pairs -> {<TYPE_URI>: COUNT} (rdf_cmd.py:22-42)."""
    parsed: dict[str, int] = {}
    for raw in raw_targets:
        if "=" not in raw:
            raise click.BadParameter(
                f"Invalid --type-target '{raw}'. Expected format: TYPE_URI=COUNT"
            )
        raw_type, raw_count = raw.split("=", 1)
        try:
            count = int(raw_count)
        except ValueError as exc:
            raise click.BadParameter(
                f"Invalid count in --type-target '{raw}'. COUNT must be an integer."
            ) from exc
        if count < 0:
            raise click.BadParameter(
                f"Invalid count in --type-target '{raw}'. COUNT must be >= 0."
            )
        parsed[normalize_uri(raw_type)] = count
    return parsed


def parse_classes(raw_classes: tuple[str, ...], classes_csv: str | None) -> tuple[str, ...]:
    """--class values + --classes CSV, normalized and order-deduped
    (rdf_cmd.py:46-57)."""
    values = list(raw_classes)
    if classes_csv:
        values.extend(part.strip() for part in classes_csv.split(","))
    normalized = [normalize_uri(v) for v in values if v and v.strip()]
    return tuple(dict.fromkeys(normalized))


@click.group()
def main():
    """odibel_spark pipelines."""


@main.group("rdf")
def rdf_group():
    """Run RDF pipelines."""


@rdf_group.command("run")
# dir_okay: Spark text sources read directories of part files — the
# normal output shape of a previous Spark job — as readily as one file
@click.option("--input", "input_path", required=True, type=click.Path(exists=True, dir_okay=True))
@click.option("--output", "output_path", required=True, type=click.Path())
@click.option(
    "--filter-s-type",
    "subject_types",
    multiple=True,
    help="Keep triples whose subject is of this rdf:type. Repeat to chain multiple filters.",
)
@click.option(
    "--type-target",
    "type_targets",
    multiple=True,
    help="Sample target per type as TYPE_URI=COUNT; repeatable (rarity-first sampling).",
)
@click.option("--class", "classes", multiple=True, help="Allowed class URI; repeatable.")
@click.option("--classes", "classes_csv", default=None, help="Comma-separated allowed class URIs.")
@click.option("--global-sample-size", default=None, type=int, help="Global entity sample budget.")
@click.option(
    "--all-types-target",
    default=None,
    type=int,
    help="Uniform per-type target for all discovered rdf:types.",
)
@click.option(
    "--related-per-seed",
    default=None,
    type=int,
    help="Related entities added per sampled entity (default 5; 0 under --all-types-target).",
)
@click.option("--sample-seed", default=13, show_default=True, type=int)
@click.option("--app-name", default="RDFPipeline", show_default=True)
@click.option("--cpus", default=None, type=int, help="local[N] cores (default: engine default).")
@click.option("--shuffle-partitions", default=None, type=int)
@click.option("--overwrite/--no-overwrite", default=False, show_default=True)
def run_pipeline(
    input_path: str,
    output_path: str,
    subject_types: tuple[str, ...],
    type_targets: tuple[str, ...],
    classes: tuple[str, ...],
    classes_csv: str | None,
    global_sample_size: int | None,
    all_types_target: int | None,
    related_per_seed: int | None,
    sample_seed: int,
    app_name: str,
    cpus: int | None,
    shuffle_partitions: int | None,
    overwrite: bool,
):
    """Execute RDF pipeline: parse -> filters/sampling -> write."""
    from odibel_spark.operators.sampling import (
        sample_entities_all_types,
        sample_entities_by_type_targets,
        sample_entities_global,
    )
    from odibel_spark.session import get_spark
    from odibel_spark.sources.rdf import (
        filter_subgraph_by_entity_classes,
        filter_triples_by_subject_type,
        parse_ntriples,
        serialize_ntriples,
    )

    parsed_classes = parse_classes(classes, classes_csv)
    if related_per_seed is not None and related_per_seed < 0:
        raise click.BadParameter("--related-per-seed must be >= 0")
    if global_sample_size is not None and global_sample_size < 0:
        raise click.BadParameter("--global-sample-size must be >= 0")
    if all_types_target is not None and all_types_target < 0:
        raise click.BadParameter("--all-types-target must be >= 0")

    mode_count = (
        int(bool(subject_types))
        + int(bool(type_targets))
        + int(bool(parsed_classes))
        + int(global_sample_size is not None)
        + int(all_types_target is not None)
    )
    if mode_count > 1:
        raise click.UsageError(
            "Use only one sampling mode: --filter-s-type OR --type-target OR "
            "--class/--classes OR --global-sample-size OR --all-types-target."
        )

    effective_related = related_per_seed
    if effective_related is None:
        effective_related = 0 if all_types_target is not None else 5

    spark = get_spark(app_name=app_name, cpus=cpus, shuffle_partitions=shuffle_partitions)
    try:
        df = parse_ntriples(spark, input_path)
        if all_types_target is not None:
            df = sample_entities_all_types(
                df, target_per_type=all_types_target,
                related_per_seed=effective_related, seed=sample_seed,
            )
        elif global_sample_size is not None:
            df = sample_entities_global(
                df, sample_size=global_sample_size,
                related_per_seed=effective_related, seed=sample_seed,
            )
        elif type_targets:
            df = sample_entities_by_type_targets(
                df, type_targets=parse_type_targets(type_targets),
                related_per_seed=effective_related, seed=sample_seed,
            )
        elif parsed_classes:
            df = filter_subgraph_by_entity_classes(df, list(parsed_classes))
        else:
            for subject_type in subject_types:
                df = filter_triples_by_subject_type(df, normalize_uri(subject_type))
        serialize_ntriples(df, output_path, overwrite=overwrite)
        click.echo(f"Wrote RDF output to: {output_path}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
