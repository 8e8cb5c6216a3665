"""LakeTable — a from-scratch transactional table format over parquet.

The sandbox image carries no Iceberg/Delta jars, so the engine
implements the snapshot-transaction semantics the north rule requires
(exactly-once commits, schema evolution, time travel, bucketed layout)
directly: immutable parquet data files + JSON snapshot manifests +
atomic optimistic commits. The reference's sink is a blind
``write.mode("overwrite").parquet`` (reference
DBpediaTKGExtractionSpark.scala:44) — this class is precisely what
replaces it.

Design (Iceberg-style, metadata tiny and O(#files)):

```
<root>/
  _meta/v00000000000000000001.json   # snapshot manifest (one per commit)
  _meta/v00000000000000000002.json
  data/c2-<uuid>/_bucket=K/part-*.parquet
```

* A **manifest** lists the exact data files of the snapshot, the
  authoritative schema, the partition spec, a free-form ``summary``
  and a ``watermarks`` map (stream-id → last applied epoch) used for
  epoch fencing by the streaming sink.
* **Atomic commit**: the manifest is written to a temp file and
  published with ``os.link`` — creating ``v{n}.json`` fails with
  ``FileExistsError`` if another writer committed version *n* first
  (optimistic concurrency). Data files written before a failed commit
  are unreferenced orphans, removable by ``vacuum``.
* **Bucketed layout**: rows are hash-bucketed on a key column
  (reference analog: ``repartition(parts, $"pid")`` replay layout,
  FlatPageRevisionPartitioner.scala:22-24). Every data file belongs to
  exactly one bucket, so MERGE rewrites only the buckets its source
  keys touch — the copy-on-write unit is a bucket, not the table.
* **Schema evolution**: the manifest schema is authoritative; readers
  pass it to the parquet scan explicitly, so files written before an
  ``add_columns`` commit surface the new columns as NULL (by-name
  column resolution), exactly Iceberg's add-column semantics.

Scale: all driver-side metadata is O(number of data files) JSON; all
data movement is distributed Spark jobs. At 1000 executors the commit
protocol is unchanged — only the manifest store would move from local
fs to an object store with a conditional-put (the ``os.link`` here is
the same primitive).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_DIR = "_meta"
DATA_DIR = "data"


class CommitConflict(Exception):
    """Another writer committed the same version first."""


@dataclass(frozen=True)
class BucketSpec:
    column: str
    buckets: int = 16

    def expr(self) -> F.Column:
        return F.pmod(F.xxhash64(F.col(self.column)), F.lit(self.buckets)).cast("int")

    def to_json(self) -> dict:
        return {"column": self.column, "buckets": self.buckets}

    @staticmethod
    def from_json(d: dict | None) -> "BucketSpec | None":
        return BucketSpec(d["column"], d["buckets"]) if d else None


def _stats_encode(v):
    """Footer min/max value → JSON-safe manifest form. Datetimes and
    decimals keep their type through a tagged dict (plain strings
    would compare as strings on decode). Type WHITELIST, not
    passthrough: pyarrow statistics can surface as bytes, time,
    Decimal or future types — anything unhandled returns None, which
    omits the column's bounds (= unknown, never pruned) instead of
    letting ``json.dump`` crash the COMMIT on an unserializable
    value."""
    import datetime
    import decimal

    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, datetime.datetime):
        return {"ts": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"d": v.isoformat()}
    if isinstance(v, decimal.Decimal):
        return {"dec": str(v)}
    return None  # bytes / time / unknown — no usable order here


def _stats_decode(v):
    import datetime
    import decimal

    if isinstance(v, dict):
        if "ts" in v:
            return datetime.datetime.fromisoformat(v["ts"])
        if "d" in v:
            return datetime.date.fromisoformat(v["d"])
        if "dec" in v:
            return decimal.Decimal(v["dec"])
    return v


def _cmp_key(v):
    """Normalize for bound comparison: pyarrow returns Spark-written
    TIMESTAMP_MICROS stats as tz-aware datetimes while callers usually
    pass naive (session-UTC) bounds — strip to naive UTC so the two
    compare instead of raising."""
    import datetime

    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return v


def _file_meta(path: str, stats_cols: tuple[str, ...] = ()) -> tuple[int, dict]:
    """Row count plus per-column ``[min, max]`` bounds from the parquet
    footer — Iceberg's ``lower_bounds``/``upper_bounds``, harvested from
    statistics the writer already computed, so collecting them costs no
    data scan (the footer is being opened for the row count regardless).

    A column is recorded only if EVERY row group carries usable min/max
    for it; partial statistics would make the bound a lie, so the
    column is omitted instead (= unknown, never pruned). String bounds
    are trusted as written: the parquet spec requires truncated string
    stats to stay valid bounds (round-up on max), and the same stats
    drive Spark's own row-group pushdown."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    if not stats_cols or md.num_row_groups == 0:
        return md.num_rows, {}
    idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
    stats: dict = {}
    for c in stats_cols:
        i = idx.get(c)
        if i is None:
            continue
        lo = hi = None
        usable = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            # pyarrow RAISES (not returns None) for stat types it
            # cannot cast — e.g. ArrowNotImplementedError on decimal
            # columns. A stats column must never crash the COMMIT, so
            # any extraction failure degrades to "no bounds recorded"
            # (= unknown, never pruned), same as absent statistics.
            try:
                if st is None or not st.has_min_max:
                    usable = False
                    break
                mn, mx = st.min, st.max
            except Exception:
                usable = False
                break
            # NaN poisons bound folding silently: Spark's writer
            # records max=NaN for a NaN-bearing row group, but
            # `NaN > finite` is False here, so a later group's NaN
            # would fold AWAY to a finite max — and Spark's filter
            # semantics order NaN ABOVE every bound, so a lower-bound
            # range could then prune a file whose NaN rows the
            # residual filter keeps. Any NaN bound ⇒ no bounds
            # recorded for the file (kept forever — sound).
            if isinstance(mn, float) and (math.isnan(mn) or math.isnan(mx)):
                usable = False
                break
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        lo, hi = _stats_encode(lo), _stats_encode(hi)
        if usable and lo is not None and hi is not None:
            stats[c] = [lo, hi]
    return md.num_rows, stats


def _file_in_ranges(fdesc: dict, ranges: dict) -> bool:
    """Keep-file decision for ``LakeTable.read(where_ranges=...)``:
    False only when the file's recorded bounds PROVE it disjoint from
    every requested range. Missing stats (old manifests, all-null
    chunks, uncollected columns) keep the file — unknown never prunes."""
    st = fdesc.get("stats") or {}
    for c, (lo, hi) in ranges.items():
        b = st.get(c)
        if not b:
            continue
        fmin, fmax = _stats_decode(b[0]), _stats_decode(b[1])
        try:
            if lo is not None and _cmp_key(fmax) < _cmp_key(lo):
                return False
            if hi is not None and _cmp_key(fmin) > _cmp_key(hi):
                return False
        except TypeError:
            raise ValueError(
                f"where_ranges[{c!r}] bound of type "
                f"{type(lo if lo is not None else hi).__name__} does not compare "
                f"with the column's parquet statistics ({type(fmin).__name__})"
            ) from None
    return True


def _arrow_type(dt: T.DataType):
    """Spark type → pyarrow type for the driver-side small-append path
    (only the types the side tables use; Spark reads the file back by
    name against the manifest schema)."""
    import pyarrow as pa

    mapping = {
        T.StringType(): pa.string(),
        T.LongType(): pa.int64(),
        T.IntegerType(): pa.int32(),
        T.DoubleType(): pa.float64(),
        T.BooleanType(): pa.bool_(),
        T.TimestampType(): pa.timestamp("us", tz="UTC"),
    }
    try:
        return mapping[dt]
    except KeyError:
        raise TypeError(f"append_rows does not support column type {dt}") from None


class LakeTable:
    """Handle to one transactional table. Cheap to construct; all state
    lives on disk in the manifest chain."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.meta_dir = os.path.join(root, META_DIR)

    # ------------------------------------------------------------- DDL
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        bucket: BucketSpec | None = None,
        properties: dict | None = None,
    ) -> "LakeTable":
        t = cls(spark, root)
        os.makedirs(t.meta_dir, exist_ok=True)
        if t.current_version() is not None:
            raise FileExistsError(f"table already exists at {root}")
        t._commit(
            version=1,
            files=[],
            schema=schema,
            bucket=bucket,
            summary={"op": "create"},
            watermarks={},
            properties=properties or {},
        )
        return t

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "LakeTable":
        t = cls(spark, root)
        if t.current_version() is None:
            raise FileNotFoundError(f"no table at {root}")
        return t

    @classmethod
    def exists(cls, spark: SparkSession, root: str) -> bool:
        t = cls(spark, root)
        return t.current_version() is not None

    # ----------------------------------------------------- manifest IO
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version:020d}.json")

    def current_version(self) -> int | None:
        try:
            names = [n for n in os.listdir(self.meta_dir) if n.startswith("v") and n.endswith(".json")]
        except FileNotFoundError:
            return None
        if not names:
            return None
        return max(int(n[1:-5]) for n in names)

    def manifest(self, version: int | None = None) -> dict:
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed snapshot at {self.root}")
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        v = self.current_version() or 0
        return [self.manifest(i) for i in range(1, v + 1)]

    def version_at(self, ts) -> int:
        """Snapshot-as-of-timestamp resolution (Iceberg's ``FOR
        TIMESTAMP AS OF``): the latest version whose ``committed_at_ms``
        is <= ``ts``, for use as the ``version=`` argument of ``read``/
        ``schema``/``files``. ``ts`` is a unix epoch in milliseconds, or
        a datetime (naive = UTC, matching the session timezone).

        Binary search over the manifest chain — O(log versions) JSON
        reads, not a full history scan; commit timestamps are
        single-writer wall clock, monotone for the same reason
        Iceberg's are. Raises ``ValueError`` for a ts before the
        table's creation: returning "empty table" there would silently
        absorb a caller's unit mistake (seconds vs ms) as missing data.

        Manifests are never vacuumed (only unreferenced DATA files
        are), so resolution works across the full history; a read at
        the resolved version can still fail if that snapshot's data
        files were vacuumed — the same contract as ``read(version=)``.
        """
        import datetime

        if isinstance(ts, datetime.datetime):
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=datetime.timezone.utc)
            ts = int(ts.timestamp() * 1000)
        cur = self.current_version()
        if cur is None:
            raise FileNotFoundError(f"no table at {self.root}")
        if self.manifest(1)["committed_at_ms"] > ts:
            raise ValueError(
                f"ts {ts} predates the table's first commit "
                f"({self.manifest(1)['committed_at_ms']} ms) — check the unit (ms, not s)"
            )
        lo, hi = 1, cur  # invariant: committed_at(lo) <= ts
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if self.manifest(mid)["committed_at_ms"] <= ts:
                lo = mid
            else:
                hi = mid - 1
        return lo

    def schema(self, version: int | None = None) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.manifest(version)["schema"]))

    def bucket_spec(self, version: int | None = None) -> BucketSpec | None:
        return BucketSpec.from_json(self.manifest(version).get("bucket"))

    def properties(self, version: int | None = None) -> dict:
        return self.manifest(version).get("properties", {})

    def watermark(self, stream_id: str) -> int:
        """Last epoch applied for a stream (−1 if never). The epoch
        fence for exactly-once foreachBatch commits."""
        return int(self.manifest().get("watermarks", {}).get(stream_id, -1))

    def _commit(
        self,
        version: int,
        files: list[dict],
        schema: T.StructType,
        bucket: BucketSpec | None,
        summary: dict,
        watermarks: dict,
        parent: int | None = None,
        properties: dict | None = None,
    ) -> dict:
        man = {
            "format_version": 1,
            "version": version,
            "parent": parent,
            "committed_at_ms": int(time.time() * 1000),
            "schema": schema.json(),
            "bucket": bucket.to_json() if bucket else None,
            "files": files,
            "row_count": sum(f["rows"] for f in files),
            "summary": summary,
            "watermarks": watermarks,
            "properties": properties or {},
        }
        os.makedirs(self.meta_dir, exist_ok=True)
        tmp = os.path.join(self.meta_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(man, f)
            f.flush()
            os.fsync(f.fileno())
        final = self._manifest_path(version)
        try:
            os.link(tmp, final)  # atomic publish; fails if version taken
        except FileExistsError as e:
            raise CommitConflict(f"version {version} already committed at {self.root}") from e
        finally:
            os.unlink(tmp)
        return man

    # -------------------------------------------------------- data IO
    def _write_data_files(
        self,
        df: DataFrame,
        version_hint: int,
        bucket: BucketSpec | None,
        write_salt: int = 1,
        cluster_by: tuple[str, ...] = (),
        cluster_files: int | None = None,
    ) -> list[dict]:
        """Write df as immutable parquet files under data/, return file
        descriptors. Bucketed tables cluster rows so each file belongs
        to one bucket (partitionBy directory = bucket id).

        ``write_salt > 1`` splits each bucket's write across that many
        tasks (deterministic row-hash salt): a hot conversation that
        dominates one bucket otherwise serializes the whole commit
        behind a single straggler task. Files still land in exactly one
        bucket directory — read-side pruning is unaffected.

        A caller that already clustered the rows by a ``_bucket``
        column (e.g. the MoR merge, which reuses its fold shuffle for
        the layout) skips the extra repartition exchange entirely.

        ``cluster_by`` is the table's sort-order lever (Iceberg sort
        orders / Delta ``OPTIMIZE ZORDER`` in spirit): on an unbucketed
        table the commit is range-repartitioned then sorted on those
        columns, so each data file covers a narrow, near-disjoint slice
        and the manifest column bounds (``stats_columns`` — which
        should include the cluster columns, or the layout buys no file
        skipping) make ``read(where_ranges=...)`` skip most files.
        ``cluster_files`` pins the file count (Iceberg's target-file
        knob); left ``None``, AQE sizes the range partitions by its
        advisory partition bytes — the right default at scale, but a
        small commit then coalesces to one file and buys no skipping.
        On a
        bucketed table the bucket layout wins (files must stay
        one-bucket); clustering there sorts rows within each bucket
        file, tightening parquet row-group statistics that Spark's own
        pushed-down range filter prunes at scan time. Range
        repartitioning samples the input (one extra Spark job per
        commit) — a write-side cost paid once, amortized over every
        range read of the file.
        """
        if cluster_by:
            missing = [c for c in cluster_by if c not in df.columns]
            if missing:
                raise ValueError(f"cluster_by columns not in data: {missing}")
        commit_dir = os.path.join(self.root, DATA_DIR, f"c{version_hint}-{uuid.uuid4().hex[:8]}")
        if bucket:
            pre_bucketed = "_bucket" in df.columns
            out = df if pre_bucketed else df.withColumn("_bucket", bucket.expr())
            if not pre_bucketed:
                if write_salt > 1:
                    salt = F.pmod(
                        F.xxhash64(F.struct(*[F.col(c) for c in df.columns])), F.lit(write_salt)
                    )
                    out = (
                        out.withColumn("_salt", salt)
                        .repartition(bucket.buckets * write_salt, "_bucket", "_salt")
                        .drop("_salt")
                    )
                else:
                    out = out.repartition(bucket.buckets, "_bucket")
            # lead with _bucket: the partitionBy writer REQUIRES tasks
            # ordered by the partition column and silently inserts its
            # own (unstable) sort when they aren't — which would clobber
            # this one. Satisfying the required ordering up front means
            # no planner sort, so the clustering survives to the file.
            # When no clustering is requested, sort by _bucket ALONE —
            # the minimal ordering the writer needs; adding the (string)
            # bucket column would tax every micro-batch commit for a
            # row-group layout nobody asked for.
            cluster_sort = (bucket.column, *cluster_by) if cluster_by else ()
            out = out.sortWithinPartitions("_bucket", *cluster_sort)
            out.write.partitionBy("_bucket").mode("errorifexists").parquet(commit_dir)
        else:
            out = df
            if cluster_by:
                cols = [F.col(c) for c in cluster_by]
                # explicit numPartitions pins the layout (AQE never
                # coalesces REPARTITION_BY_NUM shuffles); without it
                # AQE picks the count from its advisory size
                out = (
                    out.repartitionByRange(cluster_files, *cols)
                    if cluster_files
                    else out.repartitionByRange(*cols)
                )
                out = out.sortWithinPartitions(*cluster_by)
            out.write.mode("errorifexists").parquet(commit_dir)
        found: list[tuple[str, int | None]] = []
        for dirpath, _dirs, names in os.walk(commit_dir):
            b = None
            base = os.path.basename(dirpath)
            if base.startswith("_bucket="):
                b = int(base.split("=", 1)[1])
            for n in sorted(names):
                if n.endswith(".parquet"):
                    found.append((os.path.join(dirpath, n), b))
        # footer reads are driver-side IO — overlap them; a serial walk
        # over hundreds of commit files otherwise sits on the streaming
        # batch's critical path. Column bounds ride along for free: the
        # footer is already open, its statistics were computed by the
        # writer.
        from concurrent.futures import ThreadPoolExecutor

        stats_cols = tuple(self.properties().get("stats_columns") or ())
        with ThreadPoolExecutor(max_workers=8) as ex:
            metas = list(ex.map(lambda fb: _file_meta(fb[0], stats_cols), found))
        return [
            {
                "path": os.path.relpath(p, self.root),
                "bucket": b,
                "rows": r,
                "bytes": os.path.getsize(p),
                **({"stats": s} if s else {}),
            }
            for (p, b), (r, s) in zip(found, metas)
        ]

    def files(self, version: int | None = None, buckets: set[int] | None = None) -> list[dict]:
        fs = self.manifest(version)["files"]
        if buckets is not None:
            fs = [f for f in fs if f.get("bucket") in buckets]
        return fs

    def changes(self, since_version: int, until_version: int | None = None) -> DataFrame:
        """Incremental changelog scan (Iceberg ``incremental read`` /
        changelog-table semantics) for merge-on-read tables: the change
        rows committed AFTER ``since_version`` up to ``until_version``
        (inclusive; default current). Each row is a folded CDC winner —
        upsert (``_deleted`` false) or delete tombstone (``_deleted``
        true) — stamped with ``_commit_version``; downstream consumers
        tail the table incrementally instead of re-scanning it.

        Cost is metadata-pruned: only the delta files added by the
        commits in range are read — O(changes), never O(table).
        Compaction commits are skipped (they rewrite files without
        changing logical state), and maintenance never perturbs a
        consumer's changelog. Raises for copy-on-write tables, where a
        commit's new files mix changed rows with carried-over ones —
        diff two snapshot reads instead (``operators.diff``).

        Retention interplay (same contract as Iceberg incremental
        reads over expired snapshots): ``vacuum`` may delete delta
        files that only historical manifests reference once compaction
        has folded them. A consumer must keep its cursor within the
        table's retention window; a range whose files were vacuumed
        raises ``FileNotFoundError`` naming the missing files rather
        than returning a silently incomplete changelog.
        """
        if self.properties().get("merge_mode") != "mor":
            raise ValueError(
                "changes() requires a merge-on-read table; for copy-on-write "
                "diff snapshot reads (operators/diff.py::snapshot_diff)"
            )
        cur = self.current_version()
        until = until_version if until_version is not None else cur
        if not (0 <= since_version <= until <= cur):
            raise ValueError(f"need 0 <= since {since_version} <= until {until} <= current {cur}")
        schema = self.schema(until)
        parts: list[tuple[int, list[str]]] = []
        for v in range(since_version + 1, until + 1):
            man = self.manifest(v)
            op = man.get("summary", {}).get("op", "")
            if op == "rollback":
                # a rollback REMOVES state: emitting its re-referenced
                # files as change rows would miss the implied deletes
                # of everything committed after the target, silently
                # corrupting a consumer's replica. Same contract as
                # Iceberg incremental scans (append-style snapshots
                # only) — the consumer re-syncs from a snapshot read.
                raise ValueError(
                    f"changelog range ({since_version}, {until}] crosses a "
                    f"rollback commit (v{v} rolled back to "
                    f"v{man['summary'].get('rollback_of')}); incremental "
                    "consumers must re-sync from a snapshot read"
                )
            if op in ("compact", "compact-tombstones"):
                continue  # physical rewrite, logical no-op
            prev = (
                {f["path"] for f in self.manifest(v - 1)["files"]} if v > 1 else set()
            )
            added = [
                os.path.join(self.root, f["path"])
                for f in man["files"]
                if f["path"] not in prev and f["rows"] > 0
            ]
            if added:
                parts.append((v, added))
        missing = [p for _v, paths in parts for p in paths if not os.path.exists(p)]
        if missing:
            raise FileNotFoundError(
                f"changelog range ({since_version}, {until}] needs {len(missing)} "
                f"vacuumed delta file(s) (cursor fell behind the retention "
                f"window), e.g. {missing[0]}"
            )
        if not parts:
            empty = T.StructType(
                schema.fields + [T.StructField("_commit_version", T.LongType(), False)]
            )
            return self.spark.createDataFrame([], empty)
        dfs = [
            self.spark.read.schema(schema).parquet(*paths).withColumn(
                "_commit_version", F.lit(v).cast("long")
            )
            for v, paths in parts
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def read(
        self,
        version: int | None = None,
        buckets: set[int] | None = None,
        with_bucket_col: bool = False,
        include_tombstones: bool = False,
        fold: bool | None = None,
        where_ranges: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """Snapshot read (time travel via ``version``); optionally
        restricted to a bucket subset — the MERGE fast path.

        ``where_ranges`` maps column → ``(lo, hi)`` (either end may be
        ``None`` for open): data files whose manifest column bounds
        (``properties["stats_columns"]``, harvested from parquet footer
        statistics at commit time — Iceberg's lower/upper bounds) prove
        them disjoint from the range are skipped before Spark ever
        plans the scan, and the residual row filter ``lo <= col <= hi``
        (nulls excluded, SQL semantics) is applied to the survivors —
        the result is exactly ``read().filter(col BETWEEN lo AND hi)``.
        Files with no recorded bounds for a column are always kept. On
        a merge-on-read FOLD read, range columns must be merge keys:
        every version of a key shares its key values, so key-range
        pruning can never split a key's delta history, while pruning by
        a payload value could drop the file holding a key's latest
        version and silently fold to stale state — such calls raise.

        Merge-on-read tables (``properties.merge_mode == "mor"``) carry
        multiple versions of a key across delta files; the read applies
        the last-writer-wins fold (one hash agg on the merge keys) so
        every reader sees exactly the merged state. ``fold=False``
        returns the raw delta rows (compaction/debugging).

        If the table carries a ``_deleted`` tombstone column (CDC
        tables do — see lake/merge.py), tombstoned rows are filtered
        and the column hidden unless ``include_tombstones``.
        """
        schema = self.schema(version)
        fs = self.files(version, buckets)
        props = self.properties(version)
        if fold is None:
            fold = props.get("merge_mode") == "mor"
        if where_ranges:
            bad = [c for c in where_ranges if c not in schema.fieldNames()]
            if bad:
                raise ValueError(f"where_ranges columns not in table schema: {bad}")
            malformed = {c: r for c, r in where_ranges.items() if len(tuple(r)) != 2}
            if malformed:
                raise ValueError(f"where_ranges values must be (lo, hi) pairs: {malformed}")
            if fold:
                keys = set(props.get("merge_keys") or ())
                nonkey = [c for c in where_ranges if c not in keys]
                if nonkey:
                    raise ValueError(
                        f"where_ranges on non-merge-key columns {nonkey} is unsound "
                        "on a merge-on-read fold read: payload-range pruning could "
                        "drop the delta file holding a key's LATEST version while "
                        "older versions survive, silently folding to stale state. "
                        "Range merge keys here, or filter the folded DataFrame."
                    )
            fs = [f for f in fs if _file_in_ranges(f, where_ranges)]
        if not fs:
            df = self.spark.createDataFrame([], schema)
        else:
            paths = [os.path.join(self.root, f["path"]) for f in fs]
            df = self.spark.read.schema(schema).parquet(*paths)
        if where_ranges:
            # residual filter: bounds are file-granular, surviving
            # files still hold out-of-range rows. Applied pre-fold —
            # sound because fold reads only reach here on key columns.
            for c, (lo, hi) in where_ranges.items():
                if lo is not None:
                    df = df.filter(F.col(c) >= F.lit(lo))
                if hi is not None:
                    df = df.filter(F.col(c) <= F.lit(hi))
        if fold:
            keys = props.get("merge_keys")
            if not keys:
                raise ValueError("mor fold requested but table has no merge_keys property")
            others = [c for c in df.columns if c not in keys]
            winner = F.max_by(F.struct(*[F.col(c) for c in others]), F.col("_lsn")).alias("_w")
            df = (
                df.groupBy(*[F.col(k) for k in keys])
                .agg(winner)
                .select(*keys, *[F.col(f"_w.{c}").alias(c) for c in others])
            )
        if "_deleted" in schema.fieldNames() and not include_tombstones:
            df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False))).drop("_deleted")
        if with_bucket_col:
            spec = self.bucket_spec(version)
            if spec is None:
                raise ValueError("table is not bucketed")
            df = df.withColumn("_bucket", spec.expr())
        return df

    # ------------------------------------------------------- mutations
    def _next_commit(
        self,
        new_files: list[dict],
        keep: list[dict] | "object",
        summary: dict,
        watermarks_update: dict | None = None,
        schema: T.StructType | None = None,
        retries: int = 5,
    ) -> dict:
        """Optimistic commit with retry. ``keep`` is either a callable
        ``keep_fn(fresh_manifest) -> list[file dict]`` or a plain list.

        The callable form is the concurrency-correct one: it is
        re-evaluated against the FRESH manifest on every attempt, so a
        retry after a lost race carries over the *winner's* files
        instead of resurrecting a stale snapshot (which silently
        dropped concurrently-committed data). A ``keep_fn`` may raise
        :class:`CommitConflict` itself when the fresh state invalidates
        the data the caller computed (see ``replace_buckets``)."""
        keep_fn = keep if callable(keep) else (lambda _cur: keep)
        for attempt in range(retries):
            cur = self.manifest()
            wm = dict(cur.get("watermarks", {}))
            wm.update(watermarks_update or {})
            keep_files = keep_fn(cur)
            try:
                return self._commit(
                    version=cur["version"] + 1,
                    parent=cur["version"],
                    files=keep_files + new_files,
                    schema=schema or self.schema(),
                    bucket=self.bucket_spec(),
                    summary=summary,
                    watermarks=wm,
                    properties=cur.get("properties", {}),
                )
            except CommitConflict:
                if attempt == retries - 1:
                    raise
                time.sleep(0.05 * (attempt + 1))
        raise CommitConflict("unreachable")

    @staticmethod
    def _tagged(summary: dict | None, op: str) -> dict:
        """Commit summary with the authoritative ``op`` tag. The tag is
        chosen by the lake primitive (or an explicit ``op=`` argument
        at a lake-layer call site), never by a caller-supplied summary
        dict: ``changes()`` keys changelog visibility off ``op``, so a
        context summary like ``{"op": "maintenance"}`` clobbering
        ``compact`` would make a physical rewrite look like O(table)
        change rows. Any ``op`` key in ``summary`` is dropped."""
        return {**{k: v for k, v in (summary or {}).items() if k != "op"}, "op": op}

    def append_rows(self, rows: list[dict], summary: dict | None = None) -> dict:
        """Driver-side append of a handful of rows (lineage/metrics
        bookkeeping): writes one parquet file via pyarrow, no Spark job.
        A streaming sink that launched a distributed job to persist a
        three-row metrics record would spend more on scheduling than on
        data — this is the per-micro-batch fast path."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not rows:
            return self.manifest()
        schema = self.schema()
        arrow_schema = pa.schema(
            [(f.name, _arrow_type(f.dataType)) for f in schema.fields]
        )
        cols = {
            f.name: [r.get(f.name) for r in rows] for f in schema.fields
        }
        tbl = pa.Table.from_pydict(cols, schema=arrow_schema)
        cur = self.manifest()
        commit_dir = os.path.join(
            self.root, DATA_DIR, f"c{cur['version'] + 1}-{uuid.uuid4().hex[:8]}"
        )
        os.makedirs(commit_dir, exist_ok=True)
        path = os.path.join(commit_dir, "part-00000.parquet")
        pq.write_table(tbl, path, compression="snappy")
        _, stats = _file_meta(path, tuple(self.properties().get("stats_columns") or ()))
        new = [
            {
                "path": os.path.relpath(path, self.root),
                "bucket": None,
                "rows": len(rows),
                "bytes": os.path.getsize(path),
                **({"stats": stats} if stats else {}),
            }
        ]
        return self._next_commit(new, lambda c: c["files"], self._tagged(summary, "append"))

    def append(
        self,
        df: DataFrame,
        summary: dict | None = None,
        watermarks_update: dict | None = None,
        write_salt: int = 1,
        op: str = "append",
        cluster_by: tuple[str, ...] = (),
        cluster_files: int | None = None,
    ) -> dict:
        cur = self.manifest()
        new = self._write_data_files(
            df, cur["version"] + 1, self.bucket_spec(), write_salt,
            cluster_by=cluster_by, cluster_files=cluster_files,
        )
        return self._next_commit(
            new, lambda c: c["files"], self._tagged(summary, op), watermarks_update
        )

    def overwrite(
        self,
        df: DataFrame,
        summary: dict | None = None,
        cluster_by: tuple[str, ...] = (),
        cluster_files: int | None = None,
    ) -> dict:
        cur = self.manifest()
        new = self._write_data_files(
            df, cur["version"] + 1, self.bucket_spec(),
            cluster_by=cluster_by, cluster_files=cluster_files,
        )
        return self._next_commit(new, [], self._tagged(summary, "overwrite"))

    def commit_metadata(self, summary: dict, watermarks_update: dict | None = None) -> dict:
        """Metadata-only commit (e.g. advance an epoch watermark for an
        empty batch)."""
        return self._next_commit([], lambda c: c["files"], summary, watermarks_update)

    def add_columns(
        self, new_fields: list[T.StructField], summary: dict | None = None, retries: int = 5
    ) -> dict:
        """Schema evolution: append columns. Existing files are
        untouched; readers see NULLs for old files (by-name parquet
        resolution against the authoritative manifest schema).

        The retry loop recomputes the merged schema from the fresh
        manifest so a lost race against a concurrent ``add_columns``
        never drops the winner's columns."""
        for attempt in range(retries):
            cur_schema = self.schema()
            existing = {f.name for f in cur_schema.fields}
            added = [f for f in new_fields if f.name not in existing]
            if not added:
                return self.manifest()
            new_schema = T.StructType(cur_schema.fields + added)
            try:
                return self._next_commit(
                    [], lambda c: c["files"],
                    {**(summary or {}), "op": "evolve-schema", "added": [f.name for f in added]},
                    schema=new_schema,
                    retries=1,
                )
            except CommitConflict:
                if attempt == retries - 1:
                    raise
                time.sleep(0.05 * (attempt + 1))
        raise CommitConflict("unreachable")

    def replace_buckets(
        self,
        buckets: set[int],
        df: DataFrame,
        summary: dict | None = None,
        watermarks_update: dict | None = None,
        schema: T.StructType | None = None,
        write_salt: int = 1,
        base_version: int | None = None,
        op: str = "merge",
        cluster_by: tuple[str, ...] = (),
    ) -> dict:
        """Copy-on-write commit unit: atomically swap all files of the
        given buckets for the new data (which must only contain rows of
        those buckets). Files in other buckets are carried over from
        the FRESH manifest at commit time, so a lost race against a
        writer of *other* buckets retries cleanly.

        ``cluster_by`` sorts the replacement rows within each bucket
        file (see ``_write_data_files``) — compaction's OPTIMIZE hook.

        ``base_version`` is the snapshot the replacement data was
        computed from (callers that read the table first pass the
        version they read). If a concurrent commit changed the *target*
        buckets since then, the replacement would silently drop that
        writer's rows — the commit aborts with :class:`CommitConflict`
        instead; the caller must recompute from the fresh snapshot."""
        base = base_version if base_version is not None else self.current_version()
        base_target = sorted(
            f["path"] for f in self.files(base) if f.get("bucket") in buckets
        )
        new = self._write_data_files(
            df, base + 1, self.bucket_spec(), write_salt, cluster_by=cluster_by
        )
        stray = [f for f in new if f.get("bucket") not in buckets and f["rows"] > 0]
        if stray:
            raise ValueError(f"replacement data contains rows outside target buckets: {stray}")

        def keep_fn(fresh: dict) -> list[dict]:
            fresh_target = sorted(
                f["path"] for f in fresh["files"] if f.get("bucket") in buckets
            )
            if fresh_target != base_target:
                raise CommitConflict(
                    f"target buckets {sorted(buckets)} changed concurrently "
                    f"(computed from v{base}, now v{fresh['version']}) — recompute "
                    "the replacement from the fresh snapshot"
                )
            return [f for f in fresh["files"] if f.get("bucket") not in buckets]

        return self._next_commit(
            new, keep_fn, self._tagged(summary, op), watermarks_update, schema=schema
        )

    def rollback(
        self,
        version: int,
        summary: dict | None = None,
        restore_watermarks: bool = False,
    ) -> dict:
        """Roll the table back to an earlier snapshot (Iceberg
        ``rollback_to_snapshot``): commits a NEW head whose logical
        state — file list and schema — is exactly that of ``version``.
        History stays append-only: the rolled-back commits remain
        time-travelable, the target's data files become live again for
        ``vacuum`` (retention counts manifests back from the head), and
        the bad commits' delta files expire through normal retention.

        The target snapshot's data files must still exist: a rollback
        past the vacuum retention window raises ``FileNotFoundError``
        naming a missing file instead of committing a head that cannot
        be read. Like Iceberg's, a rollback racing a concurrent writer
        wins — it resets state by definition, so the keep-fn ignores
        files the fresh head added (callers coordinate maintenance
        windows for that reason).

        Stream fences: ``restore_watermarks=False`` (default) keeps the
        current per-stream epoch watermarks — correct whenever the
        stream resumes from its EXISTING checkpoint: Spark's source
        does not re-deliver consumed input, epoch numbering continues,
        and the rolled-back epochs are simply gone from the table
        (reset posture: the feed rows themselves were bad).
        ``restore_watermarks=True`` restores the target's fences
        (streams unknown at the target revert to −1 = never applied) —
        for the narrow case where the stream's CHECKPOINT was also
        restored to a matching older copy, keeping fence and epoch
        numbering in sync. It does NOT by itself make a pipeline
        replay anything: with the old checkpoint the source never
        re-emits the consumed files, and with a FRESH checkpoint epoch
        numbering restarts at 0, which a restored fence would wrongly
        skip. To reprocess a fixed feed, roll back and restart with a
        fresh checkpoint AND a fresh ``stream_id`` (fence −1): the
        full-feed replay is idempotent — LSN fencing folds re-applied
        events to the same final state.

        Incremental consumers: ``changes()`` refuses ranges that cross
        a rollback commit — re-sync from a snapshot read (Iceberg's
        incremental scans likewise support only append-style
        snapshots).
        """
        cur = self.current_version()
        if cur is None:
            raise FileNotFoundError(f"no table at {self.root}")
        if not (1 <= version < cur):
            raise ValueError(
                f"rollback target must satisfy 1 <= version < current ({cur}); got {version}"
            )
        target = self.manifest(version)
        missing = [
            f["path"]
            for f in target["files"]
            if not os.path.exists(os.path.join(self.root, f["path"]))
        ]
        if missing:
            raise FileNotFoundError(
                f"rollback to v{version} needs {len(missing)} vacuumed data "
                f"file(s), e.g. {missing[0]} — the target is outside the "
                "retention window"
            )
        wm_update = None
        if restore_watermarks:
            tgt_wm = target.get("watermarks", {})
            cur_wm = self.manifest().get("watermarks", {})
            wm_update = {k: tgt_wm.get(k, -1) for k in set(cur_wm) | set(tgt_wm)}
        return self._next_commit(
            [],
            lambda _fresh: list(target["files"]),
            self._tagged(
                {**(summary or {}), "rollback_of": version}, "rollback"
            ),
            watermarks_update=wm_update,
            schema=T.StructType.fromJson(json.loads(target["schema"])),
        )

    # ------------------------------------------------------ maintenance
    def vacuum(self, keep_versions: int = 1, grace_seconds: float = 600.0) -> list[str]:
        """Delete data files unreferenced by the last ``keep_versions``
        manifests (crash orphans + copy-on-write leftovers).

        Concurrency safety: data files land BEFORE their manifest, so a
        file can be legitimately unreferenced because its writer hasn't
        committed yet. Two guards keep vacuum from breaking an
        in-flight commit: (a) commit dirs whose version hint is newer
        than the latest manifest are skipped wholesale — that version
        hasn't committed; (b) files younger than ``grace_seconds`` are
        skipped — covers conflict-retry windows where a writer re-lands
        under a fresh version number."""
        cur = self.current_version() or 0
        live: set[str] = set()
        for v in range(max(1, cur - keep_versions + 1), cur + 1):
            live |= {f["path"] for f in self.manifest(v)["files"]}
        removed = []
        now = time.time()
        data_root = os.path.join(self.root, DATA_DIR)

        def _version_hint(entry: str) -> int | None:
            if entry.startswith("c") and "-" in entry:
                head = entry[1:].split("-", 1)[0]
                if head.isdigit():
                    return int(head)
            return None

        commit_dirs = sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []
        for entry in commit_dirs:
            d = os.path.join(data_root, entry)
            if not os.path.isdir(d):
                continue
            hint = _version_hint(entry)
            if hint is not None and hint > cur:
                continue  # in-flight writer: data landed, manifest pending
            for dirpath, _dirs, names in os.walk(d):
                for n in names:
                    p = os.path.join(dirpath, n)
                    rel = os.path.relpath(p, self.root)
                    if rel in live or not n.endswith(".parquet"):
                        continue
                    try:
                        if now - os.path.getmtime(p) < grace_seconds:
                            continue
                    except FileNotFoundError:
                        continue
                    os.unlink(p)
                    removed.append(rel)
            if not any(files for _, _, files in os.walk(d)):
                shutil.rmtree(d, ignore_errors=True)
        return removed
