"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API)
— the user-defined connector surface (SURVEY.md §2.1): the reference
ingests a paged REST API with hand-rolled request loops
(`ingestion/ingestion/raw/raw.py:86-141`); Spark 4 lets that same
pagination become a first-class ``spark.read.format(...)`` source with
partition planning, so pages fetch IN PARALLEL across executors and
land as ordinary DataFrame rows.

``ParquetPagesSource`` is the offline, deterministic instance of that
pattern: "pages" are the parquet fragments under a path (one
``InputPartition`` per file — the planning step a REST source would do
by probing total/limit), and each partition's ``read()`` pulls only
its own file via pyarrow — an executor-side fetch, exactly where a
REST page GET would run. No JVM code, no protobuf (unlike
transformWithState, this API's worker protocol is Arrow-only, verified
in-container).

Scale posture: planning lists files on the driver (O(files) metadata);
all row data flows executor-side through Arrow batches, one partition
per file — the same fan-out a parquet scan gets, here under user
control (a real connector would shard by page ranges / key ranges).
The lane's aggregate-vs-parquet-direct oracle proves no row is lost or
re-typed crossing the Python source boundary.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _fragment_files(path: str) -> list[str]:
    """A dataset path is either one parquet file or a directory of
    part-files (the amplified fixtures) — return the fragment list."""
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return [path]


class ParquetPagesSource(DataSource):
    """``spark.read.format("parquet_pages").load(path)``: parquet
    fragments as the pages of a custom Python connector."""

    @classmethod
    def name(cls) -> str:
        return "parquet_pages"

    def schema(self) -> str:
        return DOCS_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _PagesReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _PagesStreamReader(self.options)


class _PagesReader(DataSourceReader):
    def __init__(self, options) -> None:
        self._path = options["path"]

    def partitions(self) -> list[InputPartition]:
        files = _fragment_files(self._path)
        if not files:
            raise FileNotFoundError(f"no parquet fragments under {self._path}")
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition):
        import pyarrow.parquet as pq

        cols = [f.split()[0] for f in DOCS_SCHEMA.split(", ")]
        table = pq.read_table(partition.value, columns=cols)
        # Arrow batches straight through — no per-row Python objects.
        yield from table.to_batches()


class _PagesStreamReader(SimpleDataSourceStreamReader):
    """The same pages as a STREAM: each micro-batch consumes one
    fragment, the offset is the next fragment index — a replayable,
    checkpoint-compatible cursor (``readBetweenOffsets`` re-serves any
    committed range for recovery, exactly the REST-cursor replay
    contract). The Simple reader variant reads on the DRIVER — right
    for low-throughput page feeds; the partition-planned,
    executor-side half of the same offset algebra is
    ``_PagesDistStreamReader`` below (``parquet_pages_dist``)."""

    def __init__(self, options) -> None:
        self._files = _fragment_files(options["path"])

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, i: int):
        import pyarrow.parquet as pq

        cols = [f.split()[0] for f in DOCS_SCHEMA.split(", ")]
        table = pq.read_table(self._files[i], columns=cols)
        return zip(*(table.column(c).to_pylist() for c in cols))

    def read(self, start: dict):
        i = start["i"]
        if i >= len(self._files):
            return iter([]), {"i": i}
        return self._rows(i), {"i": i + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for i in range(start["i"], end["i"]):
            yield from self._rows(i)


from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class ParquetPagesDistSource(DataSource):
    """``spark.readStream.format("parquet_pages_dist").load(path)``:
    the PARTITION-PLANNED streaming half of the connector surface —
    the high-throughput variant the Simple reader's docstring defers
    to. Same offset algebra ({"i": next fragment index}), but reads
    run in EXECUTORS: ``partitions(start, end)`` fans the offset range
    out to one InputPartition per (fragment, row-group), and each
    task's ``read()`` pulls only its own row group via pyarrow,
    yielding Arrow batches — multiple tasks per micro-batch, zero row
    data on the driver (only footer metadata for planning)."""

    @classmethod
    def name(cls) -> str:
        return "parquet_pages_dist"

    def schema(self) -> str:
        return DOCS_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _PagesReader(self.options)

    def streamReader(self, schema) -> "DataSourceStreamReader":
        return _PagesDistStreamReader(self.options)


class _PagesDistStreamReader(DataSourceStreamReader):
    """Partition-planned executor-side stream reader.

    Admission model: every micro-batch ingests ALL fragments visible
    but not yet consumed (all-available — the admission policy of a
    connector without a rate limit), so the cursor only moves forward
    and recovery replay (``partitions(committed_start, committed_end)``
    over the re-listed, sorted fragment set) re-serves exactly the
    committed range. Assumes fragments are immutable and append in
    lexicographic order (part-NNNNN naming), the same contract as the
    Simple reader. Unlike the Simple reader, Trigger.AvailableNow
    drains this reader completely (``latestOffset()`` is honored;
    test-pinned), so no polling loop is needed.
    """

    def __init__(self, options) -> None:
        self._path = options["path"]

    def _files(self) -> list[str]:
        return _fragment_files(self._path)

    def initialOffset(self) -> dict:
        return {"i": 0}

    def latestOffset(self) -> dict:
        return {"i": len(self._files())}

    def partitions(self, start: dict, end: dict):
        import pyarrow.parquet as pq

        files = self._files()
        parts = []
        for fi in range(start["i"], end["i"]):
            path = files[fi]
            # footer-only metadata read: row-group count for fan-out
            n_rg = pq.ParquetFile(path).metadata.num_row_groups
            parts.extend(
                InputPartition((path, rg)) for rg in range(n_rg)
            )
        return parts

    def read(self, partition: InputPartition):
        import pyarrow.parquet as pq

        path, rg = partition.value
        cols = [f.split()[0] for f in DOCS_SCHEMA.split(", ")]
        table = pq.ParquetFile(path).read_row_group(rg, columns=cols)
        yield from table.to_batches()

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


def register(spark) -> None:
    spark.dataSource.register(ParquetPagesSource)
    spark.dataSource.register(ParquetPagesDistSource)
    spark.dataSource.register(JsonlCommitSource)


# ------------------------------------------------------------------ #
# custom Python SINK: two-phase-commit JSONL writer                   #
# ------------------------------------------------------------------ #

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _PartMessage(WriterCommitMessage):
    part_file: str
    n_rows: int


class JsonlCommitSource(DataSource):
    """``df.write.format("jsonl_commit").option("path", p).save()``:
    a user-defined sink with the TWO-PHASE COMMIT contract the
    DataSourceWriter API exists for — executors write staged
    ``part-*.jsonl`` files and return commit messages; ``commit()``
    runs ONCE on the driver after every task succeeded and publishes a
    ``_MANIFEST.json`` naming the parts (with row counts); ``abort()``
    removes strays. Readers trust ONLY manifest-listed files, so a
    half-failed write is invisible — the same stage→publish discipline
    as the repo's atomic epoch sink (`sources/sinks.py:163`), here at
    the connector layer."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_commit"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _JsonlWriter(self.options["path"], [f.name for f in schema])

    def streamWriter(self, schema, overwrite: bool):
        return _JsonlStreamWriter(
            self.options["path"], [f.name for f in schema]
        )


class _JsonlWriter(DataSourceWriter):
    def __init__(self, path: str, cols: list[str]) -> None:
        self._path = path
        self._cols = cols

    def write(self, iterator) -> _PartMessage:
        import json
        import uuid

        from pyspark import TaskContext

        os.makedirs(self._path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(self._path, fname)
        n = 0
        with open(full, "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self._cols, row))) + "\n")
                n += 1
        return _PartMessage(part_file=fname, n_rows=n)

    def commit(self, messages) -> None:
        import json

        manifest = {
            "parts": [
                {"file": m.part_file, "rows": m.n_rows}
                for m in sorted(
                    (m for m in messages if m is not None),
                    key=lambda m: m.part_file,
                )
            ],
            "total_rows": sum(m.n_rows for m in messages if m is not None),
        }
        tmp = os.path.join(self._path, "_MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self._path, "_MANIFEST.json"))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self._path, m.part_file))
                except FileNotFoundError:
                    pass


def read_jsonl_committed(spark, path: str, schema: str):
    """Read back ONLY manifest-listed parts (the reader half of the
    two-phase contract)."""
    import json

    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    files = [os.path.join(path, p["file"]) for p in manifest["parts"]]
    return spark.read.schema(schema).json(files)


from pyspark.sql.datasource import DataSourceStreamWriter  # noqa: E402


class _JsonlStreamWriter(DataSourceStreamWriter):
    """The streaming half of the two-phase contract: every micro-batch
    stages its part files, then ``commit(messages, batchId)`` publishes
    a per-batch ``_MANIFEST-<batchId>.json`` — idempotently (a replayed
    batch after driver recovery REPLACES its manifest rather than
    double-publishing, which is what makes the sink effectively
    exactly-once under Spark's batch-replay recovery model). abort()
    removes the batch's staged parts."""

    def __init__(self, path: str, cols: list[str]) -> None:
        self._path = path
        self._cols = cols

    def write(self, iterator) -> _PartMessage:
        return _JsonlWriter(self._path, self._cols).write(iterator)

    def commit(self, messages, batchId: int) -> None:
        import json

        manifest = {
            "batch_id": batchId,
            "parts": [
                {"file": m.part_file, "rows": m.n_rows}
                for m in sorted(
                    (m for m in messages if m is not None),
                    key=lambda m: m.part_file,
                )
            ],
            "total_rows": sum(m.n_rows for m in messages if m is not None),
        }
        tmp = os.path.join(self._path, f"_MANIFEST-{batchId}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(
            tmp, os.path.join(self._path, f"_MANIFEST-{batchId}.json")
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self._path, m.part_file))
                except FileNotFoundError:
                    pass


def read_jsonl_stream_committed(spark, path: str, schema: str):
    """Read back every part named by any per-batch manifest — staged
    strays and aborted batches stay invisible."""
    import json

    files = []
    for mf in sorted(glob.glob(os.path.join(path, "_MANIFEST-*.json"))):
        with open(mf) as f:
            files.extend(
                os.path.join(path, p["file"]) for p in json.load(f)["parts"]
            )
    return spark.read.schema(schema).json(files)
