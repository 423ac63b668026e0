"""``dbps_protected`` — a PySpark Python Data Source for protected
datasets.

The idiomatic Spark-4 surface for the sidecar contract
(``sources/protected_parquet.py``): after one ``register_dbps_datasource
(spark)`` call, a protected dataset opens like any other format —

    spark.read.format("dbps_protected").load(path)

— with the protected columns transparently decrypted to their original
logical types (the reference's agent-``init`` + decrypt flow,
``dbpa_interface.h:141-149``, as a declarative source instead of an
imperative client).

Scale shape: ``partitions()`` maps one input partition per parquet
file, so a 10k-file dataset fans out across the cluster exactly like
the native reader; ``read()`` decrypts whole Arrow record batches with
the same vectorized kernel the UDF path uses (zero per-row Python).
Schema is served from the sidecar + parquet footer only — planning
reads no data pages.

Current scope: parquet cell encoding, unpartitioned layout (the
``rotate_protected`` default). Partitioned or base64 text datasets use
``read_protected``, which handles both.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    InputPartition,
    WriterCommitMessage,
)

from ..core.errors import DBPSInvalidInputError
from .protected_parquet import SIDECAR_NAME

FORMAT_NAME = "dbps_protected"


def parse_columns_option(spec: str) -> dict[str, str]:
    """``"c_name:key_A,c_acctbal:key_B"`` -> {column: key_id} (data
    source options are strings, so the column->key map travels encoded)."""
    out: dict[str, str] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if ":" not in part:
            raise DBPSInvalidInputError(
                f"bad columns option entry {part!r}; want 'column:key_id'"
            )
        name, key_id = part.split(":", 1)
        out[name.strip()] = key_id.strip()
    if not out:
        raise DBPSInvalidInputError("columns option names no columns")
    return out


def _load_sidecar(path: str) -> dict:
    sp = os.path.join(path, SIDECAR_NAME)
    if not os.path.exists(sp):
        raise DBPSInvalidInputError(
            f"no {SIDECAR_NAME} found at {path!r}; not a protected dataset"
        )
    with open(sp) as f:
        return json.load(f)


class _FileSplit(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ProtectedParquetDataSource(DataSource):
    """DataSource entry point; options: ``path`` (dataset directory)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise DBPSInvalidInputError(
                f"format('{FORMAT_NAME}') requires .load(<dataset path>)"
            )
        return path

    def schema(self) -> T.StructType:
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        path = self._path()
        meta = _load_sidecar(path)
        if meta.get("format", "parquet") != "parquet":
            raise DBPSInvalidInputError(
                f"{FORMAT_NAME} reads parquet cell encoding; this dataset "
                f"is {meta.get('format')!r} — use read_protected()"
            )
        if meta.get("partition_by"):
            raise DBPSInvalidInputError(
                f"{FORMAT_NAME} does not map partition directories; use "
                "read_protected() for partitioned datasets"
            )
        files = _parquet_files(path)
        if not files:
            raise DBPSInvalidInputError(f"no parquet files under {path!r}")
        # footer-only: planning never touches data pages
        disk = from_arrow_schema(pq.read_schema(files[0]))
        fields = []
        for f in disk.fields:
            cfg = meta["columns"].get(f.name)
            if cfg is None:
                fields.append(f)
            else:
                fields.append(
                    T.StructField(
                        f.name,
                        T._parse_datatype_json_string(cfg["original_type"]),
                        f.nullable,
                    )
                )
        return T.StructType(fields)

    def reader(self, schema: T.StructType) -> "ProtectedParquetReader":
        return ProtectedParquetReader(self._path(), schema)

    def writer(self, schema: T.StructType, overwrite: bool):
        path = self._path()
        spec = self.options.get("columns")
        if not spec:
            raise DBPSInvalidInputError(
                f"format('{FORMAT_NAME}') writes need .option('columns', "
                "'col:key_id,...')"
            )
        columns = parse_columns_option(spec)
        missing = [c for c in columns if c not in schema.fieldNames()]
        if missing:
            raise DBPSInvalidInputError(
                f"columns not in DataFrame: {missing}"
            )
        encryptor = self.options.get("encryptor", "keystream_xor")
        if os.path.isdir(path) and _parquet_files(path):
            if overwrite:
                for n in os.listdir(path):
                    full = os.path.join(path, n)
                    if os.path.isfile(full):
                        os.remove(full)
            else:
                # append: the new files must decrypt under the EXISTING
                # sidecar, so the column->key/encryptor config must match
                meta = _load_sidecar(path)
                want = {
                    name: {
                        "key_id": key_id,
                        "original_type": schema[name].dataType.json(),
                        "encryptor": encryptor,
                    }
                    for name, key_id in columns.items()
                }
                if meta.get("columns") != want:
                    raise DBPSInvalidInputError(
                        "append config mismatch: dataset sidecar protects "
                        f"{sorted(meta.get('columns', {}))} but this write "
                        f"declares {sorted(want)} (keys/types/encryptor "
                        "must match exactly; use mode('overwrite') to "
                        "replace the dataset)"
                    )
        return ProtectedParquetWriter(path, schema, columns, encryptor)

    def streamWriter(self, schema: T.StructType, overwrite: bool):
        """Streaming sink: ``df.writeStream.format("dbps_protected")``.
        Append-only (streaming overwrite/complete modes don't fit a
        protected dataset whose sidecar is immutable config)."""
        if overwrite:
            raise DBPSInvalidInputError(
                f"{FORMAT_NAME} streaming sink is append-only"
            )
        path = self._path()
        spec = self.options.get("columns")
        if not spec:
            raise DBPSInvalidInputError(
                f"format('{FORMAT_NAME}') writes need .option('columns', "
                "'col:key_id,...')"
            )
        columns = parse_columns_option(spec)
        missing = [c for c in columns if c not in schema.fieldNames()]
        if missing:
            raise DBPSInvalidInputError(
                f"columns not in DataFrame: {missing}"
            )
        return ProtectedParquetStreamWriter(
            path,
            schema,
            columns,
            self.options.get("encryptor", "keystream_xor"),
        )


def _parquet_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    )


class ProtectedParquetReader(DataSourceReader):
    def __init__(self, path: str, schema: T.StructType):
        self._path = path
        self._schema = schema
        self._meta = _load_sidecar(path)
        self._pushed: list = []

    def pushFilters(self, filters):
        """Push comparison filters on UNPROTECTED columns down to the
        parquet scan (pyarrow evaluates them against row-group stats
        and pages, so pruned data never reaches Python). Filters on
        protected columns can never push — on disk those cells are
        ciphertext, and comparing plaintext predicates against them
        would be wrong — so they stay in Spark and run after decrypt."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            IsNull,
            LessThan,
            LessThanOrEqual,
        )

        supported = (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
            In,
            IsNotNull,
            IsNull,
        )
        protected = set(self._meta["columns"])
        remaining = []
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr and len(attr) == 1 else None
            if (
                isinstance(f, supported)
                and col is not None
                and col not in protected
            ):
                self._pushed.append(f)
            else:
                remaining.append(f)
        return remaining

    def _arrow_filter(self):
        """Pushed filters -> a pyarrow.compute expression (ANDed)."""
        if not self._pushed:
            return None
        import pyarrow.compute as pc
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            IsNull,
            LessThan,
            LessThanOrEqual,
        )

        expr = None
        for f in self._pushed:
            col = pc.field(f.attribute[0])
            if isinstance(f, EqualTo):
                e = col == f.value
            elif isinstance(f, GreaterThan):
                e = col > f.value
            elif isinstance(f, GreaterThanOrEqual):
                e = col >= f.value
            elif isinstance(f, LessThan):
                e = col < f.value
            elif isinstance(f, LessThanOrEqual):
                e = col <= f.value
            elif isinstance(f, In):
                e = col.isin(list(f.value))
            elif isinstance(f, IsNull):
                e = col.is_null()
            else:  # IsNotNull
                e = ~col.is_null()
            expr = e if expr is None else expr & e
        return expr

    def partitions(self):  # one split per file — native-reader fan-out
        return [_FileSplit(p) for p in _parquet_files(self._path)]

    def read(self, partition: _FileSplit):
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_type

        from ..functions.protect import make_unprotect_kernel

        kernels = {
            name: (
                make_unprotect_kernel(
                    T._parse_datatype_json_string(cfg["original_type"]),
                    cfg["key_id"],
                    cfg["encryptor"],
                ),
                to_arrow_type(self._schema[name].dataType),
            )
            for name, cfg in self._meta["columns"].items()
        }
        import pyarrow.dataset as pads

        # dataset scanner so pushed filters prune at row-group/page
        # level INSIDE pyarrow — filtered rows never cross into Python
        scanner = pads.dataset(partition.path, format="parquet").scanner(
            columns=[f.name for f in self._schema.fields],
            filter=self._arrow_filter(),
        )
        for batch in scanner.to_batches():
            if batch.num_rows == 0:
                continue
            cols = []
            for field in self._schema.fields:
                arr = batch.column(field.name)
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                hit = kernels.get(field.name)
                if hit is not None:
                    kernel, arrow_type = hit
                    arr = kernel(arr).cast(arrow_type)
                cols.append(arr)
            yield pa.RecordBatch.from_arrays(
                cols, names=[f.name for f in self._schema.fields]
            )


class _Committed(WriterCommitMessage):
    def __init__(self, filename: str):
        self.filename = filename


class ProtectedParquetWriter(DataSourceArrowWriter):
    """Arrow-batch writer: encrypt the named columns with the shared
    vectorized kernel and emit one parquet file per input partition
    (native-writer fan-out); ``commit`` persists the sidecar once all
    tasks report success, so readers never observe a dataset whose
    sidecar predates its files."""

    def __init__(
        self,
        path: str,
        schema: T.StructType,
        columns: dict[str, str],
        encryptor: str,
    ):
        self._dst = path
        self._schema = schema
        self._columns = columns
        self._encryptor = encryptor

    def write(self, iterator) -> _Committed:
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark import TaskContext

        from ..functions.protect import make_protect_kernel

        kernels = {
            name: make_protect_kernel(
                self._schema[name].dataType, key_id, self._encryptor
            )
            for name, key_id in self._columns.items()
        }
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self._dst, exist_ok=True)
        filename = f"part-{pid:05d}-{uuid.uuid4().hex}.parquet"
        out_path = os.path.join(self._dst, filename)
        writer = None
        try:
            for batch in iterator:
                cols, names = [], []
                for i, field in enumerate(batch.schema):
                    arr = batch.column(i)
                    kernel = kernels.get(field.name)
                    if kernel is not None:
                        arr = kernel(arr)
                    cols.append(arr)
                    names.append(field.name)
                out = pa.RecordBatch.from_arrays(cols, names=names)
                if writer is None:
                    writer = pq.ParquetWriter(out_path, out.schema)
                writer.write_batch(out)
        finally:
            if writer is not None:
                writer.close()
        # an empty partition emits no file (matching the native writer's
        # default); the commit message carries no filename to clean up
        return _Committed(filename if writer is not None else "")

    def commit(self, messages) -> None:
        from ..core.pagecodec import DBPS_VERSION, DBPS_VERSION_KEY

        sidecar = {
            DBPS_VERSION_KEY: DBPS_VERSION,
            "format": "parquet",
            "cell_encoding": "binary",
            "partition_by": [],
            "columns": {
                name: {
                    "key_id": key_id,
                    "original_type": self._schema[name].dataType.json(),
                    "encryptor": self._encryptor,
                }
                for name, key_id in self._columns.items()
            },
        }
        with open(os.path.join(self._dst, SIDECAR_NAME), "w") as f:
            json.dump(sidecar, f, indent=2, sort_keys=True)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.filename:
                full = os.path.join(self._dst, m.filename)
                if os.path.exists(full):
                    os.remove(full)


class ProtectedParquetStreamWriter(DataSourceStreamArrowWriter):
    """Micro-batch streaming sink: each batch's partitions write
    encrypted parquet files through the same Arrow path as the batch
    writer; the sidecar is written at the FIRST successful commit (and
    validated against on later ones), so a reader attaching mid-stream
    always sees decryptable files."""

    def __init__(
        self,
        path: str,
        schema: T.StructType,
        columns: dict[str, str],
        encryptor: str,
    ):
        self._inner = ProtectedParquetWriter(path, schema, columns, encryptor)
        self._dst = path

    def write(self, iterator) -> _Committed:
        return self._inner.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        sp = os.path.join(self._dst, SIDECAR_NAME)
        if not os.path.exists(sp):
            self._inner.commit(messages)

    def abort(self, messages, batchId: int) -> None:
        self._inner.abort(messages)


def register_dbps_datasource(spark) -> None:
    """Idempotent session registration of the ``dbps_protected`` format.

    Also enables Python-data-source filter pushdown (off by default in
    Spark 4.1) so the reader's ``pushFilters`` actually receives the
    predicates on unprotected columns."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ProtectedParquetDataSource)
