"""Protected Parquet sink/source — persist datasets with encrypted columns.

The reference splices encrypted page bytes back into Parquet files and
relies on out-of-band ``encryption_metadata`` to decrypt them later
(``encryption_sequencer.cpp:152-155``, ``dbpa_interface.h:141-149``). The
Spark-native equivalent: protected columns are written as ordinary
``binary`` Parquet columns (so any Parquet reader can still scan the
file, prune, and push down predicates on the unprotected columns), and the
decrypt-side configuration — original logical type, key id, encryptor,
engine version — travels in a JSON sidecar ``_dbps_protection.json``
next to the data, the file-level analogue of the per-column
``column_encryption_metadata`` handed to the agent's ``init``.

Writes are plain ``df.write.parquet`` — fully parallel, any partitioning
— and reads are plain scans plus the vectorized unprotect UDF, so both
paths keep Spark's whole-stage codegen and scale properties.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..core.errors import DBPSInvalidInputError
from ..core.pagecodec import DBPS_VERSION, DBPS_VERSION_KEY
from ..functions.protect import protect_column, unprotect_column

SIDECAR_NAME = "_dbps_protection.json"


def _sidecar_path(path: str) -> str:
    if path.startswith("file://"):
        path = path[len("file://"):]
    return os.path.join(path, SIDECAR_NAME)


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the JVM gateway — makes the
    sidecar work on any Spark-supported storage (hdfs://, s3a://, ...),
    not just the local filesystem."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark._jsc.hadoopConfiguration()
    return jpath.getFileSystem(conf), jpath


def _is_local(path: str) -> bool:
    scheme = path.split("://", 1)[0] if "://" in path else ""
    return scheme in ("", "file")


def _write_sidecar(spark: SparkSession | None, path: str, payload: str) -> None:
    if spark is None or _is_local(path):
        with open(_sidecar_path(path), "w") as f:
            f.write(payload)
        return
    fs, base = _hadoop_fs(spark, path)
    out = fs.create(spark._jvm.org.apache.hadoop.fs.Path(base, SIDECAR_NAME), True)
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()


def _read_sidecar(spark: SparkSession | None, path: str) -> str | None:
    """Sidecar text, or None if absent."""
    if spark is None or _is_local(path):
        sp = _sidecar_path(path)
        if not os.path.exists(sp):
            return None
        with open(sp) as f:
            return f.read()
    fs, base = _hadoop_fs(spark, path)
    jpath = spark._jvm.org.apache.hadoop.fs.Path(base, SIDECAR_NAME)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        # FSDataInputStream is a java.io.InputStream; readAllBytes (Java 9+)
        # drains it fully regardless of FS block size
        data = stream.readAllBytes()
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def build_sidecar(
    col_meta: dict,
    data_format: str = "parquet",
    cell_encoding: str = "binary",
    partition_by: list[str] | None = None,
) -> dict:
    """THE sidecar document shape — one builder shared by the batch
    writer here and the streaming writer in ``streaming/pipeline.py``
    (a drifted copy would silently produce datasets ``read_protected``
    can't open).  ``partition_by`` is always present: readers and the
    append gate key off it."""
    from ..core.pagecodec import DBPS_VERSION, DBPS_VERSION_KEY

    return {
        DBPS_VERSION_KEY: DBPS_VERSION,
        "format": data_format,
        "cell_encoding": cell_encoding,
        "partition_by": list(partition_by or []),
        "columns": col_meta,
    }


def write_protected(
    df: DataFrame,
    path: str,
    columns: dict[str, str],
    encryptor: str = "keystream_xor",
    mode: str = "error",
    partition_by: list[str] | None = None,
    data_format: str = "parquet",
) -> None:
    """Protect ``columns`` (name -> key_id) and write data + sidecar.

    ``data_format`` is ``parquet`` (ciphertext as native binary), or
    ``json``/``csv`` — text formats can't carry binary, so ciphertext
    cells travel base64-encoded, exactly like the reference's JSON
    transport (``json_request.cpp:123-144``); the sidecar records the
    encoding so reads reverse it.

    ``partition_by`` columns may not be protected (their values become
    directory names — protecting them would leak layout while breaking
    partition pruning).
    """
    if data_format not in ("parquet", "json", "csv"):
        raise DBPSInvalidInputError(f"unsupported format: {data_format!r}")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise DBPSInvalidInputError(f"columns not in DataFrame: {missing}")
    overlap = set(columns) & set(partition_by or [])
    if overlap:
        raise DBPSInvalidInputError(
            f"cannot protect partition columns: {sorted(overlap)}"
        )
    from pyspark.sql import functions as F

    base64_cells = data_format != "parquet"
    col_meta = {}
    out = df
    for name, key_id in columns.items():
        original_type = out.schema[name].dataType
        out = protect_column(out, name, key_id, encryptor)
        if base64_cells:
            out = out.withColumn(name, F.base64(F.col(name)))
        col_meta[name] = {
            "key_id": key_id,
            "original_type": original_type.json(),
            "encryptor": encryptor,
        }
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if data_format == "csv":
        writer = writer.option("header", "true")
    getattr(writer, data_format)(path)
    sidecar = build_sidecar(
        col_meta,
        data_format=data_format,
        cell_encoding="base64" if base64_cells else "binary",
        partition_by=partition_by,
    )
    _write_sidecar(
        df.sparkSession, path, json.dumps(sidecar, indent=2, sort_keys=True)
    )


def read_protection_metadata(path: str, spark: SparkSession | None = None) -> dict:
    """Load and validate the sidecar (version check mirrors the decrypt
    sequencer's ``encryption_sequencer.cpp:335-346``)."""
    text = _read_sidecar(spark, path)
    if text is None:
        raise DBPSInvalidInputError(
            f"no {SIDECAR_NAME} found at {path!r}; not a protected dataset"
        )
    meta = json.loads(text)
    version = meta.get(DBPS_VERSION_KEY)
    if version is None or not str(version).startswith(DBPS_VERSION):
        raise DBPSInvalidInputError(
            f"unsupported {DBPS_VERSION_KEY}: {version!r}"
        )
    if not isinstance(meta.get("columns"), dict):
        raise DBPSInvalidInputError("sidecar missing 'columns' map")
    return meta


def rotate_protected(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    new_keys: dict[str, str],
    new_encryptor: str | None = None,
    mode: str = "error",
) -> dict:
    """Key-rotate a protected dataset: re-encrypt the named columns under
    new key ids (optionally a new cipher) and write a new dataset with an
    updated sidecar. Returns the new sidecar dict.

    The ciphertext is read RAW (never unprotected into the plan): each
    named column goes through the single-pass rotate UDF, so plaintext
    exists only inside the executor's Arrow batches between the two
    cipher calls — the property a compliance-driven rotation needs.
    Unnamed protected columns are copied through untouched and keep
    their old keys in the new sidecar."""
    from pyspark.sql import functions as F

    from ..functions.protect import rotate_key_column

    meta = read_protection_metadata(src_path, spark)
    unknown = [c for c in new_keys if c not in meta["columns"]]
    if unknown:
        raise DBPSInvalidInputError(
            f"columns not present in protection sidecar: {unknown!r} "
            f"(sidecar has {sorted(meta['columns'])!r})"
        )
    data_format = meta.get("format", "parquet")
    base64_cells = meta.get("cell_encoding") == "base64"
    reader = spark.read
    if data_format == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    df = getattr(reader, data_format)(src_path)
    new_meta_cols = {}
    for name, cfg in meta["columns"].items():
        if name not in new_keys:
            new_meta_cols[name] = dict(cfg)
            continue
        if name not in df.columns:
            raise DBPSInvalidInputError(
                f"sidecar column {name!r} missing from dataset at {src_path!r}"
            )
        enc_new = new_encryptor or cfg["encryptor"]
        original_type = T._parse_datatype_json_string(cfg["original_type"])
        if base64_cells:
            df = df.withColumn(name, F.unbase64(F.col(name)))
        df = rotate_key_column(
            df,
            name,
            original_type,
            cfg["key_id"],
            new_keys[name],
            old_encryptor=cfg["encryptor"],
            new_encryptor=enc_new,
        )
        if base64_cells:
            df = df.withColumn(name, F.base64(F.col(name)))
        new_meta_cols[name] = {
            "key_id": new_keys[name],
            "original_type": cfg["original_type"],
            "encryptor": enc_new,
        }
    # preserve the source layout: the sidecar records partition_by at
    # write time, so the rotated copy keeps directory-partition pruning
    # (sidecars from engine versions before this field rotate flat)
    part_cols = meta.get("partition_by") or []
    writer = df.write.mode(mode)
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    if data_format == "csv":
        writer = writer.option("header", "true")
    getattr(writer, data_format)(dst_path)
    sidecar = {
        DBPS_VERSION_KEY: DBPS_VERSION,
        "format": data_format,
        "cell_encoding": "base64" if base64_cells else "binary",
        "partition_by": part_cols,
        "columns": new_meta_cols,
    }
    _write_sidecar(spark, dst_path, json.dumps(sidecar, indent=2, sort_keys=True))
    return sidecar


def verify_protected(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> dict:
    """Integrity-scan a protected dataset (fsck): every ciphertext cell
    of every (or the named) protected column is checked — type tag,
    decryptability (AES-SIV: cryptographic authentication), plaintext
    width — without any plaintext leaving the executors. Returns
    ``{column: {"n_cells": int, "n_valid": int, "n_invalid": int}}``.
    One scan, one tiny aggregate: scale-linear with zero shuffles."""
    from pyspark.sql import functions as F

    from ..functions.protect import verify_column

    meta = read_protection_metadata(path, spark)
    data_format = meta.get("format", "parquet")
    base64_cells = meta.get("cell_encoding") == "base64"
    reader = spark.read
    if data_format == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    df = getattr(reader, data_format)(path)
    if columns is None:
        targets = meta["columns"]
    else:
        unknown = [c for c in columns if c not in meta["columns"]]
        if unknown:
            raise DBPSInvalidInputError(
                f"columns not present in protection sidecar: {unknown!r} "
                f"(sidecar has {sorted(meta['columns'])!r})"
            )
        targets = {c: meta["columns"][c] for c in columns}
    aggs = []
    for name, cfg in targets.items():
        if name not in df.columns:
            raise DBPSInvalidInputError(
                f"sidecar column {name!r} missing from dataset at {path!r}"
            )
        col = df[name]
        if base64_cells:
            df = df.withColumn(name, F.unbase64(col))
        original_type = T._parse_datatype_json_string(cfg["original_type"])
        df = verify_column(
            df, name, original_type, cfg["key_id"], cfg["encryptor"]
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{name}__n"),
            F.sum(F.col(f"{name}__ok").cast("long")).alias(f"{name}__valid"),
        ]
    row = df.agg(*aggs).first()
    report = {}
    for name in targets:
        n = row[f"{name}__n"] or 0
        valid = row[f"{name}__valid"] or 0
        report[name] = {
            "n_cells": n,
            "n_valid": valid,
            "n_invalid": n - valid,
        }
    return report


def read_protected(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    keep_protected: list[str] | None = None,
) -> DataFrame:
    """Read a protected dataset, unprotecting its columns.

    ``columns`` restricts which protected columns to unprotect (default
    all); ``keep_protected`` names columns to leave as ciphertext (e.g.
    when the reader's role may not see them — they stay opaque binary).
    """
    from pyspark.sql import functions as F

    meta = read_protection_metadata(path, spark)
    data_format = meta.get("format", "parquet")
    base64_cells = meta.get("cell_encoding") == "base64"
    reader = spark.read
    if data_format == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    df = getattr(reader, data_format)(path)
    keep = set(keep_protected or [])
    if columns is None:
        targets = meta["columns"]
    else:
        unknown = [c for c in columns if c not in meta["columns"]]
        if unknown:
            raise DBPSInvalidInputError(
                f"columns not present in protection sidecar: {unknown!r} "
                f"(sidecar has {sorted(meta['columns'])!r})"
            )
        targets = {c: meta["columns"][c] for c in columns}
    for name, cfg in targets.items():
        if name in keep:
            continue
        if name not in df.columns:
            raise DBPSInvalidInputError(
                f"sidecar column {name!r} missing from dataset at {path!r}"
            )
        if base64_cells:
            df = df.withColumn(name, F.unbase64(F.col(name)))
        original_type = T._parse_datatype_json_string(cfg["original_type"])
        df = unprotect_column(
            df, name, original_type, cfg["key_id"], cfg["encryptor"]
        )
    return df
