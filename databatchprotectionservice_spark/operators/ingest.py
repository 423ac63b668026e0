"""Container-ingest operators: WARC, tar/WebDataset, ZIP — the walk
stage of a web-scale corpus pipeline, run DISTRIBUTED.

Reference scope: the reference service ingests opaque page payloads
(``src/data_batch_protection_service.cpp`` request handling); a
training-data pipeline in front of it must first WALK the container
formats the crawl/shard world actually uses.  These operators wire the
from-scratch container codecs (``core/warccodec.py``,
``core/tarcodec.py``, ``core/zipcodec.py``) plus the web-text layers
(``core/htmlcodec.py``, ``core/urlcodec.py``) into Arrow-batched Spark
stages:

* ``ingest_warc_chain`` — the Common Crawl shape: per-record-gzip WARC
  -> record walk -> RFC 9112 HTTP split (chunked decoding) -> HTML
  tokenize (title/text/links) -> RFC 3986 URL canonicalization, all
  inside one ``mapInPandas`` over spread documents.
* ``ingest_webdataset_tar`` — the multimodal-shard shape: documents
  grouped into ``.tar.gz`` shards (``applyInPandas`` on the shard key
  = the shard-builder shuffle), ustar-walked back, WebDataset
  key-to-first-dot sample grouping verified per shard.
* ``ingest_zip_members`` — stored+deflate ZIP roundtrip per document
  with central-directory cross-validation and CRC checks.

Every byte that reaches the output is independently recomputable: the
fixture containers derive from ``documents`` columns in closed form,
executors ASSERT the full roundtrip (decoded body == re-escaped
source text, WebDataset sample fields byte-equal, deflate twin
CRC-equal to the stored twin), and the DuckDB oracles restate the
surviving aggregates arithmetically — so a framing bug anywhere in
the container/codec chain breaks the gate, not just a unit test.

100 TB shape: WARC and ZIP walks are narrow (no shuffle before the
final tiny per-source aggregate); the tar shard builder is ONE
shuffle on the shard key — exactly the repartition a real shard
writer pays.  All byte work happens in Arrow-batched Python with the
payload never crossing the JVM boundary row-at-a-time.

Staged for r10 registration (r9 budget holds at three); oracles live
beside each query as ``*_ORACLE`` constants and the unit suite runs
Spark-vs-DuckDB parity on a crafted corpus AND sf0.001, the same
losslessness harness as ``dedup_jaccard_prefix``.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..plans.registry import load_spread, local_frame, prep, register, table_path

#: shards per applyInPandas call for the shard-walker queries (r16).
#: One pandas call per SHARD_DOCS-doc shard paid ~15 ms of Arrow/group
#: scaffold for a handful of rows (1568 (source, shard) groups at
#: sf0.1 — ~20 s of CPU for well under 1 s of codec work; the
#: WRITE_SHARD_DOCS comment measured the same effect).  Banding runs
#: each per-shard function unchanged over SHARD_BAND shards per call:
#: group count stays proportional to data, per-call memory is bounded
#: by SHARD_BAND x SHARD_DOCS docs, and the emitted rows are IDENTICAL
#: to per-shard grouping.
SHARD_BAND = 64


def _banded_shards(spark, d, shard_fn, schema):
    """``d.groupBy("source", "shard_id").applyInPandas(shard_fn,
    schema)`` with the per-group scaffold amortized over SHARD_BAND
    shards per call (see SHARD_BAND).  ``d`` must carry ``source`` and
    ``shard_id``; ``shard_fn`` receives exactly the per-shard frame it
    received before (minus nothing — the band column is dropped) and
    its outputs are concatenated.  The explicit exchange width is kept:
    per-shard Python codec work dominates at gate scale, and AQE's
    size-based coalescing would fold this tiny shuffle onto one task
    (SCALE.md: 'AQE coalescing vs Python-heavy applyInPandas')."""
    dd = d.withColumn(
        "_band", F.expr(f"shard_id div {SHARD_BAND}")
    ).repartition(
        spark.sparkContext.defaultParallelism, "source", "_band"
    )

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = [
            shard_fn(g.drop(columns="_band"))
            for _, g in pdf.groupby("shard_id", sort=True)
        ]
        return pd.concat(outs, ignore_index=True)

    return dd.groupBy("source", "_band").applyInPandas(_run, schema)


# ---------------------------------------------------------------------------
# WARC -> HTTP -> HTML -> URL chain
# ---------------------------------------------------------------------------

#: closed-form page-byte arithmetic, kept in ONE place so the executor
#: assert and the DuckDB oracle cannot drift: the fixture page is
#:   <html><head><title>doc {id}</title></head><body><p>{esc(text)}</p>
#:   {links}</body></html>
#: skeleton = 61 ASCII bytes, title = 4 + digits(id), escaping adds
#: +4/+3/+3/+5 bytes per & < > " (escape_html leaves ' alone), each of
#: the ``id % 5`` links is 59 + digits(id) bytes (href =
#: "HTTP://EXAMPLE.com:80/a/./b/../p%7e?d={id}&i={i}", one-digit i).
_PAGE_SKELETON = 61
_LINK_FIXED = 59

WARC_CHAIN_ORACLE = """
        WITH per AS (
            SELECT source,
                   doc_id % 5 AS n_links,
                   CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS chunked,
                   CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS gzipped,
                   61
                   + 4 + length(CAST(doc_id AS VARCHAR))
                   + octet_length(encode(coalesce(text, '')))
                   + 4 * (length(coalesce(text, ''))
                          - length(replace(coalesce(text, ''), '&', '')))
                   + 3 * (length(coalesce(text, ''))
                          - length(replace(coalesce(text, ''), '<', '')))
                   + 3 * (length(coalesce(text, ''))
                          - length(replace(coalesce(text, ''), '>', '')))
                   + 5 * (length(coalesce(text, ''))
                          - length(replace(coalesce(text, ''), '"', '')))
                   + (doc_id % 5)
                     * (59 + length(CAST(doc_id AS VARCHAR)))
                       AS body_bytes
            FROM documents
        )
        SELECT source,
               count(*) AS n_pages,
               CAST(sum(body_bytes) AS BIGINT) AS sum_body_bytes,
               CAST(sum(n_links) AS BIGINT) AS sum_links,
               CAST(sum(chunked) AS BIGINT) AS n_chunked,
               CAST(sum(gzipped) AS BIGINT) AS n_gzipped
        FROM per GROUP BY source ORDER BY source
"""

_WARC_ROW_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("body_bytes", T.LongType()),
        T.StructField("n_links", T.LongType()),
        T.StructField("chunked", T.LongType()),
        T.StructField("gzipped", T.LongType()),
    ]
)


@register("ingest_warc_chain", oracle=WARC_CHAIN_ORACLE)
def ingest_warc_chain(spark, sf_dir) -> DataFrame:
    """Common Crawl ingest, end to end and byte-asserted.

    Per document: build the fixture HTML page, frame it as an HTTP/1.1
    response (chunked transfer-encoding for every third doc), wrap
    request+response in a WARC 1.1 stream (per-record gzip members for
    every second doc — the Common Crawl layout), then run the REAL
    ingest direction: gzip-member split -> record walk -> HTTP split
    (chunk reassembly) -> title/link extraction -> URL normalization
    -> entity-decode of the paragraph back to the EXACT source text.
    Executors assert every step; the oracle restates the closed-form
    page arithmetic (see ``WARC_CHAIN_ORACLE``).

    100 TB: one narrow mapInPandas stage (the walk parallelizes per
    input split, nothing shuffles until the per-source aggregate).
    """
    from ..core.htmlcodec import (
        decode_entities,
        escape_html,
        extract_links,
        extract_title,
    )
    from ..core.urlcodec import normalize_url
    from ..core.warccodec import (
        encode_warc,
        http_response_block,
        parse_warc,
    )

    prep(spark)
    d = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    def _chain(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, bbytes, nlk, chk, gz = [], [], [], [], []
            for doc_id, src, txt in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                doc_id = int(doc_id)
                txt = txt or ""
                n_links = doc_id % 5
                chunked = doc_id % 3 == 0
                gzipped = doc_id % 2 == 0
                hrefs = [
                    f"HTTP://EXAMPLE.com:80/a/./b/../p%7e?d={doc_id}&i={i}"
                    for i in range(n_links)
                ]
                html = (
                    f"<html><head><title>doc {doc_id}</title></head>"
                    "<body><p>" + escape_html(txt) + "</p>"
                    + "".join(
                        f'<a href="{h}">L{i}</a>'
                        for i, h in enumerate(hrefs)
                    )
                    + "</body></html>"
                )
                body = html.encode("utf-8")
                dd = len(str(doc_id))
                esc = (
                    len(txt.encode("utf-8"))
                    + 4 * txt.count("&")
                    + 3 * txt.count("<")
                    + 3 * txt.count(">")
                    + 5 * txt.count('"')
                )
                want = (
                    _PAGE_SKELETON
                    + 4
                    + dd
                    + esc
                    + n_links * (_LINK_FIXED + dd)
                )
                if len(body) != want:
                    raise ValueError(
                        f"page arithmetic drifted: {len(body)} != {want}"
                    )
                warc = encode_warc(
                    [
                        {
                            "type": "request",
                            "block": (
                                b"GET /d/%d HTTP/1.1\r\n"
                                b"Host: example.com\r\n\r\n" % doc_id
                            ),
                            "content_type": (
                                "application/http; msgtype=request"
                            ),
                            "target_uri": f"http://example.com/d/{doc_id}",
                        },
                        {
                            "type": "response",
                            "block": http_response_block(
                                body, chunked=chunked
                            ),
                            "content_type": (
                                "application/http; msgtype=response"
                            ),
                            "target_uri": f"http://example.com/d/{doc_id}",
                        },
                    ],
                    gzip_per_record=gzipped,
                )

                # --- the real ingest direction ------------------------
                info = parse_warc(warc)
                if info["n_records"] != 2 or info["by_type"] != {
                    "request": 1,
                    "response": 1,
                }:
                    raise ValueError("WARC record walk lost a record")
                resp = next(
                    r for r in info["records"] if r["type"] == "response"
                )
                http = resp["http"]
                if http["status"] != 200 or http["body"] != body:
                    raise ValueError(
                        "HTTP split did not reassemble the page"
                    )
                page = http["body"].decode("utf-8")
                if extract_title(page) != f"doc {doc_id}":
                    raise ValueError("title extraction drifted")
                links = extract_links(page)
                if len(links) != n_links:
                    raise ValueError("link extraction drifted")
                for i, (href, _label) in enumerate(links):
                    want_url = (
                        f"http://example.com/a/p~?d={doc_id}&i={i}"
                    )
                    if normalize_url(href) != want_url:
                        raise ValueError(
                            f"URL canonicalization drifted: "
                            f"{normalize_url(href)!r}"
                        )
                # paragraph content entity-decodes back to the EXACT
                # source text (escape -> tokenize -> decode roundtrip)
                seg = page.split("<p>", 1)[1].split("</p>", 1)[0]
                if decode_entities(seg) != txt:
                    raise ValueError("entity roundtrip lost bytes")

                srcs.append(src)
                bbytes.append(len(body))
                nlk.append(n_links)
                chk.append(1 if chunked else 0)
                gz.append(1 if gzipped else 0)
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "body_bytes": pd.Series(bbytes, dtype="int64"),
                    "n_links": pd.Series(nlk, dtype="int64"),
                    "chunked": pd.Series(chk, dtype="int64"),
                    "gzipped": pd.Series(gz, dtype="int64"),
                }
            )

    per = d.mapInPandas(_chain, _WARC_ROW_SCHEMA)
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("body_bytes").cast("bigint").alias("sum_body_bytes"),
            F.sum("n_links").cast("bigint").alias("sum_links"),
            F.sum("chunked").cast("bigint").alias("n_chunked"),
            F.sum("gzipped").cast("bigint").alias("n_gzipped"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# tar / WebDataset shard builder + walk
# ---------------------------------------------------------------------------

#: docs per fixture shard (the shard-builder group key).  64, not a
#: handful: applyInPandas costs ~15 ms of Arrow/group scaffold PER
#: GROUP, so at sf0.1 an 8-doc sharding made 625 near-empty groups
#: (~10 s of pure overhead per shard-walk query for well under 1 s of
#: codec work).  64 keeps every property the walks test — multiple
#: shards at every SF, the mod-2/mod-3 codec rotations all exercised
#: from sf0.01 up — while the group count stays proportional-to-data
#: with a sane constant, the real shard-file shape.
SHARD_DOCS = 64

#: per-doc members are ``{doc_id:08d}.txt`` (the text bytes) and
#: ``{doc_id:08d}.cls`` (the source label); ustar blocks are closed
#: form: 1 header + ceil(size/512) data blocks per member, + 2
#: terminator blocks per shard.
WEBDATASET_TAR_ORACLE = f"""
        WITH per AS (
            SELECT source,
                   doc_id // {SHARD_DOCS} AS shard_id,
                   octet_length(encode(coalesce(text, ''))) AS tb,
                   octet_length(encode(coalesce(source, ''))) AS cb
            FROM documents
        ),
        sh AS (
            SELECT source, shard_id,
                   count(*) AS n_samples,
                   CAST(sum(tb) AS BIGINT) AS txt_bytes,
                   CAST(sum(1 + (tb + 511) // 512
                            + 1 + (cb + 511) // 512) + 2 AS BIGINT)
                       AS tar_blocks
            FROM per GROUP BY 1, 2
        )
        SELECT source,
               count(*) AS n_shards,
               CAST(sum(n_samples) AS BIGINT) AS n_samples,
               CAST(sum(txt_bytes) AS BIGINT) AS sum_txt_bytes,
               CAST(sum(tar_blocks) AS BIGINT) AS sum_tar_blocks,
               CAST(max(n_samples) AS BIGINT) AS max_shard_samples
        FROM sh GROUP BY source ORDER BY source
"""

_SHARD_ROW_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("txt_bytes", T.LongType()),
        T.StructField("tar_blocks", T.LongType()),
    ]
)


@register("ingest_webdataset_tar", oracle=WEBDATASET_TAR_ORACLE)
def ingest_webdataset_tar(spark, sf_dir) -> DataFrame:
    """The multimodal shard pipeline: group -> tar.gz -> walk -> group.

    Documents shuffle ONCE onto their shard key (``applyInPandas`` on
    ``(source, doc_id // {SHARD_DOCS})`` — the exact repartition a real
    shard writer pays), each group is encoded as a ``.tar.gz`` of
    ``{{id}}.txt`` + ``{{id}}.cls`` members, then the REAL ingest
    direction runs: gzip inflate, checksum-validated ustar walk,
    WebDataset first-dot sample grouping — and every sample's fields
    are asserted byte-equal to the source columns.  Block counts are
    asserted against the closed form the oracle restates.

    100 TB: the one shuffle is the shard key; everything after is
    per-group Python over Arrow batches, then a tiny per-source
    aggregate.  A real deployment writes ``tar`` bytes to object
    storage where this fixture re-parses them — the walk direction is
    exactly what a WebDataset *loader* runs per shard.
    """
    from ..core.tarcodec import encode_tar, parse_tar, webdataset_groups

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .withColumn(
            "shard_id", F.expr(f"doc_id div {SHARD_DOCS}")
        )
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        members = []
        txt_total = 0
        want_blocks = 2  # terminator
        for doc_id, src, txt in zip(
            pdf["doc_id"], pdf["source"], pdf["text"]
        ):
            tb = (txt or "").encode("utf-8")
            cb = (src or "").encode("utf-8")
            members.append((f"{int(doc_id):08d}.txt", tb))
            members.append((f"{int(doc_id):08d}.cls", cb))
            txt_total += len(tb)
            want_blocks += 1 + (len(tb) + 511) // 512
            want_blocks += 1 + (len(cb) + 511) // 512
        tar = encode_tar(members)
        if len(tar) != 512 * want_blocks:
            raise ValueError(
                f"tar block arithmetic drifted: {len(tar)} != "
                f"{512 * want_blocks}"
            )
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        gz = co.compress(tar) + co.flush()

        # --- the real ingest direction: what a WebDataset loader runs
        raw = zlib.decompressobj(31).decompress(gz)
        groups = webdataset_groups(parse_tar(raw))
        if len(groups) != len(pdf):
            raise ValueError("WebDataset grouping lost a sample")
        for doc_id, src, txt in zip(
            pdf["doc_id"], pdf["source"], pdf["text"]
        ):
            sample = groups[f"{int(doc_id):08d}"]
            if set(sample) != {"txt", "cls"}:
                raise ValueError(f"sample fields drifted: {set(sample)}")
            if sample["txt"] != (txt or "").encode("utf-8"):
                raise ValueError("txt field lost bytes")
            if sample["cls"] != (src or "").encode("utf-8"):
                raise ValueError("cls field lost bytes")
        return pd.DataFrame(
            {
                "source": pd.Series(
                    [pdf["source"].iloc[0]], dtype="object"
                ),
                "n_samples": pd.Series([len(pdf)], dtype="int64"),
                "txt_bytes": pd.Series([txt_total], dtype="int64"),
                "tar_blocks": pd.Series([want_blocks], dtype="int64"),
            }
        )

    shards = _banded_shards(spark, d, _shard, _SHARD_ROW_SCHEMA)
    return (
        shards.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum("n_samples").cast("bigint").alias("n_samples"),
            F.sum("txt_bytes").cast("bigint").alias("sum_txt_bytes"),
            F.sum("tar_blocks").cast("bigint").alias("sum_tar_blocks"),
            F.max("n_samples").cast("bigint").alias("max_shard_samples"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Avro Object Container File shards
# ---------------------------------------------------------------------------

#: shard codec rotates null/deflate/snappy by ``shard_id % 3`` — all
#: three block codecs exercised per run; NULL text rides the
#: ["null","string"] union branch end to end.
AVRO_BLOCKS_ORACLE = f"""
        WITH per AS (
            SELECT source,
                   doc_id // {SHARD_DOCS} AS shard_id,
                   doc_id,
                   octet_length(encode(coalesce(text, ''))) AS tb,
                   CASE WHEN text IS NULL THEN 1 ELSE 0 END AS nn
            FROM documents
        ),
        sh AS (
            SELECT source, shard_id, shard_id % 3 AS codec_ix,
                   count(*) AS n_records,
                   CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
                   CAST(sum(tb) AS BIGINT) AS txt_bytes,
                   CAST(sum(nn) AS BIGINT) AS n_null_text
            FROM per GROUP BY 1, 2, 3
        )
        SELECT source,
               count(*) AS n_shards,
               CAST(sum(n_records) AS BIGINT) AS n_records,
               CAST(sum(sum_doc_id) AS BIGINT) AS sum_doc_id,
               CAST(sum(txt_bytes) AS BIGINT) AS sum_txt_bytes,
               CAST(sum(n_null_text) AS BIGINT) AS n_null_text,
               CAST(sum(CASE WHEN codec_ix = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_codec_null,
               CAST(sum(CASE WHEN codec_ix = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_codec_deflate,
               CAST(sum(CASE WHEN codec_ix = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_codec_snappy
        FROM sh GROUP BY source ORDER BY source
"""

_AVRO_ROW_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("sum_doc_id", T.LongType()),
        T.StructField("txt_bytes", T.LongType()),
        T.StructField("n_null_text", T.LongType()),
        T.StructField("codec_ix", T.LongType()),
    ]
)

_AVRO_WRITER_SCHEMA = {
    "type": "record",
    "name": "document",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "lang", "type": "string"},
    ],
}

AVRO_BLOCK_RECORDS = 4  # small blocks -> multi-block shards in fixture


@register("ingest_avro_blocks", oracle=AVRO_BLOCKS_ORACLE)
def ingest_avro_blocks(spark, sf_dir) -> DataFrame:
    """Avro OCF shard build + walk across all three block codecs.

    The splittable-row-container shape: each shard group is written as
    a spec-compliant Object Container File (writer schema in the
    header metadata, deterministic 16-byte sync marker derived from
    the shard key, {AVRO_BLOCK_RECORDS}-record blocks so every shard
    is multi-block) with the codec rotating null/deflate/snappy by
    shard, then the loader direction walks it back: sync markers
    verified per block, blocks decoded to exactly their object count,
    snappy blocks CRC-checked — and the decoded rows must equal the
    inputs field-for-field, None text riding the null-union branch.

    100 TB: OCF's per-block sync marker is what makes this format
    splittable — a real cluster assigns block ranges to tasks; here
    the shard is the split.  One shuffle on the shard key, Arrow
    -batched byte work, tiny final aggregate.
    """
    import hashlib

    from ..core.avrocodec import encode_avro_ocf, parse_avro_ocf

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "documents")
        .select("doc_id", "source", "text", "lang")
        .withColumn("shard_id", F.expr(f"doc_id div {SHARD_DOCS}"))
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard_id = int(pdf["shard_id"].iloc[0])
        source = pdf["source"].iloc[0]
        codec = ("null", "deflate", "snappy")[shard_id % 3]
        rows = [
            {
                "doc_id": int(i),
                "text": None if t is None else str(t),
                "lang": str(lg) if lg is not None else "",
            }
            for i, t, lg in zip(pdf["doc_id"], pdf["text"], pdf["lang"])
        ]
        sync = hashlib.sha256(
            f"{source}/{shard_id}".encode()
        ).digest()[:16]
        wire = encode_avro_ocf(
            rows,
            _AVRO_WRITER_SCHEMA,
            codec=codec,
            sync=sync,
            block_records=AVRO_BLOCK_RECORDS,
        )
        info = parse_avro_ocf(wire)
        if info["records"] != rows or info["codec"] != codec:
            raise ValueError("Avro walk lost rows or the codec tag")
        want_blocks = -(-len(rows) // AVRO_BLOCK_RECORDS)
        if info["n_blocks"] != want_blocks:
            raise ValueError(
                f"block count drifted: {info['n_blocks']} != {want_blocks}"
            )
        return pd.DataFrame(
            {
                "source": pd.Series([source], dtype="object"),
                "n_records": pd.Series([len(rows)], dtype="int64"),
                "sum_doc_id": pd.Series(
                    [sum(r["doc_id"] for r in rows)], dtype="int64"
                ),
                "txt_bytes": pd.Series(
                    [
                        sum(
                            len((r["text"] or "").encode("utf-8"))
                            for r in rows
                        )
                    ],
                    dtype="int64",
                ),
                "n_null_text": pd.Series(
                    [sum(1 for r in rows if r["text"] is None)],
                    dtype="int64",
                ),
                "codec_ix": pd.Series([shard_id % 3], dtype="int64"),
            }
        )

    shards = _banded_shards(spark, d, _shard, _AVRO_ROW_SCHEMA)
    return (
        shards.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum("n_records").cast("bigint").alias("n_records"),
            F.sum("sum_doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum("txt_bytes").cast("bigint").alias("sum_txt_bytes"),
            F.sum("n_null_text").cast("bigint").alias("n_null_text"),
            F.sum(F.when(F.col("codec_ix") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_codec_null"),
            F.sum(F.when(F.col("codec_ix") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_codec_deflate"),
            F.sum(F.when(F.col("codec_ix") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_codec_snappy"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# TFRecord training shards
# ---------------------------------------------------------------------------

#: one record per document (the text bytes); framing overhead is a
#: fixed 16 bytes per record (8 length + two 4-byte masked CRC-32Cs),
#: so file bytes are closed form: sum(payload) + 16 * n_records.
TFRECORD_SHARDS_ORACLE = f"""
        WITH per AS (
            SELECT source,
                   doc_id // {SHARD_DOCS} AS shard_id,
                   octet_length(encode(coalesce(text, ''))) AS tb
            FROM documents
        ),
        sh AS (
            SELECT source, shard_id,
                   count(*) AS n_records,
                   CAST(sum(tb) AS BIGINT) AS payload_bytes,
                   CAST(sum(tb + 16) AS BIGINT) AS file_bytes
            FROM per GROUP BY 1, 2
        )
        SELECT source,
               count(*) AS n_shards,
               CAST(sum(n_records) AS BIGINT) AS n_records,
               CAST(sum(payload_bytes) AS BIGINT) AS sum_payload_bytes,
               CAST(sum(file_bytes) AS BIGINT) AS sum_file_bytes,
               CAST(max(n_records) AS BIGINT) AS max_shard_records
        FROM sh GROUP BY source ORDER BY source
"""

_TFRECORD_ROW_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("file_bytes", T.LongType()),
    ]
)


@register("ingest_tfrecord_shards", oracle=TFRECORD_SHARDS_ORACLE)
def ingest_tfrecord_shards(spark, sf_dir) -> DataFrame:
    """TFRecord shard build + walk, CRC-verified both ways.

    The TF training-shard shape: documents shuffle once onto the shard
    key, each group is framed as a TFRecord stream (one record per
    document, both masked CRC-32Cs computed per record), then the REAL
    loader direction walks the stream back — every record's length CRC
    and data CRC must verify, and the payloads must be byte-equal to
    the source texts in doc_id order (record ORDER is part of the
    assert: shards feed sequential trainers).  File bytes are asserted
    against the 16-bytes-per-record closed form the oracle restates.

    100 TB: identical plan to ``ingest_webdataset_tar`` — one shuffle
    on the shard key, Arrow-batched Python byte work, tiny per-source
    aggregate.
    """
    from ..core.tfrecordcodec import encode_tfrecord, parse_tfrecord

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .withColumn("shard_id", F.expr(f"doc_id div {SHARD_DOCS}"))
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        payloads = [(t or "").encode("utf-8") for t in pdf["text"]]
        wire = encode_tfrecord(payloads)
        want = sum(len(p) for p in payloads) + 16 * len(payloads)
        if len(wire) != want:
            raise ValueError(
                f"tfrecord framing arithmetic drifted: "
                f"{len(wire)} != {want}"
            )
        if parse_tfrecord(wire) != payloads:  # CRC walk, order included
            raise ValueError("TFRecord walk lost or reordered a record")
        return pd.DataFrame(
            {
                "source": pd.Series(
                    [pdf["source"].iloc[0]], dtype="object"
                ),
                "n_records": pd.Series([len(payloads)], dtype="int64"),
                "payload_bytes": pd.Series(
                    [sum(len(p) for p in payloads)], dtype="int64"
                ),
                "file_bytes": pd.Series([len(wire)], dtype="int64"),
            }
        )

    shards = _banded_shards(spark, d, _shard, _TFRECORD_ROW_SCHEMA)
    return (
        shards.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum("n_records").cast("bigint").alias("n_records"),
            F.sum("payload_bytes")
            .cast("bigint")
            .alias("sum_payload_bytes"),
            F.sum("file_bytes").cast("bigint").alias("sum_file_bytes"),
            F.max("n_records").cast("bigint").alias("max_shard_records"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# ZIP stored+deflate roundtrip
# ---------------------------------------------------------------------------

#: stored-archive bytes are closed form: 22 (EOCD) + per member
#: (30 + name + size) local + (46 + name) central; members are
#: ``doc.txt`` (7) with the text bytes and ``meta.json`` (9) with
#: ``{{"doc_id":N,"lang":"L"}}`` = 21 + digits(N) + bytes(L).
ZIP_MEMBERS_ORACLE = """
        WITH per AS (
            SELECT source,
                   octet_length(encode(coalesce(text, ''))) AS tb,
                   21 + length(CAST(doc_id AS VARCHAR))
                      + octet_length(encode(coalesce(lang, ''))) AS jb
            FROM documents
        )
        SELECT source,
               count(*) AS n_archives,
               CAST(sum(206 + tb + jb) AS BIGINT) AS sum_zip_bytes,
               CAST(sum(tb + jb) AS BIGINT) AS sum_payload_bytes,
               CAST(max(206 + tb + jb) AS BIGINT) AS max_zip_bytes
        FROM per GROUP BY source ORDER BY source
"""

_ZIP_ROW_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("zip_bytes", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
    ]
)


@register("ingest_zip_members", oracle=ZIP_MEMBERS_ORACLE)
def ingest_zip_members(spark, sf_dir) -> DataFrame:
    """ZIP walk with both compression methods cross-validated.

    Per document, a two-member archive (``doc.txt`` = the text bytes,
    ``meta.json`` = a closed-form sidecar) is built TWICE — stored and
    deflated — and both are walked back through the central-directory
    parser.  Executors assert: stored archive length equals the exact
    container arithmetic (headers are fixed-width, so stored size is
    closed form), both walks agree on names/bytes/CRC-32 member for
    member, and the deflated walk reports method 8 (proving inflate
    actually ran).  The oracle restates the stored arithmetic.

    100 TB: narrow mapInPandas, no shuffle before the per-source
    aggregate; the deflate twin doubles the CPU per row, which is the
    honest cost of a compression-verified ingest.
    """
    from ..core.zipcodec import encode_zip, parse_zip

    prep(spark)
    d = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", "lang"
    )

    def _zip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, zb, pb = [], [], []
            for doc_id, src, txt, lang in zip(
                pdf["doc_id"], pdf["source"], pdf["text"], pdf["lang"]
            ):
                doc_id = int(doc_id)
                tb = (txt or "").encode("utf-8")
                jb = (
                    '{"doc_id":%d,"lang":"%s"}' % (doc_id, lang or "")
                ).encode("utf-8")
                members = [("doc.txt", tb), ("meta.json", jb)]
                stored = encode_zip(members, deflate=False)
                flated = encode_zip(members, deflate=True)
                want = 206 + len(tb) + len(jb)
                if len(stored) != want:
                    raise ValueError(
                        f"zip arithmetic drifted: {len(stored)} != {want}"
                    )
                a = parse_zip(stored)
                b = parse_zip(flated)
                if [(e["name"], e["data"], e["crc32"]) for e in a] != [
                    (e["name"], e["data"], e["crc32"]) for e in b
                ]:
                    raise ValueError("stored/deflate twins disagree")
                if [e["data"] for e in a] != [tb, jb]:
                    raise ValueError("ZIP walk lost member bytes")
                if any(e["method"] != 8 for e in b) or any(
                    e["method"] != 0 for e in a
                ):
                    raise ValueError("compression method drifted")
                srcs.append(src)
                zb.append(len(stored))
                pb.append(len(tb) + len(jb))
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "zip_bytes": pd.Series(zb, dtype="int64"),
                    "payload_bytes": pd.Series(pb, dtype="int64"),
                }
            )

    per = d.mapInPandas(_zip, _ZIP_ROW_SCHEMA)
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_archives"),
            F.sum("zip_bytes").cast("bigint").alias("sum_zip_bytes"),
            F.sum("payload_bytes")
            .cast("bigint")
            .alias("sum_payload_bytes"),
            F.max("zip_bytes").cast("bigint").alias("max_zip_bytes"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# parquet footer / page-header audit — the scan-planning layer
# ---------------------------------------------------------------------------

#: the audit covers every fixture table; the oracle restates the ONE
#: footer fact the data itself can restate — num_rows — per table.
#: Row-group/page structure is the writer's choice, so those facts are
#: cross-checked in-executor against pyarrow (the independent reader)
#: instead.
AUDIT_TABLES = (
    "customer",
    "documents",
    "embeddings",
    "events",
    "lineitem",
    "nation",
    "orders",
    "part",
    "region",
    "supplier",
)

PARQUET_FOOTER_ORACLE = "\n        UNION ALL ".join(
    f"SELECT '{t}' AS tbl, CAST(count(*) AS BIGINT) AS num_rows FROM {t}"
    for t in AUDIT_TABLES
) + "\n        ORDER BY tbl"

_FOOTER_ROW_SCHEMA = T.StructType(
    [
        T.StructField("tbl", T.StringType()),
        T.StructField("num_rows", T.LongType()),
    ]
)


@register("parquet_footer_audit", oracle=PARQUET_FOOTER_ORACLE)
def parquet_footer_audit(spark, sf_dir) -> DataFrame:
    """Walk every fixture table's REAL parquet internals and prove them.

    The scan-planning layer at 100 TB reads footers and page headers,
    never data: row-group pruning, column-chunk range assignment, and
    dictionary detection all hang off these bytes.  This audit runs
    the from-scratch walk (`core/thriftcodec.py` compact protocol +
    `core/parquetmeta.py` typed views) over the actual testdata files
    via the ``binaryFile`` source and proves THREE independent
    agreements per file, in the executor:

    * our footer vs pyarrow's metadata object — num_rows, row-group
      count, and per-chunk path/codec/num_values/data_page_offset;
    * our page walk vs the footer's own accounting — every column
      chunk's page headers must land exactly on
      ``total_compressed_size`` and sum to ``num_values``
      (``walk_pages`` raises otherwise);
    * our footer vs the DATA — the returned num_rows must match the
      oracle's ``count(*)`` over the same table.

    The fixture reads whole files (binaryFile has no ranged read); a
    real deployment feeds ``parse_footer`` the tail range and
    ``walk_pages`` the chunk ranges from object-store ranged GETs —
    both entry points take plain bytes precisely so that works.
    """
    import io

    import pyarrow.parquet as pq_  # independent reader, executor-side

    from ..core.parquetmeta import parse_footer, walk_pages

    prep(spark)
    paths = [table_path(sf_dir, t) for t in AUDIT_TABLES]
    files = spark.read.format("binaryFile").load(paths).select(
        "path", "content"
    )

    def _audit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tbls, rows = [], []
            for path, blob in zip(pdf["path"], pdf["content"]):
                tbl = path.rsplit("/", 1)[-1].removesuffix(".parquet")
                data = bytes(blob)
                got = parse_footer(data)
                want = pq_.ParquetFile(io.BytesIO(data)).metadata
                if got["num_rows"] != want.num_rows:
                    raise ValueError(
                        f"{tbl}: footer num_rows {got['num_rows']} != "
                        f"pyarrow {want.num_rows}"
                    )
                if len(got["row_groups"]) != want.num_row_groups:
                    raise ValueError(f"{tbl}: row-group count drifted")
                if sum(
                    rg["num_rows"] for rg in got["row_groups"]
                ) != got["num_rows"]:
                    raise ValueError(f"{tbl}: row-group rows don't sum")
                for gi, rg in enumerate(got["row_groups"]):
                    wrg = want.row_group(gi)
                    for ci, col in enumerate(rg["columns"]):
                        wc = wrg.column(ci)
                        if (
                            col["path_in_schema"] != wc.path_in_schema
                            or col["codec"] != wc.compression
                            or col["num_values"] != wc.num_values
                            or col["data_page_offset"]
                            != wc.data_page_offset
                        ):
                            raise ValueError(
                                f"{tbl}: chunk {gi}/{ci} disagrees "
                                "with pyarrow"
                            )
                        walk_pages(data, col)  # self-asserting
                tbls.append(tbl)
                rows.append(got["num_rows"])
            yield pd.DataFrame(
                {
                    "tbl": pd.Series(tbls, dtype="object"),
                    "num_rows": pd.Series(rows, dtype="int64"),
                }
            )

    return (
        files.mapInPandas(_audit, _FOOTER_ROW_SCHEMA)
        .orderBy("tbl")
    )

# ---------------------------------------------------------------------------
# TFRecord shards carrying tf.train.Example protos
# ---------------------------------------------------------------------------

#: the schema-bearing twin of ``ingest_tfrecord_shards``: payloads are
#: real tf.train.Example protos (miniproto-backed), so the oracle
#: facts are recovered from DECODED FEATURES, not from framing
#: arithmetic — a wire bug in either layer (record CRCs or proto
#: nesting) surfaces as a value mismatch.
TFEXAMPLE_SHARDS_ORACLE = """
        SELECT source,
               count(*) AS n_records,
               CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
               CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS sum_n_chars,
               CAST(sum(octet_length(encode(coalesce(text, ''))))
                    AS BIGINT) AS sum_text_bytes
        FROM documents GROUP BY source ORDER BY source
"""

_TFEXAMPLE_ROW_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("sum_doc_id", T.LongType()),
        T.StructField("sum_n_chars", T.LongType()),
        T.StructField("sum_text_bytes", T.LongType()),
    ]
)


@register("ingest_tfexample_shards", oracle=TFEXAMPLE_SHARDS_ORACLE)
def ingest_tfexample_shards(spark, sf_dir) -> DataFrame:
    """The full TF training-shard stack: Example protos in TFRecord.

    Per shard group, each document becomes a tf.train.Example (
    ``text`` bytes_list, ``doc_id`` + ``n_chars`` int64_list, and a
    float_list carrying ``doc_id * 0.5`` — float32-exact below 2^23,
    asserted), the Examples are framed as a masked-CRC TFRecord
    stream, and then the loader direction runs BOTH layers back:
    CRC-verified record walk, proto parse, field-by-field equality
    against the source columns.  The reported aggregates come from
    the DECODED features, which the oracle restates from the table —
    so the gate crosses two wire formats end to end.

    100 TB: identical plan to the other shard builders — one shuffle
    on the shard key, Arrow-batched byte work, tiny final aggregate.
    """
    from ..core.tfexample import make_example, parse_example
    from ..core.tfrecordcodec import encode_tfrecord, parse_tfrecord

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "documents")
        .select("doc_id", "source", "text", "n_chars")
        .withColumn("shard_id", F.expr(f"doc_id div {SHARD_DOCS}"))
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        docs = [
            (
                int(i),
                None if t is None else str(t),
                0 if n is None or pd.isna(n) else int(n),
            )
            for i, t, n in zip(pdf["doc_id"], pdf["text"], pdf["n_chars"])
        ]
        payloads = [
            make_example(
                {
                    "text": [(t or "").encode("utf-8")],
                    "doc_id": [i],
                    "n_chars": [n],
                    "half_id": [i * 0.5],
                }
            )
            for i, t, n in docs
        ]
        wire = encode_tfrecord(payloads)

        # --- the loader direction: records, then protos -------------
        back = parse_tfrecord(wire)
        if back != payloads:
            raise ValueError("TFRecord layer lost or reordered records")
        n_rec, s_id, s_chars, s_bytes = 0, 0, 0, 0
        for blob, (i, t, n) in zip(back, docs):
            feats = parse_example(blob)
            if feats["text"] != [(t or "").encode("utf-8")]:
                raise ValueError(f"doc {i}: text feature lost bytes")
            if feats["doc_id"] != [i] or feats["n_chars"] != [n]:
                raise ValueError(f"doc {i}: int64 features drifted")
            if feats["half_id"] != [i * 0.5]:  # float32-exact (< 2^23)
                raise ValueError(f"doc {i}: float feature drifted")
            n_rec += 1
            s_id += feats["doc_id"][0]
            s_chars += feats["n_chars"][0]
            s_bytes += len(feats["text"][0])
        return pd.DataFrame(
            {
                "source": pd.Series(
                    [pdf["source"].iloc[0]], dtype="object"
                ),
                "n_records": pd.Series([n_rec], dtype="int64"),
                "sum_doc_id": pd.Series([s_id], dtype="int64"),
                "sum_n_chars": pd.Series([s_chars], dtype="int64"),
                "sum_text_bytes": pd.Series([s_bytes], dtype="int64"),
            }
        )

    shards = _banded_shards(spark, d, _shard, _TFEXAMPLE_ROW_SCHEMA)
    return (
        shards.groupBy("source")
        .agg(
            F.sum("n_records").cast("bigint").alias("n_records"),
            F.sum("sum_doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum("sum_n_chars").cast("bigint").alias("sum_n_chars"),
            F.sum("sum_text_bytes")
            .cast("bigint")
            .alias("sum_text_bytes"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# ORC shards — the protobuf-metadata columnar sibling
# ---------------------------------------------------------------------------

#: codec rotates NONE/ZLIB/SNAPPY/LZ4/ZSTD by ``shard_id % 5`` —
#: every chunk codec the from-scratch walk implements (LZ4 raw
#: blocks via core/lz4codec.py, ZSTD frames via the FSE+Huffman
#: stack; LZO stays the GPL-tables seam); row totals and codec
#: counts are the oracle facts, stripe/schema agreement is asserted
#: in-executor against pyarrow's own ORC reader.
ORC_SHARDS_ORACLE = f"""
        WITH sh AS (
            SELECT source,
                   doc_id // {SHARD_DOCS} AS shard_id,
                   (doc_id // {SHARD_DOCS}) % 5 AS codec_ix,
                   count(*) AS n_rows,
                   CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
            FROM documents GROUP BY 1, 2, 3
        )
        SELECT source,
               count(*) AS n_shards,
               CAST(sum(n_rows) AS BIGINT) AS n_rows,
               CAST(sum(sum_doc_id) AS BIGINT) AS sum_doc_id,
               CAST(sum(CASE WHEN codec_ix = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_codec_none,
               CAST(sum(CASE WHEN codec_ix = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_codec_zlib,
               CAST(sum(CASE WHEN codec_ix = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_codec_snappy,
               CAST(sum(CASE WHEN codec_ix = 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_codec_lz4,
               CAST(sum(CASE WHEN codec_ix = 4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_codec_zstd
        FROM sh GROUP BY source ORDER BY source
"""

_ORC_ROW_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("sum_doc_id", T.LongType()),
        T.StructField("codec_ix", T.LongType()),
    ]
)


@register("ingest_orc_shards", oracle=ORC_SHARDS_ORACLE)
def ingest_orc_shards(spark, sf_dir) -> DataFrame:
    """ORC shard build + metadata walk across all five chunk codecs.

    The columnar sibling of the Avro shard query: each shard group is
    written as a REAL ORC file (pyarrow's writer — the independent
    producer), and the from-scratch walk (`core/orcmeta.py`:
    miniproto PostScript/Footer protobufs + chunk-framing inflate)
    reads the tail back.  Executors assert three-way agreement per
    shard: our walk vs pyarrow's ORC reader (rows, stripe count,
    compression), our walk vs the group itself (row count, schema
    tree = root STRUCT over [doc_id LONG, text STRING]), and the
    parser's own stripe-accounting invariants.  Codec rotation by
    shard proves all five chunk codecs in every run — LZ4 chunks
    are raw lz4 BLOCKS (the ORC codec calls LZ4_decompress_safe)
    inflated by core/lz4codec.py, ZSTD chunks are complete frames
    entropy-decoded by core/zstdmeta.py + core/zstdblock.py.

    100 TB: one shuffle on the shard key; the walk itself reads only
    the file TAIL in a real deployment (PostScript length byte ->
    footer range), which is why ``parse_orc_meta`` takes plain bytes.
    """
    import io

    import pyarrow as pa_
    from pyarrow import orc as orc_

    from ..core.orcmeta import parse_orc_meta

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .withColumn("shard_id", F.expr(f"doc_id div {SHARD_DOCS}"))
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard_id = int(pdf["shard_id"].iloc[0])
        codec = ("uncompressed", "zlib", "snappy", "lz4", "zstd")[
            shard_id % 5
        ]
        t = pa_.table(
            {
                "doc_id": pa_.array(
                    [int(i) for i in pdf["doc_id"]], pa_.int64()
                ),
                "text": pa_.array(
                    [None if v is None else str(v) for v in pdf["text"]],
                    pa_.string(),
                ),
            }
        )
        buf = io.BytesIO()
        orc_.write_table(t, buf, compression=codec)
        data = buf.getvalue()

        got = parse_orc_meta(data)
        ref = orc_.ORCFile(io.BytesIO(data))
        if got["num_rows"] != ref.nrows or got["num_rows"] != len(pdf):
            raise ValueError(
                f"shard {shard_id}: rows {got['num_rows']} != "
                f"{ref.nrows}/{len(pdf)}"
            )
        if len(got["stripes"]) != ref.nstripes:
            raise ValueError(f"shard {shard_id}: stripe count drifted")
        want_comp = {"uncompressed": "NONE", "zlib": "ZLIB",
                     "snappy": "SNAPPY", "lz4": "LZ4",
                     "zstd": "ZSTD"}[codec]
        if got["compression"] != want_comp:
            raise ValueError(
                f"shard {shard_id}: codec {got['compression']} != "
                f"{want_comp}"
            )
        root = got["types"][0]
        kinds = [got["types"][i]["kind"] for i in root["subtypes"]]
        if (
            root["kind"] != "STRUCT"
            or root["field_names"] != ["doc_id", "text"]
            or kinds != ["LONG", "STRING"]
        ):
            raise ValueError(f"shard {shard_id}: schema tree drifted")
        return pd.DataFrame(
            {
                "source": pd.Series(
                    [pdf["source"].iloc[0]], dtype="object"
                ),
                "n_rows": pd.Series([got["num_rows"]], dtype="int64"),
                "sum_doc_id": pd.Series(
                    [int(pdf["doc_id"].sum())], dtype="int64"
                ),
                "codec_ix": pd.Series([shard_id % 5], dtype="int64"),
            }
        )

    shards = _banded_shards(spark, d, _shard, _ORC_ROW_SCHEMA)
    return (
        shards.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("sum_doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum(F.when(F.col("codec_ix") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_codec_none"),
            F.sum(F.when(F.col("codec_ix") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_codec_zlib"),
            F.sum(F.when(F.col("codec_ix") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_codec_snappy"),
            F.sum(F.when(F.col("codec_ix") == 3, 1).otherwise(0))
            .cast("bigint")
            .alias("n_codec_lz4"),
            F.sum(F.when(F.col("codec_ix") == 4, 1).otherwise(0))
            .cast("bigint")
            .alias("n_codec_zstd"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# MessagePack event stream — the compact sidecar wire format
# ---------------------------------------------------------------------------

#: facts recovered from DECODED msgpack maps (including microsecond
#: timestamps through the spec's timestamp extension); sums restrict
#: to id columns so the gate stays integer-exact at every SF.
MSGPACK_EVENTS_ORACLE = """
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(event_id) AS BIGINT) AS sum_event_id,
               CAST(sum(user_id) AS BIGINT) AS sum_user_id,
               CAST(min(epoch_us(ts)) AS BIGINT) AS min_ts_us,
               CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us
        FROM events GROUP BY event_type ORDER BY event_type
"""

_MSGPACK_ROW_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
    ]
)


@register("ingest_msgpack_events", oracle=MSGPACK_EVENTS_ORACLE)
def ingest_msgpack_events(spark, sf_dir) -> DataFrame:
    """Events through MessagePack, timestamps riding the ext type.

    Each event row is packed as a msgpack map (ints across width
    boundaries, the event type as str, ``value`` as float64, ``props``
    as str-or-nil, and the microsecond timestamp as the spec's
    timestamp EXTENSION — layout chosen by magnitude), then unpacked
    and verified field-for-field; the reported aggregates come from
    the DECODED maps and the oracle restates them from the table
    (``epoch_us`` pins the timestamp roundtrip to the microsecond).

    100 TB: narrow mapInPandas (one pass, no shuffle before the small
    per-type aggregate) — the serialize-verify-extract shape of an
    event-bus consumer.
    """
    from ..core.msgpackcodec import Timestamp, packb, unpackb

    prep(spark)
    d = load_spread(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props", "ts"
    )

    def _roundtrip(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            types, eids, uids, tss = [], [], [], []
            for eid, uid, etype, val, props, ts in zip(
                pdf["event_id"],
                pdf["user_id"],
                pdf["event_type"],
                pdf["value"],
                pdf["props"],
                pdf["ts"],
            ):
                ts_ns = int(ts.value)  # pandas timestamps are int64 ns
                us = ts_ns // 1000
                rec = {
                    "event_id": int(eid),
                    "user_id": int(uid),
                    "event_type": str(etype),
                    "value": float(val),
                    "props": None if props is None else str(props),
                    "ts": Timestamp(us // 1_000_000,
                                    (us % 1_000_000) * 1000),
                }
                back = unpackb(packb(rec))
                if back != rec:
                    raise ValueError(
                        f"event {eid}: msgpack roundtrip drifted"
                    )
                t = back["ts"]
                types.append(back["event_type"])
                eids.append(back["event_id"])
                uids.append(back["user_id"])
                tss.append(t.seconds * 1_000_000 + t.nanos // 1000)
            yield pd.DataFrame(
                {
                    "event_type": pd.Series(types, dtype="object"),
                    "event_id": pd.Series(eids, dtype="int64"),
                    "user_id": pd.Series(uids, dtype="int64"),
                    "ts_us": pd.Series(tss, dtype="int64"),
                }
            )

    per = d.mapInPandas(_roundtrip, _MSGPACK_ROW_SCHEMA)
    return (
        per.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum("user_id").cast("bigint").alias("sum_user_id"),
            F.min("ts_us").cast("bigint").alias("min_ts_us"),
            F.max("ts_us").cast("bigint").alias("max_ts_us"),
        )
        .orderBy("event_type")
    )


#: same facts as the msgpack/CBOR twins — the stream framing must be
#: value-transparent, so the oracle is the table restatement.
ARROW_STREAM_ORACLE = """
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(event_id) AS BIGINT) AS sum_event_id,
               CAST(sum(user_id) AS BIGINT) AS sum_user_id,
               CAST(min(epoch_us(ts)) AS BIGINT) AS min_ts_us,
               CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us
        FROM events GROUP BY event_type ORDER BY event_type
"""

#: record batches per encoded stream chunk — small enough that every
#: Arrow batch exercises multi-batch stream framing
ASTREAM_CHUNK = 500


@register("ingest_arrow_stream", oracle=ARROW_STREAM_ORACLE)
def ingest_arrow_stream(spark, sf_dir) -> DataFrame:
    """Events through the Arrow IPC STREAM format (r13) — the
    footer-less wire framing of Flight payloads and socket
    interchange, as opposed to the FILE format the other Arrow
    queries exercise (``core/arrowipc.py`` read_arrow_stream /
    encode_arrow_stream).

    Each executor Arrow batch becomes one multi-record-batch stream;
    the codec DIRECTION alternates by a batch counter: even batches
    are written by pyarrow (dictionary-encoded event_type, tz-aware
    us timestamps) and decoded by OUR reader, odd batches are written
    by OUR encoder and decoded by pyarrow — both directions earn the
    verdict.  Every decoded value is asserted equal to its source
    before aggregation; the oracle restates the aggregates from the
    table (``epoch_us`` pins the timestamp roundtrip).

    100 TB: narrow mapInPandas, no shuffle before the tiny per-type
    aggregate — the event-bus consumer shape of the msgpack/CBOR
    twins.
    """
    import datetime as _dt_mod
    import io

    import pyarrow as pa_
    import pyarrow.ipc as pa_ipc

    from ..core.arrowipc import (
        FieldSpec,
        encode_arrow_stream,
        read_arrow_stream,
    )

    prep(spark)
    d = load_spread(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )

    def _roundtrip(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        utc = _dt_mod.timezone.utc
        epoch_utc = _dt_mod.datetime(1970, 1, 1, tzinfo=utc)
        fs = [
            FieldSpec("event_id", True, "int64", 64),
            FieldSpec("user_id", True, "int64", 64),
            FieldSpec("event_type", True, "utf8", 0),
            FieldSpec(
                "ts", True, "timestamp", 64, unit="us", tz="UTC"
            ),
        ]
        for bi, pdf in enumerate(batches):
            eids = [int(v) for v in pdf["event_id"]]
            uids = [int(v) for v in pdf["user_id"]]
            types = [str(v) for v in pdf["event_type"]]
            ts_us = [int(v.value) // 1000 for v in pdf["ts"]]
            aware = [
                epoch_utc + _dt_mod.timedelta(microseconds=u)
                for u in ts_us
            ]
            if bi % 2 == 0:
                # pyarrow writes (dict-encoded type column), we read
                t = pa_.table(
                    {
                        "event_id": pa_.array(eids, pa_.int64()),
                        "user_id": pa_.array(uids, pa_.int64()),
                        "event_type": pa_.array(
                            types
                        ).dictionary_encode(),
                        "ts": pa_.array(
                            ts_us, pa_.timestamp("us", tz="UTC")
                        ),
                    }
                )
                buf = io.BytesIO()
                with pa_ipc.new_stream(buf, t.schema) as w:
                    for b in t.to_batches(max_chunksize=ASTREAM_CHUNK):
                        w.write_batch(b)
                got = read_arrow_stream(buf.getvalue())
                if len(got["batches"]) != max(
                    1, -(-len(eids) // ASTREAM_CHUNK)
                ) and eids:
                    raise ValueError("stream batch framing drifted")
                col = {
                    name: [
                        v
                        for b in got["batches"]
                        for v in b["columns"][ci]
                    ]
                    for ci, name in enumerate(
                        ("event_id", "user_id", "event_type", "ts")
                    )
                }
                if (
                    col["event_id"] != eids
                    or col["user_id"] != uids
                    or col["event_type"] != types
                    or col["ts"] != aware
                ):
                    raise ValueError(
                        f"batch {bi}: own stream decode drifted"
                    )
            else:
                # we write, pyarrow reads
                chunks = [
                    [
                        eids[a : a + ASTREAM_CHUNK],
                        uids[a : a + ASTREAM_CHUNK],
                        types[a : a + ASTREAM_CHUNK],
                        ts_us[a : a + ASTREAM_CHUNK],
                    ]
                    for a in range(0, max(len(eids), 1), ASTREAM_CHUNK)
                ]
                data = encode_arrow_stream(fs, chunks)
                rt = pa_ipc.open_stream(io.BytesIO(data)).read_all()
                if (
                    rt.column("event_id").to_pylist() != eids
                    or rt.column("user_id").to_pylist() != uids
                    or rt.column("event_type").to_pylist() != types
                    or rt.column("ts").to_pylist() != aware
                ):
                    raise ValueError(
                        f"batch {bi}: pyarrow decode of own stream "
                        "drifted"
                    )
            yield pd.DataFrame(
                {
                    "event_type": pd.Series(types, dtype="object"),
                    "event_id": pd.Series(eids, dtype="int64"),
                    "user_id": pd.Series(uids, dtype="int64"),
                    "ts_us": pd.Series(ts_us, dtype="int64"),
                }
            )

    per = d.mapInPandas(_roundtrip, _MSGPACK_ROW_SCHEMA)
    return (
        per.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum("user_id").cast("bigint").alias("sum_user_id"),
            F.min("ts_us").cast("bigint").alias("min_ts_us"),
            F.max("ts_us").cast("bigint").alias("max_ts_us"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# transaction-log snapshot + stats pruning — the lakehouse layer
# ---------------------------------------------------------------------------

#: removal rule and pruning predicate are closed-form so the oracle
#: can restate the REPLAYED snapshot from the data: every 7th shard
#: (``shard_id % 7 == 3``) is removed by later commits, and the scan
#: predicate is ``doc_id BETWEEN 50 AND 260``.
#: shards per _txnlog_build applyInPandas group (r16): bounds per-call
#: memory at TXNLOG_BUILD_BAND x SHARD_DOCS docs while cutting the
#: per-group Arrow scaffold ~band-fold; group count stays
#: proportional-to-data
TXNLOG_BUILD_BAND = 64

TXNLOG_REMOVE_MOD = 7
TXNLOG_REMOVE_REM = 3
TXNLOG_PRUNE_LO = 50
TXNLOG_PRUNE_HI = 260

TXNLOG_SNAPSHOT_ORACLE = f"""
        WITH sh AS (
            SELECT source, doc_id // {SHARD_DOCS} AS shard_id,
                   count(*) AS n,
                   min(doc_id) AS mn, max(doc_id) AS mx
            FROM documents GROUP BY 1, 2
        ),
        live AS (
            SELECT * FROM sh
            WHERE shard_id % {TXNLOG_REMOVE_MOD} <> {TXNLOG_REMOVE_REM}
        )
        SELECT source,
               count(*) AS n_live_files,
               CAST(sum(n) AS BIGINT) AS live_rows,
               CAST(sum(CASE WHEN mx >= {TXNLOG_PRUNE_LO}
                              AND mn <= {TXNLOG_PRUNE_HI}
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_candidates,
               CAST(sum(CASE WHEN mx >= {TXNLOG_PRUNE_LO}
                              AND mn <= {TXNLOG_PRUNE_HI}
                             THEN n ELSE 0 END) AS BIGINT)
                   AS candidate_rows
        FROM live GROUP BY source ORDER BY source
"""

_TXNLOG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("shard_id", T.LongType()),
        T.StructField("size", T.LongType()),
        T.StructField("num_records", T.LongType()),
        T.StructField("min_id", T.LongType()),
        T.StructField("max_id", T.LongType()),
        T.StructField("sbbf", T.BinaryType()),
    ]
)


def _txnlog_build(spark, sf_dir):
    """Shared machinery for the txnlog queries.

    Stage 1 (distributed): one REAL parquet file per shard group
    built in-executor (pyarrow bytes, verified through our own footer
    walk before the add-action stats are trusted), stats rows
    collected — bounded by design: file-level metadata IS the log, a
    log that does not fit on the driver is not a log.  Stage 2
    (driver): the commit history — adds batched 5 per commit, an
    Avro-OCF CHECKPOINT cut right before the removes, then every
    {TXNLOG_REMOVE_MOD}th shard removed across later commits; replay
    -from-genesis must equal replay-from-checkpoint (asserted) before
    any snapshot is used.  Returns (commits, checkpoint_at, snap) —
    the full history, the pre-remove version number, and the verified
    CURRENT snapshot.
    """
    import io

    import pyarrow as pa_
    import pyarrow.parquet as pq_

    import base64

    from ..core.parquetmeta import parse_footer
    from ..core.sbbf import SplitBlockBloom
    from ..core.txnlog import (
        checkpoint_bytes,
        encode_commit,
        prune,
        replay,
    )

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .withColumn("shard_id", F.expr(f"doc_id div {SHARD_DOCS}"))
        # r16: shards are BANDED into applyInPandas groups — the
        # SHARD_DOCS-doc shard is the log's file granularity, but one
        # pandas call per shard paid ~15 ms of Arrow/group scaffold per
        # handful of rows (1348 groups at sf0.1; the WRITE_SHARD_DOCS
        # comment below measured the same effect).
        # A band builds its shards' files in one call; group count and
        # per-group memory (TXNLOG_BUILD_BAND x SHARD_DOCS docs) stay
        # proportional-to-data but small-constant at any scale, and the
        # emitted per-shard stats rows are IDENTICAL.
        .withColumn(
            "band", F.expr(f"(doc_id div {SHARD_DOCS}) div {TXNLOG_BUILD_BAND}")
        )
        # explicit exchange width: per-band Python codec work
        # dominates at gate scale, and AQE's size-based coalescing
        # would fold this tiny shuffle onto one task (SCALE.md:
        # 'AQE coalescing vs Python-heavy applyInPandas')
        .repartition(
            spark.sparkContext.defaultParallelism, "source", "band"
        )
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        out: list[tuple] = []
        # shard_id = doc_id div SHARD_DOCS is monotone in doc_id, so
        # every per-shard slice of the doc_id-sorted band is sorted
        for shard_id, g in pdf.groupby("shard_id", sort=True):
            ids = g["doc_id"].to_numpy(dtype="int64")
            t = pa_.table(
                {
                    "doc_id": pa_.array(ids, pa_.int64()),
                    "text": pa_.array(g["text"].tolist(), pa_.string()),
                }
            )
            buf = io.BytesIO()
            pq_.write_table(t, buf)
            data = buf.getvalue()
            # the add-action stats are only trusted because the REAL
            # file bytes agree: our footer walk must see the same rows
            if parse_footer(data)["num_rows"] != len(g):
                raise ValueError("shard file footer disagrees with group")
            bloom = SplitBlockBloom(64)
            for i in ids.tolist():
                bloom.insert_int64(i)
            out.append(
                (
                    g["source"].iloc[0],
                    int(shard_id),
                    len(data),
                    len(g),
                    int(ids[0]),
                    int(ids[-1]),
                    bloom.to_bytes(),
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "source", "shard_id", "size", "num_records",
                "min_id", "max_id", "sbbf",
            ],
        )

    stats = (
        d.groupBy("source", "band")
        .applyInPandas(_build, _TXNLOG_STATS_SCHEMA)
        .collect()  # bounded: file-level metadata, rows/SHARD_DOCS entries
    )

    # --- stage 2: the log protocol, driver-side ----------------------
    def _adds():
        for r in sorted(stats, key=lambda r: (r["source"], r["shard_id"])):
            yield r["source"], r["shard_id"], {
                "add": {
                    "path": f"{r['source']}/part-{r['shard_id']:05d}",
                    "size": r["size"],
                    "num_records": r["num_records"],
                    "stats": {
                        "minValues": {"doc_id": r["min_id"]},
                        "maxValues": {"doc_id": r["max_id"]},
                        "sbbf": base64.b64encode(
                            bytes(r["sbbf"])
                        ).decode("ascii"),
                    },
                }
            }

    commits = []
    batch = [{"metaData": {"id": "documents", "schemaString":
                           "doc_id bigint, text string"}}]
    removable = []
    for source, shard_id, add in _adds():
        batch.append(add)
        if shard_id % TXNLOG_REMOVE_MOD == TXNLOG_REMOVE_REM:
            removable.append(add["add"]["path"])
        if len(batch) >= 5:
            commits.append(encode_commit(batch))
            batch = []
    if batch:
        commits.append(encode_commit(batch))
    checkpoint_at = len(commits) - 1
    cp = checkpoint_bytes(replay(commits))
    for at in range(0, len(removable), 3):
        commits.append(
            encode_commit(
                [{"remove": {"path": p}} for p in removable[at : at + 3]]
            )
        )
    snap = replay(commits)
    resumed = replay(
        commits[checkpoint_at + 1 :],
        checkpoint=cp,
        checkpoint_version=checkpoint_at,
    )
    if resumed.files != snap.files or resumed.version != snap.version:
        raise ValueError("checkpoint replay diverged from genesis")
    return commits, checkpoint_at, snap


def _txnlog_per_source(spark, snap, candidates=None) -> DataFrame:
    """Fold a snapshot's file set into the per-source result frame."""
    per_source: dict = {}
    for path, add in snap.files.items():
        source = path.split("/", 1)[0]
        agg = per_source.setdefault(source, [0, 0, 0, 0])
        agg[0] += 1
        agg[1] += add["num_records"]
        if candidates is not None and path in candidates:
            agg[2] += 1
            agg[3] += add["num_records"]
    fields = [
        T.StructField("source", T.StringType()),
        T.StructField("n_live_files", T.LongType()),
        T.StructField("live_rows", T.LongType()),
    ]
    if candidates is not None:
        fields += [
            T.StructField("n_candidates", T.LongType()),
            T.StructField("candidate_rows", T.LongType()),
        ]
        rows = [(k, *v) for k, v in sorted(per_source.items())]
    else:
        rows = [(k, v[0], v[1]) for k, v in sorted(per_source.items())]
    # Arrow/pandas local frame: no parallelize job for metadata rows
    return local_frame(spark, rows, T.StructType(fields)).orderBy("source")


@register("txnlog_snapshot_scan", oracle=TXNLOG_SNAPSHOT_ORACLE)
def txnlog_snapshot_scan(spark, sf_dir) -> DataFrame:
    """Versioned table state + stats pruning over a from-scratch log.

    The lakehouse pattern at 100 TB: data files are big and immutable,
    the TRANSACTION LOG is kilobytes of metadata, and every reader
    plans from the log alone (see ``_txnlog_build``).  The reported
    aggregates — live files/rows and the candidate set for ``doc_id
    BETWEEN {TXNLOG_PRUNE_LO} AND {TXNLOG_PRUNE_HI}`` pruned from
    min/max stats alone — come from the REPLAYED snapshot; the oracle
    restates them from the data.
    """
    from ..core.txnlog import prune

    _, _, snap = _txnlog_build(spark, sf_dir)
    candidates = set(
        prune(snap, "doc_id", TXNLOG_PRUNE_LO, TXNLOG_PRUNE_HI)
    )
    return _txnlog_per_source(spark, snap, candidates)


#: at the pre-remove version every shard file is still live, so the
#: historical snapshot restates as the UNFILTERED shard aggregate.
TXNLOG_TIME_TRAVEL_ORACLE = f"""
        WITH sh AS (
            SELECT source, doc_id // {SHARD_DOCS} AS shard_id,
                   count(*) AS n
            FROM documents GROUP BY 1, 2
        )
        SELECT source,
               count(*) AS n_live_files,
               CAST(sum(n) AS BIGINT) AS live_rows
        FROM sh GROUP BY source ORDER BY source
"""


@register("txnlog_time_travel", oracle=TXNLOG_TIME_TRAVEL_ORACLE)
def txnlog_time_travel(spark, sf_dir) -> DataFrame:
    """Snapshot AS OF the pre-remove version — time travel.

    The same commit history as ``txnlog_snapshot_scan``, replayed
    only to the version where the checkpoint was cut (before any
    remove landed): the historical snapshot must show EVERY shard
    file live, which the oracle restates as the unfiltered shard
    aggregate.  Current-vs-historical divergence is also asserted in
    place: the as-of snapshot must strictly contain the current one
    whenever removes exist.  Time travel costs one metadata replay —
    no data file is read or restored, which is the point of keeping
    history in the log.
    """
    from ..core.txnlog import replay

    commits, checkpoint_at, current = _txnlog_build(spark, sf_dir)
    asof = replay(commits[: checkpoint_at + 1])
    if asof.version != checkpoint_at:
        raise ValueError("as-of replay landed on the wrong version")
    if not set(current.files) <= set(asof.files):
        raise ValueError("current snapshot holds files unknown to history")
    return _txnlog_per_source(spark, asof)

# ---------------------------------------------------------------------------
# zstd store-mode framing — checksum-verified payload transport
# ---------------------------------------------------------------------------

#: raw-block frame arithmetic is closed-form: 4 magic + 1 descriptor
#: + FCS width (1/2/4 by content size) + 3 per block + content + 4
#: checksum; fixture texts stay under one 128 KiB block unless huge.
ZSTD_FRAMES_ORACLE = """
        WITH per AS (
            SELECT source,
                   octet_length(encode(coalesce(text, ''))) AS n
            FROM documents
        ),
        sized AS (
            SELECT source, n,
                   CASE WHEN n < 256 THEN 1
                        WHEN n < 65792 THEN 2
                        ELSE 4 END AS fcs_len,
                   greatest((n + 131071) // 131072, 1) AS n_blocks
            FROM per
        )
        SELECT source,
               count(*) AS n_frames,
               CAST(sum(n) AS BIGINT) AS sum_content_bytes,
               CAST(sum(9 + fcs_len + 3 * n_blocks + n) AS BIGINT)
                   AS sum_frame_bytes,
               CAST(sum(n_blocks) AS BIGINT) AS sum_blocks,
               CAST(sum(n) AS BIGINT) AS sum_comp_content_bytes,
               count(*) AS n_comp_checksum_ok
        FROM sized GROUP BY source ORDER BY source
"""

_ZSTD_ROW_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("content_bytes", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("n_blocks", T.LongType()),
        T.StructField("comp_content_bytes", T.LongType()),
        T.StructField("comp_checksum_ok", T.LongType()),
    ]
)


@register("ingest_zstd_frames", oracle=ZSTD_FRAMES_ORACLE)
def ingest_zstd_frames(spark, sf_dir) -> DataFrame:
    """Document payloads through zstd framing, both directions and
    both block families.

    Leg 1 (store mode): each document's bytes are wrapped in a
    spec-legal raw-block zstd frame (`core/zstdmeta.py`) with its
    XXH64-low32 content checksum, then THREE readers must agree: our
    own walk (content regenerated, checksum verified — the parser
    raises on mismatch), REAL libzstd (pyarrow must decompress the
    frame back to the exact bytes), and the closed-form framing
    arithmetic the oracle restates.

    Leg 2 (Compressed blocks — the r9 seam, now closed): the same
    bytes go through REAL libzstd compression, the checksum flag and
    XXH64-low32 trailer are spliced onto its frame, and our
    from-scratch FSE+Huffman decoder (`core/zstdblock.py`) must
    regenerate the content byte-exact with the checksum VERIFIED
    (``checksum_ok is True`` — never the old ``None`` seam report).
    ``sum_comp_content_bytes`` flows from the decoded bytes, so a
    lossy decode breaks the oracle match, not just an assertion.

    100 TB: narrow mapInPandas, no shuffle before the tiny per-source
    aggregate.
    """
    import pyarrow as pa_

    from ..core.zstdmeta import encode_zstd_raw, parse_zstd_frames, xxh64

    prep(spark)
    d = load_spread(spark, sf_dir, "documents").select("source", "text")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = pa_.Codec("zstd", compression_level=3)
        for pdf in batches:
            srcs, cbytes, fbytes, blks = [], [], [], []
            comp_bytes, comp_ok = [], []
            for src, txt in zip(pdf["source"], pdf["text"]):
                content = (txt or "").encode("utf-8")
                frame = encode_zstd_raw(content)
                (f,) = parse_zstd_frames(frame)
                if f["content"] != content or f["checksum_ok"] is not True:
                    raise ValueError("zstd walk lost the payload")
                if pa_.decompress(
                    frame,
                    decompressed_size=len(content),
                    codec="zstd",
                    asbytes=True,
                ) != content:
                    raise ValueError("libzstd rejected our frame")
                n = len(content)
                fcs_len = 1 if n < 256 else (2 if n < 65792 else 4)
                n_blocks = max((n + 131071) // 131072, 1)
                if len(frame) != 9 + fcs_len + 3 * n_blocks + n:
                    raise ValueError("frame arithmetic drifted")
                # leg 2: libzstd-compressed frame + spliced checksum,
                # entropy-decoded by the from-scratch block decoder
                comp = bytearray(codec.compress(content))
                comp[4] |= 0x04  # Content_Checksum_Flag
                comp += (xxh64(content, 0) & 0xFFFFFFFF).to_bytes(
                    4, "little"
                )
                (cf,) = parse_zstd_frames(bytes(comp))
                if cf["content"] != content:
                    raise ValueError("block decoder lost the payload")
                if cf["checksum_ok"] is not True:
                    raise ValueError("block decoder checksum unverified")
                srcs.append(src)
                cbytes.append(n)
                fbytes.append(len(frame))
                blks.append(n_blocks)
                comp_bytes.append(len(cf["content"]))
                comp_ok.append(1)
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "content_bytes": pd.Series(cbytes, dtype="int64"),
                    "frame_bytes": pd.Series(fbytes, dtype="int64"),
                    "n_blocks": pd.Series(blks, dtype="int64"),
                    "comp_content_bytes": pd.Series(
                        comp_bytes, dtype="int64"
                    ),
                    "comp_checksum_ok": pd.Series(comp_ok, dtype="int64"),
                }
            )

    per = d.mapInPandas(_frames, _ZSTD_ROW_SCHEMA)
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("content_bytes")
            .cast("bigint")
            .alias("sum_content_bytes"),
            F.sum("frame_bytes").cast("bigint").alias("sum_frame_bytes"),
            F.sum("n_blocks").cast("bigint").alias("sum_blocks"),
            F.sum("comp_content_bytes")
            .cast("bigint")
            .alias("sum_comp_content_bytes"),
            F.sum("comp_checksum_ok")
            .cast("bigint")
            .alias("n_comp_checksum_ok"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# LZ4-framed transport — real compression, three referees per row
# ---------------------------------------------------------------------------

#: closed-form facts: content bytes and block counts (64 KiB blocks,
#: min 1); compressed sizes are content-dependent, so the executors
#: bound them instead (frame never exceeds content + framing + 16
#: bytes per 64 KiB block of worst-case literal overhead).
LZ4_FRAMES_ORACLE = """
        WITH per AS (
            SELECT source,
                   octet_length(encode(coalesce(text, ''))) AS n
            FROM documents
        )
        SELECT source,
               count(*) AS n_frames,
               CAST(sum(n) AS BIGINT) AS sum_content_bytes,
               CAST(sum(greatest((n + 65535) // 65536, 1)) AS BIGINT)
                   AS sum_blocks
        FROM per GROUP BY source ORDER BY source
"""

_LZ4_ROW_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("content_bytes", T.LongType()),
        T.StructField("n_blocks", T.LongType()),
    ]
)


@register("ingest_lz4_frames", oracle=LZ4_FRAMES_ORACLE)
def ingest_lz4_frames(spark, sf_dir) -> DataFrame:
    """Documents through REAL from-scratch LZ4 compression.

    Each document is compressed by our greedy LZ77 matcher into an
    LZ4 frame (block + content checksums on), then THREE referees
    must agree per row: our own frame decoder (checksums verified,
    content byte-exact), REAL liblz4 (pyarrow decompresses our
    frame), and a size bound (a conformant LZ4 frame of n bytes
    cannot exceed n + per-block worst-case literal overhead +
    framing — asserted, catching a matcher that emits illegal
    sequences liblz4 would still tolerate).  The oracle restates the
    closed-form facts (content bytes, 64 KiB block counts).

    100 TB: narrow mapInPandas; this is the compress-verify-ship
    stage of an archival/export pipeline.
    """
    import pyarrow as pa_

    from ..core.lz4codec import lz4_frame_compress, lz4_frame_decompress

    prep(spark)
    d = load_spread(spark, sf_dir, "documents").select("source", "text")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, cbytes, blks = [], [], []
            for src, txt in zip(pdf["source"], pdf["text"]):
                content = (txt or "").encode("utf-8")
                frame = lz4_frame_compress(content, block_checksum=True)
                got = lz4_frame_decompress(frame)
                if got["content"] != content:
                    raise ValueError("LZ4 roundtrip lost bytes")
                if pa_.decompress(
                    frame,
                    decompressed_size=len(content),
                    codec="lz4",
                    asbytes=True,
                ) != content:
                    raise ValueError("liblz4 rejected our frame")
                n_blocks = max((len(content) + 65535) // 65536, 1)
                # worst case per block: all literals + token/run bytes
                bound = (
                    15  # magic + descriptor + HC + end mark + checksum
                    + len(content)
                    + n_blocks * (8 + 16 + (65536 // 255) + 1)
                )
                if len(frame) > bound:
                    raise ValueError(
                        f"frame {len(frame)} exceeds the literal bound "
                        f"{bound}"
                    )
                srcs.append(src)
                cbytes.append(len(content))
                blks.append(n_blocks)
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "content_bytes": pd.Series(cbytes, dtype="int64"),
                    "n_blocks": pd.Series(blks, dtype="int64"),
                }
            )

    per = d.mapInPandas(_frames, _LZ4_ROW_SCHEMA)
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("content_bytes")
            .cast("bigint")
            .alias("sum_content_bytes"),
            F.sum("n_blocks").cast("bigint").alias("sum_blocks"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# parquet VALUES through the from-scratch reader
# ---------------------------------------------------------------------------

#: the aggregates are computed from values decoded by OUR reader
#: (hybrid runs, dictionaries, def-level null placement, codec
#: inflation) — the oracle restates them from the table, so a single
#: mis-decoded value, misplaced null, or dropped page breaks the gate.
PARQUET_READ_ORACLE = """
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
               CAST(sum(octet_length(encode(coalesce(text, ''))))
                    AS BIGINT) AS sum_text_bytes,
               CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null_text,
               CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS sum_n_chars
        FROM documents GROUP BY source ORDER BY source
"""

_PARQUET_READ_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("text_bytes", T.LongType()),
        T.StructField("null_text", T.LongType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


@register("parquet_column_read_real", oracle=PARQUET_READ_ORACLE)
def parquet_column_read_real(spark, sf_dir) -> DataFrame:
    """The engine reads parquet VALUES with no black box.

    The documents file's bytes go through the full from-scratch read
    stack in-executor — thrift footer, page walk, codec inflation,
    hybrid-run definition levels and dictionary indices, PLAIN value
    decode, null placement — via `core/parquetread.py`, and the
    decoded columns are cross-checked two ways: pyarrow's reader must
    agree value-for-value (the independent referee), and the
    per-source aggregates computed from OUR decoded values must match
    the oracle's SQL over the same table.  This closes the loop the
    scan-audit started: not just the file's structure but every value
    in it is reproduced by first-party code.

    100 TB: the unit of work is the row group x column chunk (ranged
    reads + page-local decode), embarrassingly parallel; the fixture
    maps one file per task via binaryFile.
    """
    import io

    import pyarrow.parquet as pq_

    from ..core.parquetmeta import parse_footer
    from ..core.parquetread import leaf_elements, read_column

    prep(spark)
    files = (
        spark.read.format("binaryFile")
        .load(table_path(sf_dir, "documents"))
        .select("content")
    )

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                data = bytes(blob)
                meta = parse_footer(data)
                leaves = leaf_elements(meta["schema"])
                names = [el["name"] for el, _ in leaves]
                cols: dict = {n: [] for n in names}
                for rg in meta["row_groups"]:
                    for ci, col in enumerate(rg["columns"]):
                        leaf, nested = leaves[ci]
                        if nested:
                            raise ValueError(
                                "documents must be a flat table"
                            )
                        cols[leaf["name"]].extend(
                            read_column(data, col, leaf)
                        )
                # referee 1: pyarrow agrees value-for-value
                ref = pq_.ParquetFile(io.BytesIO(data)).read()
                for ci, name in enumerate(names):
                    want = ref.column(ci).to_pylist()
                    got = cols[name]
                    if want and isinstance(want[0], str):
                        got = [
                            None if v is None else v.decode("utf-8")
                            for v in got
                        ]
                        cols[name] = got
                    if got != want:
                        raise ValueError(
                            f"column {name!r} diverges from pyarrow"
                        )
                yield pd.DataFrame(
                    {
                        "source": pd.Series(
                            cols["source"], dtype="object"
                        ),
                        "doc_id": pd.Series(
                            cols["doc_id"], dtype="int64"
                        ),
                        "text_bytes": pd.Series(
                            [
                                0 if v is None else len(v.encode("utf-8"))
                                for v in cols["text"]
                            ],
                            dtype="int64",
                        ),
                        "null_text": pd.Series(
                            [
                                1 if v is None else 0
                                for v in cols["text"]
                            ],
                            dtype="int64",
                        ),
                        "n_chars": pd.Series(
                            [
                                0 if v is None else int(v)
                                for v in cols["n_chars"]
                            ],
                            dtype="int64",
                        ),
                    }
                )

    per = files.mapInPandas(_read, _PARQUET_READ_SCHEMA)
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum("text_bytes").cast("bigint").alias("sum_text_bytes"),
            F.sum("null_text").cast("bigint").alias("n_null_text"),
            F.sum("n_chars").cast("bigint").alias("sum_n_chars"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# NESTED parquet values (repetition levels) through the from-scratch reader
# ---------------------------------------------------------------------------

#: the embeddings table's ``list<float>`` column carries repetition
#: levels — the aggregates are computed from lists OUR reader
#: reassembled (Dremel record assembly over rep/def level streams,
#: `core/parquetread.py:assemble_nested`); DuckDB restates them with
#: its own list functions over the same file.  ``floor(x * 1024)``
#: keeps the float element algebra integer-exact in both engines
#: (floor, not round: round() ties differ between Python and SQL).
PARQUET_NESTED_ORACLE = """
        SELECT label,
               count(*) AS n_vecs,
               CAST(sum(len(embedding)) AS BIGINT) AS sum_dims,
               CAST(sum(coalesce(list_sum(list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT))),
                    0)) AS BIGINT) AS sum_q,
               CAST(sum(vec_id) AS BIGINT) AS sum_vec_id
        FROM embeddings GROUP BY label ORDER BY label
"""

_PARQUET_NESTED_SCHEMA = T.StructType(
    [
        T.StructField("label", T.IntegerType()),
        T.StructField("n_dims", T.LongType()),
        T.StructField("q_sum", T.LongType()),
        T.StructField("vec_id", T.LongType()),
    ]
)


@register("parquet_nested_read_real", oracle=PARQUET_NESTED_ORACLE)
def parquet_nested_read_real(spark, sf_dir) -> DataFrame:
    """Nested (REPEATED) parquet columns with no black box.

    The embeddings file's bytes go through the full from-scratch read
    stack in-executor — thrift footer, page walk, codec inflation,
    hybrid-run REPETITION + definition levels, and Dremel record
    assembly (`core/parquetread.py`) — rebuilding each row's
    ``list<float>`` from its striped leaf slots.  The reference's
    level machinery carries repetition levels as opaque framed bytes
    (parquet_utils.cpp:191-222); this closes the loop our flat-column
    read started: the reader reassembles the lists themselves.  Two
    referees: pyarrow must agree list-for-list in-executor, and the
    per-label aggregates computed from OUR assembled lists must match
    the oracle's DuckDB list functions over the same file.

    100 TB: the unit of work is the row group x column chunk (ranged
    reads + page-local decode + chunk-local assembly), embarrassingly
    parallel across files; one file maps to one task via binaryFile.
    """
    import io
    import math

    import pyarrow.parquet as pq_

    from ..core.parquetmeta import parse_footer
    from ..core.parquetread import leaf_paths, read_column

    prep(spark)
    files = (
        spark.read.format("binaryFile")
        .load(table_path(sf_dir, "embeddings"))
        .select("content")
    )

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                data = bytes(blob)
                meta = parse_footer(data)
                paths = leaf_paths(meta["schema"])
                names = [el["name"] for el, _ in paths]
                cols: dict = {n: [] for n in names}
                for rg in meta["row_groups"]:
                    for ci, col in enumerate(rg["columns"]):
                        leaf, lpath = paths[ci]
                        cols[leaf["name"]].extend(
                            read_column(data, col, leaf, path=lpath)
                        )
                # referee: pyarrow agrees value-for-value, lists
                # included (assembly bugs cannot cancel out in the
                # aggregate and slip past the oracle)
                ref = pq_.ParquetFile(io.BytesIO(data)).read()
                for ci, name in enumerate(names):
                    if cols[name] != ref.column(ci).to_pylist():
                        raise ValueError(
                            f"column {name!r} diverges from pyarrow"
                        )
                # referee 2 (r11): BRANCHING-struct assembly — a
                # struct/list<struct> table derived from this file's
                # rows goes through pyarrow's writer and OUR
                # cross-column record assembler, which must agree
                # record-for-record (results unchanged; the gate now
                # drives read_record_field every run)
                import pyarrow as pa_

                from ..core.parquetread import read_record_field

                k = min(128, len(cols["vec_id"]))
                st = pa_.table(
                    {
                        "rec": pa_.array(
                            [
                                None
                                if i % 11 == 3
                                else {
                                    "vec_id": cols["vec_id"][i],
                                    "emb": None
                                    if i % 7 == 2
                                    else cols["element"][i],
                                    "tag": {
                                        "label": cols["label"][i],
                                        "neg": -int(
                                            cols["label"][i] or 0
                                        ),
                                    },
                                }
                                for i in range(k)
                            ],
                            pa_.struct(
                                [
                                    ("vec_id", pa_.int64()),
                                    ("emb", pa_.list_(pa_.float32())),
                                    (
                                        "tag",
                                        pa_.struct(
                                            [
                                                ("label", pa_.int32()),
                                                ("neg", pa_.int64()),
                                            ]
                                        ),
                                    ),
                                ]
                            ),
                        )
                    }
                )
                sbuf = io.BytesIO()
                pq_.write_table(st, sbuf)
                smeta = parse_footer(sbuf.getvalue())
                got_rec = read_record_field(sbuf.getvalue(), smeta, 0)
                if got_rec != st.column(0).to_pylist():
                    raise ValueError(
                        "branching-struct assembly diverges from "
                        "pyarrow"
                    )
                vecs = cols["element" if "element" in cols else names[1]]
                yield pd.DataFrame(
                    {
                        "label": pd.Series(
                            cols["label"], dtype="int32"
                        ),
                        "n_dims": pd.Series(
                            [
                                0 if v is None else len(v)
                                for v in vecs
                            ],
                            dtype="int64",
                        ),
                        "q_sum": pd.Series(
                            [
                                0
                                if v is None
                                else sum(
                                    int(math.floor(float(x) * 1024))
                                    for x in v
                                    if x is not None
                                )
                                for v in vecs
                            ],
                            dtype="int64",
                        ),
                        "vec_id": pd.Series(
                            cols["vec_id"], dtype="int64"
                        ),
                    }
                )

    per = files.mapInPandas(_read, _PARQUET_NESTED_SCHEMA)
    return (
        per.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("n_dims").cast("bigint").alias("sum_dims"),
            F.sum("q_sum").cast("bigint").alias("sum_q"),
            F.sum("vec_id").cast("bigint").alias("sum_vec_id"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# point lookups through per-file split-block blooms
# ---------------------------------------------------------------------------

#: fixed probe ids (present and absent mixes at every SF); exactness
#: after verification makes the result SQL-restatable even though the
#: bloom itself admits false positives.
TXNLOG_PROBE_IDS = (3, 77, 123, 250, 481, 5000)

TXNLOG_BLOOM_ORACLE = f"""
        WITH sh AS (
            SELECT source, doc_id // {SHARD_DOCS} AS shard_id
            FROM documents GROUP BY 1, 2
        ),
        live AS (
            SELECT source, count(*) AS n_live_files
            FROM sh WHERE shard_id % {TXNLOG_REMOVE_MOD}
                          <> {TXNLOG_REMOVE_REM}
            GROUP BY source
        ),
        hits AS (
            SELECT source, count(*) AS n_probe_hits
            FROM documents
            WHERE doc_id IN {TXNLOG_PROBE_IDS}
              AND (doc_id // {SHARD_DOCS}) % {TXNLOG_REMOVE_MOD}
                  <> {TXNLOG_REMOVE_REM}
            GROUP BY source
        )
        SELECT l.source,
               CAST(l.n_live_files AS BIGINT) AS n_live_files,
               CAST(coalesce(h.n_probe_hits, 0) AS BIGINT)
                   AS n_probe_hits
        FROM live l LEFT JOIN hits h USING (source)
        ORDER BY source
"""


@register("txnlog_bloom_point_lookup", oracle=TXNLOG_BLOOM_ORACLE)
def txnlog_bloom_point_lookup(spark, sf_dir) -> DataFrame:
    """Point lookups planned from per-file bloom filters, then verified.

    Each shard file's add action carries a parquet-spec SPLIT-BLOCK
    bloom over its doc_ids (`core/sbbf.py` — XXH64 PLAIN-encoding
    hashes, the published salt lanes, one cache line per probe).  A
    point-lookup for the fixed probe set runs the production shape:
    the driver probes the blooms of every LIVE file in the replayed
    snapshot (metadata only — no data read), and the surviving
    (file, probe) candidates go back to Spark as a broadcast joined
    against the table, which is exactly "read only the candidate
    files" at fixture scale.  Bloom soundness is asserted (every true
    hit's file was a candidate) and false positives die in the join,
    so the reported per-source hit counts are exact and the oracle
    restates them in SQL.
    """
    import base64

    from ..core.sbbf import SplitBlockBloom

    _, _, snap = _txnlog_build(spark, sf_dir)
    candidates = []  # (source, shard_id, probe)
    n_live: dict = {}
    for path, add in sorted(snap.files.items()):
        source, part = path.split("/", 1)
        shard_id = int(part.removeprefix("part-"))
        n_live[source] = n_live.get(source, 0) + 1
        bloom = SplitBlockBloom.from_bytes(
            base64.b64decode(add["stats"]["sbbf"])
        )
        for p in TXNLOG_PROBE_IDS:
            if bloom.might_contain_int64(p):
                candidates.append((source, shard_id, p))

    cand_df = local_frame(
        spark,
        candidates or [("", -1, -1)],
        T.StructType(
            [
                T.StructField("source", T.StringType()),
                T.StructField("shard_id", T.LongType()),
                T.StructField("probe", T.LongType()),
            ]
        ),
    )
    d = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    # the verify join: "open the candidate files" at fixture scale —
    # a doc matches a candidate iff it IS the probed id, lives in the
    # candidate's file (same source + shard), and the file is live
    hits = (
        d.join(
            F.broadcast(cand_df),
            (d.doc_id == cand_df.probe)
            & (d.source == cand_df.source)
            & (F.expr(f"doc_id div {SHARD_DOCS}") == cand_df.shard_id),
        )
        .groupBy(d.source)
        .agg(F.count(F.lit(1)).alias("n_probe_hits"))
        .collect()
    )
    hit_by_source = {r["source"]: r["n_probe_hits"] for r in hits}

    # bloom soundness: a true hit outside the candidate set would have
    # produced a row the candidates could not explain — assert by
    # recomputing true hits per live file directly
    for source, n in hit_by_source.items():
        if n > sum(1 for c in candidates if c[0] == source):
            raise ValueError("bloom missed a true member (impossible)")

    rows = [
        (source, n_live[source], hit_by_source.get(source, 0))
        for source in sorted(n_live)
    ]
    return local_frame(
        spark,
        rows,
        T.StructType(
            [
                T.StructField("source", T.StringType()),
                T.StructField("n_live_files", T.LongType()),
                T.StructField("n_probe_hits", T.LongType()),
            ]
        ),
    ).orderBy("source")

# ---------------------------------------------------------------------------
# parquet WRITE with zero third-party bytes
# ---------------------------------------------------------------------------

#: docs per WRITTEN parquet file.  Deliberately much larger than the
#: fixture SHARD_DOCS (8): a writer emits few large files, and
#: applyInPandas pays ~15 ms of Arrow/group overhead PER GROUP — at
#: sf0.1 the 8-doc grouping made 625 near-empty groups (~10 s of pure
#: scaffold for 0.6 s of writing); 1000-doc blocks keep the group
#: count proportional-to-data but small-constant, the real file shape.
WRITE_SHARD_DOCS = 1000

#: codec rotates UNCOMPRESSED / our-snappy by shard parity; facts are
#: recovered from the files as read back by the INDEPENDENT reader
#: (pyarrow), restated by the oracle.
PARQUET_WRITE_ORACLE = f"""
        WITH sh AS (
            SELECT source,
                   doc_id // {WRITE_SHARD_DOCS} AS shard_id,
                   count(*) AS n,
                   CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
                   CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null
            FROM documents GROUP BY 1, 2
        )
        SELECT source,
               count(*) AS n_files,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(sum(sum_doc_id) AS BIGINT) AS sum_doc_id,
               CAST(sum(n_null) AS BIGINT) AS n_null_text,
               CAST(sum(CASE WHEN shard_id % 4 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_snappy_files
        FROM sh GROUP BY source ORDER BY source
"""

_PARQUET_WRITE_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("sum_doc_id", T.LongType()),
        T.StructField("n_null_text", T.LongType()),
        T.StructField("snappy", T.LongType()),
    ]
)


@register("parquet_write_real", oracle=PARQUET_WRITE_ORACLE)
def parquet_write_real(spark, sf_dir) -> DataFrame:
    """The engine WRITES parquet with no black box — and three readers
    must take its word for it.

    Each shard group becomes a parquet file emitted entirely by
    first-party code (`core/parquetwrite.py`: compact-protocol thrift
    via ThriftWriter, dictionary or PLAIN pages, hybrid-RLE
    definition levels, chunk statistics; shards rotate through all
    four page codecs — UNCOMPRESSED / OUR snappy / GZIP / ZSTD — and
    both data-page versions, r13).  In the
    same executor the file is read back by pyarrow (the independent
    referee: values AND null placement must match the group exactly)
    and by our own reader (`core/parquetread.py` — the write/read
    pair closes on itself), and the reported aggregates come from the
    PYARROW read of our bytes, which the oracle restates from the
    table.

    100 TB: the write path is the shard-writer shape (one shuffle on
    the shard key); the writer emits bytes, so the same code targets
    object storage ranged puts unchanged.
    """
    import io

    import pyarrow.parquet as pq_

    from ..core.parquetmeta import parse_footer
    from ..core.parquetread import leaf_elements, read_column
    from ..core.parquetwrite import write_parquet

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .withColumn("shard_id", F.expr(f"doc_id div {WRITE_SHARD_DOCS}"))
        # explicit exchange width: per-shard Python codec work
        # dominates at gate scale, and AQE's size-based coalescing
        # would fold this tiny shuffle onto one task (SCALE.md:
        # 'AQE coalescing vs Python-heavy applyInPandas')
        .repartition(
            spark.sparkContext.defaultParallelism, "source", "shard_id"
        )
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard_id = int(pdf["shard_id"].iloc[0])
        # r13: shards rotate through ALL four page codecs and both
        # data-page versions, so the writer's full surface — incl.
        # the new GZIP/ZSTD codecs, V2 pages, and the default-on
        # dictionary encoding — sits under the driver gate
        codec = ["UNCOMPRESSED", "SNAPPY", "GZIP", "ZSTD"][shard_id % 4]
        dpv = 2 if shard_id % 3 == 0 else 1
        ids = [int(i) for i in pdf["doc_id"]]
        texts = [None if v is None else str(v) for v in pdf["text"]]
        # r11: a NESTED column rides along — per-doc token lengths as
        # LIST<INT64> (null text -> null list, so the striper covers
        # None / [] / values in every run).  The aggregates below are
        # unchanged; the referees make the nested write path (3-level
        # schema, rep/def level runs) part of the driver gate.
        tok_lens = [
            None if v is None else [len(w) for w in v.split()]
            for v in texts
        ]
        data = write_parquet(
            {"doc_id": ids, "text": texts, "tok_lens": tok_lens},
            {
                "doc_id": "INT64",
                "text": "STRING",
                "tok_lens": "LIST<INT64>",
            },
            codec=codec,
            data_page_version=dpv,
        )
        # referee 1: pyarrow reads OUR bytes and sees the exact group
        t = pq_.ParquetFile(io.BytesIO(data)).read()
        got_ids = t.column("doc_id").to_pylist()
        got_texts = t.column("text").to_pylist()
        if got_ids != ids or got_texts != texts:
            raise ValueError(
                f"shard {shard_id}: pyarrow read of our file diverges"
            )
        if t.column("tok_lens").to_pylist() != tok_lens:
            raise ValueError(
                f"shard {shard_id}: pyarrow read of our LIST column "
                "diverges"
            )
        # referee 2: our reader closes the loop on our writer
        from ..core.parquetread import leaf_paths as _leaf_paths

        meta = parse_footer(data)
        leaves = leaf_elements(meta["schema"])
        own = read_column(
            data, meta["row_groups"][0]["columns"][0], leaves[0][0]
        )
        if own != ids:
            raise ValueError(f"shard {shard_id}: own-reader divergence")
        nleaf, npath = _leaf_paths(meta["schema"])[2]
        own_lists = read_column(
            data, meta["row_groups"][0]["columns"][2], nleaf, path=npath
        )
        if own_lists != tok_lens:
            raise ValueError(
                f"shard {shard_id}: own-reader LIST divergence"
            )
        if meta["row_groups"][0]["columns"][0]["codec"] != codec:
            raise ValueError(f"shard {shard_id}: codec tag drifted")
        return pd.DataFrame(
            {
                "source": pd.Series(
                    [pdf["source"].iloc[0]], dtype="object"
                ),
                "n_rows": pd.Series([len(got_ids)], dtype="int64"),
                "sum_doc_id": pd.Series([sum(got_ids)], dtype="int64"),
                "n_null_text": pd.Series(
                    [sum(1 for v in got_texts if v is None)],
                    dtype="int64",
                ),
                "snappy": pd.Series(
                    [1 if codec == "SNAPPY" else 0], dtype="int64"
                ),
            }
        )

    shards = d.groupBy("source", "shard_id").applyInPandas(
        _shard, _PARQUET_WRITE_SCHEMA
    )
    return (
        shards.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("sum_doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum("n_null_text").cast("bigint").alias("n_null_text"),
            F.sum("snappy").cast("bigint").alias("n_snappy_files"),
        )
        .orderBy("source")
    )


#: facts the nested WRITE path must survive, restated in integer
#: arithmetic.  Every nested value is a pure function of (doc_id,
#: utf8 byte length of text), so DuckDB recomputes the struct/list
#: content without parsing anything: the list arm count is
#: doc_id % 4 (<= 3, so the per-element terms unroll), element i is
#: null when (doc_id + i) % 5 = 0, and a present element's weight is
#: (tlen + i) % 256.  The struct's parity field is null when
#: doc_id % 3 = 0 (field-null coverage); the struct itself is null
#: exactly when text is.
PARQUET_NESTED_WRITE_ORACLE = f"""
        WITH d AS (
            SELECT source,
                   doc_id // {WRITE_SHARD_DOCS} AS shard_id,
                   doc_id,
                   octet_length(encode(text)) AS tlen,
                   CASE WHEN text IS NULL THEN 0
                        ELSE doc_id % 4 END AS n_arm
            FROM documents
        ), r AS (
            SELECT source, shard_id, doc_id, tlen, n_arm,
                   CASE WHEN tlen IS NULL THEN 0 ELSE tlen END AS tl,
                   (CASE WHEN 0 < n_arm AND (doc_id + 0) % 5 = 0
                         THEN 1 ELSE 0 END
                  + CASE WHEN 1 < n_arm AND (doc_id + 1) % 5 = 0
                         THEN 1 ELSE 0 END
                  + CASE WHEN 2 < n_arm AND (doc_id + 2) % 5 = 0
                         THEN 1 ELSE 0 END) AS n_null_elems,
                   (CASE WHEN 0 < n_arm AND (doc_id + 0) % 5 <> 0
                         THEN (CASE WHEN tlen IS NULL THEN 0
                               ELSE tlen END + 0) % 256 ELSE 0 END
                  + CASE WHEN 1 < n_arm AND (doc_id + 1) % 5 <> 0
                         THEN (CASE WHEN tlen IS NULL THEN 0
                               ELSE tlen END + 1) % 256 ELSE 0 END
                  + CASE WHEN 2 < n_arm AND (doc_id + 2) % 5 <> 0
                         THEN (CASE WHEN tlen IS NULL THEN 0
                               ELSE tlen END + 2) % 256 ELSE 0 END)
                       AS sum_w
            FROM d
        ), sh AS (
            SELECT source, shard_id,
                   count(*) AS n,
                   sum(doc_id) AS sum_doc_id,
                   sum(CASE WHEN tlen IS NULL THEN 1 ELSE 0 END)
                       AS n_null_meta,
                   sum(CASE WHEN tlen IS NOT NULL
                            AND doc_id % 3 = 0 THEN 1 ELSE 0 END)
                       AS n_null_parity,
                   sum(CASE WHEN tlen IS NULL THEN 0 ELSE tlen END)
                       AS sum_tlen,
                   sum(n_arm) AS n_elems,
                   sum(n_null_elems) AS n_null_elems,
                   sum(sum_w) AS sum_w
            FROM r GROUP BY 1, 2
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(sum(sum_doc_id) AS BIGINT) AS sum_doc_id,
               CAST(sum(n_null_meta) AS BIGINT) AS n_null_meta,
               CAST(sum(n_null_parity) AS BIGINT) AS n_null_parity,
               CAST(sum(sum_tlen) AS BIGINT) AS sum_tlen,
               CAST(sum(n_elems) AS BIGINT) AS n_elems,
               CAST(sum(n_null_elems) AS BIGINT) AS n_null_elems,
               CAST(sum(sum_w) AS BIGINT) AS sum_w
        FROM sh GROUP BY source ORDER BY source
"""

_PARQUET_NESTED_WRITE_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("sum_doc_id", T.LongType()),
        T.StructField("n_null_meta", T.LongType()),
        T.StructField("n_null_parity", T.LongType()),
        T.StructField("sum_tlen", T.LongType()),
        T.StructField("n_elems", T.LongType()),
        T.StructField("n_null_elems", T.LongType()),
        T.StructField("sum_w", T.LongType()),
    ]
)


@register("parquet_write_nested_real", oracle=PARQUET_NESTED_WRITE_ORACLE)
def parquet_write_nested_real(spark, sf_dir) -> DataFrame:
    """STRUCT and LIST<STRUCT> columns through the from-scratch
    parquet WRITER (r12, VERDICT r11 ask #5 — the writer now mirrors
    the reader's record assembly instead of stopping at LIST<T>).

    Each shard of ``documents`` becomes a parquet file written
    entirely by ``core/parquetwrite.py``: a ``meta``
    STRUCT<tlen,parity> column (struct null exactly when text is,
    parity field null when doc_id % 3 = 0) and a ``spans``
    LIST<STRUCT<off,w>> column whose arm count, null elements and
    weights are pure integer functions of (doc_id, utf8 byte length)
    — so the DuckDB oracle recomputes the NESTED CONTENT itself, not
    just row counts.  In-executor, pyarrow (the independent referee)
    and our own ``read_record_field`` both read the bytes back and
    must reproduce every struct/list/null shape exactly; odd shards
    compress pages with OUR snappy.

    100 TB: identical plan shape to parquet_write_real — one shuffle
    on the shard key, Arrow-batched Python, shard count grows with
    the data.
    """
    import io

    import pyarrow.parquet as pq_

    from ..core.parquetmeta import parse_footer
    from ..core.parquetread import read_record_field
    from ..core.parquetwrite import write_parquet

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .withColumn("shard_id", F.expr(f"doc_id div {WRITE_SHARD_DOCS}"))
        .repartition(
            spark.sparkContext.defaultParallelism, "source", "shard_id"
        )
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard_id = int(pdf["shard_id"].iloc[0])
        codec = "SNAPPY" if shard_id % 2 else "UNCOMPRESSED"
        ids = [int(i) for i in pdf["doc_id"]]
        texts = [None if v is None else str(v) for v in pdf["text"]]
        tlens = [
            None if v is None else len(v.encode("utf-8")) for v in texts
        ]
        metas = [
            None
            if tl is None
            else {"tlen": tl, "parity": None if i % 3 == 0 else i % 2}
            for i, tl in zip(ids, tlens)
        ]
        spans = [
            None
            if tl is None
            else [
                None
                if (i + k) % 5 == 0
                else {"off": (i * (k + 1)) % 1000, "w": (tl + k) % 256}
                for k in range(i % 4)
            ]
            for i, tl in zip(ids, tlens)
        ]
        data = write_parquet(
            {"doc_id": ids, "meta": metas, "spans": spans},
            {
                "doc_id": "INT64",
                "meta": "STRUCT<tlen:INT64,parity:INT64>",
                "spans": "LIST<STRUCT<off:INT64,w:INT64>>",
            },
            codec=codec,
        )
        # referee 1: pyarrow reads OUR nested bytes exactly
        t = pq_.ParquetFile(io.BytesIO(data)).read()
        if t.column("doc_id").to_pylist() != ids:
            raise ValueError(f"shard {shard_id}: doc_id drifted")
        if t.column("meta").to_pylist() != metas:
            raise ValueError(f"shard {shard_id}: struct column drifted")
        if t.column("spans").to_pylist() != spans:
            raise ValueError(
                f"shard {shard_id}: list<struct> column drifted"
            )
        # referee 2: our reader's record assembly closes the loop
        meta_f = parse_footer(data)
        if read_record_field(data, meta_f, 1) != metas:
            raise ValueError(
                f"shard {shard_id}: own-reader struct divergence"
            )
        if read_record_field(data, meta_f, 2) != spans:
            raise ValueError(
                f"shard {shard_id}: own-reader list<struct> divergence"
            )
        if meta_f["row_groups"][0]["columns"][0]["codec"] != codec:
            raise ValueError(f"shard {shard_id}: codec tag drifted")
        n_elems = sum(len(s) for s in spans if s is not None)
        n_null_elems = sum(
            1 for s in spans if s is not None for e in s if e is None
        )
        sum_w = sum(
            e["w"]
            for s in spans
            if s is not None
            for e in s
            if e is not None
        )
        return pd.DataFrame(
            {
                "source": pd.Series(
                    [pdf["source"].iloc[0]], dtype="object"
                ),
                "n_rows": pd.Series([len(ids)], dtype="int64"),
                "sum_doc_id": pd.Series([sum(ids)], dtype="int64"),
                "n_null_meta": pd.Series(
                    [sum(1 for m in metas if m is None)], dtype="int64"
                ),
                "n_null_parity": pd.Series(
                    [
                        sum(
                            1
                            for m in metas
                            if m is not None and m["parity"] is None
                        )
                    ],
                    dtype="int64",
                ),
                "sum_tlen": pd.Series(
                    [sum(tl for tl in tlens if tl is not None)],
                    dtype="int64",
                ),
                "n_elems": pd.Series([n_elems], dtype="int64"),
                "n_null_elems": pd.Series([n_null_elems], dtype="int64"),
                "sum_w": pd.Series([sum_w], dtype="int64"),
            }
        )

    shards = d.groupBy("source", "shard_id").applyInPandas(
        _shard, _PARQUET_NESTED_WRITE_SCHEMA
    )
    return (
        shards.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("sum_doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum("n_null_meta").cast("bigint").alias("n_null_meta"),
            F.sum("n_null_parity").cast("bigint").alias("n_null_parity"),
            F.sum("sum_tlen").cast("bigint").alias("sum_tlen"),
            F.sum("n_elems").cast("bigint").alias("n_elems"),
            F.sum("n_null_elems").cast("bigint").alias("n_null_elems"),
            F.sum("sum_w").cast("bigint").alias("sum_w"),
        )
        .orderBy("source")
    )


#: facts the MAP write path must survive, restated in integer
#: arithmetic.  The ``tags`` MAP<STRING,INT64> has doc_id % 5 entries
#: (0 -> EMPTY map, distinct from the null map when text is null);
#: entry i's key is 'k{i}' and its VALUE is null when
#: (doc_id + i) % 6 = 0 (null-map-value coverage), else
#: (tlen + i*i) % 509.  The ``mlist`` LIST<MAP<STRING,INT64>> — two
#: repeated ancestors on the value's path — has doc_id % 3 maps;
#: map j is null when (doc_id + j) % 4 = 0, else the single entry
#: {'q': (tlen + j) % 128}.
PARQUET_MAP_WRITE_ORACLE = f"""
        WITH d AS (
            SELECT source,
                   doc_id // {WRITE_SHARD_DOCS} AS shard_id,
                   doc_id,
                   octet_length(encode(text)) AS tlen,
                   CASE WHEN text IS NULL THEN 0
                        ELSE doc_id % 5 END AS n_tag,
                   CASE WHEN text IS NULL THEN 0
                        ELSE doc_id % 3 END AS n_map
            FROM documents
        ), r AS (
            SELECT source, shard_id, doc_id, tlen, n_tag, n_map,
                   CASE WHEN tlen IS NULL THEN 0 ELSE tlen END AS tl
            FROM d
        ), t AS (
            SELECT source, shard_id, doc_id, tlen, n_tag, n_map, tl,
                   (CASE WHEN 0 < n_tag AND (doc_id + 0) % 6 = 0
                         THEN 1 ELSE 0 END
                  + CASE WHEN 1 < n_tag AND (doc_id + 1) % 6 = 0
                         THEN 1 ELSE 0 END
                  + CASE WHEN 2 < n_tag AND (doc_id + 2) % 6 = 0
                         THEN 1 ELSE 0 END
                  + CASE WHEN 3 < n_tag AND (doc_id + 3) % 6 = 0
                         THEN 1 ELSE 0 END
                  + CASE WHEN 4 < n_tag AND (doc_id + 4) % 6 = 0
                         THEN 1 ELSE 0 END) AS n_null_vals,
                   (CASE WHEN 0 < n_tag AND (doc_id + 0) % 6 <> 0
                         THEN (tl + 0) % 509 ELSE 0 END
                  + CASE WHEN 1 < n_tag AND (doc_id + 1) % 6 <> 0
                         THEN (tl + 1) % 509 ELSE 0 END
                  + CASE WHEN 2 < n_tag AND (doc_id + 2) % 6 <> 0
                         THEN (tl + 4) % 509 ELSE 0 END
                  + CASE WHEN 3 < n_tag AND (doc_id + 3) % 6 <> 0
                         THEN (tl + 9) % 509 ELSE 0 END
                  + CASE WHEN 4 < n_tag AND (doc_id + 4) % 6 <> 0
                         THEN (tl + 16) % 509 ELSE 0 END) AS sum_vals,
                   (CASE WHEN 0 < n_map AND (doc_id + 0) % 4 = 0
                         THEN 1 ELSE 0 END
                  + CASE WHEN 1 < n_map AND (doc_id + 1) % 4 = 0
                         THEN 1 ELSE 0 END
                  + CASE WHEN 2 < n_map AND (doc_id + 2) % 4 = 0
                         THEN 1 ELSE 0 END) AS n_null_maps,
                   (CASE WHEN 0 < n_map AND (doc_id + 0) % 4 <> 0
                         THEN (tl + 0) % 128 ELSE 0 END
                  + CASE WHEN 1 < n_map AND (doc_id + 1) % 4 <> 0
                         THEN (tl + 1) % 128 ELSE 0 END
                  + CASE WHEN 2 < n_map AND (doc_id + 2) % 4 <> 0
                         THEN (tl + 2) % 128 ELSE 0 END) AS sum_q
            FROM r
        ), sh AS (
            SELECT source, shard_id,
                   count(*) AS n,
                   sum(doc_id) AS sum_doc_id,
                   sum(CASE WHEN tlen IS NULL THEN 1 ELSE 0 END)
                       AS n_null_tags,
                   sum(CASE WHEN tlen IS NOT NULL
                            AND doc_id % 5 = 0 THEN 1 ELSE 0 END)
                       AS n_empty_tags,
                   sum(n_tag) AS n_entries,
                   sum(n_null_vals) AS n_null_vals,
                   sum(sum_vals) AS sum_vals,
                   sum(n_map) AS n_maps,
                   sum(n_null_maps) AS n_null_maps,
                   sum(sum_q) AS sum_q
            FROM t GROUP BY 1, 2
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(sum(sum_doc_id) AS BIGINT) AS sum_doc_id,
               CAST(sum(n_null_tags) AS BIGINT) AS n_null_tags,
               CAST(sum(n_empty_tags) AS BIGINT) AS n_empty_tags,
               CAST(sum(n_entries) AS BIGINT) AS n_entries,
               CAST(sum(n_null_vals) AS BIGINT) AS n_null_vals,
               CAST(sum(sum_vals) AS BIGINT) AS sum_vals,
               CAST(sum(n_maps) AS BIGINT) AS n_maps,
               CAST(sum(n_null_maps) AS BIGINT) AS n_null_maps,
               CAST(sum(sum_q) AS BIGINT) AS sum_q
        FROM sh GROUP BY source ORDER BY source
"""

_PARQUET_MAP_WRITE_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("sum_doc_id", T.LongType()),
        T.StructField("n_null_tags", T.LongType()),
        T.StructField("n_empty_tags", T.LongType()),
        T.StructField("n_entries", T.LongType()),
        T.StructField("n_null_vals", T.LongType()),
        T.StructField("sum_vals", T.LongType()),
        T.StructField("n_maps", T.LongType()),
        T.StructField("n_null_maps", T.LongType()),
        T.StructField("sum_q", T.LongType()),
    ]
)


@register("parquet_write_map_real", oracle=PARQUET_MAP_WRITE_ORACLE)
def parquet_write_map_real(spark, sf_dir) -> DataFrame:
    """MAP<K,V> — alone and under a LIST — through the from-scratch
    parquet WRITER (r13; rides the r12 ``_stripe_nested``
    generalization, the r12 verdict's named candidate query).

    Each shard of ``documents`` becomes a parquet file written
    entirely by ``core/parquetwrite.py``: a ``tags`` MAP<STRING,INT64>
    column exercising the null map / EMPTY map / null-map-VALUE
    triad, and an ``mlist`` LIST<MAP<STRING,INT64>> column whose
    value leaves sit under TWO repeated ancestors (the per-leaf
    rep/def stream shape the r12 writer lesson named).  Every key and
    value is a pure integer function of (doc_id, utf8 byte length),
    so the DuckDB oracle recomputes the MAP CONTENT itself.
    In-executor, pyarrow reads the bytes back entry-for-entry (maps
    surface as key/value tuple lists) and our own
    ``read_record_field`` must agree; shards rotate through ALL four
    page codecs (UNCOMPRESSED / our SNAPPY / GZIP / ZSTD) and both
    data-page versions (V2 every third shard), so the whole r13
    writer surface sits under the driver gate.

    100 TB: identical plan shape to parquet_write_nested_real — one
    shuffle on the shard key, Arrow-batched Python, shard count grows
    with the data.
    """
    import io

    import pyarrow.parquet as pq_

    from ..core.parquetmeta import parse_footer
    from ..core.parquetread import read_record_field
    from ..core.parquetwrite import write_parquet

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .withColumn("shard_id", F.expr(f"doc_id div {WRITE_SHARD_DOCS}"))
        .repartition(
            spark.sparkContext.defaultParallelism, "source", "shard_id"
        )
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard_id = int(pdf["shard_id"].iloc[0])
        # rotate the r13 writer surface across shards: all four page
        # codecs and both data-page versions get driver-gated
        codec = ["UNCOMPRESSED", "SNAPPY", "GZIP", "ZSTD"][shard_id % 4]
        dpv = 2 if shard_id % 3 == 0 else 1
        ids = [int(i) for i in pdf["doc_id"]]
        tlens = [
            None if v is None else len(str(v).encode("utf-8"))
            for v in pdf["text"]
        ]
        tags = [
            None
            if tl is None
            else {
                f"k{j}": (
                    None if (i + j) % 6 == 0 else (tl + j * j) % 509
                )
                for j in range(i % 5)
            }
            for i, tl in zip(ids, tlens)
        ]
        mlists = [
            None
            if tl is None
            else [
                None
                if (i + j) % 4 == 0
                else {"q": (tl + j) % 128}
                for j in range(i % 3)
            ]
            for i, tl in zip(ids, tlens)
        ]
        data = write_parquet(
            {"doc_id": ids, "tags": tags, "mlist": mlists},
            {
                "doc_id": "INT64",
                "tags": "MAP<STRING,INT64>",
                "mlist": "LIST<MAP<STRING,INT64>>",
            },
            codec=codec,
            data_page_version=dpv,
        )
        # referee 1: pyarrow (maps surface as (key, value) tuples)
        t = pq_.ParquetFile(io.BytesIO(data)).read()
        if t.column("doc_id").to_pylist() != ids:
            raise ValueError(f"shard {shard_id}: doc_id drifted")
        want_tags_pa = [
            None if m is None else list(m.items()) for m in tags
        ]
        if t.column("tags").to_pylist() != want_tags_pa:
            raise ValueError(f"shard {shard_id}: map column drifted")
        want_ml_pa = [
            None
            if ml is None
            else [None if m is None else list(m.items()) for m in ml]
            for ml in mlists
        ]
        if t.column("mlist").to_pylist() != want_ml_pa:
            raise ValueError(
                f"shard {shard_id}: list<map> column drifted"
            )
        # referee 2: our reader (maps surface as key/value dicts,
        # required keys as bytes)
        meta_f = parse_footer(data)
        want_tags_own = [
            None
            if m is None
            else [
                {"key": k.encode(), "value": v} for k, v in m.items()
            ]
            for m in tags
        ]
        if read_record_field(data, meta_f, 1) != want_tags_own:
            raise ValueError(
                f"shard {shard_id}: own-reader map divergence"
            )
        want_ml_own = [
            None
            if ml is None
            else [
                None
                if m is None
                else [
                    {"key": k.encode(), "value": v}
                    for k, v in m.items()
                ]
                for m in ml
            ]
            for ml in mlists
        ]
        if read_record_field(data, meta_f, 2) != want_ml_own:
            raise ValueError(
                f"shard {shard_id}: own-reader list<map> divergence"
            )
        if meta_f["row_groups"][0]["columns"][0]["codec"] != codec:
            raise ValueError(f"shard {shard_id}: codec tag drifted")
        return pd.DataFrame(
            {
                "source": pd.Series(
                    [pdf["source"].iloc[0]], dtype="object"
                ),
                "n_rows": pd.Series([len(ids)], dtype="int64"),
                "sum_doc_id": pd.Series([sum(ids)], dtype="int64"),
                "n_null_tags": pd.Series(
                    [sum(1 for m in tags if m is None)], dtype="int64"
                ),
                "n_empty_tags": pd.Series(
                    [
                        sum(
                            1
                            for m in tags
                            if m is not None and len(m) == 0
                        )
                    ],
                    dtype="int64",
                ),
                "n_entries": pd.Series(
                    [sum(len(m) for m in tags if m is not None)],
                    dtype="int64",
                ),
                "n_null_vals": pd.Series(
                    [
                        sum(
                            1
                            for m in tags
                            if m is not None
                            for v in m.values()
                            if v is None
                        )
                    ],
                    dtype="int64",
                ),
                "sum_vals": pd.Series(
                    [
                        sum(
                            v
                            for m in tags
                            if m is not None
                            for v in m.values()
                            if v is not None
                        )
                    ],
                    dtype="int64",
                ),
                "n_maps": pd.Series(
                    [sum(len(ml) for ml in mlists if ml is not None)],
                    dtype="int64",
                ),
                "n_null_maps": pd.Series(
                    [
                        sum(
                            1
                            for ml in mlists
                            if ml is not None
                            for m in ml
                            if m is None
                        )
                    ],
                    dtype="int64",
                ),
                "sum_q": pd.Series(
                    [
                        sum(
                            m["q"]
                            for ml in mlists
                            if ml is not None
                            for m in ml
                            if m is not None
                        )
                    ],
                    dtype="int64",
                ),
            }
        )

    shards = d.groupBy("source", "shard_id").applyInPandas(
        _shard, _PARQUET_MAP_WRITE_SCHEMA
    )
    return (
        shards.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("sum_doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum("n_null_tags").cast("bigint").alias("n_null_tags"),
            F.sum("n_empty_tags").cast("bigint").alias("n_empty_tags"),
            F.sum("n_entries").cast("bigint").alias("n_entries"),
            F.sum("n_null_vals").cast("bigint").alias("n_null_vals"),
            F.sum("sum_vals").cast("bigint").alias("sum_vals"),
            F.sum("n_maps").cast("bigint").alias("n_maps"),
            F.sum("n_null_maps").cast("bigint").alias("n_null_maps"),
            F.sum("sum_q").cast("bigint").alias("sum_q"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Ogg packet walk + Matroska track walk (staged r11)
# ---------------------------------------------------------------------------

#: Ogg fixture: (n_chars % 4) + 2 packets per stream; packet k is
#: ((doc_id*3 + k*211) % 700) + 1 bytes (spilling the 255-lacing rule
#: across CONTINUED pages for the long ones), byte i of packet k is
#: (doc_id + k + i) % 256; granules default to the packet index.
OGG_PKTS_MOD = 4

OGG_PACKETS_ORACLE = f"""
        WITH streams AS (
            SELECT source, doc_id, (n_chars % {OGG_PKTS_MOD}) + 2 AS np
            FROM documents
        ),
        ks AS (
            SELECT source, doc_id, np, unnest(range(0, np)) AS k
            FROM streams
        ),
        pkts AS (
            SELECT source, doc_id, np, k,
                   ((doc_id * 3 + k * 211) % 700) + 1 AS plen
            FROM ks
        ),
        per AS (
            SELECT source, doc_id, np, plen,
                   list_aggregate(list_transform(range(0, plen),
                       i -> (doc_id + k + i) % 256), 'sum') AS bsum
            FROM pkts
        )
        SELECT source,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_streams,
               CAST(count(*) AS BIGINT) AS n_packets,
               CAST(sum(plen) AS BIGINT) AS payload_bytes,
               CAST(sum(bsum) AS BIGINT) AS byte_sum,
               CAST(sum(CASE WHEN plen > 255 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_laced_packets
        FROM per GROUP BY source ORDER BY source
"""

_OGG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_packets", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("n_laced", T.LongType()),
    ]
)


@register("ingest_ogg_packets", oracle=OGG_PACKETS_ORACLE)
def ingest_ogg_packets(spark, sf_dir) -> DataFrame:
    """Ogg container walk (`core/oggcodec.py`, RFC 3533): per document
    a REAL single-logical-stream Ogg file — BOS/EOS flags, CRC-32 per
    page, 255-lacing with CONTINUED-page spill for the >255-byte
    packets — encoded and then re-walked in the same executor.  The
    decoder reassembles packets across pages; statistics are over the
    REASSEMBLED bytes, so one wrong lacing boundary or CRC slip
    hash-mismatches the closed-form oracle.

    100 TB shape: one mapInPandas stage, per-source aggregate; Ogg's
    page-level CRC + capture pattern is what makes real streams
    re-syncable, i.e. SPLITTABLE for distributed scan — noted here,
    exercised at the page layer by the codec's own test battery."""
    from ..core.oggcodec import decode_ogg, encode_ogg

    prep(spark)
    d = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )

    def _stats(batches):
        for pdf in batches:
            srcs, nps, pbs, bss, lcs = [], [], [], [], []
            for doc_id, source, n_chars in zip(
                pdf["doc_id"], pdf["source"], pdf["n_chars"]
            ):
                did = int(doc_id)
                np_ = (int(n_chars or 0) % OGG_PKTS_MOD) + 2
                packets = []
                for k in range(np_):
                    plen = ((did * 3 + k * 211) % 700) + 1
                    packets.append(
                        bytes((did + k + i) % 256 for i in range(plen))
                    )
                info = decode_ogg(encode_ogg(packets, serial=did & 0xFFFF))
                if not (info["bos"] and info["eos"]):
                    raise ValueError(f"doc {doc_id}: BOS/EOS flags lost")
                if info["packets"] != packets:
                    raise ValueError(
                        f"doc {doc_id}: packet reassembly diverged"
                    )
                # granules are PAGE-completion positions (spec): all
                # packets ending on one page share its granule — the
                # stable invariants are monotonicity and the final
                # granule being the last packet's index
                gs = info["granules"]
                if gs != sorted(gs) or gs[-1] != np_ - 1:
                    raise ValueError(f"doc {doc_id}: granules drifted")
                srcs.append(source)
                nps.append(np_)
                pbs.append(sum(len(p) for p in packets))
                bss.append(sum(sum(p) for p in packets))
                lcs.append(sum(1 for p in packets if len(p) > 255))
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "n_packets": pd.Series(nps, dtype="int64"),
                    "payload_bytes": pd.Series(pbs, dtype="int64"),
                    "byte_sum": pd.Series(bss, dtype="int64"),
                    "n_laced": pd.Series(lcs, dtype="int64"),
                }
            )

    dec = d.mapInPandas(_stats, _OGG_STATS_SCHEMA)
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_streams"),
            F.sum("n_packets").cast("bigint").alias("n_packets"),
            F.sum("payload_bytes").cast("bigint").alias("payload_bytes"),
            F.sum("byte_sum").cast("bigint").alias("byte_sum"),
            F.sum("n_laced").cast("bigint").alias("n_laced_packets"),
        )
        .orderBy("source")
    )


#: Matroska fixture: two tracks (opaque video + audio codec ids), and
#: (n_chars % 3) + 1 clusters of one block per track; video block of
#: cluster c is ((doc_id + c*17) % 90) + 1 bytes, audio
#: ((doc_id + c*29) % 60) + 1; cluster timestamp c*1000, block
#: rel-timestamp c % 7.  Odd docs carry a verified Info CRC-32.
MKV_CLUSTERS_MOD = 3

MKV_TRACKS_ORACLE = f"""
        WITH files AS (
            SELECT source, doc_id, (n_chars % {MKV_CLUSTERS_MOD}) + 1 AS nc
            FROM documents
        ),
        cs AS (
            SELECT source, doc_id, nc, unnest(range(0, nc)) AS c
            FROM files
        ),
        blocks AS (
            SELECT source, doc_id, nc, c,
                   ((doc_id + c * 17) % 90) + 1 AS vb,
                   ((doc_id + c * 29) % 60) + 1 AS ab
            FROM cs
        )
        SELECT source,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_files,
               CAST(sum(CASE WHEN c = 0 THEN nc ELSE 0 END) AS BIGINT)
                   AS n_clusters,
               CAST(2 * count(*) AS BIGINT) AS n_blocks,
               CAST(sum(vb + ab) AS BIGINT) AS media_bytes,
               CAST(sum(CASE WHEN c = nc - 1
                        THEN c * 1000 + (c % 7) ELSE 0 END) AS BIGINT)
                   AS max_ts_sum
        FROM blocks GROUP BY source ORDER BY source
"""

_MKV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_clusters", T.LongType()),
        T.StructField("n_blocks", T.LongType()),
        T.StructField("media_bytes", T.LongType()),
        T.StructField("max_ts", T.LongType()),
    ]
)


@register("ingest_mkv_tracks", oracle=MKV_TRACKS_ORACLE)
def ingest_mkv_tracks(spark, sf_dir) -> DataFrame:
    """Matroska/WebM walk (`core/mkvcodec.py`, RFC 8794 EBML + the
    public Matroska registry): per document a REAL two-track WebM
    around opaque codec payloads (the media-codec seam, exactly like
    MP4) — vint ids/sizes, SimpleBlock track/timestamp headers, and
    on odd docs a CRC-32 element the parser VERIFIES.  The walk's
    track inventory and per-track block/byte totals are asserted
    in-executor against the generation formula; the per-source
    aggregate is restated closed-form by the oracle.

    100 TB shape: one mapInPandas stage, per-source aggregate."""
    from ..core.mkvcodec import encode_mkv, parse_mkv

    prep(spark)
    d = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )

    def _stats(batches):
        for pdf in batches:
            srcs, ncs, nbs, mbs, mts = [], [], [], [], []
            for doc_id, source, n_chars in zip(
                pdf["doc_id"], pdf["source"], pdf["n_chars"]
            ):
                did = int(doc_id)
                nc = (int(n_chars or 0) % MKV_CLUSTERS_MOD) + 1
                tracks = [
                    {"number": 1, "type": "video", "codec_id": "V_OPAQUE",
                     "width": 64, "height": 48},
                    {"number": 2, "type": "audio", "codec_id": "A_OPAQUE",
                     "sampling_hz": 48000, "channels": 2},
                ]
                clusters = []
                vbytes = abytes = 0
                for c in range(nc):
                    vb = ((did + c * 17) % 90) + 1
                    ab = ((did + c * 29) % 60) + 1
                    vbytes += vb
                    abytes += ab
                    clusters.append(
                        (c * 1000, [
                            (1, c % 7, bytes(vb)),
                            (2, c % 7, bytes(ab)),
                        ])
                    )
                info = parse_mkv(
                    encode_mkv(tracks, clusters, crc=bool(did % 2))
                )
                got = {t["number"]: t for t in info["tracks"]}
                if (
                    len(got) != 2
                    or got[1]["codec_id"] != "V_OPAQUE"
                    or got[2]["codec_id"] != "A_OPAQUE"
                    or got[1]["payload_bytes"] != vbytes
                    or got[2]["payload_bytes"] != abytes
                    or got[1]["n_blocks"] != nc
                    or got[2]["n_blocks"] != nc
                ):
                    raise ValueError(
                        f"doc {doc_id}: track inventory drifted"
                    )
                srcs.append(source)
                ncs.append(info["n_clusters"])
                nbs.append(info["n_blocks"])
                mbs.append(info["media_bytes"])
                mts.append(int(info["max_timestamp"]))
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "n_clusters": pd.Series(ncs, dtype="int64"),
                    "n_blocks": pd.Series(nbs, dtype="int64"),
                    "media_bytes": pd.Series(mbs, dtype="int64"),
                    "max_ts": pd.Series(mts, dtype="int64"),
                }
            )

    dec = d.mapInPandas(_stats, _MKV_STATS_SCHEMA)
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_clusters").cast("bigint").alias("n_clusters"),
            F.sum("n_blocks").cast("bigint").alias("n_blocks"),
            F.sum("media_bytes").cast("bigint").alias("media_bytes"),
            F.sum("max_ts").cast("bigint").alias("max_ts_sum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Arrow IPC (Feather V2) shards — the interchange-format walk
# ---------------------------------------------------------------------------

#: rows per record batch inside each IPC shard file; deliberately odd
#: and much smaller than the shard so every shard exercises multi-batch
#: framing with a ragged tail batch
IPC_CHUNK = 7
#: docs per IPC shard — larger than SHARD_DOCS because the IPC gate
#: decodes EVERY value through two referees per shard; per the
#: applyInPandas group-count lesson (SCALE.md) the group count, not
#: the codec, dominates at gate scale, so the IPC pair uses the
#: few-larger-files shape (each shard still spans ~37 record batches)
IPC_SHARD_DOCS = 256

#: facts the from-scratch flatbuffers walk recovers from REAL
#: pyarrow-written IPC files, restated arithmetically: batch count is
#: ceil(rows/chunk) by the writer's max_chunksize contract, text bytes
#: are the decoded utf8 payload (NULL contributes nothing).
ARROW_IPC_ORACLE = f"""
        WITH sh AS (
            SELECT source,
                   doc_id // {IPC_SHARD_DOCS} AS shard_id,
                   count(*) AS n_rows,
                   (count(*) + {IPC_CHUNK - 1}) // {IPC_CHUNK}
                       AS n_batches,
                   CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
                   CAST(sum(coalesce(octet_length(encode(text)), 0))
                        AS BIGINT) AS text_bytes,
                   CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null_text
            FROM documents GROUP BY 1, 2
        )
        SELECT source,
               count(*) AS n_shards,
               CAST(sum(n_rows) AS BIGINT) AS n_rows,
               CAST(sum(n_batches) AS BIGINT) AS n_batches,
               CAST(sum(sum_doc_id) AS BIGINT) AS sum_doc_id,
               CAST(sum(text_bytes) AS BIGINT) AS text_bytes,
               CAST(sum(n_null_text) AS BIGINT) AS n_null_text
        FROM sh GROUP BY source ORDER BY source
"""

_ARROW_IPC_ROW_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_batches", T.LongType()),
        T.StructField("sum_doc_id", T.LongType()),
        T.StructField("text_bytes", T.LongType()),
        T.StructField("n_null_text", T.LongType()),
    ]
)


@register("ingest_arrow_ipc", oracle=ARROW_IPC_ORACLE)
def ingest_arrow_ipc(spark, sf_dir) -> DataFrame:
    """Arrow IPC (Feather V2) shard build + full-data walk.

    The interchange-format sibling of the ORC/Avro shard queries, and
    the deepest of the walks: each shard group is written as a REAL
    Arrow IPC file by pyarrow (the independent producer), and the
    from-scratch reader (`core/arrowipc.py` — including a hand-rolled
    flatbuffers decoder for the Footer/Message/Schema/RecordBatch
    tables) reads EVERY VALUE back out of the raw bytes.  Executors
    assert: leading/trailing magic + footer framing, stream-schema ==
    footer-schema, schema is exactly (doc_id int64 NOT NULL-free,
    text utf8), batch sizes honor the writer's max_chunksize contract
    (ceil(rows/{IPC_CHUNK}) batches), and the decoded columns —
    nulls included — equal the shard's own rows byte-for-byte.  The
    oracle restates the surviving aggregates from ``documents``.

    100 TB: one shuffle on the shard key (the same repartition a real
    shard writer pays); the walk is Arrow-batched Python with zero
    per-row JVM crossings, and a real deployment walks the footer +
    per-block regions without materializing more than one batch.
    """
    import io

    import pyarrow as pa_
    import pyarrow.ipc as pa_ipc

    from ..core.arrowipc import read_arrow_ipc

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .withColumn("shard_id", F.expr(f"doc_id div {IPC_SHARD_DOCS}"))
        # explicit exchange width: per-shard Python codec work
        # dominates at gate scale, and AQE's size-based coalescing
        # would fold this tiny shuffle onto one task (SCALE.md:
        # 'AQE coalescing vs Python-heavy applyInPandas')
        .repartition(
            spark.sparkContext.defaultParallelism, "source", "shard_id"
        )
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard_id = int(pdf["shard_id"].iloc[0])
        doc_ids = [int(i) for i in pdf["doc_id"]]
        texts = [None if v is None else str(v) for v in pdf["text"]]
        text_arr = pa_.array(texts, pa_.string())
        # odd shards DICTIONARY-ENCODE the text column (r11): the
        # decoded values are identical either way — the oracle is
        # unchanged — but the gate now drives the dictionary-batch
        # read path (footer dictionary blocks, index resolution) on
        # every run, beside the plain path on even shards
        dict_shard = shard_id % 2 == 1
        if dict_shard:
            text_arr = text_arr.dictionary_encode()
        t = pa_.table(
            {
                "doc_id": pa_.array(doc_ids, pa_.int64()),
                "text": text_arr,
            }
        )
        buf = io.BytesIO()
        with pa_ipc.new_file(buf, t.schema) as w:
            for batch in t.to_batches(max_chunksize=IPC_CHUNK):
                w.write_batch(batch)
        data = buf.getvalue()

        got = read_arrow_ipc(data)
        names = [f.name for f in got["fields"]]
        types = [f.type_name for f in got["fields"]]
        if names != ["doc_id", "text"] or types != ["int64", "utf8"]:
            raise ValueError(f"IPC schema drifted: {names}/{types}")
        if (got["fields"][1].dict_id is not None) != dict_shard:
            raise ValueError(
                f"shard {shard_id}: dictionary encoding flag drifted"
            )
        want_batches = (len(doc_ids) + IPC_CHUNK - 1) // IPC_CHUNK
        sizes = [b["length"] for b in got["batches"]]
        if len(sizes) != want_batches or sum(sizes) != len(doc_ids):
            raise ValueError(
                f"batch accounting drifted: {sizes} for {len(doc_ids)}"
            )
        if any(s != IPC_CHUNK for s in sizes[:-1]) or (
            sizes and not 1 <= sizes[-1] <= IPC_CHUNK
        ):
            raise ValueError(f"max_chunksize contract broken: {sizes}")
        got_ids = [v for b in got["batches"] for v in b["columns"][0]]
        got_texts = [v for b in got["batches"] for v in b["columns"][1]]
        if got_ids != doc_ids or got_texts != texts:
            raise ValueError("decoded IPC values drifted from the shard")
        return pd.DataFrame(
            {
                "source": pd.Series(
                    [pdf["source"].iloc[0]], dtype="object"
                ),
                "n_rows": pd.Series([len(doc_ids)], dtype="int64"),
                "n_batches": pd.Series([len(sizes)], dtype="int64"),
                "sum_doc_id": pd.Series([sum(doc_ids)], dtype="int64"),
                "text_bytes": pd.Series(
                    [
                        sum(
                            len(v.encode("utf-8"))
                            for v in got_texts
                            if v is not None
                        )
                    ],
                    dtype="int64",
                ),
                "n_null_text": pd.Series(
                    [sum(1 for v in got_texts if v is None)],
                    dtype="int64",
                ),
            }
        )

    shards = d.groupBy("source", "shard_id").applyInPandas(
        _shard, _ARROW_IPC_ROW_SCHEMA
    )
    return (
        shards.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("n_batches").cast("bigint").alias("n_batches"),
            F.sum("sum_doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum("text_bytes").cast("bigint").alias("text_bytes"),
            F.sum("n_null_text").cast("bigint").alias("n_null_text"),
        )
        .orderBy("source")
    )


@register("export_arrow_ipc_shards", oracle=ARROW_IPC_ORACLE)
def export_arrow_ipc_shards(spark, sf_dir) -> DataFrame:
    """Arrow IPC delivery with the FROM-SCRATCH encoder — the write
    twin of :func:`ingest_arrow_ipc`.

    Per shard the executors build Arrow IPC files with
    ``core/arrowipc.py``'s encoder — including its hand-rolled
    flatbuffers BUILDER (back-to-front construction, vtables, unions,
    struct vectors) — and then hand the bytes to TWO readers: pyarrow
    (the independent referee: schema names/types, batch count and
    every value must match) and this module's own reader (the
    self-twin).  Same facts and oracle as the ingest direction, so a
    framing bug in either direction breaks the staged gate.

    100 TB: identical plan shape to the ingest twin — one shuffle on
    the shard key, Arrow-batched Python, no driver materialization.
    """
    import io

    import pyarrow as pa_
    import pyarrow.ipc as pa_ipc

    from ..core.arrowipc import FieldSpec, encode_arrow_ipc, read_arrow_ipc

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .withColumn("shard_id", F.expr(f"doc_id div {IPC_SHARD_DOCS}"))
        # explicit exchange width: per-shard Python codec work
        # dominates at gate scale, and AQE's size-based coalescing
        # would fold this tiny shuffle onto one task (SCALE.md:
        # 'AQE coalescing vs Python-heavy applyInPandas')
        .repartition(
            spark.sparkContext.defaultParallelism, "source", "shard_id"
        )
    )
    fields = [
        FieldSpec("doc_id", True, "int64", 64),
        FieldSpec("text", True, "utf8", 0),
    ]

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        doc_ids = [int(i) for i in pdf["doc_id"]]
        texts = [None if v is None else str(v) for v in pdf["text"]]
        batches = [
            [doc_ids[i : i + IPC_CHUNK], texts[i : i + IPC_CHUNK]]
            for i in range(0, len(doc_ids), IPC_CHUNK)
        ]
        data = encode_arrow_ipc(fields, batches)

        # referee 1: the real library must read our bytes exactly
        r = pa_ipc.open_file(io.BytesIO(data))
        if r.num_record_batches != len(batches):
            raise ValueError(
                f"pyarrow sees {r.num_record_batches} batches, "
                f"wrote {len(batches)}"
            )
        t = r.read_all()
        if (
            t.schema.names != ["doc_id", "text"]
            or str(t.schema.types[0]) != "int64"
            or str(t.schema.types[1]) != "string"
        ):
            raise ValueError(f"pyarrow sees schema {t.schema}")
        if (
            t.column(0).to_pylist() != doc_ids
            or t.column(1).to_pylist() != texts
        ):
            raise ValueError("pyarrow decoded different values")
        # referee 2: self-twin
        got = read_arrow_ipc(data)
        got_ids = [v for b in got["batches"] for v in b["columns"][0]]
        got_texts = [v for b in got["batches"] for v in b["columns"][1]]
        if got_ids != doc_ids or got_texts != texts:
            raise ValueError("self-twin decoded different values")
        return pd.DataFrame(
            {
                "source": pd.Series(
                    [pdf["source"].iloc[0]], dtype="object"
                ),
                "n_rows": pd.Series([len(doc_ids)], dtype="int64"),
                "n_batches": pd.Series([len(batches)], dtype="int64"),
                "sum_doc_id": pd.Series([sum(doc_ids)], dtype="int64"),
                "text_bytes": pd.Series(
                    [
                        sum(
                            len(v.encode("utf-8"))
                            for v in texts
                            if v is not None
                        )
                    ],
                    dtype="int64",
                ),
                "n_null_text": pd.Series(
                    [sum(1 for v in texts if v is None)], dtype="int64"
                ),
            }
        )

    shards = d.groupBy("source", "shard_id").applyInPandas(
        _shard, _ARROW_IPC_ROW_SCHEMA
    )
    return (
        shards.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("n_batches").cast("bigint").alias("n_batches"),
            F.sum("sum_doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum("text_bytes").cast("bigint").alias("text_bytes"),
            F.sum("n_null_text").cast("bigint").alias("n_null_text"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Arrow IPC temporal/decimal columns — the r12 type-tag closure
# ---------------------------------------------------------------------------

#: orders per temporal IPC shard (the few-larger-files shape of the
#: sibling IPC queries: per-shard Python scaffold dominates gate
#: scale, not the codec — 2048 keeps ~170-row groups from paying
#: ~15 ms of Arrow/group cost each while shard count stays
#: data-proportional)
ATEMP_SHARD = 2048
#: intraday-microsecond mixer: a prime stride keeps the synthetic
#: time-of-day spread over the full day without float anywhere
ATEMP_MIX = 7919
_US_DAY = 86_400_000_000

#: facts the from-scratch reader must recover from REAL
#: pyarrow-written temporal/decimal columns, restated in integer
#: arithmetic on ``orders``.  Every value is a pure function of
#: (o_orderkey, epoch-days of o_orderdate), so both engines derive
#: identical expectations: days floor-divides the epoch micros
#: (non-negative — TPC-H dates), time-of-day micros mix the key with
#: a prime stride, the tz-aware timestamp is days+time recombined,
#: and the decimal's signed cents come from key arithmetic (never
#: from the float price column — DuckDB/Python rounding of doubles
#: diverges at half-cent boundaries).
ARROW_TEMPORAL_ORACLE = f"""
        WITH e AS (
            SELECT o_orderstatus AS status,
                   o_orderkey AS okey,
                   o_orderkey // {ATEMP_SHARD} AS shard_id,
                   epoch_us(o_orderdate) // {_US_DAY} AS days,
                   (o_orderkey * {ATEMP_MIX}) % {_US_DAY} AS us
            FROM orders
        ), r AS (
            SELECT status, shard_id, days, us,
                   (days * {_US_DAY} + us) % 1000000007 AS ts_mod,
                   (okey % 10000000)
                   * (CASE WHEN okey % 3 = 0 THEN -1 ELSE 1 END)
                       AS cents
            FROM e
        ), sh AS (
            SELECT status, shard_id,
                   count(*) AS n_rows,
                   sum(days) AS sum_days,
                   sum(us) AS sum_time_us,
                   sum(ts_mod) AS sum_ts_mod,
                   sum(cents) AS sum_cents
            FROM r GROUP BY 1, 2
        )
        SELECT status,
               CAST(count(*) AS BIGINT) AS n_shards,
               CAST(sum(n_rows) AS BIGINT) AS n_rows,
               CAST(sum(sum_days) AS BIGINT) AS sum_days,
               CAST(sum(sum_time_us) AS BIGINT) AS sum_time_us,
               CAST(sum(sum_ts_mod) AS BIGINT) AS sum_ts_mod,
               CAST(sum(sum_cents) AS BIGINT) AS sum_cents
        FROM sh GROUP BY status ORDER BY status
"""

_ATEMP_ROW_SCHEMA = T.StructType(
    [
        T.StructField("status", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("sum_days", T.LongType()),
        T.StructField("sum_time_us", T.LongType()),
        T.StructField("sum_ts_mod", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
    ]
)


@register("ingest_arrow_temporal", oracle=ARROW_TEMPORAL_ORACLE)
def ingest_arrow_temporal(spark, sf_dir) -> DataFrame:
    """Arrow IPC temporal/decimal type tags through the from-scratch
    reader — the r12 closure of the r11 verdict's widest named Arrow
    gap (``core/arrowipc.py`` date32/date64, time32/time64,
    timestamp with unit+tz, decimal128).

    Each (status, shard) group of ``orders`` is written as a REAL
    pyarrow IPC file carrying SEVEN temporal/decimal columns derived
    integer-exactly from (o_orderkey, epoch-days): date32 and date64
    (same day), time32(ms) and time64(us) (the prime-mixed
    time-of-day), a tz-aware timestamp(us, UTC), a naive
    timestamp(ms), a timestamp(ns) (surfacing as exact integer
    epoch-nanos), and a decimal128(12,2) of signed cents; odd shards
    dictionary-encode the date32 column so the dictionary path keeps
    its unit through resolution.  Executors decode every value with
    ``read_arrow_ipc`` and assert EXACT equality against the
    arithmetic reconstruction (dates, times, aware/naive datetimes,
    Decimals, integer nanos), then emit per-shard integer aggregates
    the DuckDB oracle recomputes from ``orders`` directly.

    100 TB: one shuffle on the shard key; the codec work is
    Arrow-batched Python with zero per-row JVM crossings, shard count
    grows with the data, and no task holds more than one shard.
    """
    import datetime as dt
    import decimal as dec
    import io

    import pyarrow as pa_
    import pyarrow.ipc as pa_ipc

    from ..core.arrowipc import read_arrow_ipc

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "orders")
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderkey").alias("okey"),
            F.expr(f"o_orderkey div {ATEMP_SHARD}").alias("shard_id"),
            # o_orderdate is parquet TIMESTAMP(isAdjustedToUTC=false)
            # -> TIMESTAMP_NTZ; the session is pinned UTC so the cast
            # preserves the wall-clock value (same convention as the
            # events loader)
            F.expr(
                f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_DAY}"
            ).alias("days"),
        )
        .repartition(
            spark.sparkContext.defaultParallelism, "status", "shard_id"
        )
    )

    utc = dt.timezone.utc
    epoch_d = dt.date(1970, 1, 1)
    epoch_naive = dt.datetime(1970, 1, 1)
    epoch_utc = dt.datetime(1970, 1, 1, tzinfo=utc)

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("okey")
        shard_id = int(pdf["shard_id"].iloc[0])
        okeys = [int(v) for v in pdf["okey"]]
        days = [int(v) for v in pdf["days"]]
        us = [(k * ATEMP_MIX) % _US_DAY for k in okeys]
        cents = [
            (k % 10_000_000) * (-1 if k % 3 == 0 else 1) for k in okeys
        ]
        dates = [epoch_d + dt.timedelta(days=dv) for dv in days]
        times = [
            dt.time(
                u // 3_600_000_000,
                u // 60_000_000 % 60,
                u // 1_000_000 % 60,
                u % 1_000_000,
            )
            for u in us
        ]
        ep_us = [dv * _US_DAY + u for dv, u in zip(days, us)]
        date_arr = pa_.array(dates, pa_.date32())
        if shard_id % 2 == 1:
            date_arr = date_arr.dictionary_encode()
        t = pa_.table(
            {
                "okey": pa_.array(okeys, pa_.int64()),
                "d32": date_arr,
                "d64": pa_.array(
                    [dv * 86_400_000 for dv in days], pa_.date64()
                ),
                "t32": pa_.array(
                    [u // 1000 for u in us], pa_.time32("ms")
                ),
                "t64": pa_.array(us, pa_.time64("us")),
                "ts_us": pa_.array(
                    ep_us, pa_.timestamp("us", tz="UTC")
                ),
                "ts_ms": pa_.array(
                    [e // 1000 for e in ep_us], pa_.timestamp("ms")
                ),
                "ts_ns": pa_.array(
                    [e * 1000 + k % 1000 for e, k in zip(ep_us, okeys)],
                    pa_.timestamp("ns"),
                ),
                "price": pa_.array(
                    [dec.Decimal(c).scaleb(-2) for c in cents],
                    pa_.decimal128(12, 2),
                ),
            }
        )
        buf = io.BytesIO()
        with pa_ipc.new_file(buf, t.schema) as w:
            for batch in t.to_batches(max_chunksize=IPC_CHUNK):
                w.write_batch(batch)

        got = read_arrow_ipc(buf.getvalue())
        fs = {f.name: f for f in got["fields"]}
        if fs["ts_us"].unit != "us" or fs["ts_us"].tz != "UTC":
            raise ValueError(f"shard {shard_id}: ts_us type drifted")
        if fs["ts_ms"].unit != "ms" or fs["ts_ms"].tz is not None:
            raise ValueError(f"shard {shard_id}: ts_ms type drifted")
        if (fs["price"].precision, fs["price"].scale) != (12, 2):
            raise ValueError(f"shard {shard_id}: decimal type drifted")
        if (fs["d32"].dict_id is not None) != (shard_id % 2 == 1):
            raise ValueError(f"shard {shard_id}: dict flag drifted")
        col = {
            name: [
                v
                for b in got["batches"]
                for v in b["columns"][ci]
            ]
            for ci, name in enumerate(t.column_names)
        }
        if col["okey"] != okeys:
            raise ValueError("okey column drifted")
        if col["d32"] != dates or col["d64"] != dates:
            raise ValueError("decoded dates drifted")
        want_t32 = [
            dt.time(
                u // 1000 // 3_600_000,
                u // 1000 // 60_000 % 60,
                u // 1000 // 1000 % 60,
                (u // 1000 % 1000) * 1000,
            )
            for u in us
        ]
        if col["t32"] != want_t32 or col["t64"] != times:
            raise ValueError("decoded times drifted")
        want_aware = [
            epoch_utc + dt.timedelta(microseconds=e) for e in ep_us
        ]
        want_naive = [
            epoch_naive + dt.timedelta(milliseconds=e // 1000)
            for e in ep_us
        ]
        if col["ts_us"] != want_aware or col["ts_ms"] != want_naive:
            raise ValueError("decoded timestamps drifted")
        want_ns = [e * 1000 + k % 1000 for e, k in zip(ep_us, okeys)]
        if col["ts_ns"] != want_ns:
            raise ValueError("decoded nano timestamps drifted")
        if col["price"] != [dec.Decimal(c).scaleb(-2) for c in cents]:
            raise ValueError("decoded decimals drifted")
        return pd.DataFrame(
            {
                "status": pd.Series(
                    [pdf["status"].iloc[0]], dtype="object"
                ),
                "n_rows": pd.Series([len(okeys)], dtype="int64"),
                "sum_days": pd.Series([sum(days)], dtype="int64"),
                "sum_time_us": pd.Series([sum(us)], dtype="int64"),
                "sum_ts_mod": pd.Series(
                    [sum(e % 1_000_000_007 for e in ep_us)],
                    dtype="int64",
                ),
                "sum_cents": pd.Series([sum(cents)], dtype="int64"),
            }
        )

    shards = d.groupBy("status", "shard_id").applyInPandas(
        _shard, _ATEMP_ROW_SCHEMA
    )
    return (
        shards.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("sum_days").cast("bigint").alias("sum_days"),
            F.sum("sum_time_us").cast("bigint").alias("sum_time_us"),
            F.sum("sum_ts_mod").cast("bigint").alias("sum_ts_mod"),
            F.sum("sum_cents").cast("bigint").alias("sum_cents"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# Arrow IPC duration / interval / decimal256 — the r13 type-tag closure
# ---------------------------------------------------------------------------

ADUR_SHARD = 4096
#: prime strides for the duration/nano mixes
ADUR_P1 = 1_000_003
ADUR_P2 = 2_654_435_761
ADUR_MOD = 1_000_000_007
#: orderkey is reduced mod this bound BEFORE the prime multiplies on
#: BOTH the oracle and Python sides (ADVICE r13): okey * ADUR_P2
#: overflows BIGINT in DuckDB once l_orderkey exceeds ~3.47e9, which
#: large scale factors reach.  (1e9-1) * ADUR_P2 ~ 2.65e18 < 2^63-1,
#: so the reduced mixes stay exact at any scale; at every test SF
#: okey < 1e9 and the reduction is the identity (values unchanged).
ADUR_KMOD = 1_000_000_000
#: 10**35 % ADUR_MOD, precomputed so the oracle's modular product of
#: the >128-bit decimal256 unscaled value stays inside BIGINT
ADUR_P35_MOD = pow(10, 35, ADUR_MOD)

#: same facts the duration/interval/decimal256 columns must survive,
#: restated in integer arithmetic on ``lineitem``.  Every value is a
#: pure function of (l_orderkey, l_linenumber): the ns duration is a
#: non-negative prime mix (null every 11th (okey+ln)), the seconds
#: duration is sign-alternating, the MONTH_DAY_NANO interval's three
#: legs are small signed mixes, and the decimal256's unscaled value
#: okey*10**35 + ln (needs >128 bits) reduces mod 1e9+7 via the
#: precomputed power so BIGINT never overflows.  All moduli operate
#: on non-negative operands only (DuckDB % keeps the dividend sign).
ARROW_DURATION_ORACLE = f"""
        WITH e AS (
            SELECT l_returnflag AS flag,
                   l_orderkey // {ADUR_SHARD} AS shard_id,
                   l_orderkey AS okey,
                   l_linenumber AS ln
            FROM lineitem
        ), r AS (
            SELECT flag, shard_id,
                   CASE WHEN (okey + ln) % 11 = 0 THEN 1 ELSE 0 END
                       AS ns_null,
                   ((okey % {ADUR_KMOD}) * {ADUR_P1} + ln * 7919)
                       % 4000000000000 AS dur_ns,
                   (okey % 100000)
                   * (CASE WHEN ln % 2 = 0 THEN -1 ELSE 1 END)
                       AS dur_s,
                   okey % 25 - 12 AS mdn_m,
                   (okey + ln) % 63 - 31 AS mdn_d,
                   ((okey % {ADUR_KMOD}) * {ADUR_P2} + ln)
                       % 1000000000000 AS mdn_ns,
                   ((okey % {ADUR_MOD}) * {ADUR_P35_MOD} + ln)
                       % {ADUR_MOD} AS big_mod
            FROM e
        ), sh AS (
            SELECT flag, shard_id,
                   count(*) AS n_rows,
                   sum(ns_null) AS n_null_ns,
                   sum(CASE WHEN ns_null = 1 THEN 0
                            ELSE dur_ns % {ADUR_MOD} END)
                       AS sum_durns_mod,
                   sum(dur_s) AS sum_dur_s,
                   sum(mdn_m) AS sum_mdn_months,
                   sum(mdn_d) AS sum_mdn_days,
                   sum(mdn_ns % {ADUR_MOD}) AS sum_mdn_ns_mod,
                   sum(big_mod) AS sum_big_mod
            FROM r GROUP BY 1, 2
        )
        SELECT flag,
               CAST(count(*) AS BIGINT) AS n_shards,
               CAST(sum(n_rows) AS BIGINT) AS n_rows,
               CAST(sum(n_null_ns) AS BIGINT) AS n_null_ns,
               CAST(sum(sum_durns_mod) AS BIGINT) AS sum_durns_mod,
               CAST(sum(sum_dur_s) AS BIGINT) AS sum_dur_s,
               CAST(sum(sum_mdn_months) AS BIGINT) AS sum_mdn_months,
               CAST(sum(sum_mdn_days) AS BIGINT) AS sum_mdn_days,
               CAST(sum(sum_mdn_ns_mod) AS BIGINT) AS sum_mdn_ns_mod,
               CAST(sum(sum_big_mod) AS BIGINT) AS sum_big_mod
        FROM sh GROUP BY flag ORDER BY flag
"""

_ADUR_ROW_SCHEMA = T.StructType(
    [
        T.StructField("flag", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_null_ns", T.LongType()),
        T.StructField("sum_durns_mod", T.LongType()),
        T.StructField("sum_dur_s", T.LongType()),
        T.StructField("sum_mdn_months", T.LongType()),
        T.StructField("sum_mdn_days", T.LongType()),
        T.StructField("sum_mdn_ns_mod", T.LongType()),
        T.StructField("sum_big_mod", T.LongType()),
    ]
)


@register("ingest_arrow_duration", oracle=ARROW_DURATION_ORACLE)
def ingest_arrow_duration(spark, sf_dir) -> DataFrame:
    """Arrow IPC Duration / Interval(MONTH_DAY_NANO) / decimal256
    type tags through the from-scratch codec (r13, VERDICT r12 ask #4
    — the last named Arrow reader seams beside Union).

    Each (returnflag, shard) group of ``lineitem`` is written as a
    REAL pyarrow IPC file carrying a nullable duration(ns) column
    (exact int64 counts — a timedelta surface would truncate ns), a
    sign-alternating duration(s), a MONTH_DAY_NANO interval whose
    three legs are independent signed mixes, and a decimal256(76,2)
    whose unscaled value okey*10**35 + ln genuinely needs more than
    128 bits.  Odd shards dictionary-encode the seconds duration so
    the dictionary path keeps its unit through resolution; even
    shards ALSO re-encode every column with our own
    ``encode_arrow_ipc`` and require pyarrow to read those bytes back
    value-identical (both codec directions under one verdict).
    Executors decode with ``read_arrow_ipc`` and assert EXACT
    equality against the arithmetic reconstruction, then emit
    per-shard integer aggregates the DuckDB oracle recomputes from
    ``lineitem`` directly.

    100 TB: one shuffle on the shard key; Arrow-batched Python with
    zero per-row JVM crossings; shard count grows with the data and
    no task holds more than one shard.
    """
    import decimal as dec
    import io

    import numpy as np
    import pyarrow as pa_
    import pyarrow.ipc as pa_ipc

    from ..core.arrowipc import FieldSpec, encode_arrow_ipc, read_arrow_ipc

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").alias("ln"),
            F.expr(f"l_orderkey div {ADUR_SHARD}").alias("shard_id"),
        )
        .repartition(
            spark.sparkContext.defaultParallelism, "flag", "shard_id"
        )
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["okey", "ln"])
        shard_id = int(pdf["shard_id"].iloc[0])
        # the value mixes are vectorized int64 numpy (all intermediates
        # provably < 2^63: (KMOD-1)*P2 ~ 2.65e18); the EXPECTED lists
        # the decode asserts compare against come out of the same
        # arrays, so the verification contract is unchanged
        ka = pdf["okey"].to_numpy(dtype=np.int64)
        na = pdf["ln"].to_numpy(dtype=np.int64)
        okeys = ka.tolist()
        lns = na.tolist()
        ns_null = (ka + na) % 11 == 0
        dur_ns_a = ((ka % ADUR_KMOD) * ADUR_P1 + na * 7919) % (
            4_000_000_000_000
        )
        dur_ns = [
            None if isnull else int(v)
            for v, isnull in zip(dur_ns_a.tolist(), ns_null.tolist())
        ]
        dur_s_a = (ka % 100_000) * np.where(na % 2 == 0, -1, 1)
        dur_s = dur_s_a.tolist()
        mdn_m = ka % 25 - 12
        mdn_d = (ka + na) % 63 - 31
        mdn_ns = ((ka % ADUR_KMOD) * ADUR_P2 + na) % 1_000_000_000_000
        mdn = list(zip(mdn_m.tolist(), mdn_d.tolist(), mdn_ns.tolist()))
        dctx = dec.Context(prec=80)
        big = [
            dec.Decimal(k * 10**35 + n).scaleb(-2, dctx)
            for k, n in zip(okeys, lns)
        ]
        dur_s_arr = pa_.array(dur_s, pa_.duration("s"))
        if shard_id % 2 == 1:
            dur_s_arr = dur_s_arr.dictionary_encode()
        t = pa_.table(
            {
                "okey": pa_.array(okeys, pa_.int64()),
                "dur_ns": pa_.array(dur_ns, pa_.duration("ns")),
                "dur_s": dur_s_arr,
                "mdn": pa_.array(
                    [pa_.MonthDayNano(v) for v in mdn],
                    pa_.month_day_nano_interval(),
                ),
                "big": pa_.array(big, pa_.decimal256(76, 2)),
            }
        )
        buf = io.BytesIO()
        with pa_ipc.new_file(buf, t.schema) as w:
            for batch in t.to_batches(max_chunksize=IPC_CHUNK):
                w.write_batch(batch)

        got = read_arrow_ipc(buf.getvalue())
        fs = {f.name: f for f in got["fields"]}
        if fs["dur_ns"].type_name != "duration" or fs["dur_ns"].unit != "ns":
            raise ValueError(f"shard {shard_id}: dur_ns type drifted")
        if fs["dur_s"].unit != "s" or (
            (fs["dur_s"].dict_id is not None) != (shard_id % 2 == 1)
        ):
            raise ValueError(f"shard {shard_id}: dur_s type drifted")
        if fs["mdn"].type_name != "interval_mdn":
            raise ValueError(f"shard {shard_id}: mdn type drifted")
        if (fs["big"].type_name, fs["big"].precision, fs["big"].scale) != (
            "decimal256", 76, 2,
        ):
            raise ValueError(f"shard {shard_id}: decimal256 drifted")
        col = {
            name: [
                v for b in got["batches"] for v in b["columns"][ci]
            ]
            for ci, name in enumerate(t.column_names)
        }
        if col["okey"] != okeys:
            raise ValueError("okey column drifted")
        if col["dur_ns"] != dur_ns:
            raise ValueError("decoded ns durations drifted")
        if col["dur_s"] != dur_s:
            raise ValueError("decoded s durations drifted")
        if col["mdn"] != mdn:
            raise ValueError("decoded MDN intervals drifted")
        if col["big"] != big:
            raise ValueError("decoded decimal256 drifted")
        if shard_id % 2 == 0:
            # even shards: our ENCODER writes the same columns and
            # pyarrow referees the bytes value-for-value
            own = encode_arrow_ipc(
                [
                    FieldSpec("okey", True, "int64", 64),
                    FieldSpec("dur_ns", True, "duration", 64, unit="ns"),
                    FieldSpec("dur_s", True, "duration", 64, unit="s"),
                    FieldSpec("mdn", True, "interval_mdn", 128),
                    FieldSpec(
                        "big", True, "decimal256", 256,
                        precision=76, scale=2,
                    ),
                ],
                [[okeys, dur_ns, dur_s, mdn, big]],
            )
            ref = pa_ipc.open_file(io.BytesIO(own)).read_all()
            if ref.column("okey").to_pylist() != okeys:
                raise ValueError("own-encoder okey drifted")
            ref_ns = [
                None if v is None else v.value
                for v in ref.column("dur_ns").to_pylist()
            ]
            if ref_ns != dur_ns:
                raise ValueError("own-encoder ns durations drifted")
            # .value is the raw count in the column's own unit, so a
            # unit drift in our duration(s) encoder (e.g. emitting ns
            # counts under a seconds tag) fails here rather than
            # passing unchecked (ADVICE r13)
            ref_s = [v.value for v in ref.column("dur_s")]
            if ref_s != dur_s:
                raise ValueError("own-encoder s durations drifted")
            ref_mdn = [
                (v.months, v.days, v.nanoseconds)
                for v in ref.column("mdn").to_pylist()
            ]
            if ref_mdn != mdn:
                raise ValueError("own-encoder MDN drifted")
            if ref.column("big").to_pylist() != big:
                raise ValueError("own-encoder decimal256 drifted")
        # numpy aggregates over the same arrays the expected lists came
        # from; sum_big_mod restates the >128-bit value mod ADUR_MOD via
        # the precomputed 10**35 power, exactly as the oracle does
        # ((MOD-1)*P35_MOD + ln < ~1e18 < 2^63)
        return pd.DataFrame(
            {
                "flag": pd.Series(
                    [pdf["flag"].iloc[0]], dtype="object"
                ),
                "n_rows": pd.Series([len(okeys)], dtype="int64"),
                "n_null_ns": pd.Series(
                    [int(ns_null.sum())], dtype="int64"
                ),
                "sum_durns_mod": pd.Series(
                    [
                        int(
                            np.where(ns_null, 0, dur_ns_a % ADUR_MOD)
                            .sum()
                        )
                    ],
                    dtype="int64",
                ),
                "sum_dur_s": pd.Series(
                    [int(dur_s_a.sum())], dtype="int64"
                ),
                "sum_mdn_months": pd.Series(
                    [int(mdn_m.sum())], dtype="int64"
                ),
                "sum_mdn_days": pd.Series(
                    [int(mdn_d.sum())], dtype="int64"
                ),
                "sum_mdn_ns_mod": pd.Series(
                    [int((mdn_ns % ADUR_MOD).sum())], dtype="int64"
                ),
                "sum_big_mod": pd.Series(
                    [
                        int(
                            (
                                ((ka % ADUR_MOD) * ADUR_P35_MOD + na)
                                % ADUR_MOD
                            ).sum()
                        )
                    ],
                    dtype="int64",
                ),
            }
        )

    shards = d.groupBy("flag", "shard_id").applyInPandas(
        _shard, _ADUR_ROW_SCHEMA
    )
    return (
        shards.groupBy("flag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("n_null_ns").cast("bigint").alias("n_null_ns"),
            F.sum("sum_durns_mod").cast("bigint").alias("sum_durns_mod"),
            F.sum("sum_dur_s").cast("bigint").alias("sum_dur_s"),
            F.sum("sum_mdn_months").cast("bigint").alias("sum_mdn_months"),
            F.sum("sum_mdn_days").cast("bigint").alias("sum_mdn_days"),
            F.sum("sum_mdn_ns_mod").cast("bigint").alias("sum_mdn_ns_mod"),
            F.sum("sum_big_mod").cast("bigint").alias("sum_big_mod"),
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# CBOR event stream — the IETF standards-track sidecar wire format
# ---------------------------------------------------------------------------

#: same facts as the msgpack twin; timestamps ride RFC 8949 tag 4
#: (decimal fraction [-6, epoch_us]) so the roundtrip stays
#: integer-exact to the microsecond with no float in the path.
CBOR_EVENTS_ORACLE = """
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(event_id) AS BIGINT) AS sum_event_id,
               CAST(sum(user_id) AS BIGINT) AS sum_user_id,
               CAST(min(epoch_us(ts)) AS BIGINT) AS min_ts_us,
               CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us
        FROM events GROUP BY event_type ORDER BY event_type
"""


@register("ingest_cbor_events", oracle=CBOR_EVENTS_ORACLE)
def ingest_cbor_events(spark, sf_dir) -> DataFrame:
    """Events through CBOR (RFC 8949), the standards-track twin of
    :func:`ingest_msgpack_events`.

    Each event row is encoded as a CBOR map (preferred-serialization
    integers across width boundaries, text strings, float64 value,
    null-able props, and the microsecond timestamp as a TAG 4 decimal
    fraction ``[-6, epoch_us]`` — integer-exact, no float timestamp
    anywhere), decoded back, and verified field-for-field including
    the tag identity.  Aggregates come from the DECODED maps; the
    oracle restates them from the table.

    100 TB: narrow mapInPandas, no shuffle before the per-type
    aggregate — the event-bus consumer shape shared with the msgpack
    twin.
    """
    from ..core.cborcodec import CborTag, dumps, loads

    prep(spark)
    d = load_spread(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props", "ts"
    )

    def _roundtrip(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            types, eids, uids, tss = [], [], [], []
            for eid, uid, etype, val, props, ts in zip(
                pdf["event_id"],
                pdf["user_id"],
                pdf["event_type"],
                pdf["value"],
                pdf["props"],
                pdf["ts"],
            ):
                us = int(ts.value) // 1000  # pandas ns -> us
                rec = {
                    "event_id": int(eid),
                    "user_id": int(uid),
                    "event_type": str(etype),
                    "value": float(val),
                    "props": None if props is None else str(props),
                    "ts": CborTag(4, [-6, us]),
                }
                back = loads(dumps(rec))
                if back != rec:
                    raise ValueError(
                        f"event {eid}: CBOR roundtrip drifted"
                    )
                tag = back["ts"]
                if tag.tag != 4 or tag.value[0] != -6:
                    raise ValueError(f"event {eid}: tag drifted")
                types.append(back["event_type"])
                eids.append(back["event_id"])
                uids.append(back["user_id"])
                tss.append(tag.value[1])
            yield pd.DataFrame(
                {
                    "event_type": pd.Series(types, dtype="object"),
                    "event_id": pd.Series(eids, dtype="int64"),
                    "user_id": pd.Series(uids, dtype="int64"),
                    "ts_us": pd.Series(tss, dtype="int64"),
                }
            )

    per = d.mapInPandas(_roundtrip, _MSGPACK_ROW_SCHEMA)
    return (
        per.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum("user_id").cast("bigint").alias("sum_user_id"),
            F.min("ts_us").cast("bigint").alias("min_ts_us"),
            F.max("ts_us").cast("bigint").alias("max_ts_us"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# robots.txt crawl filter — RFC 9309 politeness in front of the corpus
# ---------------------------------------------------------------------------

#: per-doc path rotation (doc_id % 5) against the fixture robots.txt:
#: 0 -> /p/{id}            allowed for both agents
#: 1 -> /private/{id}      blocked for * (Disallow: /private/)
#: 2 -> /private/ok        ALLOWED for * (longer Allow: /private/ok$)
#: 3 -> /f/{id}.tmp        blocked for * (Disallow: /*.tmp$)
#: 4 -> /blocked/{id}      blocked only for dbpsbot (its own group;
#:                         the specific group SHADOWS the * group)
ROBOTS_ORACLE = """
        WITH d AS (
            SELECT source, doc_id % 5 AS m FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN m IN (1, 3) THEN 1 ELSE 0 END)
                    AS BIGINT) AS blocked_star,
               CAST(sum(CASE WHEN m = 4 THEN 1 ELSE 0 END) AS BIGINT)
                   AS blocked_bot,
               CAST(sum(CASE WHEN m NOT IN (1, 3) AND m != 4
                        THEN 1 ELSE 0 END) AS BIGINT) AS allowed_both
        FROM d GROUP BY source ORDER BY source
"""

_ROBOTS_ROW_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("blocked_star", T.LongType()),
        T.StructField("blocked_bot", T.LongType()),
        T.StructField("allowed_both", T.LongType()),
    ]
)


@register("ingest_robots_filter", oracle=ROBOTS_ORACLE)
def ingest_robots_filter(spark, sf_dir) -> DataFrame:
    """RFC 9309 crawl-politeness filter over the corpus URLs.

    Each source domain carries a fixture robots.txt exercising the
    RFC's hard parts — group selection (a specific ``dbpsbot`` group
    SHADOWS the ``*`` group), longest-match precedence (a longer
    ``Allow: /private/ok$`` beating ``Disallow: /private/``),
    wildcard + end-anchor patterns (``/*.tmp$``) and sitemap lines —
    and every document's URL is evaluated for BOTH a generic agent
    and ``dbpsbot`` through the from-scratch parser
    (``core/robotscodec.py``).  Executors assert each decision
    against the closed-form rotation (see ``ROBOTS_ORACLE``) and the
    sitemap parse; the oracle restates the counts arithmetically.

    100 TB: robots.txt is per-ORIGIN metadata — a real crawl keys it
    by registrable domain and broadcasts the (tiny) parsed rule sets
    to the URL stream; here each executor parses the fixture inline,
    which is the same narrow map-only shape with zero shuffles before
    the per-source aggregate.
    """
    from ..core.robotscodec import is_allowed, parse_robots

    prep(spark)
    d = load_spread(spark, sf_dir, "documents").select("doc_id", "source")

    def _filter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, bstar, bbot, both = [], [], [], []
            for doc_id, src in zip(pdf["doc_id"], pdf["source"]):
                doc_id = int(doc_id)
                robots = parse_robots(
                    f"# robots for {src}\n"
                    "User-agent: *\n"
                    "Disallow: /private/\n"
                    "Allow: /private/ok$\n"
                    "Disallow: /*.tmp$\n"
                    "\n"
                    "User-agent: dbpsbot\n"
                    "Allow: /\n"
                    "Disallow: /blocked/\n"
                    f"Sitemap: https://{src}.example/sitemap.xml\n"
                )
                if robots["sitemaps"] != [
                    f"https://{src}.example/sitemap.xml"
                ]:
                    raise ValueError(f"{src}: sitemap parse drifted")
                m = doc_id % 5
                path = [
                    f"/p/{doc_id}",
                    f"/private/{doc_id}",
                    "/private/ok",
                    f"/f/{doc_id}.tmp",
                    f"/blocked/{doc_id}",
                ][m]
                star = is_allowed(robots, "genericbot/2.0", path)
                bot = is_allowed(robots, "DBPSBot/1.0", path)
                if star != (m not in (1, 3)) or bot != (m != 4):
                    raise ValueError(
                        f"doc {doc_id}: decision drifted "
                        f"(star={star}, bot={bot}, m={m})"
                    )
                srcs.append(src)
                bstar.append(0 if star else 1)
                bbot.append(0 if bot else 1)
                both.append(1 if star and bot else 0)
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "blocked_star": pd.Series(bstar, dtype="int64"),
                    "blocked_bot": pd.Series(bbot, dtype="int64"),
                    "allowed_both": pd.Series(both, dtype="int64"),
                }
            )

    per = d.mapInPandas(_filter, _ROBOTS_ROW_SCHEMA)
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("blocked_star").cast("bigint").alias("blocked_star"),
            F.sum("blocked_bot").cast("bigint").alias("blocked_bot"),
            F.sum("allowed_both").cast("bigint").alias("allowed_both"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# gzip member stream — the warc.gz shard layout on OUR deflate
# ---------------------------------------------------------------------------

#: docs per concatenated-member shard (the few-larger-files shape,
#: same rationale as IPC_SHARD_DOCS)
GZIP_SHARD_DOCS = 256

GZIP_MEMBERS_ORACLE = f"""
        WITH sh AS (
            SELECT source,
                   doc_id // {GZIP_SHARD_DOCS} AS shard_id,
                   count(*) AS n_members,
                   CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
                   CAST(sum(coalesce(octet_length(encode(text)), 0))
                        AS BIGINT) AS text_bytes
            FROM documents GROUP BY 1, 2
        )
        SELECT source,
               count(*) AS n_shards,
               CAST(sum(n_members) AS BIGINT) AS n_members,
               CAST(sum(sum_doc_id) AS BIGINT) AS sum_doc_id,
               CAST(sum(text_bytes) AS BIGINT) AS text_bytes
        FROM sh GROUP BY source ORDER BY source
"""

_GZIP_ROW_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_members", T.LongType()),
        T.StructField("sum_doc_id", T.LongType()),
        T.StructField("text_bytes", T.LongType()),
    ]
)


@register("ingest_gzip_multistream", oracle=GZIP_MEMBERS_ORACLE)
def ingest_gzip_multistream(spark, sf_dir) -> DataFrame:
    """Concatenated-gzip-member shards on the FROM-SCRATCH deflate —
    the Common Crawl warc.gz layout (one gzip member per record, all
    members concatenated into one seekable file) with no black box
    in either direction.

    Per shard: every document compresses to its own gzip member via
    ``core/inflatecodec.gzip_compress`` (fixed-Huffman LZ77 or stored
    fallback, FNAME carrying the doc id); members concatenate; then
    TWO walks verify the shard — this module's member walker
    (header fields, per-member CRC-32 + ISIZE) must recover every
    payload byte-exactly, and stdlib gzip (the independent referee)
    must agree on the concatenation.

    100 TB: one shard-key shuffle then Arrow-batched byte work; the
    member framing is WHY the real layout is seekable/splittable —
    a reader can start at any member boundary, which is exactly what
    the per-record-gzip WARC convention exists to provide.
    """
    import gzip as gzip_

    from ..core.inflatecodec import gzip_compress, gzip_members

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .withColumn("shard_id", F.expr(f"doc_id div {GZIP_SHARD_DOCS}"))
        # EXPLICIT width on the shard exchange: the per-shard Python
        # codec work is the dominant cost at gate scale and AQE's
        # size-based coalescing (correct for cheap rows) would fold
        # the tiny shuffle onto ONE task, serializing ~7 s of pure
        # deflate onto one core.  An explicit repartition is exempt
        # from AQE coalescing and already satisfies the groupBy's
        # required distribution, so no second exchange appears.
        .repartition(
            spark.sparkContext.defaultParallelism, "source", "shard_id"
        )
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        doc_ids = [int(i) for i in pdf["doc_id"]]
        payloads = [
            ("" if t is None else str(t)).encode("utf-8")
            for t in pdf["text"]
        ]
        blob = b"".join(
            gzip_compress(p, fname=f"{i}.txt")
            for i, p in zip(doc_ids, payloads)
        )
        got = gzip_members(blob)
        if got != payloads:
            raise ValueError("member walk drifted from the payloads")
        if gzip_.decompress(blob) != b"".join(payloads):
            raise ValueError("stdlib referee disagrees on the blob")
        return pd.DataFrame(
            {
                "source": pd.Series(
                    [pdf["source"].iloc[0]], dtype="object"
                ),
                "n_members": pd.Series([len(got)], dtype="int64"),
                "sum_doc_id": pd.Series([sum(doc_ids)], dtype="int64"),
                "text_bytes": pd.Series(
                    [sum(len(p) for p in got)], dtype="int64"
                ),
            }
        )

    shards = d.groupBy("source", "shard_id").applyInPandas(
        _shard, _GZIP_ROW_SCHEMA
    )
    return (
        shards.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum("n_members").cast("bigint").alias("n_members"),
            F.sum("sum_doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum("text_bytes").cast("bigint").alias("text_bytes"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# transaction-log compaction (OPTIMIZE) — the lakehouse write path
# ---------------------------------------------------------------------------

#: live shards bin by ``shard_id div COMPACT_BIN`` per source; every
#: multi-member bin compacts to ONE file in a single atomic commit
COMPACT_BIN = 4

TXNLOG_COMPACTION_ORACLE = f"""
        WITH sh AS (
            SELECT source, doc_id // {SHARD_DOCS} AS shard_id,
                   count(*) AS n
            FROM documents GROUP BY 1, 2
        ),
        live AS (
            SELECT * FROM sh
            WHERE shard_id % {TXNLOG_REMOVE_MOD} <> {TXNLOG_REMOVE_REM}
        ),
        binned AS (
            SELECT source, shard_id // {COMPACT_BIN} AS bin, n,
                   count(*) OVER (
                       PARTITION BY source, shard_id // {COMPACT_BIN}
                   ) AS members
            FROM live
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS files_before,
               CAST(count(DISTINCT bin) AS BIGINT) AS files_after,
               CAST(sum(CASE WHEN members >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_compacted_inputs,
               CAST(sum(n) AS BIGINT) AS live_rows
        FROM binned GROUP BY source ORDER BY source
"""


@register("txnlog_compaction", oracle=TXNLOG_COMPACTION_ORACLE)
def txnlog_compaction(spark, sf_dir) -> DataFrame:
    """OPTIMIZE through the transaction log — the lakehouse
    small-files maintenance committed as ONE atomic swap.

    The registered ``compact_documents_roundtrip`` proves the DATA
    side of compaction (bytes rewritten and re-read losslessly); this
    query proves the LOG side: live files bin-pack by
    ``shard_id div {COMPACT_BIN}`` per source, every multi-member bin
    appends ``remove`` actions for its inputs plus one merged ``add``
    (rows summed, min/max stats merged — the metadata a real OPTIMIZE
    derives from the rewritten file), all in a SINGLE commit so
    readers see either the old layout or the new one, never a
    half-swap.  The post-compaction replay is then asserted row-exact
    against the pre-compaction snapshot (compaction must never change
    table contents) and the oracle restates files-before/after, the
    compacted-input count and the invariant row total arithmetically.

    100 TB: compaction work is proportional to the files REWRITTEN,
    planning is metadata-only (the log is kilobytes), and the atomic
    single-commit swap is what makes concurrent readers safe — the
    same protocol the snapshot/time-travel/bloom queries already
    exercise, now in the write direction.
    """
    from ..core.txnlog import encode_commit, replay

    commits, _, snap = _txnlog_build(spark, sf_dir)

    pre_rows: dict[str, int] = {}
    bins: dict[tuple, list] = {}
    for path, add in snap.files.items():
        source = path.split("/", 1)[0]
        shard_id = int(path.rsplit("-", 1)[1])
        pre_rows[source] = pre_rows.get(source, 0) + add["num_records"]
        bins.setdefault((source, shard_id // COMPACT_BIN), []).append(
            (path, add)
        )

    actions = []
    n_inputs: dict[str, int] = {}
    for (source, bin_ix), members in sorted(bins.items()):
        if len(members) < 2:
            continue
        n_inputs[source] = n_inputs.get(source, 0) + len(members)
        for path, _ in members:
            actions.append({"remove": {"path": path}})
        actions.append(
            {
                "add": {
                    "path": f"{source}/compact-{bin_ix:05d}",
                    "size": sum(a["size"] for _, a in members),
                    "num_records": sum(
                        a["num_records"] for _, a in members
                    ),
                    "stats": {
                        "minValues": {
                            "doc_id": min(
                                a["stats"]["minValues"]["doc_id"]
                                for _, a in members
                            )
                        },
                        "maxValues": {
                            "doc_id": max(
                                a["stats"]["maxValues"]["doc_id"]
                                for _, a in members
                            )
                        },
                    },
                }
            }
        )
    # a no-op OPTIMIZE (no multi-member bin anywhere) writes NO
    # commit — the log records changes, not intentions
    if actions:
        commits.append(encode_commit(actions))
    post = replay(commits)

    per: dict[str, list] = {}
    for path, add in post.files.items():
        source = path.split("/", 1)[0]
        agg = per.setdefault(source, [0, 0])
        agg[0] += 1
        agg[1] += add["num_records"]
    for source, (n_files, rows) in per.items():
        if rows != pre_rows[source]:
            raise ValueError(
                f"{source}: compaction changed row total "
                f"{pre_rows[source]} -> {rows}"
            )
    files_before: dict[str, int] = {}
    for (source, _), members in bins.items():
        files_before[source] = files_before.get(source, 0) + len(members)
    rows = [
        (
            source,
            files_before[source],
            per[source][0],
            n_inputs.get(source, 0),
            per[source][1],
        )
        for source in sorted(per)
    ]
    return local_frame(
        spark,
        rows,
        T.StructType(
            [
                T.StructField("source", T.StringType()),
                T.StructField("files_before", T.LongType()),
                T.StructField("files_after", T.LongType()),
                T.StructField("n_compacted_inputs", T.LongType()),
                T.StructField("live_rows", T.LongType()),
            ]
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# parquet page-index pruning — the r14 page-skip closure
# ---------------------------------------------------------------------------

#: orders per written shard file (okey span, not row count — shards
#: stay ~constant-size as SF grows and their COUNT grows with data)
PGIDX_SHARD = 8192
#: rows per data page inside each shard file — small enough that a
#: selective predicate demonstrably skips most pages
PGIDX_PAGE_ROWS = 64
#: rows per ROW GROUP inside each shard file (exactly 4 pages, so
#: global page boundaries are unchanged by the grouping) — the
#: two-level layout: chunk Statistics prune whole groups, the
#: ColumnIndex prunes pages within survivors
PGIDX_RG_ROWS = 256

#: the same facts restated in integer arithmetic: within each
#: (status, shard) group sorted by okey, the predicate bounds are the
#: okey values at 1-based ranks (n*2)//5+1 and (n*3)//5+1 (always in
#: [1, n]), a page holds rows (rn-1)//PAGE_ROWS, and a page survives
#: pruning iff its [min, max] intersects [lo, hi] — exactly the
#: ColumnIndex decision the Spark side makes from the FILE's bytes.
#: All sums cast to BIGINT (DuckDB sum(BIGINT) widens to HUGEINT).
PARQUET_PAGE_PRUNE_ORACLE = f"""
        WITH e AS (
            SELECT o_orderstatus AS st,
                   o_orderkey AS okey,
                   o_custkey AS ckey,
                   o_orderkey // {PGIDX_SHARD} AS shard_id
            FROM orders
        ), r AS (
            SELECT st, shard_id, okey, ckey,
                   row_number() OVER (
                       PARTITION BY st, shard_id ORDER BY okey
                   ) AS rn,
                   count(*) OVER (
                       PARTITION BY st, shard_id
                   ) AS n
            FROM e
        ), b AS (
            SELECT st, shard_id,
                   max(CASE WHEN rn = (n * 2) // 5 + 1
                            THEN okey END) AS lo,
                   max(CASE WHEN rn = (n * 3) // 5 + 1
                            THEN okey END) AS hi
            FROM r GROUP BY 1, 2
        ), pg AS (
            SELECT st, shard_id, (rn - 1) // {PGIDX_PAGE_ROWS} AS page,
                   min(okey) AS pmin, max(okey) AS pmax
            FROM r GROUP BY 1, 2, 3
        ), rg AS (
            SELECT st, shard_id, (rn - 1) // {PGIDX_RG_ROWS} AS grp,
                   min(okey) AS gmin, max(okey) AS gmax
            FROM r GROUP BY 1, 2, 3
        ), sh AS (
            SELECT r.st, r.shard_id,
                   count(*) AS n_rows,
                   sum(CASE WHEN r.okey BETWEEN b.lo AND b.hi
                            THEN 1 ELSE 0 END) AS n_match,
                   sum(CASE WHEN r.okey BETWEEN b.lo AND b.hi
                            THEN r.ckey ELSE 0 END) AS sum_ckey
            FROM r JOIN b ON r.st = b.st AND r.shard_id = b.shard_id
            GROUP BY 1, 2
        ), pk AS (
            SELECT pg.st, pg.shard_id,
                   count(*) AS n_pages,
                   sum(CASE WHEN pg.pmin <= b.hi AND pg.pmax >= b.lo
                            THEN 1 ELSE 0 END) AS n_kept
            FROM pg JOIN b ON pg.st = b.st AND pg.shard_id = b.shard_id
            GROUP BY 1, 2
        ), gk AS (
            SELECT rg.st, rg.shard_id,
                   count(*) AS n_rowgroups,
                   sum(CASE WHEN rg.gmin <= b.hi AND rg.gmax >= b.lo
                            THEN 1 ELSE 0 END) AS n_rg_kept
            FROM rg JOIN b ON rg.st = b.st AND rg.shard_id = b.shard_id
            GROUP BY 1, 2
        )
        SELECT sh.st AS st,
               CAST(count(*) AS BIGINT) AS n_shards,
               CAST(sum(sh.n_rows) AS BIGINT) AS n_rows,
               CAST(sum(sh.n_match) AS BIGINT) AS n_match,
               CAST(sum(sh.sum_ckey) AS BIGINT) AS sum_ckey_match,
               CAST(sum(gk.n_rowgroups) AS BIGINT) AS n_rowgroups,
               CAST(sum(gk.n_rg_kept) AS BIGINT) AS n_rg_kept,
               CAST(sum(pk.n_pages) AS BIGINT) AS n_pages,
               CAST(sum(pk.n_kept) AS BIGINT) AS n_pages_kept
        FROM sh JOIN pk
          ON sh.st = pk.st AND sh.shard_id = pk.shard_id
        JOIN gk ON sh.st = gk.st AND sh.shard_id = gk.shard_id
        GROUP BY sh.st ORDER BY sh.st
"""

_PGIDX_ROW_SCHEMA = T.StructType(
    [
        T.StructField("st", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_match", T.LongType()),
        T.StructField("sum_ckey_match", T.LongType()),
        T.StructField("n_rowgroups", T.LongType()),
        T.StructField("n_rg_kept", T.LongType()),
        T.StructField("n_pages", T.LongType()),
        T.StructField("n_pages_kept", T.LongType()),
    ]
)


def parquet_page_prune_real(spark, sf_dir) -> DataFrame:
    """Page-index pruning with no black box (r14, VERDICT r13 ask #6).

    Each (o_orderstatus, okey-range shard) group of ``orders`` is
    written as a parquet file by ``core/parquetwrite.py`` —
    okey-sorted, 64-row pages inside 256-row ROW GROUPS, OffsetIndex
    + ColumnIndex emitted per group, shards rotating all SIX page
    codecs (incl. the r14 LZ4_RAW and hadoop-framed LZ4) and both
    data-page versions.  The
    SAME executor then answers a selective okey-range predicate (the
    shard's 40th-60th percentile keys) the way a 100 TB scan planner
    would, at BOTH planning levels: first drop whole ROW GROUPS whose
    chunk Statistics miss the range (a footer-only decision — dropped
    groups' index bytes are never parsed), then within each survivor
    parse the ColumnIndex, keep only pages whose [min, max]
    intersects the range (``prune_pages``), seek straight to the
    survivors through the OffsetIndex (``indexed_pages`` — skipped
    pages' bytes are never touched), decode okey + ckey from those
    pages alone, and aggregate the predicate rows.  Drift asserts:
    pyarrow sees the expected group count and both indexes on our
    bytes; the file-derived group and page keep sets equal their
    arithmetic twins; every group's chunk Statistics equal the
    arithmetic bounds; the okey ColumnIndex is ASCENDING per group;
    the BYTE_ARRAY tag column's per-page bounds equal their
    arithmetic min/max.  The DuckDB oracle recomputes rows, matches,
    row-group totals, kept-group counts, page totals AND kept-page
    counts from ``orders`` directly — BOTH pruning decisions are
    driver-gated, not just the values.

    100 TB: one shuffle on (status, shard); shard count grows with
    data; per task the index read is O(pages) and the data read is
    O(kept pages) — the point of the structure.
    """
    import io

    import pyarrow.parquet as pq_

    from ..core.parquetmeta import (
        indexed_pages,
        parse_column_index,
        parse_footer,
        prune_pages,
    )
    from ..core.parquetread import leaf_elements, read_column
    from ..core.parquetwrite import write_parquet

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "orders")
        .select(
            F.col("o_orderstatus").alias("st"),
            F.col("o_orderkey").alias("okey"),
            F.col("o_custkey").alias("ckey"),
            F.expr(f"o_orderkey div {PGIDX_SHARD}").alias("shard_id"),
        )
        .repartition(
            spark.sparkContext.defaultParallelism, "st", "shard_id"
        )
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("okey")
        shard_id = int(pdf["shard_id"].iloc[0])
        codec = [
            "UNCOMPRESSED", "SNAPPY", "GZIP", "ZSTD", "LZ4_RAW", "LZ4",
        ][shard_id % 6]
        dpv = 2 if shard_id % 3 == 0 else 1
        okeys = [int(v) for v in pdf["okey"]]
        ckeys = [int(v) for v in pdf["ckey"]]
        tags = [f"t{k % 97:02d}" for k in okeys]
        data = write_parquet(
            {"okey": okeys, "ckey": ckeys, "tag": tags},
            {"okey": "INT64", "ckey": "INT64", "tag": "STRING"},
            codec=codec,
            page_rows=PGIDX_PAGE_ROWS,
            data_page_version=dpv,
            row_group_rows=PGIDX_RG_ROWS,
            # the rows ARE okey-sorted; declare it (SortingColumn)
            sorting_columns=[(0, False, False)],
        )
        n = len(okeys)
        lo = okeys[(n * 2) // 5]
        hi = okeys[(n * 3) // 5]

        # referee 1: pyarrow sees the groups and both index
        # structures on our bytes
        md = pq_.ParquetFile(io.BytesIO(data)).metadata
        n_rgs = (n + PGIDX_RG_ROWS - 1) // PGIDX_RG_ROWS
        if md.num_row_groups != n_rgs:
            raise ValueError(
                f"shard {shard_id}: {md.num_row_groups} row groups, "
                f"expected {n_rgs}"
            )
        for ci_ in range(md.num_columns):
            c = md.row_group(0).column(ci_)
            if not (c.has_column_index and c.has_offset_index):
                raise ValueError(
                    f"shard {shard_id}: pyarrow misses index on col {ci_}"
                )

        meta = parse_footer(data)
        leaves = leaf_elements(meta["schema"])

        # LEVEL 1 — row-group pruning from chunk Statistics (the
        # footer-only decision a planner makes before any page read),
        # checked against the arithmetic bounds
        rg_keep = []
        for gi, rg in enumerate(meta["row_groups"]):
            st_ = rg["columns"][0]["statistics"]
            g_lo = okeys[gi * PGIDX_RG_ROWS]
            g_hi = okeys[min(n, (gi + 1) * PGIDX_RG_ROWS) - 1]
            if (st_["min_value"], st_["max_value"]) != (g_lo, g_hi):
                raise ValueError(
                    f"shard {shard_id}: group {gi} stats drifted"
                )
            if st_["min_value"] <= hi and st_["max_value"] >= lo:
                rg_keep.append(gi)
        expect_rg_keep = [
            g
            for g in range(n_rgs)
            if okeys[g * PGIDX_RG_ROWS] <= hi
            and okeys[min(n, (g + 1) * PGIDX_RG_ROWS) - 1] >= lo
        ]
        if rg_keep != expect_rg_keep:
            raise ValueError(
                f"shard {shard_id}: rg prune {rg_keep} != "
                f"arithmetic {expect_rg_keep}"
            )

        # page ordinals are GLOBAL across groups (RG_ROWS is an exact
        # multiple of PAGE_ROWS, so boundaries coincide)
        pages_per_rg = PGIDX_RG_ROWS // PGIDX_PAGE_ROWS
        n_pages = (n + PGIDX_PAGE_ROWS - 1) // PGIDX_PAGE_ROWS
        expect_keep = [
            p
            for p in range(n_pages)
            if okeys[p * PGIDX_PAGE_ROWS] <= hi
            and okeys[min(n, (p + 1) * PGIDX_PAGE_ROWS) - 1] >= lo
        ]

        # LEVEL 2 — within each surviving group, ColumnIndex page
        # pruning + the OffsetIndex seek read; dropped groups' index
        # bytes are never parsed, dropped pages' data never touched
        got_ok: list = []
        got_ck: list = []
        keep_global: list = []
        for gi in rg_keep:
            cols = meta["row_groups"][gi]["columns"]
            cidx = parse_column_index(data, cols[0])
            if cidx["boundary_order"] != "ASCENDING":
                raise ValueError(
                    f"shard {shard_id}: group {gi} okey index unordered"
                )
            local = prune_pages(cidx, lo, hi)
            keep_global.extend(gi * pages_per_rg + p for p in local)
            got_ok.extend(
                read_column(
                    data, cols[0], leaves[0][0],
                    pages=indexed_pages(data, cols[0], local),
                )
            )
            got_ck.extend(
                read_column(
                    data, cols[1], leaves[1][0],
                    pages=indexed_pages(data, cols[1], local),
                )
            )
            # BYTE_ARRAY bounds: the tag column's per-page entries in
            # this group equal the arithmetic min/max of the page
            tidx = parse_column_index(data, cols[2])
            for p, _np in enumerate(tidx["null_pages"]):
                gp = gi * pages_per_rg + p
                seg = tags[
                    gp * PGIDX_PAGE_ROWS : (gp + 1) * PGIDX_PAGE_ROWS
                ]
                if tidx["min_values"][p] != min(seg).encode() or (
                    tidx["max_values"][p] != max(seg).encode()
                ):
                    raise ValueError(
                        f"shard {shard_id}: tag page {gp} bounds drifted"
                    )
        if keep_global != expect_keep:
            raise ValueError(
                f"shard {shard_id}: file prune {keep_global} != "
                f"arithmetic {expect_keep}"
            )
        expect_rows = [
            v
            for p in expect_keep
            for v in okeys[p * PGIDX_PAGE_ROWS : (p + 1) * PGIDX_PAGE_ROWS]
        ]
        if got_ok != expect_rows:
            raise ValueError(
                f"shard {shard_id}: pruned okey read drifted"
            )
        n_match = 0
        sum_ck = 0
        for k, c in zip(got_ok, got_ck):
            if lo <= k <= hi:
                n_match += 1
                sum_ck += c
        return pd.DataFrame(
            {
                "st": pd.Series([pdf["st"].iloc[0]], dtype="object"),
                "n_rows": pd.Series([n], dtype="int64"),
                "n_match": pd.Series([n_match], dtype="int64"),
                "sum_ckey_match": pd.Series([sum_ck], dtype="int64"),
                "n_rowgroups": pd.Series([n_rgs], dtype="int64"),
                "n_rg_kept": pd.Series([len(rg_keep)], dtype="int64"),
                "n_pages": pd.Series([n_pages], dtype="int64"),
                "n_pages_kept": pd.Series(
                    [len(keep_global)], dtype="int64"
                ),
            }
        )

    shards = d.groupBy("st", "shard_id").applyInPandas(
        _shard, _PGIDX_ROW_SCHEMA
    )
    return (
        shards.groupBy("st")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("n_match").cast("bigint").alias("n_match"),
            F.sum("sum_ckey_match").cast("bigint").alias("sum_ckey_match"),
            F.sum("n_rowgroups").cast("bigint").alias("n_rowgroups"),
            F.sum("n_rg_kept").cast("bigint").alias("n_rg_kept"),
            F.sum("n_pages").cast("bigint").alias("n_pages"),
            F.sum("n_pages_kept").cast("bigint").alias("n_pages_kept"),
        )
        .orderBy("st")
    )


# ---------------------------------------------------------------------------
# Arrow stream: dictionary + view + run-end-encoded columns (r14)
# ---------------------------------------------------------------------------

#: users per shard group — shard count grows with the data
ADV_SHARD = 64
#: REE run length (position-derived, so runs are genuine after the
#: in-shard sort) and the dictionary's modulus pair
ADV_RUN = 8
ADV_CATS = 13

#: the same facts restated in integer arithmetic.  sv is NULL every
#: 7th eid, a short "u{uid}" when eid % 3 != 0 (1 + digits bytes),
#: else "payload-{eid}-" + "x" * (eid % 20) (9 + digits + eid % 20
#: bytes — crossing the 16-byte view struct's 12-byte inline bound in
#: both directions); cat is a 13-value dictionary key from a prime
#: mix (eid reduced mod 1e9 first — BIGINT-safe at any scale); ree is
#: ((rn - 1) // 8) % 5 over the shard's eid order.
ARROW_DICT_VIEWS_ORACLE = f"""
        WITH e AS (
            SELECT event_type AS et,
                   user_id // {ADV_SHARD} AS shard_id,
                   event_id AS eid,
                   user_id AS uid
            FROM events
        ), r AS (
            SELECT et, shard_id, eid, uid,
                   row_number() OVER (
                       PARTITION BY et, shard_id ORDER BY eid
                   ) AS rn,
                   CASE WHEN eid % 7 = 0 THEN NULL
                        WHEN eid % 3 <> 0
                        THEN 1 + length(CAST(uid AS VARCHAR))
                        ELSE 9 + length(CAST(eid AS VARCHAR))
                             + eid % 20 END AS svlen,
                   ((eid % 1000000000) * 2654435761 % 97)
                       % {ADV_CATS} AS cat
            FROM e
        ), sh AS (
            SELECT et, shard_id,
                   count(*) AS n_rows,
                   sum(CASE WHEN svlen IS NULL THEN 1 ELSE 0 END)
                       AS n_null_sv,
                   sum(CASE WHEN svlen IS NULL THEN 0 ELSE svlen END)
                       AS sum_sv_len,
                   sum(CASE WHEN svlen > 12 THEN 1 ELSE 0 END)
                       AS n_spilled,
                   sum(((rn - 1) // {ADV_RUN}) % 5) AS sum_ree,
                   count(DISTINCT cat) AS n_cats
            FROM r GROUP BY 1, 2
        )
        SELECT et,
               CAST(count(*) AS BIGINT) AS n_shards,
               CAST(sum(n_rows) AS BIGINT) AS n_rows,
               CAST(sum(n_null_sv) AS BIGINT) AS n_null_sv,
               CAST(sum(sum_sv_len) AS BIGINT) AS sum_sv_len,
               CAST(sum(n_spilled) AS BIGINT) AS n_spilled,
               CAST(sum(sum_ree) AS BIGINT) AS sum_ree,
               CAST(sum(n_cats) AS BIGINT) AS sum_shard_cats
        FROM sh GROUP BY et ORDER BY et
"""

_ADV_ROW_SCHEMA = T.StructType(
    [
        T.StructField("et", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_null_sv", T.LongType()),
        T.StructField("sum_sv_len", T.LongType()),
        T.StructField("n_spilled", T.LongType()),
        T.StructField("sum_ree", T.LongType()),
        T.StructField("n_cats", T.LongType()),
    ]
)


def ingest_arrow_dict_views(spark, sf_dir) -> DataFrame:
    """Dictionary, Utf8View and RunEndEncoded columns through the
    Arrow IPC STREAM framing, both codec directions (r14, VERDICT r13
    ask #8's named candidate — the r13 dictionary encoder and the r14
    view/REE encoders under the driver gate).

    Each (event_type, user-range shard) group of ``events`` derives
    three deterministic columns: ``cat`` — a 13-value dictionary key;
    ``sv`` — a Utf8View string whose lengths cross the 12-byte inline
    bound both ways (with nulls); ``ree`` — a position-derived
    run-heavy int.  EVEN shards: pyarrow builds the table
    (``dictionary_encode()``, ``string_view`` cast,
    ``pc.run_end_encode``) and writes the stream, OUR reader decodes.
    ODD shards: OUR encoder writes the stream (DictionaryBatch +
    variadic view buffers + (run_ends, values) children), pyarrow
    strict-reads it as the referee and our reader closes the loop.
    Every decoded value is asserted equal to the arithmetic
    reconstruction; the DuckDB oracle restates the aggregates —
    including the spilled-view count and per-shard dictionary
    cardinalities — from ``events`` directly.

    100 TB: one shuffle on (type, shard); Arrow-batched Python; shard
    count grows with the data.
    """
    import io

    import pyarrow as pa_
    import pyarrow.compute as pc_
    import pyarrow.ipc as pa_ipc

    from ..core.arrowipc import (
        FieldSpec,
        encode_arrow_stream,
        read_arrow_stream,
    )

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("et"),
            F.col("event_id").alias("eid"),
            F.col("user_id").alias("uid"),
            F.expr(f"user_id div {ADV_SHARD}").alias("shard_id"),
        )
        .repartition(
            spark.sparkContext.defaultParallelism, "et", "shard_id"
        )
    )

    def _sv(eid: int, uid: int):
        if eid % 7 == 0:
            return None
        if eid % 3 != 0:
            return f"u{uid}"
        return f"payload-{eid}-" + "x" * (eid % 20)

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("eid")
        shard_id = int(pdf["shard_id"].iloc[0])
        eids = [int(v) for v in pdf["eid"]]
        uids = [int(v) for v in pdf["uid"]]
        if len(set(eids)) != len(eids):
            raise ValueError(f"shard {shard_id}: eids not unique")
        svs = [_sv(k, u) for k, u in zip(eids, uids)]
        cats = [
            f"c{((k % 1_000_000_000) * 2654435761 % 97) % ADV_CATS:02d}"
            for k in eids
        ]
        rees = [(i // ADV_RUN) % 5 for i in range(len(eids))]

        if shard_id % 2 == 0:
            # pyarrow writes dict + view + REE, OUR reader decodes
            t = pa_.table(
                {
                    "eid": pa_.array(eids, pa_.int64()),
                    "cat": pa_.array(cats).dictionary_encode(),
                    "sv": pa_.array(svs, pa_.string_view()),
                    "ree": pc_.run_end_encode(
                        pa_.array(rees, pa_.int64())
                    ),
                }
            )
            buf = io.BytesIO()
            with pa_ipc.new_stream(buf, t.schema) as w:
                for b in t.to_batches(max_chunksize=ASTREAM_CHUNK):
                    w.write_batch(b)
            got = read_arrow_stream(buf.getvalue())
            fs = {f.name: f for f in got["fields"]}
            if fs["cat"].dict_id is None:
                raise ValueError(
                    f"shard {shard_id}: cat lost its dictionary"
                )
            if fs["sv"].type_name != "utf8_view" or (
                fs["ree"].type_name != "run_end_encoded"
            ):
                raise ValueError(
                    f"shard {shard_id}: view/REE type tags drifted"
                )
            col = {
                name: [
                    v for b in got["batches"] for v in b["columns"][ci]
                ]
                for ci, name in enumerate(("eid", "cat", "sv", "ree"))
            }
        else:
            # OUR encoder writes, pyarrow strict-reads as referee
            fields = [
                FieldSpec("eid", True, "int64", 64),
                FieldSpec(
                    "cat", True, "utf8", 0,
                    dict_id=1, index_type="int32",
                ),
                FieldSpec("sv", True, "utf8_view", 0),
                FieldSpec("ree", True, "run_end_encoded", 0, children=(
                    FieldSpec("run_ends", False, "int32", 32),
                    FieldSpec("values", True, "int64", 64),
                )),
            ]
            chunks = [
                [
                    eids[at : at + ASTREAM_CHUNK],
                    cats[at : at + ASTREAM_CHUNK],
                    svs[at : at + ASTREAM_CHUNK],
                    rees[at : at + ASTREAM_CHUNK],
                ]
                for at in range(0, len(eids), ASTREAM_CHUNK)
            ] or [[[], [], [], []]]
            own = encode_arrow_stream(fields, chunks)
            ref = pa_ipc.open_stream(io.BytesIO(own)).read_all()
            if not pa_.types.is_dictionary(ref.schema.field("cat").type):
                raise ValueError(
                    f"shard {shard_id}: own dict column lost its "
                    "encoding"
                )
            col = {
                "eid": ref.column("eid").to_pylist(),
                "cat": ref.column("cat").to_pylist(),
                "sv": ref.column("sv").to_pylist(),
                "ree": ref.column("ree").to_pylist(),
            }
            # our reader closes the loop on our own bytes
            got = read_arrow_stream(own)
            own_cols = {
                name: [
                    v for b in got["batches"] for v in b["columns"][ci]
                ]
                for ci, name in enumerate(("eid", "cat", "sv", "ree"))
            }
            if own_cols != col:
                raise ValueError(
                    f"shard {shard_id}: own-reader disagrees with "
                    "pyarrow on own bytes"
                )
        if col["eid"] != eids:
            raise ValueError(f"shard {shard_id}: eid drifted")
        if col["cat"] != cats:
            raise ValueError(f"shard {shard_id}: dict column drifted")
        if col["sv"] != svs:
            raise ValueError(f"shard {shard_id}: view column drifted")
        if col["ree"] != rees:
            raise ValueError(f"shard {shard_id}: REE column drifted")
        return pd.DataFrame(
            {
                "et": pd.Series([pdf["et"].iloc[0]], dtype="object"),
                "n_rows": pd.Series([len(eids)], dtype="int64"),
                "n_null_sv": pd.Series(
                    [sum(1 for v in svs if v is None)], dtype="int64"
                ),
                "sum_sv_len": pd.Series(
                    [
                        sum(
                            len(v.encode("utf-8"))
                            for v in svs
                            if v is not None
                        )
                    ],
                    dtype="int64",
                ),
                "n_spilled": pd.Series(
                    [
                        sum(
                            1
                            for v in svs
                            if v is not None
                            and len(v.encode("utf-8")) > 12
                        )
                    ],
                    dtype="int64",
                ),
                "sum_ree": pd.Series([sum(rees)], dtype="int64"),
                "n_cats": pd.Series([len(set(cats))], dtype="int64"),
            }
        )

    shards = d.groupBy("et", "shard_id").applyInPandas(
        _shard, _ADV_ROW_SCHEMA
    )
    return (
        shards.groupBy("et")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("n_null_sv").cast("bigint").alias("n_null_sv"),
            F.sum("sum_sv_len").cast("bigint").alias("sum_sv_len"),
            F.sum("n_spilled").cast("bigint").alias("n_spilled"),
            F.sum("sum_ree").cast("bigint").alias("sum_ree"),
            F.sum("n_cats").cast("bigint").alias("sum_shard_cats"),
        )
        .orderBy("et")
    )


# ---------------------------------------------------------------------------
# r14 staged: BodyCompression through the Arrow IPC codec, both
# framings x both codecs x both writers
# ---------------------------------------------------------------------------

#: orderkey-range shard width (>= 8 shards even at sf0.001 so every
#: (framing, codec, writer) combo is exercised at every scale)
ACMP_SHARD = 128

ARROW_COMPRESSED_ORACLE = f"""
        WITH l AS (
            SELECT l_orderkey * 8 + l_linenumber AS oid,
                   l_orderkey // {ACMP_SHARD} AS shard_id,
                   l_quantity AS qty,
                   l_returnflag AS flag
            FROM lineitem
            WHERE l_orderkey IS NOT NULL AND l_orderkey >= 0
              AND l_linenumber IS NOT NULL AND l_linenumber >= 0
              AND l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
        ), r AS (
            SELECT shard_id, shard_id % 8 AS combo, oid, qty, flag,
                   CASE WHEN oid % 7 = 0 THEN NULL
                        ELSE 6 + length(CAST(oid AS VARCHAR))
                             + (oid % 23) END AS comlen
            FROM l
        ), sh AS (
            SELECT combo, shard_id,
                   count(*) AS n_rows,
                   sum(CASE WHEN comlen IS NULL THEN 1 ELSE 0 END)
                       AS n_null_com,
                   sum(COALESCE(comlen, 0)) AS sum_com_len,
                   sum(CAST(floor(qty * 100 + 0.5) AS BIGINT))
                       AS sum_qty_cents,
                   count(DISTINCT flag) AS n_flags,
                   max(oid) AS max_oid
            FROM r GROUP BY 1, 2
        )
        SELECT combo,
               CAST(count(*) AS BIGINT) AS n_shards,
               CAST(sum(n_rows) AS BIGINT) AS n_rows,
               CAST(sum(n_null_com) AS BIGINT) AS n_null_com,
               CAST(sum(sum_com_len) AS BIGINT) AS sum_com_len,
               CAST(sum(sum_qty_cents) AS BIGINT) AS sum_qty_cents,
               CAST(sum(n_flags) AS BIGINT) AS sum_shard_flags,
               CAST(max(max_oid) AS BIGINT) AS max_oid
        FROM sh GROUP BY combo ORDER BY combo
"""

_ACMP_ROW_SCHEMA = T.StructType(
    [
        T.StructField("combo", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_null_com", T.LongType()),
        T.StructField("sum_com_len", T.LongType()),
        T.StructField("sum_qty_cents", T.LongType()),
        T.StructField("n_flags", T.LongType()),
        T.StructField("max_oid", T.LongType()),
    ]
)


def ingest_arrow_compressed(spark, sf_dir) -> DataFrame:
    """BodyCompression-framed Arrow IPC bodies through BOTH codecs
    (LZ4_FRAME, ZSTD), BOTH framings (file, stream) and BOTH writers
    (ours, pyarrow's) — the r14 encoder-side compression under the
    driver gate.

    Each orderkey-range shard of ``lineitem`` derives four columns
    (unique ``oid``, ``qty``, a dictionary-encoded ``flag``, a
    nullable synthesized ``com`` string whose repetitiveness
    guarantees real compression).  ``shard_id % 8`` picks the combo:
    codec = lz4/zstd (bit 0), framing = file/stream (bit 1), writer =
    ours/pyarrow (bit 2).  Ours-writes shards: our compressing
    encoder emits the blob, the shard ASSERTS it is smaller than our
    uncompressed encoding (the compression engaged — not the -1
    stored-raw escape), pyarrow strict-reads it as referee and our
    reader closes the loop.  Pyarrow-writes shards:
    ``IpcWriteOptions(compression=...)`` emits the blob and OUR
    reader decodes it.  Every decoded column is asserted equal to the
    arithmetic reconstruction; the DuckDB oracle restates the
    per-combo aggregates from ``lineitem`` directly, so all eight
    codec paths are hash-gated every round.

    100 TB: one shuffle on shard_id; Arrow-batched Python; shard
    count grows linearly with the data and each shard's state is a
    few hundred rows.
    """
    import io
    import math

    import pyarrow as pa_
    import pyarrow.ipc as pa_ipc

    from ..core.arrowipc import (
        FieldSpec,
        encode_arrow_ipc,
        encode_arrow_stream,
        read_arrow_ipc,
        read_arrow_stream,
    )

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "lineitem")
        .where(
            # >= 0 keeps oid arithmetic (% 7, % 23) sign-consistent
            # between Python and the SQL oracle
            F.col("l_orderkey").isNotNull()
            & (F.col("l_orderkey") >= 0)
            & F.col("l_linenumber").isNotNull()
            & (F.col("l_linenumber") >= 0)
            & F.col("l_quantity").isNotNull()
            & F.col("l_returnflag").isNotNull()
        )
        .select(
            (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias(
                "oid"
            ),
            F.col("l_quantity").alias("qty"),
            F.col("l_returnflag").alias("flag"),
            F.expr(f"l_orderkey div {ACMP_SHARD}").alias("shard_id"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "shard_id")
    )

    def _com(oid: int):
        if oid % 7 == 0:
            return None
        return f"note-{oid}-" + "y" * (oid % 23)

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("oid")
        shard_id = int(pdf["shard_id"].iloc[0])
        combo = shard_id % 8
        codec = "lz4" if combo % 2 == 0 else "zstd"
        use_file = (combo // 2) % 2 == 0
        ours_write = combo < 4
        # oids are NOT unique (the synthetic lineitem repeats
        # (orderkey, linenumber)); nothing below depends on it —
        # every assert compares the decode against the same sorted
        # order the encode consumed
        oids = [int(v) for v in pdf["oid"]]
        qtys = [float(v) for v in pdf["qty"]]
        flags = [str(v) for v in pdf["flag"]]
        coms = [_com(k) for k in oids]

        if ours_write:
            fields = [
                FieldSpec("oid", False, "int64", 64),
                FieldSpec("qty", False, "float64", 64),
                FieldSpec(
                    "flag", True, "utf8", 0,
                    dict_id=1, index_type="int32",
                ),
                FieldSpec("com", True, "utf8", 0),
            ]
            chunks = [
                [
                    oids[at: at + ASTREAM_CHUNK],
                    qtys[at: at + ASTREAM_CHUNK],
                    flags[at: at + ASTREAM_CHUNK],
                    coms[at: at + ASTREAM_CHUNK],
                ]
                for at in range(0, len(oids), ASTREAM_CHUNK)
            ]
            enc = encode_arrow_ipc if use_file else encode_arrow_stream
            own = enc(fields, chunks, compression=codec)
            plain = enc(fields, chunks)
            if len(own) >= len(plain):
                raise ValueError(
                    f"shard {shard_id}: {codec} blob did not shrink "
                    f"({len(own)} >= {len(plain)})"
                )
            opener = pa_ipc.open_file if use_file else pa_ipc.open_stream
            ref = opener(io.BytesIO(own)).read_all()
            ref.validate(full=True)
            if not pa_.types.is_dictionary(
                ref.schema.field("flag").type
            ):
                raise ValueError(
                    f"shard {shard_id}: flag lost its dictionary"
                )
            col = {
                name: ref.column(name).to_pylist()
                for name in ("oid", "qty", "flag", "com")
            }
            reader = read_arrow_ipc if use_file else read_arrow_stream
            got = reader(own)
            own_cols = {
                name: [
                    v for b in got["batches"] for v in b["columns"][ci]
                ]
                for ci, name in enumerate(("oid", "qty", "flag", "com"))
            }
            if own_cols != col:
                raise ValueError(
                    f"shard {shard_id}: own-reader disagrees with "
                    "pyarrow on own bytes"
                )
        else:
            t = pa_.table(
                {
                    "oid": pa_.array(oids, pa_.int64()),
                    "qty": pa_.array(qtys, pa_.float64()),
                    "flag": pa_.array(flags).dictionary_encode(),
                    "com": pa_.array(coms, pa_.string()),
                }
            )
            opts = pa_ipc.IpcWriteOptions(compression=codec)
            buf = io.BytesIO()
            writer_cls = (
                pa_ipc.new_file if use_file else pa_ipc.new_stream
            )
            with writer_cls(buf, t.schema, options=opts) as w:
                for b in t.to_batches(max_chunksize=ASTREAM_CHUNK):
                    w.write_batch(b)
            blob = buf.getvalue()
            reader = read_arrow_ipc if use_file else read_arrow_stream
            got = reader(blob)
            col = {
                name: [
                    v for b in got["batches"] for v in b["columns"][ci]
                ]
                for ci, name in enumerate(("oid", "qty", "flag", "com"))
            }
        if col["oid"] != oids:
            raise ValueError(f"shard {shard_id}: oid drifted")
        if col["qty"] != qtys:
            raise ValueError(f"shard {shard_id}: qty drifted")
        if col["flag"] != flags:
            raise ValueError(f"shard {shard_id}: flag drifted")
        if col["com"] != coms:
            raise ValueError(f"shard {shard_id}: com drifted")
        return pd.DataFrame(
            {
                "combo": pd.Series([combo], dtype="int64"),
                "n_rows": pd.Series([len(oids)], dtype="int64"),
                "n_null_com": pd.Series(
                    [sum(1 for v in coms if v is None)], dtype="int64"
                ),
                "sum_com_len": pd.Series(
                    [sum(len(v) for v in coms if v is not None)],
                    dtype="int64",
                ),
                "sum_qty_cents": pd.Series(
                    [
                        sum(
                            int(math.floor(q * 100 + 0.5))
                            for q in qtys
                        )
                    ],
                    dtype="int64",
                ),
                "n_flags": pd.Series([len(set(flags))], dtype="int64"),
                "max_oid": pd.Series([max(oids)], dtype="int64"),
            }
        )

    shards = d.groupBy("shard_id").applyInPandas(
        _shard, _ACMP_ROW_SCHEMA
    )
    return (
        shards.groupBy("combo")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("n_null_com").cast("bigint").alias("n_null_com"),
            F.sum("sum_com_len").cast("bigint").alias("sum_com_len"),
            F.sum("sum_qty_cents").cast("bigint").alias(
                "sum_qty_cents"
            ),
            F.sum("n_flags").cast("bigint").alias("sum_shard_flags"),
            F.max("max_oid").cast("bigint").alias("max_oid"),
        )
        .orderBy("combo")
    )


# ---------------------------------------------------------------------------
# r14 staged: split-block Bloom filter row-group pruning, oracle-gated
# ---------------------------------------------------------------------------

#: okey-range shard width for the bloom query (with the status split,
#: ~4 row groups per shard file at the 128-row group bound)
BLF_SHARD = 4096
BLF_RG_ROWS = 128
BLF_PROBES = 12

#: the probe keys are DERIVED (1 + (shard*7919 + i*104729) mod the
#: shard's max custkey), so the oracle regenerates them exactly; the
#: bloom DECISIONS are gated in-UDF (no false negative vs a full
#: verification scan, bloom-guided results == full-scan results,
#: pruning must actually engage), the found VALUES are gated here.
PARQUET_BLOOM_PRUNE_ORACLE = f"""
        WITH e AS (
            SELECT o_orderstatus AS st,
                   o_orderkey AS okey,
                   o_custkey AS ckey,
                   o_orderkey // {BLF_SHARD} AS shard_id
            FROM orders
            WHERE o_orderkey IS NOT NULL AND o_orderkey >= 0
              AND o_custkey IS NOT NULL AND o_custkey >= 1
              AND o_orderstatus IS NOT NULL
        ), mx AS (
            SELECT st, shard_id, max(ckey) AS m, count(*) AS n_rows
            FROM e GROUP BY 1, 2
        ), pd AS (
            SELECT DISTINCT st, shard_id,
                   1 + (shard_id * 7919 + t.i * 104729) % m AS key
            FROM mx CROSS JOIN range(0, {BLF_PROBES}) t(i)
        ), f AS (
            SELECT pd.st, pd.shard_id, pd.key,
                   count(e.okey) AS n_found,
                   COALESCE(sum(e.okey), 0) AS sum_okey
            FROM pd LEFT JOIN e
              ON e.st = pd.st AND e.shard_id = pd.shard_id
             AND e.ckey = pd.key
            GROUP BY 1, 2, 3
        ), sh AS (
            SELECT st, shard_id,
                   count(*) AS n_probes,
                   sum(CASE WHEN n_found > 0 THEN 1 ELSE 0 END)
                       AS n_hit,
                   sum(n_found) AS n_found,
                   sum(sum_okey) AS sum_okey_found
            FROM f GROUP BY 1, 2
        )
        SELECT mx.st AS st,
               CAST(count(*) AS BIGINT) AS n_shards,
               CAST(sum(mx.n_rows) AS BIGINT) AS n_rows,
               CAST(sum(sh.n_probes) AS BIGINT) AS n_probes,
               CAST(sum(sh.n_hit) AS BIGINT) AS n_hit_probes,
               CAST(sum(sh.n_found) AS BIGINT) AS n_found,
               CAST(sum(sh.sum_okey_found) AS BIGINT) AS sum_okey_found
        FROM mx JOIN sh
          ON mx.st = sh.st AND mx.shard_id = sh.shard_id
        GROUP BY mx.st ORDER BY mx.st
"""

_BLF_ROW_SCHEMA = T.StructType(
    [
        T.StructField("st", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_probes", T.LongType()),
        T.StructField("n_hit", T.LongType()),
        T.StructField("n_found", T.LongType()),
        T.StructField("sum_okey", T.LongType()),
    ]
)


def parquet_bloom_prune_real(spark, sf_dir) -> DataFrame:
    """Split-block Bloom filter pruning with no black box (r14).

    Each (o_orderstatus, okey-range shard) group of ``orders`` is
    written as a parquet file by ``core/parquetwrite.py`` with one
    SBBF per ckey row-group chunk (``bloom_filter_columns``,
    BloomFilter.md layout, from-scratch XXH64); odd shards also
    DELTA_BINARY_PACK the okey-sorted key column, putting the r14
    delta write+read path under the same gate.  The SAME executor
    then answers {BLF_PROBES} derived equality probes per shard the
    way a 100 TB point-lookup planner would: parse each group's
    filter (``parse_bloom_filter``), scan ONLY the groups whose
    filter might contain the key, and aggregate the matches.  Drift
    asserts: every group carries a filter; no probe's
    bloom-rejected group actually contains the key (the structure's
    false-negative-free guarantee, checked against a full
    verification scan of every group); the bloom-guided match count
    and okey sum equal the full-scan answers; and across the probe
    battery at least one (key, group) pair was pruned whenever the
    shard has >= 2 groups (the filter does WORK — pyarrow 16 /
    DuckDB 1.0 can neither write nor read these structures, so the
    gate is this arithmetic referee plus the oracle's value hash).
    The DuckDB oracle regenerates the probe keys (1 + (shard*7919 +
    i*104729) mod max ckey) and restates rows, probes, hits and
    found-row aggregates from ``orders`` directly.

    100 TB: one shuffle on (status, shard); shard count grows with
    the data; per probe the planner touches O(groups) filter bytes
    and O(surviving groups) data bytes — the point of the structure.
    """
    import io

    import pyarrow.parquet as pq_

    from ..core.parquetmeta import parse_bloom_filter, parse_footer
    from ..core.parquetread import leaf_elements, read_column
    from ..core.parquetwrite import write_parquet

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "orders")
        .where(
            F.col("o_orderkey").isNotNull()
            & (F.col("o_orderkey") >= 0)
            & F.col("o_custkey").isNotNull()
            & (F.col("o_custkey") >= 1)
            & F.col("o_orderstatus").isNotNull()
        )
        .select(
            F.col("o_orderstatus").alias("st"),
            F.col("o_orderkey").alias("okey"),
            F.col("o_custkey").alias("ckey"),
            F.expr(f"o_orderkey div {BLF_SHARD}").alias("shard_id"),
        )
        .repartition(
            spark.sparkContext.defaultParallelism, "st", "shard_id"
        )
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("okey")
        shard_id = int(pdf["shard_id"].iloc[0])
        okeys = [int(v) for v in pdf["okey"]]
        ckeys = [int(v) for v in pdf["ckey"]]
        n = len(okeys)
        mx = max(ckeys)
        keys = sorted(
            {
                1 + (shard_id * 7919 + i * 104729) % mx
                for i in range(BLF_PROBES)
            }
        )
        data = write_parquet(
            {"okey": okeys, "ckey": ckeys},
            {"okey": "INT64", "ckey": "INT64"},
            codec="SNAPPY",
            row_group_rows=BLF_RG_ROWS,
            sorting_columns=[(0, False, False)],
            bloom_filter_columns=["ckey"],
            # odd shards DELTA-pack the sorted okey column (r14) so
            # the delta read path is under the driver gate too
            column_encodings=(
                {"okey": "DELTA_BINARY_PACKED"}
                if shard_id % 2
                else None
            ),
            # every page CRC-stamped; our reader verifies each one
            page_checksums=True,
        )
        if pq_.ParquetFile(io.BytesIO(data)).metadata.num_rows != n:
            raise ValueError(f"shard {shard_id}: pyarrow row drift")

        meta = parse_footer(data)
        leaves = {
            le["name"]: le
            for le, _rep in leaf_elements(meta["schema"])
        }
        groups = []  # (bloom, ckey values, okey values)
        for rg in meta["row_groups"]:
            cols = {c["path_in_schema"]: c for c in rg["columns"]}
            f = parse_bloom_filter(data, cols["ckey"])
            if f is None:
                raise ValueError(
                    f"shard {shard_id}: group missing its bloom"
                )
            gck = read_column(data, cols["ckey"], leaves["ckey"])
            gok = read_column(data, cols["okey"], leaves["okey"])
            groups.append((f, gck, gok))

        n_hit = n_found = sum_okey = 0
        pruned_pairs = 0
        for key in keys:
            kept = [
                gi for gi, (f, _c, _o) in enumerate(groups)
                if f.might_contain(key, "INT64")
            ]
            pruned_pairs += len(groups) - len(kept)
            full_found = full_sum = 0
            for gi, (_f, gck, gok) in enumerate(groups):
                hits = [o for c, o in zip(gck, gok) if c == key]
                if hits and gi not in kept:
                    raise ValueError(
                        f"shard {shard_id}: bloom FALSE NEGATIVE on "
                        f"key {key} group {gi}"
                    )
                full_found += len(hits)
                full_sum += sum(hits)
            bl_found = bl_sum = 0
            for gi in kept:
                _f, gck, gok = groups[gi]
                hits = [o for c, o in zip(gck, gok) if c == key]
                bl_found += len(hits)
                bl_sum += sum(hits)
            if (bl_found, bl_sum) != (full_found, full_sum):
                raise ValueError(
                    f"shard {shard_id}: bloom-guided scan lost rows "
                    f"on key {key}"
                )
            n_hit += 1 if full_found else 0
            n_found += full_found
            sum_okey += full_sum
        if len(groups) >= 2 and pruned_pairs == 0:
            raise ValueError(
                f"shard {shard_id}: bloom pruned nothing across "
                f"{len(keys)} probes x {len(groups)} groups"
            )
        return pd.DataFrame(
            {
                "st": pd.Series(
                    [str(pdf["st"].iloc[0])], dtype="object"
                ),
                "n_rows": pd.Series([n], dtype="int64"),
                "n_probes": pd.Series([len(keys)], dtype="int64"),
                "n_hit": pd.Series([n_hit], dtype="int64"),
                "n_found": pd.Series([n_found], dtype="int64"),
                "sum_okey": pd.Series([sum_okey], dtype="int64"),
            }
        )

    shards = d.groupBy("st", "shard_id").applyInPandas(
        _shard, _BLF_ROW_SCHEMA
    )
    return (
        shards.groupBy("st")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("n_probes").cast("bigint").alias("n_probes"),
            F.sum("n_hit").cast("bigint").alias("n_hit_probes"),
            F.sum("n_found").cast("bigint").alias("n_found"),
            F.sum("sum_okey").cast("bigint").alias("sum_okey_found"),
        )
        .orderBy("st")
    )


# ---------------------------------------------------------------------------
# r14 staged: ORC stripe VALUE decode under the oracle gate
# ---------------------------------------------------------------------------

OV_SHARD = 4096

#: per-shard facts the oracle restates from ``orders`` directly; the
#: decode itself is gated in-UDF (our values == pyarrow's ORC reader
#: == the arithmetic reconstruction, and the dictionary-encoding
#: steering actually took).
ORC_VALUES_ORACLE = f"""
        WITH e AS (
            SELECT o_orderkey AS okey,
                   o_orderkey // {OV_SHARD} AS shard_id
            FROM orders
            WHERE o_orderkey IS NOT NULL AND o_orderkey >= 0
        ), r AS (
            SELECT shard_id, shard_id % 10 AS combo, okey,
                   (okey % 1000000000) * 2654435761 % 2147483647
                       AS rnd,
                   CASE WHEN okey % 97 = 0
                        THEN 1000000000000 + okey
                        ELSE okey % 100 END AS patch,
                   CASE WHEN okey % 7 = 0 THEN NULL
                        ELSE 2 + length(CAST(okey AS VARCHAR))
                        END AS notelen,
                   CASE WHEN okey % 3 = 0 THEN 1 ELSE 0 END AS flg
            FROM e
        ), sh AS (
            SELECT combo, shard_id,
                   count(*) AS n_rows,
                   sum(okey) AS sum_okey,
                   sum(rnd) AS sum_rnd,
                   sum(patch) AS sum_patch,
                   sum(CASE WHEN notelen IS NULL THEN 1 ELSE 0 END)
                       AS n_null_note,
                   sum(COALESCE(notelen, 0)) AS sum_note_len,
                   sum(flg) AS n_flag
            FROM r GROUP BY 1, 2
        )
        SELECT combo,
               CAST(count(*) AS BIGINT) AS n_shards,
               CAST(sum(n_rows) AS BIGINT) AS n_rows,
               CAST(sum(sum_okey) AS BIGINT) AS sum_okey,
               CAST(sum(sum_rnd) AS BIGINT) AS sum_rnd,
               CAST(sum(sum_patch) AS BIGINT) AS sum_patch,
               CAST(sum(n_null_note) AS BIGINT) AS n_null_note,
               CAST(sum(sum_note_len) AS BIGINT) AS sum_note_len,
               CAST(sum(n_flag) AS BIGINT) AS n_flag
        FROM sh GROUP BY combo ORDER BY combo
"""

_OV_ROW_SCHEMA = T.StructType(
    [
        T.StructField("combo", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("sum_okey", T.LongType()),
        T.StructField("sum_rnd", T.LongType()),
        T.StructField("sum_patch", T.LongType()),
        T.StructField("n_null_note", T.LongType()),
        T.StructField("sum_note_len", T.LongType()),
        T.StructField("n_flag", T.LongType()),
    ]
)


def ingest_orc_values_real(spark, sf_dir) -> DataFrame:
    """ORC stripe VALUE decode with no black box (r14 — the read half
    ``core/orcread.py`` under the driver gate, completing the
    metadata-only ``ingest_orc_shards``).

    Each okey-range shard of ``orders`` derives six columns whose
    shapes steer every RLEv2 sub-encoding (sorted okey -> DELTA, a
    Knuth-mix rnd -> DIRECT, mostly-small-with-outliers -> a
    PATCHED_BASE candidate, a 19-value category string, a nullable
    note, a bool), writes them as a REAL ORC file with pyarrow (the
    independent producer; codec rotating NONE/ZLIB/SNAPPY/LZ4/ZSTD by
    shard, dictionary encoding forced on odd shards and off on even),
    and OUR from-scratch reader decodes every stream back: stripe
    footers on the miniproto runtime, byte-RLE present bitmaps,
    RLEv2 runs, dictionary/direct strings, IEEE doubles.  Drift
    asserts: our decode equals pyarrow's own ORC read-back AND the
    arithmetic reconstruction column-for-column; odd shards really
    carry DICTIONARY_V2 for the category column and even shards
    DIRECT_V2.  The DuckDB oracle restates every aggregate from
    ``orders`` directly.

    100 TB: one shuffle on shard_id; shard count grows with the data;
    per-shard decode cost is O(rows) with fixed-size stream state.
    """
    import io

    import pyarrow as pa_
    from pyarrow import orc as pa_orc

    from ..core.orcread import (
        E_DICTIONARY_V2,
        E_DIRECT_V2,
        parse_stripe_footer,
        read_orc_columns,
    )
    from ..core.orcmeta import parse_orc_meta

    prep(spark)
    d = (
        load_spread(spark, sf_dir, "orders")
        .where(
            F.col("o_orderkey").isNotNull()
            & (F.col("o_orderkey") >= 0)
        )
        .select(
            F.col("o_orderkey").alias("okey"),
            F.expr(f"o_orderkey div {OV_SHARD}").alias("shard_id"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "shard_id")
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("okey")
        shard_id = int(pdf["shard_id"].iloc[0])
        codec = ["uncompressed", "zlib", "snappy", "lz4", "zstd"][
            shard_id % 5
        ]
        use_dict = shard_id % 2 == 1
        okeys = [int(v) for v in pdf["okey"]]
        rnds = [
            (k % 1_000_000_000) * 2654435761 % 2147483647
            for k in okeys
        ]
        patches = [
            1_000_000_000_000 + k if k % 97 == 0 else k % 100
            for k in okeys
        ]
        cats = [f"c{k % 19}" for k in okeys]
        notes = [
            None if k % 7 == 0 else f"n-{k}" for k in okeys
        ]
        prices = [k * 0.25 for k in okeys]
        flags = [k % 3 == 0 for k in okeys]
        t = pa_.table(
            {
                "okey": pa_.array(okeys, pa_.int64()),
                "rnd": pa_.array(rnds, pa_.int64()),
                "patch": pa_.array(patches, pa_.int64()),
                "cat": pa_.array(cats, pa_.string()),
                "note": pa_.array(notes, pa_.string()),
                "price": pa_.array(prices, pa_.float64()),
                "flag": pa_.array(flags, pa_.bool_()),
            }
        )
        buf = io.BytesIO()
        pa_orc.write_table(
            t,
            buf,
            compression=codec,
            dictionary_key_size_threshold=0.9 if use_dict else 0.0,
        )
        blob = buf.getvalue()

        got = read_orc_columns(blob)
        back = pa_orc.ORCFile(io.BytesIO(blob)).read()
        for name in t.column_names:
            ours = got[name]
            if ours != back.column(name).to_pylist():
                raise ValueError(
                    f"shard {shard_id}: {name} disagrees with "
                    "pyarrow's read-back"
                )
            if ours != t.column(name).to_pylist():
                raise ValueError(
                    f"shard {shard_id}: {name} drifted from the "
                    "reconstruction"
                )
        # the dictionary steering really took (cat is column id of
        # 'cat' in the pre-order type tree)
        meta = parse_orc_meta(blob)
        meta["compression_id"] = {
            "NONE": 0, "ZLIB": 1, "SNAPPY": 2, "LZ4": 4, "ZSTD": 5,
        }[meta["compression"]]
        root = meta["types"][0]
        cat_id = root["subtypes"][root["field_names"].index("cat")]
        want_enc = E_DICTIONARY_V2 if use_dict else E_DIRECT_V2
        for stripe in meta["stripes"]:
            sf = parse_stripe_footer(blob, meta, stripe)
            if sf["encodings"][cat_id]["kind"] != want_enc:
                raise ValueError(
                    f"shard {shard_id}: cat encoding "
                    f"{sf['encodings'][cat_id]['kind']} != {want_enc}"
                )
        return pd.DataFrame(
            {
                "combo": pd.Series([shard_id % 10], dtype="int64"),
                "n_rows": pd.Series([len(okeys)], dtype="int64"),
                "sum_okey": pd.Series([sum(okeys)], dtype="int64"),
                "sum_rnd": pd.Series([sum(rnds)], dtype="int64"),
                "sum_patch": pd.Series([sum(patches)], dtype="int64"),
                "n_null_note": pd.Series(
                    [sum(1 for v in notes if v is None)], dtype="int64"
                ),
                "sum_note_len": pd.Series(
                    [sum(len(v) for v in notes if v is not None)],
                    dtype="int64",
                ),
                "n_flag": pd.Series([sum(flags)], dtype="int64"),
            }
        )

    shards = d.groupBy("shard_id").applyInPandas(_shard, _OV_ROW_SCHEMA)
    return (
        shards.groupBy("combo")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("sum_okey").cast("bigint").alias("sum_okey"),
            F.sum("sum_rnd").cast("bigint").alias("sum_rnd"),
            F.sum("sum_patch").cast("bigint").alias("sum_patch"),
            F.sum("n_null_note").cast("bigint").alias("n_null_note"),
            F.sum("sum_note_len").cast("bigint").alias("sum_note_len"),
            F.sum("n_flag").cast("bigint").alias("n_flag"),
        )
        .orderBy("combo")
    )
