#!/usr/bin/env python
"""Correctness sweep for STAGED queries (built + oracled, not yet in
the scoring registry).

Mirrors scripts/check_oracle.py's comparison exactly (same multiset/
string normalization as the driver gate) over the staged manifest
below, so the committed run log is audit-grade evidence for queries
that have no CORRECTNESS_r{N} row yet — the same every-registration-
has-committed-evidence discipline the registered surface follows.

    python scripts/check_staged.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from check_oracle import TABLES, frame_multiset  # noqa: E402


def staged_manifest():
    """name -> (query_fn, oracle_sql). Import inside so a broken
    module names itself in the failure output."""
    from databatchprotectionservice_spark.operators import (
        dedup,
        graph,
        ingest,
        multimodal,
        profiling,
        protection,
        relational,
        streamops,
        textops,
    )

    return {
        "dedup_jaccard_prefix": (
            dedup.dedup_jaccard_prefix, dedup.JACCARD_PREFIX_ORACLE),
        "triangle_suppliers": (
            graph.triangle_suppliers, graph.TRIANGLE_ORACLE),
        "ingest_warc_chain": (
            ingest.ingest_warc_chain, ingest.WARC_CHAIN_ORACLE),
        "ingest_webdataset_tar": (
            ingest.ingest_webdataset_tar, ingest.WEBDATASET_TAR_ORACLE),
        "ingest_zip_members": (
            ingest.ingest_zip_members, ingest.ZIP_MEMBERS_ORACLE),
        "ingest_tfrecord_shards": (
            ingest.ingest_tfrecord_shards, ingest.TFRECORD_SHARDS_ORACLE),
        "ingest_avro_blocks": (
            ingest.ingest_avro_blocks, ingest.AVRO_BLOCKS_ORACLE),
        "ingest_tfexample_shards": (
            ingest.ingest_tfexample_shards, ingest.TFEXAMPLE_SHARDS_ORACLE),
        "ingest_orc_shards": (
            ingest.ingest_orc_shards, ingest.ORC_SHARDS_ORACLE),
        "ingest_msgpack_events": (
            ingest.ingest_msgpack_events, ingest.MSGPACK_EVENTS_ORACLE),
        "ingest_zstd_frames": (
            ingest.ingest_zstd_frames, ingest.ZSTD_FRAMES_ORACLE),
        "ingest_lz4_frames": (
            ingest.ingest_lz4_frames, ingest.LZ4_FRAMES_ORACLE),
        "parquet_footer_audit": (
            ingest.parquet_footer_audit, ingest.PARQUET_FOOTER_ORACLE),
        "parquet_column_read_real": (
            ingest.parquet_column_read_real, ingest.PARQUET_READ_ORACLE),
        "parquet_write_real": (
            ingest.parquet_write_real, ingest.PARQUET_WRITE_ORACLE),
        "txnlog_snapshot_scan": (
            ingest.txnlog_snapshot_scan, ingest.TXNLOG_SNAPSHOT_ORACLE),
        "txnlog_time_travel": (
            ingest.txnlog_time_travel, ingest.TXNLOG_TIME_TRAVEL_ORACLE),
        "txnlog_bloom_point_lookup": (
            ingest.txnlog_bloom_point_lookup, ingest.TXNLOG_BLOOM_ORACLE),
        "protect_parquet_pages_real": (
            protection.protect_parquet_pages_real,
            protection.PROTECT_REAL_PAGES_ORACLE),
        "decontaminate_bloom_prefilter": (
            textops.decontaminate_bloom_prefilter,
            textops.DECON_BLOOM_ORACLE),
        "text_gopher_rules": (
            textops.text_gopher_rules, textops.GOPHER_RULES_ORACLE),
        "dedup_substring_coverage": (
            dedup.dedup_substring_coverage,
            dedup.SUBSTRING_COVERAGE_ORACLE),
        "multimodal_video_mjpeg_stats": (
            multimodal.multimodal_video_mjpeg_stats,
            multimodal.MJPEG_STATS_ORACLE),
        "multimodal_image_qoi_stats": (
            multimodal.multimodal_image_qoi_stats,
            multimodal.QOI_STATS_ORACLE),
        "multimodal_image_jls_stats": (
            multimodal.multimodal_image_jls_stats,
            multimodal.JLS_STATS_ORACLE),
        "multimodal_audio_mp3_walk": (
            multimodal.multimodal_audio_mp3_walk,
            multimodal.MP3_WALK_ORACLE),
        "ingest_ogg_packets": (
            ingest.ingest_ogg_packets, ingest.OGG_PACKETS_ORACLE),
        "ingest_mkv_tracks": (
            ingest.ingest_mkv_tracks, ingest.MKV_TRACKS_ORACLE),
        "multimodal_audio_g711_stats": (
            multimodal.multimodal_audio_g711_stats,
            multimodal.G711_STATS_ORACLE),
        "text_c4_rules": (
            textops.text_c4_rules, textops.C4_RULES_ORACLE),
        "dedup_c4_spans": (
            dedup.dedup_c4_spans, dedup.C4_SPANS_ORACLE),
        "ingest_arrow_ipc": (
            ingest.ingest_arrow_ipc, ingest.ARROW_IPC_ORACLE),
        "export_arrow_ipc_shards": (
            ingest.export_arrow_ipc_shards, ingest.ARROW_IPC_ORACLE),
        "ingest_cbor_events": (
            ingest.ingest_cbor_events, ingest.CBOR_EVENTS_ORACLE),
        "dedup_url_canonical": (
            dedup.dedup_url_canonical, dedup.URL_CANONICAL_ORACLE),
        "ingest_robots_filter": (
            ingest.ingest_robots_filter, ingest.ROBOTS_ORACLE),
        "profiling_hll_distinct": (
            profiling.profiling_hll_distinct,
            profiling.HLL_DISTINCT_ORACLE),
        "ingest_gzip_multistream": (
            ingest.ingest_gzip_multistream,
            ingest.GZIP_MEMBERS_ORACLE),
        "sales_cube_rollup": (
            relational.sales_cube_rollup,
            relational.CUBE_ROLLUP_ORACLE),
        "profiling_equidepth_histogram": (
            profiling.profiling_equidepth_histogram,
            profiling.EQUIDEPTH_ORACLE),
        "streaming_hll_tws": (
            streamops.streaming_hll_tws, streamops.HLL_TWS_ORACLE),
        "streaming_cms_tws": (
            streamops.streaming_cms_tws, streamops.CMS_TWS_ORACLE),
        "txnlog_compaction": (
            ingest.txnlog_compaction, ingest.TXNLOG_COMPACTION_ORACLE),
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    from databatchprotectionservice_spark.plans import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    spark = get_spark(app_name="check-staged")
    failures = []
    manifest = staged_manifest()
    print(f"staged sweep: {len(manifest)} queries at {sf_dir}")
    for name, (fn, sql) in manifest.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
            duck_pdf = con.execute(sql).df()
        except Exception as e:
            print(f"  {name:34s} ERROR: {str(e).splitlines()[0][:120]}")
            failures.append(name)
            continue
        dt = time.time() - t0
        rows_ok = len(spark_pdf) == len(duck_pdf)
        cols_ok = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
        hash_ok = frame_multiset(spark_pdf) == frame_multiset(duck_pdf)
        ok = rows_ok and cols_ok and hash_ok
        print(
            f"  {name:34s} rows={len(spark_pdf):6d} "
            f"{'OK' if ok else 'MISMATCH'} [{dt:.1f}s]"
        )
        if not ok:
            failures.append(name)
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("all staged queries green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
