"""databatchprotectionservice_spark — a PySpark-native column-protection
and large-scale data-pipeline engine.

A ground-up rebuild, on Apache Spark, of the data-processing capabilities of
the reference C++ service ``protegrity/DataBatchProtectionService`` (a
column-batch encrypt/decrypt HTTP service; see ``SURVEY.md``), extended with
the operators a 100 TB LLM-training-data pipeline needs: deduplication,
similarity search, multimodal (binary) columns, and text analysis.

Layout
------
``core/``       pure Python+numpy codec/crypto library (no Spark): keystream,
                ciphertext wire format, compression, page-level sequencer.
``agent``       the ``ProtectionAgent`` API mirroring the reference's
                ``DataBatchProtectionAgentInterface`` contract.
``functions/``  Spark column functions: protect/unprotect pandas UDFs, text
                analysis, vector math (built-in-function compositions).
``operators/``  DataFrame-level operators: relational query suite, dedup
                (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
                similarity search (brute-force + LSH-bucketed ANN),
                multimodal column plumbing.
``sources/``    table catalog / readers for the test datasets.
``plans/``      SparkSession construction tuned for scale + plan inspection
                helpers.
``streaming/``  Structured Streaming protect pipeline + windowed aggregation.
"""

__version__ = "0.1.0"
