"""timeseriestokenizer_spark — a from-scratch, PySpark-native time-series
rollup + downsample + retention engine with the query and data-processing
capabilities of the reference (Doglas-Anjos/TimeSeriesTokenizer), rebuilt
Spark-first over conversation-transcript tables.

Layout:
    oracle/      vendored pure-NumPy oracle mirroring the reference's exact math
    functions/   scalar/vectorized column functions (signals, scaling, quantize, text)
    operators/   relational/dataflow operators (rollup tiers, gap-fill, TPE, Gorilla,
                 dedup, similarity, salting, splits)
    sources/     artifact table IO (.fvocab / minbpe-model text parity, registry tables)
    plans/       checkpoint manifest + resumable job planning
    streaming/   Structured Streaming twins of the batch rollups
    multimodal/  opaque-binary column plumbing (decode stubbed)
"""

__version__ = "0.1.0"
