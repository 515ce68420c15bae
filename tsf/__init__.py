"""tsf — a PySpark-native time-series rollup + downsample + retention engine.

Re-expresses the capabilities of brendanjohnharris/TimeseriesFeatures.jl
(reference at /root/reference, studied for semantics only) as an idiomatic
Spark engine over tables of pre-tokenized sequences
``(doc_id string, tokens array<int>, n_tok int, source string)``:

- ``tsf.registry``   Feature / SuperFeature / FeatureSet with set algebra
                     (reference: src/Features.jl:39-64, src/FeatureSets.jl,
                     src/SuperFeatures.jl:87-117).
- ``tsf.kernels``    vectorized numpy feature kernels (ACF, PACF, RAD,
                     histogram mode, z-score supers, first-ACF-crossing).
- ``tsf.rollup``     tier-0 tumbling-window rollup (mapInPandas) and the
                     10x/100x downsample tier cascade derived from
                     lower-tier compressed blocks (segment-tree layout).
- ``tsf.gorilla``    Gorilla-style XOR float codec + delta-of-delta int
                     codec, vectorized numpy bit-packing, exact round-trip.
- ``tsf.gapfill``    window-grid densify + LOCF + linear interpolation.
- ``tsf.ledger``     per-tier rollup ledger (partition_id, watermark,
                     checksum, metrics) and exact resume-from-checkpoint.
- ``tsf.streaming``  Structured Streaming arrival path: incremental
                     tier-0 (availableNow / foreachBatch + ledger),
                     watermarked event-time windows.
- ``tsf.dedup`` / ``tsf.similarity`` / ``tsf.textstats``  training-data
                     pipeline operators (exact + MinHash/SimHash dedup,
                     ANN cosine search, series-pairwise Pearson,
                     language-ID / quality scoring / token counting).
- ``tsf.multimodal`` binary media columns: typed metadata, stub decode,
                     batch feature extraction, frame-sampling plumbing.
- ``tsf.icelite``    Iceberg-style snapshot table format over parquet
                     (atomic commits, time travel, snapshot expiry,
                     hidden identity/bucket partitioning, manifest
                     min/max file pruning, one-commit retention expiry)
                     — the sandbox stand-in for the jar-less Iceberg
                     seam in ``tsf.io.write_rollup(table=...)``.
"""

from tsf.registry import Feature, FeatureSet  # noqa: F401

__version__ = "0.1.0"
