"""numalogic_spark — a from-scratch PySpark-native time-series rollup,
downsample and retention engine with the query/data-processing semantics of
numaproj/numalogic (reference at /root/reference, studied for behavior only).

Architecture: DataFrame/SQL plans optimized by Catalyst for everything
expressible declaratively (scans, filters, bucket aggregation, tier cascade,
gap-fill spine + interpolation, joins), plus Arrow-vectorized pandas UDF
kernels for the matrix-shaped semantics the reference computes in numpy
(strided windows, EWM, scalers/thresholds, Gorilla-style compression).
No per-row Python in any hot path.
"""

__version__ = "0.1.0"
