"""webcrawler_go_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A brand-new engine (NOT a port) with the query and data-processing
capabilities of the reference Go crawler ``chrislanejones/webcrawler-go``:
batch-iterative frontier loop, URL canonicalization + dedup (Bloom
pre-filter + anti-join), per-host politeness scheduling (salted
repartition + Window rank), vectorized fetch/extract via pandas/Arrow
UDFs, interleaved text+media span documents, plus the large-scale
training-data operators (dedup families, ANN similarity, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
partial aggregation, broadcast selection and AQE; Python appears only in
vectorized (Arrow-batched) UDF kernels.
"""

__version__ = "0.1.0"
