"""connected_components_3d_spark — a from-scratch PySpark-native link-graph
analytics engine with the query/data-processing capabilities of the reference
`fratim/connected-components-3d` (cc3d: multilabel connected-components
labeling with 6/18/26-connectivity, component statistics, region graphs,
contacts, dust / largest-k filtering), generalized to a web-scale edge table
per BASELINE.json's north rule.

NOT a port: the reference is a single-node dense-array Cython/C++ kernel; this
engine expresses the same semantics as Spark DataFrame plans (Catalyst-
optimized joins/aggregations) plus vectorized pandas/Arrow UDFs — never
per-row Python.

Layout
------
sources/    synthetic Common-Crawl-style pages, parquet/"iceberg-style" table
            IO, checkpoint manifests
functions/  vectorized extraction (html→text, html→hrefs), text analysis,
            hashing helpers
operators/  edge build & hygiene, connected components (hash-min and
            block-union-find), pagerank, label propagation, triangles,
            component statistics / largest_k / dust / contacts / region graph,
            dedup (exact / minhash-LSH / simhash), similarity search, grid
            (cc3d-parity stencil frontend), skew (salting)
plans/      explain/tuning helpers
streaming/  incremental-edge ingestion stubs (batch engine; see SURVEY.md §1.2)
"""

__version__ = "0.1.0"
