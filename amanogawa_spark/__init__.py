"""amanogawa_spark — a from-scratch, PySpark-native link-graph analytics engine.

Re-expresses the capabilities of the reference engine
(hoshizora-project/amanogawa, a single-process C++/Arrow dataflow DAG) as
idiomatic Spark DataFrame programs:

- web-page ingestion + vectorized (pandas/Arrow UDF) link & text extraction,
- dictionary-encoded vertex table + deduplicated edge table
  (reference: ``plugin/flow/to_graph/to_graph.cpp:174-223``),
- iterative graph analytics: PageRank (damping + dangling-mass
  redistribution), connected components (small-star/large-star and
  min-label), synchronous label propagation, degree-ordered triangle
  counting,
- ETL parity operators: schema-declared csv/json/jsonl scans, filter
  predicates (reference op set ``include/util.h:110-161``), column branch
  (``plugin/branch/column/column.cpp``), inner key-join with
  drop-right-key semantics (``plugin/confluence/key/key.cpp``),
- training-data pipeline ops: exact / MinHash-LSH / SimHash dedup,
  cosine top-k similarity search, language-ID / quality scoring /
  tokenization, multimodal binary-column plumbing.

Everything is DataFrame/SQL-first so Catalyst + AQE own the physical plan;
Python only runs inside Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
