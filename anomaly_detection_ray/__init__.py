"""anomaly_detection_ray — a Ray-Data-native data-processing engine.

A from-scratch rebuild of the capabilities of
opensearch-project/anomaly-detection (reference at /root/reference,
read-only) on top of ``ray.data.Dataset``:

- **Layer A** — the OpenSearch/Lucene substrate the reference plugin
  assumes: a SPIMI-style inverted-index builder + Okapi BM25 (k1=1.2,
  b=0.75) top-k query engine over Parquet corpora, including the
  bool/term/range filter + metric/bucket aggregation surface the plugin
  pushes down (SURVEY.md §2.A).
- **Layer B** — the plugin's own dataflow: windowed per-interval feature
  aggregation → imputation → RCF-style streaming scoring → thresholding
  → result rows (SURVEY.md §2.B–§2.D).
- **Pipeline extras** — dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard / embedding-cosine), ANN similarity search, text analysis and
  multimodal plumbing for large-scale training-data pipelines.

Nothing here calls ``ray.init()``/``ray.shutdown()`` — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
