"""lucene_7_x_9_x_ray — a Ray-Data-native full-text index + BM25/WAND query engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the Lucene 7.x-9.x reference (ycgoodluck/Lucene-7.x-9.x):
inverted-index build over Parquet tables of Common-Crawl-style web pages,
segment merge with head-term salting, block-compressed postings with
block-max impacts, and BM25 (k1=1.2, b=0.75) top-k scoring with
block-max-WAND pruning — expressed as ray.data.Dataset pipelines
(map_batches over zero-copy Arrow batches, actor pools for stateful
query serving).

Layout:
  functions/  pure kernels: SmallFloat norms, analyzer, BM25, block codec
  state/      segment artifacts (writer/reader, mmap), manifests/lineage
  stages/     Ray Data build / merge / query-serving stages
  search/     query tree (Term/Boolean), scorers (exhaustive + WAND), top-k
  sources/    synthetic Common-Crawl-style page generator, html->text
  pipelines/  end-to-end pipelines + training-data ops (dedup, ANN, text stats)
"""

__version__ = "0.1.0"
