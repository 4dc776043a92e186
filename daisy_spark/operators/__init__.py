"""Macro-operators: semantics the reference has that Spark lacks natively.

Each is a plain DataFrame -> DataFrame composition so Catalyst still
optimizes through it (pushdown, pruning, join strategy, AQE).

- ``joins``      ASOF join, ANY join, semi/anti helpers (SURVEY §2.3)
- ``modifiers``  LIMIT BY, WITH TIES, WITH FILL, WITH TOTALS, SAMPLE,
                  ROLLUP/CUBE/totals helpers (SURVEY §2.4, §2.6)
- ``final``      engine-semantics-on-read: Replacing/Summing/Collapsing/
                  VersionedCollapsing normalization (SURVEY §2.1)
- ``topk``       shuffle-efficient exact top-K by frequency
- ``dedup``      exact + MinHash-LSH + SimHash + n-gram-Jaccard +
                  embedding-cosine near-duplicate detection
- ``similarity`` brute-force, IVF, and LSH-bucketed ANN over embeddings
- ``text``       language-ID, quality scoring, token counting, fingerprints
- ``multimodal`` binary-column decode/feature plumbing (codecs stubbed)
"""
