"""Large-scale training-data pipeline operators (north star in
BASELINE.json): deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding cosine), similarity search, text analysis,
multimodal column plumbing.

Everything here is designed for the 100 TB case: per-row transforms
are JVM-side Catalyst expressions (higher-order array functions, not
Python); candidate generation for near-dup detection is band-bucketed
(shuffle on bucket keys, never an all-pairs cross join); Python
appears only in Arrow-batched pandas UDFs where built-ins genuinely
cannot express the op.
"""
