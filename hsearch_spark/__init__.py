"""hsearch_spark — a PySpark-native near-duplicate detection + clustering engine.

A ground-up Spark-first re-expression of the query/data-processing
capabilities of acgtun/hsearch (LSH-based sequence search & clustering;
reference at /root/reference/, survey in SURVEY.md):

- text canonicalization           (ref: alphabet reduction, util.hpp:103-105)
- k-shingle hashing               (ref: Kmer2Integer, util.hpp:244-250)
- MinHash signatures + LSH bands  (ref: E2LSH K×L tables, hclust/lsh.hpp:29-59)
- SimHash fingerprints            (ref: KLSH sign bits, pcluster/lsh.cpp:17-49)
- bucket self-join candidates     (ref: per-bucket loops, hclust.cpp:186-205)
- exact-verify joins              (ref: Euclidean verify, kmer_search.cpp:106-112)
- connected components            (ref: union-find, pcluster/union_find.cpp:16-43)
- anchor-based substring dedup    (ref: suffix array, IGC/suffix_array.cpp:15-47)
- recall evaluation harness       (ref: evaulate(), motif_both_points.cpp:100-165)

All operators are DataFrame/Catalyst-native; Python appears only in
vectorized pandas/Arrow UDFs (signature computation and text extraction).
"""

from hsearch_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
