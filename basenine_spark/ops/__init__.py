"""Extension operators beyond the reference's surface.

The reference (up9inc/basenine) implements no joins, aggregations,
windows, or set operations (SURVEY.md §2.3-2.7); these modules are the
Spark-native extension surface the north-star asks for:

* :mod:`.relational` — aggregations / joins / windows / set ops over
  the TPC-H-ish driver tables, plus sketches, profiling, equi-depth
  histograms, PSI release drift, and heavy-key skew diagnosis.
* :mod:`.timeseries` — as-of joins, RANGE frames, gap-fill, ordered
  event funnels, cohort retention, rolling z-score anomaly detection.
* :mod:`.text` — text analysis for training-data pipelines (tokens,
  quality, fingerprints, language id, BM25, unigram/bigram surprisal,
  NFKC normalization).
* :mod:`.dedup` — exact / canonical / normalized dedup, PPJoin exact
  n-gram Jaccard, MinHash-LSH, SimHash, min-label clustering,
  duplicated-substring spans + scrub + decontamination, containment
  joins, threshold operating curves — always bucketed/banded by
  construction, never a cartesian self-join.
* :mod:`.similarity` — embedding search (brute-force / SRP-LSH / IVF /
  PQ), quantization, k-NN graphs, k-means + SemDeDup, release drift,
  contrastive triplet mining.
* :mod:`.graph` — PageRank centrality over the k-NN graph.
* :mod:`.bpe` — distributed BPE vocabulary induction + subword token
  counting.
* :mod:`.quality_model` — weak-label MLlib quality classifier.
* :mod:`.sampling` — content-stable stratified / mixture / quantile /
  domain-cap / split / exact-n sampling.
* :mod:`.pipeline` — composed curation & release funnels, packing,
  chunking, shard + WebDataset export, epoch & curriculum ordering.
* :mod:`.layout` — Z-order (Morton) multi-dimensional data layout.
* :mod:`.expectations` — declarative data-quality gates.
* :mod:`.multimodal` — real WAV/BMP decode, spectral features,
  perceptual image hashing + audio fingerprints with pigeonhole-exact
  Hamming near-dup.
"""
