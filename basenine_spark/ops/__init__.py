"""Extension operators beyond the reference's surface.

The reference (up9inc/basenine) implements no joins, aggregations,
windows, or set operations (SURVEY.md §2.3-2.7); these modules are the
Spark-native extension surface the north-star asks for:

* :mod:`.relational` — aggregations / joins / windows / set ops over the
  TPC-H-ish driver tables.
* :mod:`.text` — text analysis for training-data pipelines (tokens,
  quality, fingerprints, language id).
* :mod:`.dedup` — exact + near-duplicate detection (hash groupBy,
  n-gram Jaccard via shingle join, MinHash-LSH, SimHash) — always
  bucketed/banded by construction, never a cartesian self-join.
* :mod:`.similarity` — embedding similarity search (brute-force cosine
  top-k with broadcast queries; sign-LSH bucketed variant).
* :mod:`.multimodal` — opaque binary payload plumbing with stubbed
  decoders (image/audio libs are not in this container).
"""
