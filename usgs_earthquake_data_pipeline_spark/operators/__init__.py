"""Relational + pipeline operators built Spark-first: dedup family
(exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search,
silver aggregations. No driver-side row iteration anywhere."""
