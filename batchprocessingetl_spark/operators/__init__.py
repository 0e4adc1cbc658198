"""Composable DataFrame -> DataFrame operators.

Each module implements one operator family, designed for multi-executor
scale (no driver-side collects, shuffle-minimal plans, built-in
expressions over Python UDFs wherever possible):

- ``scd2``        — corrected SCD Type 2 merge (reference parity + fixes)
- ``dedup``       — exact, MinHash-LSH, SimHash, n-gram Jaccard dedup
- ``text``        — tokenization, quality signals, language ID, fingerprints
- ``similarity``  — embedding cosine top-k (brute force + LSH-bucketed)
- ``multimodal``  — opaque binary columns + Pandas-UDF feature plumbing
"""
