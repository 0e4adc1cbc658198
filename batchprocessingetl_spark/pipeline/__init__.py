"""Medallion pipeline composites (SURVEY.md §2.11, §3, §7.2 step 3).

The reference's three layers re-expressed as pure DataFrame->DataFrame
functions with injected timestamps (testable, deterministic) instead of
module-level scripts with ``current_timestamp()``:

- ``staging``     — cleaner chain (dedup, null filter, casts, fillna,
                    derived columns) + duplicate report
- ``star``        — star-schema builder (dim_date / dim_store /
                    dim_product via SCD2, fact_sales projection)
- ``incremental`` — high-water-mark incremental loader with idempotent
                    merge
"""
