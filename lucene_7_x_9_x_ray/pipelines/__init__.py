"""End-to-end pipelines + training-data operators over the driver tables.

Each operator here is expressed Ray-Data-first (read_parquet with column
pruning -> map_batches over Arrow -> groupby/aggregate only where the
semantics need a shuffle) and, where ANSI-SQL-expressible, ships a DuckDB
oracle in ``oracles.py`` so the driver's correctness gate can value-hash
both sides (see __ray_entry__.py).
"""
