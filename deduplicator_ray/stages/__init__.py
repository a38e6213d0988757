"""Ray Data stages: vectorized ``map_batches`` transforms, groupby-reduce
shuffles, and actor-pool stages. Each module documents the reference
operator(s) it implements (SURVEY.md §2) and its partitioning assumptions.
"""
