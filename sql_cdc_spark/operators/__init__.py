"""Operator library: CDC change-log operators, relational helpers, and
nested-document assembly. Each operator is a plain function over
DataFrames so Catalyst sees one logical plan end-to-end (predicate
pushdown, column pruning, join reordering all apply across operator
boundaries)."""
