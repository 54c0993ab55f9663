"""Pure-Python extraction kernels (no Spark imports).

Every function here is a deterministic pure function of its inputs, so the
Spark ``mapInPandas`` stage that wraps them is shuffle-invariant and
task-retry-safe.
"""
