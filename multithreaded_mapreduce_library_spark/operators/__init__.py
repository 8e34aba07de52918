"""Operator inventory modules — importing them registers queries + oracles.

Use :func:`multithreaded_mapreduce_library_spark.registry.load_all` to
populate the registry.
"""
