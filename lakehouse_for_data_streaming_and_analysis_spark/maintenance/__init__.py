"""Maintenance layer (SURVEY.md §2.11): parquet-native OPTIMIZE /
Z-ORDER / VACUUM in ``optimize``, commit-log observability in
``commitlog``."""

from . import commitlog, optimize

__all__ = ["commitlog", "optimize"]
