"""Checkpoint/state layer — the meta-DB replacement (SURVEY.md §1.1)."""

from transferdb_spark.state.store import ChunkState, StateStore  # noqa: F401
