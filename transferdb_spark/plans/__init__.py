"""Planning layer: chunk/split planning and split-key election."""

from transferdb_spark.plans.chunker import Chunk, elect_split_key, plan_chunks, with_chunk_id  # noqa: F401
