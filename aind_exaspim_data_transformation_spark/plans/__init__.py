from .grid import shard_tasks_df

__all__ = ["shard_tasks_df"]
