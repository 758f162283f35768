"""Distributed execution: (channel, time) meshes, halo exchange, sharded
pipelines (SURVEY.md §5 'Distributed communication backend' — the component
the reference lacks and BASELINE.json makes a first-class target)."""

from .halo import pull_right_halo, push_right_tail
from .mesh import CHANNEL_AXIS, TIME_AXIS, auto_mesh, io_sharding, make_mesh
from .multihost import global_mesh, initialize, process_info
from .sharded_pipeline import (
    dryrun,
    metrics_report,
    sharded_round_trip,
    sharded_round_trip_jit,
)
from .stream import ShardedStreamer, sharded_stream, sharded_stream_iter

__all__ = [
    "CHANNEL_AXIS",
    "ShardedStreamer",
    "TIME_AXIS",
    "auto_mesh",
    "dryrun",
    "global_mesh",
    "initialize",
    "io_sharding",
    "make_mesh",
    "metrics_report",
    "process_info",
    "pull_right_halo",
    "push_right_tail",
    "sharded_round_trip",
    "sharded_round_trip_jit",
    "sharded_stream",
    "sharded_stream_iter",
]
