"""Pose-graph / bundle-adjustment refinement (new capability, TPU-first)."""

from .bundle_adjustment import (
    BAProblem,
    ba_step,
    build_normal_blocks,
    optimize_ba,
    project,
    reprojection_residuals,
    schur_reduce,
)
from .distributed import (
    make_distributed_ba_step,
    make_distributed_pose_graph_step,
    make_distributed_sqrt_ba_step,
    optimize_pose_graph_two_stage_distributed,
    pad_pose_graph_edges,
    shard_ba_inputs,
)
from .sqrt_ba import optimize_sqrt_ba, sqrt_ba_step
from .synthetic import make_sfm_problem
from .pose_graph import (
    PoseGraph,
    edge_residuals,
    gauss_newton_step,
    graph_from_odometry,
    optimize_pose_graph,
    optimize_pose_graph_two_stage,
)

__all__ = [k for k in dir() if not k.startswith("_")]
