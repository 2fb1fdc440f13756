from houv_tpu.solvers.houv import HOUVConfig, houv_pass, houv_solve
from houv_tpu.solvers.icp import icp_solve
from houv_tpu.solvers.fgr import fgr_solve, fpfh, estimate_normals
from houv_tpu.solvers.goicp_bnb import build_distance_field, goicp_bnb_solve
from houv_tpu.solvers.rescore import (
    extract_candidates,
    houv_candidate_pools,
    houv_solve_rescored,
    make_classifier_scorer,
    make_oracle_scorer,
    make_sharded_classifier_scorer,
    sharded_houv_solve_rescored,
)

__all__ = [
    "HOUVConfig", "houv_pass", "houv_solve", "icp_solve",
    "fgr_solve", "fpfh", "estimate_normals",
    "build_distance_field", "goicp_bnb_solve",
    "extract_candidates", "houv_candidate_pools", "houv_solve_rescored",
    "make_classifier_scorer", "make_oracle_scorer",
    "make_sharded_classifier_scorer", "sharded_houv_solve_rescored",
]
