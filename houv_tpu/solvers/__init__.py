from houv_tpu.solvers.houv import HOUVConfig, houv_pass, houv_solve
from houv_tpu.solvers.icp import icp_solve
from houv_tpu.solvers.fgr import fgr_solve, fpfh, estimate_normals

__all__ = [
    "HOUVConfig", "houv_pass", "houv_solve", "icp_solve",
    "fgr_solve", "fpfh", "estimate_normals",
]
