from houv_tpu.solvers.houv import HOUVConfig, houv_pass, houv_solve
from houv_tpu.solvers.icp import icp_solve

__all__ = ["HOUVConfig", "houv_pass", "houv_solve", "icp_solve"]
