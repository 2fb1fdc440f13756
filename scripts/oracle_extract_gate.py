"""Offline (CPU) oracle-extraction gate at the session-8 reduced protocol:
16 structured pairs, 256 pts, kernel 32, 250 steps, 4 windows, retry always.
Rows: loss pick (reference) / oracle pick over the n_cand=8 rotation-NMS
candidate list — the upper bound any rescorer (classifier) can reach GIVEN
the extraction stage."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from houv_tpu.data import synthesize_registration_pairs
from houv_tpu.solvers import HOUVConfig
from houv_tpu.solvers.houv import evaluate_solution
from houv_tpu.solvers.rescore import (
    houv_candidate_pools, houv_solve_rescored, make_oracle_scorer)

data = synthesize_registration_pairs(
    16, n_points=256, max_angle_deg=90.0, max_trans=0.5, seed=11,
    shape_mode="structured", rot_mix=True)
cfg = HOUVConfig(kernel=32, steps=250, angle_passes=4,
                 retry_mode="always")
src = jnp.asarray(data["rotated_src"]); tgt = jnp.asarray(data["rotated_tgt"])
gt = data["transforms"]; key = jax.random.PRNGKey(3)
t0 = time.time()
pools = houv_candidate_pools(src, tgt, key, cfg)
print(f"solve wall {time.time()-t0:.0f}s", flush=True)

def stats(tag, tf):
    r_err, t_err = evaluate_solution(tf, jnp.asarray(gt))
    r = np.asarray(r_err)
    print(f"{tag:22s} med {np.median(r):5.2f} mean {r.mean():6.2f} "
          f"<5 {np.mean(r<5)*100:3.0f}% <10 {np.mean(r<10)*100:3.0f}% "
          f"max {r.max():5.1f}", flush=True)

base = houv_solve_rescored(src, tgt, key, cfg, make_oracle_scorer(gt),
                           n_cand=1, margin=float("inf"), pools=pools)
stats("loss (reference)", base["transform"])
for nc, ang in ((8, 10.0), (8, 20.0), (16, 10.0)):
    o = houv_solve_rescored(src, tgt, key, cfg, make_oracle_scorer(gt),
                            n_cand=nc, angle_deg=ang, margin=0.0, pools=pools)
    stats(f"oracle n={nc} ang={ang:.0f}", o["transform"])
    print(f"   overrides {int(o['n_override'])}/16", flush=True)
