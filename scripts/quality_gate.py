"""Full-budget solver quality gate on the MVP-statistics fixture.

Run on real TPU hardware; records the 2x2 (rot_level x match_level) grid.
The CPU-sized version of this gate is tests/test_quality_gate.py.

Usage: python scripts/quality_gate.py [n_pairs]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from houv_tpu.data import synthesize_registration_pairs
from houv_tpu.solvers import HOUVConfig
from houv_tpu.solvers.houv import evaluate_solution, houv_solve_chunked
from houv_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


VARIANTS = {
    # canonical submission settings (reference solve, train_utils.py:467)
    "canonical": {},
    # + the three axis-projected view CDs (module variant, houv.py:209-222)
    "view": dict(use_view_loss=True),
    # threshold-free: run every angle window, keep the lowest loss
    "always": dict(retry_mode="always"),
    # getPredict_cd_keba_v3: adaptive multi-percent + two-bracket split
    "v3": dict(reparam="v3", objective="multi_percent", two_bracket=True,
               lr=0.01, angle_passes=2),
    "view_always": dict(use_view_loss=True, retry_mode="always"),
    # framework-native hybrid the reference can't express: v3's adaptive
    # multi-percent objective (sharpens on the best-matching 10%) under
    # the champion's sine windows + full translation range, threshold-free
    "mp_always": dict(objective="multi_percent", retry_mode="always"),
    # selection/merge by FULL CD (select_percent=1.0): wrong-window optima
    # fit the truncated overlap but misfit globally
    "selfull": dict(select_percent=1.0),
    "always_selfull": dict(retry_mode="always", select_percent=1.0),
    "view_always_selfull": dict(use_view_loss=True, retry_mode="always",
                                select_percent=1.0),
    # coarse-to-fine correspondence cadence (BENCH_NOTES r3): the bench
    # champion schedule, alone and under threshold-free window search —
    # 'always' quality at ~the old canonical cost
    "fast": dict(nn_refresh_schedule=((300, 5, 4), (150, 5, 2), (50, 2))),
    "always_fast": dict(retry_mode="always",
                        nn_refresh_schedule=((300, 5, 4), (150, 5, 2),
                                             (50, 2))),
    # restart-consensus window selection (r3 late): symmetric-object
    # ambiguity — the true optimum's larger basin of attraction collects
    # more restarts than the impostor's
    "consensus_always": dict(retry_mode="always",
                             window_select="consensus"),
    "consensus_always_fast": dict(
        retry_mode="always", window_select="consensus",
        nn_refresh_schedule=((300, 5, 4), (150, 5, 2), (50, 2))),
}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    variant = sys.argv[2] if len(sys.argv) > 2 else "canonical"
    data = synthesize_registration_pairs(
        n, n_points=2048, max_angle_deg=90.0, max_trans=0.5, seed=11,
        shape_mode="structured", rot_mix=True,
    )
    kw = dict(kernel=64, steps=500, angle_passes=4, retry_threshold=0.030)
    kw.update(VARIANTS[variant])  # variants may override the base budget
    cfg = HOUVConfig(**kw)
    print(f"variant: {variant}")
    t0 = time.perf_counter()
    out = houv_solve_chunked(
        jnp.asarray(data["rotated_src"]), jnp.asarray(data["rotated_tgt"]),
        jax.random.PRNGKey(3), cfg,
    )
    r_err, t_err = evaluate_solution(
        out["transform"], jnp.asarray(data["transforms"])
    )
    r = np.asarray(r_err)
    t = np.asarray(t_err)
    print(f"wall {time.perf_counter() - t0:.0f}s  "
          f"retries {int(out['n_retry'])}")
    print(f"rot: median {np.median(r):.2f}  mean {r.mean():.2f}  "
          f"recall<5° {np.mean(r < 5) * 100:.0f}%  "
          f"<10° {np.mean(r < 10) * 100:.0f}%")
    print(f"trans: median {np.median(t):.4f}  mean {t.mean():.4f}")
    rl, ml = data["rot_level"], data["match_level"]
    for i in range(2):
        for j in range(2):
            sel = (rl == i) & (ml == j)
            if sel.sum():
                print(f"  rot{i}/match{j}: n={sel.sum():2d}  "
                      f"rot_med={np.median(r[sel]):6.2f}  "
                      f"trans_med={np.median(t[sel]):.4f}")


if __name__ == "__main__":
    main()
