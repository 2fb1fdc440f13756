import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np, time
from houv_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from houv_tpu.data import synthesize_registration_pairs
from houv_tpu.solvers import HOUVConfig
from houv_tpu.solvers.houv import houv_solve_chunked as houv_solve
from houv_tpu.solvers.houv import evaluate_solution

# 128 pairs at up-to-90° rotations: exercises the retry machinery at the
# canonical budget (BASELINE config 1 scale).
N_PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
# cadence: "2" (uniform nn_refresh) or a schedule "400:5,100:2"
CADENCE = sys.argv[2] if len(sys.argv) > 2 else "1"
if ":" in CADENCE:
    sched = tuple(tuple(int(v) for v in p.split(":"))
                  for p in CADENCE.split(","))
    refresh_kw = dict(nn_refresh_schedule=sched)
else:
    refresh_kw = dict(nn_refresh=int(CADENCE))
data = synthesize_registration_pairs(N_PAIRS, n_points=2048, max_angle_deg=90.0, seed=99)
src = jnp.asarray(data['rotated_src']); tgt = jnp.asarray(data['rotated_tgt'])
cfg = HOUVConfig(kernel=64, steps=500, angle_passes=4, use_pallas=True,
                 **refresh_kw)
t0 = time.perf_counter()
outs = []
B = 32
for s in range(0, N_PAIRS, B):
    out = houv_solve(src[s:s+B], tgt[s:s+B], jax.random.PRNGKey(s), cfg)
    outs.append(out)
    print('batch', s, 'retries', int(out['n_retry']), 'rmse', float(out['rmse'].mean()), flush=True)
tf = jnp.concatenate([o['transform'] for o in outs])
r_err, t_err = evaluate_solution(tf, jnp.asarray(data['transforms']))
re = np.asarray(r_err); te = np.asarray(t_err)
dt = time.perf_counter() - t0
print("TOTAL: %d pairs in %.1fs (%.3f pairs/s incl compile)" % (N_PAIRS, dt, N_PAIRS/dt), flush=True)
print('rot_err mean %.3f median %.3f p90 %.3f; trans_err mean %.4f' % (re.mean(), np.median(re), np.percentile(re, 90), te.mean()), flush=True)
print('recall(rot<5deg) %.3f recall(rot<10deg) %.3f' % ((re<5).mean(), (re<10).mean()), flush=True)
