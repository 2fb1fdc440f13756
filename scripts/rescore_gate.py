"""Classifier-rescored solver quality gate on the MVP-statistics fixture.

Compares, at identical solver budget and fixture protocol as
scripts/quality_gate.py:

  loss       — reference selection (houv_solve_chunked)
  oracle     — rescored with the GT-rotation oracle (the recoverable
               upper bound given the candidate pools)
  classifier — rescored with a trained AlignmentClassifier checkpoint

Usage: python scripts/rescore_gate.py [n_pairs] [ckpt] [variant]
  ckpt: path to an alignment_spconv checkpoint
        (default: best_acc_network.ckpt in the log dir the rescorer
        trainer writes — work_dir/{model_name}_{loss}_{flag} from
        cfgs/rescore_alignment.yaml; pass 'none' to skip the
        classifier row)

RESCORE_CANDS accepts a comma list (e.g. "8,16") — the classifier row
is measured at each count on the same candidate pools (ADVICE r3: 16
was promoted on the oracle metric, which is monotone in count; the
classifier's precision at 8 vs 16 must be measured separately).
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from houv_tpu.data import synthesize_registration_pairs
from houv_tpu.solvers import HOUVConfig
from houv_tpu.solvers.houv import evaluate_solution
from houv_tpu.solvers.rescore import (
    houv_candidate_pools,
    houv_solve_rescored,
    make_classifier_scorer,
    make_oracle_scorer,
)
from houv_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

VARIANTS = {
    "canonical": {},
    "always": dict(retry_mode="always"),
    "always_fast": dict(retry_mode="always",
                        nn_refresh_schedule=((300, 5, 4), (150, 5, 2),
                                             (50, 2))),
}


def _stats(tag, transform, gt, extra=""):
    r_err, t_err = evaluate_solution(transform, jnp.asarray(gt))
    r = np.asarray(r_err)
    t = np.asarray(t_err)
    print(f"{tag:11s} rot med {np.median(r):5.2f}  mean {r.mean():6.2f}  "
          f"<5° {np.mean(r < 5) * 100:3.0f}%  <10° {np.mean(r < 10) * 100:3.0f}%  "
          f"trans med {np.median(t):.4f}  {extra}")
    return r


def _default_ckpt() -> str:
    """Mirror _TrainerBase.log_dir for cfgs/rescore_alignment.yaml so the
    default path always matches where the trainer saved (ADVICE r3)."""
    from houv_tpu.train.config import load_config

    cfg = load_config("cfgs/rescore_alignment.yaml")
    return os.path.join(
        cfg.work_dir, f"{cfg.model_name}_{cfg.loss}_{cfg.flag}",
        "best_acc_network.ckpt",
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ckpt = sys.argv[2] if len(sys.argv) > 2 else _default_ckpt()
    variant = sys.argv[3] if len(sys.argv) > 3 else "always_fast"
    # n_cand=16 promoted by the offline oracle-extraction gate (BENCH_NOTES
    # r3 session 9): at 16/10° the candidate list contains a ≤8° restart
    # for every loss-pick failure (recall<10° 88→100%); 8 captures 2 of 3.
    cand_list = [int(c) for c in
                 os.environ.get("RESCORE_CANDS", "16").split(",")]
    n_cand = max(cand_list)
    angle_deg = float(os.environ.get("RESCORE_ANGLE", "10"))
    margins = [float(m) for m in
               os.environ.get("RESCORE_MARGIN", "0").split(",")]
    margin = margins[0]

    data = synthesize_registration_pairs(
        n, n_points=2048, max_angle_deg=90.0, max_trans=0.5, seed=11,
        shape_mode="structured", rot_mix=True,
    )
    kw = dict(kernel=64, steps=500, angle_passes=4, retry_threshold=0.030)
    kw.update(VARIANTS[variant])
    cfg = HOUVConfig(**kw)
    src = jnp.asarray(data["rotated_src"])
    tgt = jnp.asarray(data["rotated_tgt"])
    gt = data["transforms"]
    key = jax.random.PRNGKey(3)
    print(f"variant {variant}  n_cand {n_cand}  angle {angle_deg}  "
          f"margin {margin}")

    t0 = time.perf_counter()
    # chunk the pool solve at 128 pairs: the B=128 segment binaries are
    # the bench-validated good compiles (~1 s/pair); other batch shapes
    # can land 6-8x slower in the current toolchain's codegen lottery
    # (BENCH_NOTES r5). Pool tensors concat along the pair axis.
    chunk = int(os.environ.get("GATE_CHUNK", "128"))
    sc = int(os.environ.get("GATE_STEP_CHUNK", "105"))  # measured-good
    if n > chunk and n % chunk == 0:
        parts = [houv_candidate_pools(src[s:s + chunk], tgt[s:s + chunk],
                                      key, cfg, step_chunk=sc)
                 for s in range(0, n, chunk)]
        pools = tuple(
            jnp.concatenate([p[i] for p in parts], axis=0)
            for i in range(3)
        ) + (sum(int(p[3]) for p in parts),)
    else:
        pools = houv_candidate_pools(src, tgt, key, cfg, step_chunk=sc)
    print(f"solve wall {time.perf_counter() - t0:.0f}s  "
          f"retries {pools[3]}")
    # loss row = candidate 0 on the same pools (margin=inf never overrides)
    base = houv_solve_rescored(
        src, tgt, key, cfg, make_oracle_scorer(gt),
        n_cand=1, margin=float("inf"), pools=pools,
    )
    _stats("loss", base["transform"], gt)

    t0 = time.perf_counter()
    orc = houv_solve_rescored(
        src, tgt, key, cfg, make_oracle_scorer(gt),
        n_cand=n_cand, angle_deg=angle_deg, margin=margin, pools=pools,
    )
    _stats("oracle", orc["transform"], gt,
           extra=f"overrides {int(orc['n_override'])}  "
                 f"wall {time.perf_counter() - t0:.0f}s")

    ckpts = [c for c in ckpt.split(",") if c != "none"
             and os.path.exists(c)] if ckpt != "none" else []
    if ckpts:
        from houv_tpu.models import get_model
        from houv_tpu.train.checkpoint import load_checkpoint

        use_gap_env = os.environ.get("RESCORE_GAP", "0") == "1"
        n_aug = int(os.environ.get("RESCORE_TTA", "1"))
        models = {}
        scorers = []
        for c in ckpts:
            state = load_checkpoint(c)
            # gap head auto-detected per checkpoint (train/cli.py seam)
            has_gap = use_gap_env or "Dense_2" in state["params"]
            if has_gap:
                print(f"loss-gap scorer input enabled for {c}")
            model = models.setdefault(has_gap, get_model(
                "alignment_spconv", grid_size=50,
                compute_dtype="bfloat16", n_extra=1 if has_gap else 0))
            variables = {"params": state["params"]}
            if state.get("batch_stats"):
                variables["batch_stats"] = state["batch_stats"]
            scorers.append(make_classifier_scorer(
                model, variables, micro_batch=16, n_aug=n_aug,
                use_gap=has_gap))
        if len(scorers) == 1:
            named_scorers = [(ckpts[0], scorers[0])]
        elif os.environ.get("RESCORE_EVAL_EACH", "0") == "1":
            # evaluate every checkpoint SEPARATELY on the shared pools —
            # one pool solve serves N model gates (lever-comparison mode;
            # the default comma behavior below ensembles instead)
            named_scorers = list(zip(ckpts, scorers))
        else:
            # checkpoint ensemble. RESCORE_ENSEMBLE: 'mean' averages
            # logits; 'min' is a veto — an override fires only when EVERY
            # model clears the margin (a mean lets one model's confident
            # mistake through — measured, BENCH_NOTES r4)
            mode = os.environ.get("RESCORE_ENSEMBLE", "mean")
            print(f"ensembling {len(scorers)} checkpoints ({mode})")
            red = {"mean": np.mean, "min": np.min}[mode]

            def scorer(moved, tgt, cand_r=None, cand_t=None,
                       cand_loss=None, _s=tuple(scorers), _red=red):
                logits = np.stack(
                    [np.asarray(s(moved, tgt, cand_r, cand_t,
                                  cand_loss=cand_loss))
                     for s in _s])
                # candidate 0 (the loss pick) keeps its MEAN logit so a
                # min-reduction cannot weaken the incumbent's defense
                out = _red(logits, axis=0)
                out[:, 0] = np.mean(logits[:, :, 0], axis=0)
                return out

            named_scorers = [("ensemble", scorer)]
        if n_aug > 1:
            print(f"test-time augmentation: {n_aug} joint rotations")
        # pools reuse (ADVICE r3): identical key/cfg -> identical pools;
        # re-solving would double wall and risk a second long dispatch.
        base_rot_err = None
        for name, scorer in named_scorers:
            if len(named_scorers) > 1:
                print(f"--- ckpt {name}")
            for nc in cand_list:
                for mg in margins:
                    t0 = time.perf_counter()
                    cls = houv_solve_rescored(
                        src, tgt, key, cfg, scorer,
                        n_cand=nc, angle_deg=angle_deg, margin=mg,
                        pools=pools,
                    )
                    r = _stats(f"clf@{nc}/m{mg:g}", cls["transform"], gt,
                               extra=f"overrides {int(cls['n_override'])} "
                                     f" wall {time.perf_counter() - t0:.0f}s")
                    if base_rot_err is None:
                        base_rot_err, _ = evaluate_solution(
                            base["transform"], jnp.asarray(gt))
                        base_rot_err = np.asarray(base_rot_err)
                    ov = np.asarray(cls["pick"]) != 0
                    if ov.any():
                        d = r[ov] - base_rot_err[ov]
                        print(f"    overrides: {int((d < -1).sum())} improved"
                              f" >1°, {int((d > 1).sum())} hurt >1°, worst"
                              f" hurt {d.max():+.1f}°, best {d.min():+.1f}°")
    else:
        print(f"classifier: skipped (no checkpoint at {ckpt})")


if __name__ == "__main__":
    main()
