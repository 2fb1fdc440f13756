"""Real-MVP-data readiness kit (VERDICT r3 next-round #5).

One command from ".h5 appeared" to a parity number: validates the files
against the exact reference schema, runs a 16-pair smoke solve on the
labeled val split, and prints the leaderboard-protocol commands.

Usage: python scripts/prepare_mvp.py [data_dir] [--smoke/--no-smoke]

Schema source (reference, read-only):
- registration/dataset.py:55-151 (MVP_RG): keys src, tgt, rotated_src,
  rotated_tgt, transforms, pose_src, pose_tgt, complete, cat_labels
  (NOTE: code key `cat_labels`, README says `cat_label` — the code key
  is canonical), match_level, rot_level, and match_id as an h5 GROUP of
  ragged int arrays keyed "0".."N-1".
- completion/dataset.py:12-40 (MVP_CP): incomplete_pcds, complete_pcds,
  labels; 26 partial scans per complete model (index//26 gt mapping).
- Leaderboard target (registration/README.md:62): Rot_Error 2.94973°,
  Trans_Error 0.02108, MSE 0.07257.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

try:
    import h5py
except ImportError:
    h5py = None

LEADERBOARD = {"rot_error_deg": 2.94973, "trans_error": 0.02108,
               "mse": 0.07257}

# (key, ndim, trailing shape or None, dtype kind)
_RG_COMMON = [("cat_labels", 1, None, "iu")]
_RG_PAIR = [("rotated_src", 3, (2048, 3), "f"),
            ("rotated_tgt", 3, (2048, 3), "f")]
_RG_LABELED = [
    ("src", 3, (2048, 3), "f"), ("tgt", 3, (2048, 3), "f"),
    ("match_level", 1, None, "iu"),
]
_RG_VAL_ONLY = [
    ("transforms", 3, (4, 4), "f"), ("rot_level", 1, None, "iu"),
    ("pose_src", 3, (4, 4), "f"), ("pose_tgt", 3, (4, 4), "f"),
    ("complete", 3, (2048, 3), "f"),
]

SCHEMAS = {
    # file -> (required datasets, needs ragged match_id group)
    "MVP_Train_RG.h5": (_RG_COMMON + _RG_LABELED, True),
    "MVP_Test_RG.h5": (_RG_COMMON + _RG_LABELED + _RG_PAIR + _RG_VAL_ONLY,
                       True),
    "MVP_ExtraTest_RG.h5": (_RG_COMMON + _RG_PAIR, False),
    "MVP_Train_CP.h5": ([("incomplete_pcds", 3, (2048, 3), "f"),
                         ("complete_pcds", 3, (2048, 3), "f"),
                         ("labels", 1, None, "iu")], False),
    "MVP_Test_CP.h5": ([("incomplete_pcds", 3, (2048, 3), "f"),
                        ("complete_pcds", 3, (2048, 3), "f"),
                        ("labels", 1, None, "iu")], False),
    "MVP_ExtraTest_Shuffled_CP.h5": (
        [("incomplete_pcds", 3, (2048, 3), "f")], False),
}


def check_file(path: str, name: str, strict: bool = True) -> list[str]:
    """Validate one h5 file; returns a list of problems (empty = ok).

    strict=False relaxes the 2048-points requirement (small test
    fixtures) but still requires consistent point counts across clouds."""
    specs, needs_match_id = SCHEMAS[name]
    problems = []
    n_points = None
    with h5py.File(path, "r") as f:
        if "cat_label" in f and "cat_labels" not in f:
            problems.append(
                "key 'cat_label' found — the reference CODE reads"
                " 'cat_labels' (dataset.py:70); rename the dataset")
        n = None
        for key, ndim, trail, kind in specs:
            if key not in f:
                problems.append(f"missing dataset '{key}'")
                continue
            ds = f[key]
            if ds.ndim != ndim:
                problems.append(f"'{key}' ndim {ds.ndim} != {ndim}")
                continue
            if trail == (2048, 3):  # a point cloud (n_points, 3)
                if ds.shape[-1] != 3:
                    problems.append(f"'{key}' last dim {ds.shape[-1]} != 3")
                if key != "complete":  # complete may differ in count
                    if n_points is None:
                        n_points = ds.shape[-2]
                    elif ds.shape[-2] != n_points:
                        problems.append(
                            f"'{key}' has {ds.shape[-2]} points,"
                            f" others have {n_points}")
                if strict and ds.shape[-2] != 2048:
                    problems.append(
                        f"'{key}' has {ds.shape[-2]} points — the MVP"
                        " protocol is 2048")
            elif trail and tuple(ds.shape[-len(trail):]) != trail:
                problems.append(
                    f"'{key}' trailing shape {ds.shape[1:]} != {trail}")
            if ds.dtype.kind not in kind:
                problems.append(f"'{key}' dtype {ds.dtype} not kind "
                                f"'{kind}'")
            if n is None:
                n = ds.shape[0]
            elif ds.shape[0] != n:
                problems.append(
                    f"'{key}' leading dim {ds.shape[0]} != {n}")
        if needs_match_id:
            if "match_id" not in f or not isinstance(f["match_id"],
                                                     h5py.Group):
                problems.append(
                    "missing ragged 'match_id' GROUP (reference iterates"
                    " f['match_id'][str(i)], dataset.py:77-80)")
            else:
                g = f["match_id"]
                if n is not None and len(g.keys()) != n:
                    problems.append(
                        f"match_id group has {len(g.keys())} entries,"
                        f" expected {n}")
                elif n and "0" not in g:
                    problems.append("match_id group not keyed '0'..'N-1'")
        if name.endswith("CP.h5") and "complete_pcds" in f \
                and "incomplete_pcds" in f:
            ni, nc = f["incomplete_pcds"].shape[0], \
                f["complete_pcds"].shape[0]
            if ni != 26 * nc:
                problems.append(
                    f"incomplete {ni} != 26 x complete {nc} — the"
                    " index//26 gt mapping (completion/dataset.py:52)"
                    " breaks")
        if n is not None and not problems:
            print(f"  {name}: OK — {n} samples, all keys/shapes/dtypes"
                  " match the reference reader")
    return problems


def smoke_solve(path: str, n_pairs: int = 16):
    """Full-budget solve of the first n labeled val pairs + metrics."""
    import jax
    import jax.numpy as jnp

    from houv_tpu.geometry.rotations import rmse_loss
    from houv_tpu.solvers import HOUVConfig
    from houv_tpu.solvers.houv import evaluate_solution, houv_solve_chunked
    from houv_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    with h5py.File(path, "r") as f:
        src = np.asarray(f["rotated_src"][:n_pairs], np.float32)
        tgt = np.asarray(f["rotated_tgt"][:n_pairs], np.float32)
        gt = np.asarray(f["transforms"][:n_pairs], np.float32)
        complete = np.asarray(f["complete"][:n_pairs], np.float32)
    cfg = HOUVConfig(kernel=64, steps=500, angle_passes=4,
                     retry_threshold=0.030)
    t0 = time.perf_counter()
    out = houv_solve_chunked(jnp.asarray(src), jnp.asarray(tgt),
                             jax.random.PRNGKey(2021), cfg)
    r_err, t_err = evaluate_solution(out["transform"], jnp.asarray(gt))
    mse = rmse_loss(jnp.asarray(complete), out["transform"],
                    jnp.asarray(gt))
    r, t = np.asarray(r_err), np.asarray(t_err)
    print(f"  smoke solve ({n_pairs} pairs, canonical budget): "
          f"{time.perf_counter() - t0:.0f}s wall")
    print(f"    rot_err  mean {r.mean():7.4f}  median {np.median(r):7.4f}"
          f"   (leaderboard mean {LEADERBOARD['rot_error_deg']})")
    print(f"    trans_err mean {t.mean():7.5f}  "
          f"(leaderboard {LEADERBOARD['trans_error']})")
    print(f"    mse      mean {float(np.mean(np.asarray(mse))):7.5f}  "
          f"(leaderboard {LEADERBOARD['mse']})")
    if r.mean() > 3 * LEADERBOARD["rot_error_deg"]:
        print("    WARNING: rot error far above leaderboard — inspect"
              " before launching the full sweep")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    data_dir = args[0] if args else "data"
    do_smoke = "--no-smoke" not in sys.argv
    if h5py is None:
        print("h5py unavailable — cannot validate")
        return 1
    print(f"Scanning {data_dir}/ for MVP .h5 files...")
    found = {}
    rc = 0
    for name in SCHEMAS:
        path = os.path.join(data_dir, name)
        if not os.path.exists(path):
            print(f"  {name}: absent")
            continue
        problems = check_file(path, name)
        found[name] = path
        for p in problems:
            print(f"  {name}: PROBLEM — {p}")
            rc = 1

    val = found.get("MVP_Test_RG.h5")
    if val and do_smoke and rc == 0:
        print("Running registration smoke solve on the val split...")
        smoke_solve(val)

    print("\nLeaderboard-protocol commands (run each alone — 1-vCPU box):")
    if val:
        print(f"  # full labeled val eval (2x2 bucket grid, MSE=rmse_loss):"
              f"\n  python train.py -c cfgs/houv.yaml"
              f" --data-path {val}")
    et = found.get("MVP_ExtraTest_RG.h5")
    if et:
        print(f"  # submission sweep -> results.h5 + submission.zip:"
              f"\n  python test.py -c cfgs/houv_extratest.yaml"
              f" --data-path {et}")
    cp = found.get("MVP_ExtraTest_Shuffled_CP.h5")
    if cp:
        print(f"  # completion submission:"
              f"\n  python test.py -c cfgs/vrcnet_knn_extratest.yaml"
              f" --data-path {cp}")
    if not found:
        print("  (no files found — drop the MVP .h5 files into"
              f" {data_dir}/ and re-run)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
