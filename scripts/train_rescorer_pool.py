"""Train the rescoring classifier on candidate-pool rows.

Consumes the npz from scripts/make_rescore_dataset.py, splits train/val
by PAIR (no leakage of a pair's candidates across the split), and fits
AlignmentTrainer. Checkpoints land in
log/alignment_spconv_cd_rescorer_pool/best_acc_network.ckpt — pass that
to scripts/rescore_gate.py.

Usage: python scripts/train_rescorer_pool.py [npz] [nepoch]
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np

from houv_tpu.train.aux import AlignmentTrainer, PoolCandidateDataset
from houv_tpu.train.config import Config
from houv_tpu.utils.cache import enable_compilation_cache
from houv_tpu.utils.logging_utils import setup_logging

enable_compilation_cache()


def make_override_gate(trainer, rows, margin=2.0, micro=16):
    """Epoch hook: simulate the deployed margin-gated pick rule on the
    held-out pairs' candidate rows and checkpoint on OVERRIDE PRECISION
    (lexicographic: fewest harmful overrides, then largest total
    rotation-error reduction) into best_prec_network.ckpt. Balanced-val
    accuracy saturates ~0.99 while override behavior still varies run to
    run (BENCH_NOTES r4) — this selects directly for the decision rule
    the solver deploys (NEXT_ROUND r4 lever #1)."""
    import logging

    import jax
    import jax.numpy as jnp

    model = trainer.model
    n = len(rows["lbl"])
    pair = rows["pair"]
    extra = rows.get("extra")

    @jax.jit
    def apply(variables, sm, tg, ex):
        return model.apply(variables, sm, tg, False, extra=ex)

    state = {"best": None}

    def gate(variables, epoch):
        logits = np.zeros(n, np.float32)
        for s in range(0, n, micro):
            e = min(s + micro, n)
            pad = micro - (e - s)
            sm = rows["src_moved"][s:e]
            tg = rows["tgt"][s:e]
            ex = (extra[s:e] if extra is not None
                  else np.zeros((e - s, 1), np.float32))
            if pad:
                sm = np.concatenate([sm, np.repeat(sm[:1], pad, 0)])
                tg = np.concatenate([tg, np.repeat(tg[:1], pad, 0)])
                ex = np.concatenate([ex, np.repeat(ex[:1], pad, 0)])
            lg = np.asarray(apply(variables, jnp.asarray(sm),
                                  jnp.asarray(tg), jnp.asarray(ex)))
            logits[s:e] = lg[: e - s]
        n_harm = n_good = n_over = 0
        delta = 0.0
        for pid in np.unique(pair):
            idx = np.where(pair == pid)[0]
            lg = logits[idx]
            err = rows["rot_err"][idx]
            chal = int(np.argmax(lg))
            if lg[chal] > lg[0] + margin:          # deployed pick rule
                n_over += 1
                d = float(err[0] - err[chal])
                delta += d
                if d > 1.0:
                    n_good += 1
                elif d < -1.0:
                    n_harm += 1
        score = (-n_harm, delta)
        logging.getLogger("houv_tpu").info(
            "override gate m%g: %d overrides (%d improving / %d harmful), "
            "rot delta %+.1f deg", margin, n_over, n_good, n_harm, delta)
        if state["best"] is None or score > state["best"]:
            state["best"] = score
            trainer.save("best_prec_network.ckpt")

    return gate


def main():
    npz = sys.argv[1] if len(sys.argv) > 1 else "log/rescore_pool_train.npz"
    nepoch = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    flag = sys.argv[3] if len(sys.argv) > 3 else "rescorer_pool"
    use_gap = os.environ.get("RESCORE_GAP", "0") == "1"

    z = np.load(npz)
    pairs = z["pair"]
    uniq = np.unique(pairs)
    # 10% of pairs (shuffled, fixed seed) for validation — the r4 strided
    # slice selected a constant ~11 pairs regardless of dataset size
    # (ADVICE r4), making best-acc checkpoint selection noisy at scale
    shuffled = np.random.default_rng(2021).permutation(uniq)
    val_pairs = set(shuffled[: max(len(uniq) // 10, 1)].tolist())
    val_mask = np.isin(pairs, list(val_pairs))
    arrays = {k: z[k] for k in ("src_moved", "tgt", "lbl")}
    if use_gap:
        # relative CD-loss gap vs the pair's loss pick (candidate 0 = the
        # per-pair minimum): the scorer sees how much worse a challenger
        # fits — a near-tie needs less geometric confidence to override
        loss = z["cand_loss"]
        best = np.full_like(loss, np.inf)
        for pid in uniq:
            m = pairs == pid
            best[m] = loss[m].min()
        gap = np.clip((loss - best) / np.maximum(best, 1e-6), 0.0, 4.0)
        arrays["extra"] = gap[:, None].astype(np.float32)
        print(f"loss-gap input enabled: mean {gap.mean():.3f} "
              f"p90 {np.percentile(gap, 90):.3f}")
    train_rows = {k: v[~val_mask] for k, v in arrays.items()}
    val_rows = {k: v[val_mask] for k, v in arrays.items()}
    # held-out pool rows for the override-precision gate (pairs stay
    # contiguous: the mask selects whole pairs)
    gate_rows = dict(val_rows)
    for k in ("rot_err", "cand_loss", "pair"):
        gate_rows[k] = z[k][val_mask]
    print(f"{len(pairs)} rows -> train {len(train_rows['lbl'])} "
          f"(pos {train_rows['lbl'].mean():.3f}) / "
          f"val {len(val_rows['lbl'])} (pos {val_rows['lbl'].mean():.3f})")

    cfg = Config(
        model_name="alignment_spconv", dataset="mvp_rg", num_points=2048,
        batch_size=16, lr=1e-4, nepoch=nepoch, work_dir="log/",
        flag=flag, compute_dtype="bfloat16",
        epoch_interval_to_val=2, manual_seed=2021,
    )
    trainer = AlignmentTrainer(cfg)
    if use_gap:
        from houv_tpu.models import get_model

        trainer.model = get_model("alignment_spconv", grid_size=50,
                                  compute_dtype="bfloat16", n_extra=1)
    setup_logging(trainer.log_dir)
    trainer.override_gate = make_override_gate(trainer, gate_rows,
                                               margin=2.0)
    train_ds = PoolCandidateDataset(train_rows, balance=True, augment=True)
    # val balanced too: on the raw 1:7 candidate distribution an always-
    # negative predictor scores 87% acc and would win best-ckpt selection
    val_ds = PoolCandidateDataset(val_rows, balance=True)
    trainer.fit(train_ds, val_ds)
    print("best ckpt:",
          os.path.join(trainer.log_dir, "best_acc_network.ckpt"))
    print("best override-precision ckpt:",
          os.path.join(trainer.log_dir, "best_prec_network.ckpt"))


if __name__ == "__main__":
    main()
