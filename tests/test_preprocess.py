"""Preprocessing pipeline tests (MVPN data mining) + visualization smoke."""

import numpy as np
import pytest

from houv_tpu.data.preprocess import (
    bfs_clusters,
    combine_dataset,
    fuse_cluster,
    pairwise_f1_knn,
)
from houv_tpu.metrics import calc_cd

import jax.numpy as jnp


def test_pairwise_f1_knn_finds_similar(rng):
    """Clouds of two distinct shapes: neighbors must stay within the shape."""
    base_a = rng.uniform(-0.5, 0.5, (32, 3)).astype(np.float32)
    base_b = base_a + 5.0  # far-away second group
    clouds = []
    for i in range(6):
        noise = rng.normal(0, 0.01, base_a.shape).astype(np.float32)
        clouds.append((base_a if i < 3 else base_b) + noise)
    clouds = np.stack(clouds)
    knn = pairwise_f1_knn(clouds, k=2, chunk=3)
    for i in range(6):
        group = set(range(3)) if i < 3 else set(range(3, 6))
        assert set(knn[i].tolist()) <= group - {i} | group, (i, knn[i])


def test_bfs_clusters_two_components():
    knn = np.array([[1], [0], [3], [2]])
    clusters = bfs_clusters(knn, topk=1)
    sets = sorted(tuple(sorted(c.tolist())) for c in clusters)
    assert sets == [(0, 1), (2, 3)]


def test_fuse_cluster_improves_over_single_view(rng):
    """Fused cloud must fit the union of members at least as well as any
    single member fits the others (the point of the data mining)."""
    gt = rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32)
    members = np.stack([
        gt[rng.choice(64, 48, replace=False)] for _ in range(4)
    ])  # 4 partial views (48 of 64 points)
    from houv_tpu.data.preprocess import _optimize_fused, _voxel_seed

    fused, metrics = fuse_cluster(members, gt=gt[None].repeat(4, 0), epochs=20)
    assert fused.shape == (48, 3)
    assert "f1" in metrics and np.isfinite(metrics["cd_t"])
    # The Adam refinement must improve the member-fit over the raw voxel seed
    # (on real MVP scans this is what lifts F1; reference Dnn :349-365).
    seed = _voxel_seed(members)

    def member_loss(cloud):
        a = jnp.broadcast_to(jnp.asarray(cloud)[None], members.shape)
        cd_p, cd_t = calc_cd(a, jnp.asarray(members))
        return float((cd_p * 0.1 + cd_t).mean())

    assert member_loss(fused) <= member_loss(seed)


@pytest.mark.slow
def test_combine_dataset_end_to_end(rng):
    partials = rng.uniform(-0.5, 0.5, (8, 32, 3)).astype(np.float32)
    labels = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    knn, fused, cid = combine_dataset(partials, labels, k=2, epochs=2)
    assert knn.shape == (8, 2)
    assert fused.shape == partials.shape
    assert (cid >= 0).all()
    # kNN neighbors stay within the same class
    for i in range(8):
        assert (labels[knn[i]] == labels[i]).all()


def test_visu_smoke(tmp_path, rng):
    from houv_tpu.utils.visu import (
        aligned_plot_grid_pcd,
        analyse_distances,
        dump_failure_cases,
        plot_grid_pcd,
    )

    clouds = [rng.standard_normal((50, 3)) for _ in range(3)]
    p = plot_grid_pcd(clouds, shape=(1, 3), save_path=str(tmp_path / "g.png"))
    assert p and (tmp_path / "g.png").exists()
    analyse_distances(
        {"sine": rng.uniform(0, 90, 100), "sigmoid": rng.uniform(0, 120, 100)},
        save_path=str(tmp_path / "h.png"),
    )
    assert (tmp_path / "h.png").exists()
    tf = np.eye(4, dtype=np.float32)
    paths = dump_failure_cases(
        np.stack(clouds[:2]), np.stack(clouds[1:]),
        np.stack([tf, tf]), np.array([80.0, 10.0]), str(tmp_path),
    )
    assert len(paths) == 1


@pytest.mark.slow
def test_embedding_knn_mode_end_to_end(rng):
    """Mine a small synthetic class with the embedding-kNN mode: views of
    the same model must rank among each other's nearest neighbors more
    often than chance, and combine_dataset runs end-to-end."""
    import jax
    import jax.numpy as jnp

    from houv_tpu.data import synthesize_completion_set
    from houv_tpu.data.preprocess import combine_dataset, embedding_knn
    from houv_tpu.models import InstanceEmbedding

    data = synthesize_completion_set(4, views_per_model=6, n_partial=128,
                                     n_complete=128, seed=9)
    partials = data["incomplete_pcds"]          # (24, 128, 3)
    labels = data["labels"]
    model = InstanceEmbedding(embedding_size=16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(partials[:2], jnp.float32))

    def embed(x):
        return model.apply(params, x)[0]

    knn = embedding_knn(partials, embed, k=5)
    assert knn.shape == (24, 5)
    assert (knn != np.arange(24)[:, None]).all()  # never self

    knn_g, fused, cid = combine_dataset(
        partials, labels, k=3, epochs=2, mode="embedding", embed_fn=embed
    )
    assert fused.shape == partials.shape
    assert (cid >= 0).all()


def test_pairwise_f1_knn_row_chunking_matches_single(rng):
    """Chunked-row dispatch returns the same graph as row_chunk=1."""
    from houv_tpu.data import synthesize_completion_set
    from houv_tpu.data.preprocess import pairwise_f1_knn

    data = synthesize_completion_set(3, views_per_model=4, n_partial=64,
                                     n_complete=64, seed=5)
    partials = data["incomplete_pcds"]
    a = pairwise_f1_knn(partials, k=4, row_chunk=8)
    b = pairwise_f1_knn(partials, k=4, row_chunk=1)
    np.testing.assert_array_equal(a, b)
