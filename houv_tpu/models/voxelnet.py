"""Asymmetric sparse-conv voxel encoder (flax) — the champion completion
model's voxel branch.

Reference: completion/models/segmentator_3d_asymm_spconv.py — factorized
SubMConv kernels conv1x3/conv3x1/conv1x1x3/... (:11-79), ResContextBlock
(:81-139), ResBlock with stride-2 height pooling (:142-222), ReconBlock
dimension-wise sigmoid attention (:283-324), and the Asymm_3d_spconv
wrapper that max-pools the last two stages into a global feature
(:325-383). Built on houv_tpu.ops.sparse_conv (gather-GEMM, fixed-capacity
voxel lists) instead of the spconv runtime.

Note: the reference constructs ResContextBlock(1024, 128) followed by
ResBlock(512, 512) — a channel mismatch that would fail against real
spconv; we implement the evident intent (context block outputs 4·init_size
so the residual chain is consistent).
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from houv_tpu.ops.sparse_conv import (
    SparseGrid,
    build_lookup,
    from_point_voxels,
    kernel_offsets,
    masked_max,
    sparse_conv_down,
    subm_conv,
)

Array = jax.Array


class SubMConv(nn.Module):
    """Submanifold conv layer with a factorized kernel (no bias, like the
    reference's conv1x3/conv3x1/... constructors).

    With ``remat=True`` the conv body runs under ``jax.checkpoint``: the
    (B, V, K, C) gathered-neighbor tensor is REGATHERED in the backward
    instead of saved — these residuals were the voxel branch's HBM cap
    (11.5 G at B=16; the gather recompute costs ~ms). Checkpointing the
    pure op function keeps flax param paths unchanged. ``remat=False``
    saves the residuals and skips the backward regather einsums — faster
    when HBM headroom allows (the match-conv einsum path fits B=16)."""

    out_channels: int
    kernel_size: tuple = (3, 3, 3)
    compute_dtype: str | None = None  # bf16: MXU contraction (f32 accum)
    remat: bool = True

    @nn.compact
    def __call__(self, sg: SparseGrid, lookup: Array) -> SparseGrid:
        k = int(np.prod(self.kernel_size))
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, sg.features.shape[-1], self.out_channels),
        )

        def body(feats, w):
            return subm_conv(
                SparseGrid(feats, sg.coords, sg.mask, sg.grid_size),
                lookup, w, self.kernel_size,
                compute_dtype=self.compute_dtype,
            ).features

        run = jax.checkpoint(body) if self.remat else body
        out = run(sg.features, w)
        return SparseGrid(out, sg.coords, sg.mask, sg.grid_size)


class SparseDownConv(nn.Module):
    """Strided sparse conv (kernel 3, padding 1); neighbor gathers remat'd
    in the backward (see SubMConv)."""

    out_channels: int
    stride: tuple = (2, 2, 2)
    compute_dtype: str | None = None
    remat: bool = True

    @nn.compact
    def __call__(self, sg: SparseGrid, lookup: Array) -> SparseGrid:
        from houv_tpu.ops.sparse_conv import (
            downsample_sites,
            sparse_conv_down_features,
        )

        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (27, sg.features.shape[-1], self.out_channels),
        )
        out_coords, out_mask, out_g = downsample_sites(sg, self.stride)

        def body(feats, w):
            return sparse_conv_down_features(
                SparseGrid(feats, sg.coords, sg.mask, sg.grid_size),
                lookup, w, out_coords, out_mask, self.stride,
                compute_dtype=self.compute_dtype,
            )

        run = jax.checkpoint(body) if self.remat else body
        feats = run(sg.features, w)
        return SparseGrid(feats, out_coords, out_mask, out_g)


def _masked_bn(sg: SparseGrid, bn: nn.Module) -> SparseGrid:
    """BatchNorm over valid voxels only (the reference's BatchNorm1d over
    the ragged feature list)."""
    feats = bn(sg.features, mask=sg.mask[..., None])
    feats = jnp.where(sg.mask[..., None], feats, 0.0)
    return SparseGrid(feats, sg.coords, sg.mask, sg.grid_size)


def _act(sg: SparseGrid, fn) -> SparseGrid:
    return SparseGrid(fn(sg.features), sg.coords, sg.mask, sg.grid_size)


class ResContextBlock(nn.Module):
    """(1x3x3 -> 3x1x3) vs (3x1x3 -> 1x3x3) two-path residual context
    (reference segmentator_3d_asymm_spconv.py:81-139)."""

    out_filters: int
    axis_name: str | None = None
    compute_dtype: str | None = None
    remat: bool = True

    @nn.compact
    def __call__(self, sg: SparseGrid, lookup: Array, train: bool = False):
        dt = self.compute_dtype
        rm = self.remat

        def bn():
            return nn.BatchNorm(use_running_average=not train,
                                axis_name=self.axis_name)

        shortcut = SubMConv(self.out_filters, (1, 3, 3), dt, rm)(sg, lookup)
        shortcut = _masked_bn(_act(shortcut, nn.leaky_relu), bn())
        shortcut = SubMConv(self.out_filters, (3, 1, 3), dt, rm)(
            shortcut, lookup)
        shortcut = _masked_bn(_act(shortcut, nn.leaky_relu), bn())

        res = SubMConv(self.out_filters, (3, 1, 3), dt, rm)(sg, lookup)
        res = _masked_bn(_act(res, nn.leaky_relu), bn())
        res = SubMConv(self.out_filters, (1, 3, 3), dt, rm)(res, lookup)
        res = _masked_bn(_act(res, nn.leaky_relu), bn())
        return SparseGrid(
            res.features + shortcut.features, sg.coords, sg.mask, sg.grid_size
        )


class ResBlock(nn.Module):
    """Two-path factorized residual + stride-2 pooling (reference :142-222).
    Returns (pooled, pre-pool)."""

    out_filters: int
    height_pooling: bool = True
    compute_dtype: str | None = None
    remat: bool = True

    @nn.compact
    def __call__(self, sg: SparseGrid, lookup: Array):
        dt = self.compute_dtype
        rm = self.remat
        shortcut = SubMConv(self.out_filters, (3, 1, 3), dt, rm)(sg, lookup)
        shortcut = _act(shortcut, nn.leaky_relu)
        shortcut = SubMConv(self.out_filters, (1, 3, 3), dt, rm)(
            shortcut, lookup)
        shortcut = _act(shortcut, nn.leaky_relu)

        res = SubMConv(self.out_filters, (1, 3, 3), dt, rm)(sg, lookup)
        res = _act(res, nn.leaky_relu)
        res = SubMConv(self.out_filters, (3, 1, 3), dt, rm)(res, lookup)
        res = _act(res, nn.leaky_relu)

        res = SparseGrid(
            res.features + shortcut.features, sg.coords, sg.mask, sg.grid_size
        )
        stride = (2, 2, 2) if self.height_pooling else (2, 2, 1)
        pooled = SparseDownConv(self.out_filters, stride, dt, rm)(res, lookup)
        return pooled, res


class ReconBlock(nn.Module):
    """Dimension-wise sigmoid attention (reference :283-324)."""

    out_filters: int
    compute_dtype: str | None = None
    remat: bool = True

    @nn.compact
    def __call__(self, sg: SparseGrid, lookup: Array) -> SparseGrid:
        dt = self.compute_dtype
        rm = self.remat
        a = _act(SubMConv(self.out_filters, (3, 1, 1), dt, rm)(sg, lookup),
                 nn.sigmoid)
        b = _act(SubMConv(self.out_filters, (1, 3, 1), dt, rm)(sg, lookup),
                 nn.sigmoid)
        c = _act(SubMConv(self.out_filters, (1, 1, 3), dt, rm)(sg, lookup),
                 nn.sigmoid)
        att = a.features + b.features + c.features
        return SparseGrid(att * sg.features, sg.coords, sg.mask, sg.grid_size)


class SparseBasicBlock(nn.Module):
    """ResNet-style sparse residual block (reference
    utils/mm3d_pn2/ops/sparse_block.py SparseBasicBlock): two 3x3x3
    submanifold convs with BN + ReLU and an identity shortcut."""

    out_filters: int
    axis_name: str | None = None
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, sg: SparseGrid, lookup: Array, train: bool = False):
        def bn():
            return nn.BatchNorm(use_running_average=not train,
                                axis_name=self.axis_name)

        identity = sg.features
        h = SubMConv(self.out_filters, (3, 3, 3), self.compute_dtype)(sg, lookup)
        h = _masked_bn(_act(h, nn.relu), bn())
        h = SubMConv(self.out_filters, (3, 3, 3), self.compute_dtype)(h, lookup)
        h = _masked_bn(h, bn())
        if identity.shape[-1] != self.out_filters:
            identity = nn.Dense(self.out_filters, use_bias=False)(identity)
        out = nn.relu(h.features + identity)
        return SparseGrid(out, sg.coords, sg.mask, sg.grid_size)


# ---------------------------------------------------------------------------
# Dense levels. Below ~13³ the voxel grid is >90% occupied (2048 points
# can't be sparse in 2197 cells), so sparse gather/match machinery wastes
# both FLOPs and compile time; a plain ``lax.conv_general_dilated`` over a
# dense (B, G, G, G, C) volume with an occupancy mask reproduces the
# submanifold semantics exactly (empty sites carry zero features and are
# masked out of the output) at 1/5 the MAC count.


def _dense_conv(x: Array, w: Array, stride=(1, 1, 1),
                compute_dtype="bfloat16") -> Array:
    """x (B, X, Y, Z, C) × w (kx, ky, kz, C, D), SAME padding.

    Operand and result dtypes stay symmetric (a mixed bf16-operand /
    f32-result conv has no valid transpose under jax.grad); the MXU still
    accumulates in f32 internally, only the conv OUTPUT is rounded."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    pads = [((k - 1) // 2, (k - 1) // 2) for k in w.shape[:3]]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pads,
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
    )
    return out.astype(jnp.float32)


def sparse_to_dense(sg: SparseGrid) -> tuple[Array, Array]:
    """SparseGrid -> (features (B, G, G, G, C) f32, occ (B, G, G, G) bool)."""
    from houv_tpu.ops.sparse_conv import to_dense

    g = sg.grid_size
    dense = to_dense(sg)
    flat = (
        sg.coords[..., 0] * g + sg.coords[..., 1]
    ) * g + sg.coords[..., 2]
    flat = jnp.where(sg.mask, flat, g * g * g)

    def single(f):
        return (
            jnp.zeros((g * g * g,), jnp.bool_).at[f].set(True, mode="drop")
            .reshape(g, g, g)
        )

    return dense, jax.vmap(single)(flat)


def _occ_downsample(occ: Array, stride: tuple[int, int, int]) -> Array:
    """Exact strided-conv site occupancy (kernel 3, padding 1): coarse
    cell o is occupied iff any input cell in [o·s−1, o·s+1]³ is —
    mirrors ops/sparse_conv.downsample_sites' exact spconv rule so the
    hybrid dense levels mask the same sites the sparse levels emit."""
    pads = []
    for i in range(3):
        g = occ.shape[1 + i]
        og = -(-g // stride[i])
        pads.append((1, (og - 1) * stride[i] + 2 - g))
    return jax.lax.reduce_window(
        occ, False, jax.lax.bitwise_or,
        window_dimensions=(1, 3, 3, 3), window_strides=(1, *stride),
        padding=[(0, 0), *pads],
    )


class DenseSubMConv(nn.Module):
    """Dense-volume equivalent of SubMConv (same factorized kernels)."""

    out_channels: int
    kernel_size: tuple = (3, 3, 3)
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x: Array, occ: Array) -> Array:
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1], self.out_channels),
        )
        return _dense_conv(x, w, (1, 1, 1), self.compute_dtype) * occ[
            ..., None
        ].astype(jnp.float32)


class DenseResBlock(nn.Module):
    """ResBlock on a dense volume; returns (pooled x, occ), pre-pool x."""

    out_filters: int
    height_pooling: bool = True
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x: Array, occ: Array):
        dt = self.compute_dtype
        shortcut = nn.leaky_relu(
            DenseSubMConv(self.out_filters, (3, 1, 3), dt)(x, occ))
        shortcut = nn.leaky_relu(
            DenseSubMConv(self.out_filters, (1, 3, 3), dt)(shortcut, occ))
        res = nn.leaky_relu(
            DenseSubMConv(self.out_filters, (1, 3, 3), dt)(x, occ))
        res = nn.leaky_relu(
            DenseSubMConv(self.out_filters, (3, 1, 3), dt)(res, occ))
        res = res + shortcut
        stride = (2, 2, 2) if self.height_pooling else (2, 2, 1)
        w = self.param(
            "down_kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, self.out_filters, self.out_filters),
        )
        occ_dn = _occ_downsample(occ, stride)
        pooled = _dense_conv(res, w, stride, self.compute_dtype) * occ_dn[
            ..., None
        ].astype(jnp.float32)
        return (pooled, occ_dn), res


class DenseReconBlock(nn.Module):
    """Dimension-wise sigmoid attention on a dense volume."""

    out_filters: int
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x: Array, occ: Array) -> Array:
        dt = self.compute_dtype
        a = nn.sigmoid(DenseSubMConv(self.out_filters, (3, 1, 1), dt)(x, occ))
        b = nn.sigmoid(DenseSubMConv(self.out_filters, (1, 3, 1), dt)(x, occ))
        c = nn.sigmoid(DenseSubMConv(self.out_filters, (1, 1, 3), dt)(x, occ))
        return (a + b + c) * x


def dense_masked_max(x: Array, occ: Array) -> Array:
    """(B, C) max over occupied cells."""
    neg = jnp.where(occ[..., None], x, -jnp.inf)
    out = jnp.max(neg, axis=(1, 2, 3))
    return jnp.where(jnp.isfinite(out), out, 0.0)


class Asymm3DSpconv(nn.Module):
    """Full voxel encoder: context block + 3 stride-2 ResBlocks + ReconBlock,
    global feature = max-pooled concat of the last two stages -> (B, 8·init)
    (reference :325-383; 2·4·init_size = 1024 for init_size=128).

    Hybrid sparse/dense execution: the 50³ and 25³ levels (1.6-13%
    occupancy) run the sparse match-conv path; from 13³ down (>90%
    occupancy) the volume is densified once and everything is plain MXU
    ``lax.conv`` (same submanifold semantics, ~5× fewer MACs, far smaller
    compiled code). ``dense_from`` sets the grid size at which to switch
    (0 = fully sparse, used on CPU golden tests).

    Inputs: per-point voxel indices (B, N, 3) int32 on the 50³ grid and
    per-point features (B, N, C) (the PCN_encoder_label point features)."""

    init_size: int = 128
    grid_size: int = 50
    axis_name: str | None = None
    dense_from: int = 13
    # bf16 by default: the TPU sparse path (coordinate-match einsums,
    # ops/sparse_conv.py) is designed around a low-precision compute dtype
    # and was benchmarked at bf16 (BENCH_NOTES r3). None = full-f32
    # reference numerics via the gather path (CPU golden tests).
    compute_dtype: str | None = "bfloat16"
    # conv_remat=True regathers neighbor tensors in the backward (HBM
    # headroom); False saves them and skips the backward regather einsums
    # (measured faster at champion shapes — BENCH_NOTES r3 final).
    conv_remat: bool = False

    @nn.compact
    def __call__(self, grid_ind: Array, point_features: Array,
                 train: bool = False) -> Array:
        c = 4 * self.init_size
        dt = self.compute_dtype
        rm = self.conv_remat
        sg = from_point_voxels(grid_ind, point_features, self.grid_size)

        lk = build_lookup(sg)
        sg = ResContextBlock(c, self.axis_name, dt, rm)(sg, lk, train)

        down1, _ = ResBlock(c, height_pooling=True, compute_dtype=dt,
                            remat=rm)(sg, lk)
        lk1 = build_lookup(down1)
        down2, _ = ResBlock(c, height_pooling=True, compute_dtype=dt,
                            remat=rm)(down1, lk1)

        if down2.grid_size <= self.dense_from:
            # sparse subm convs at 25³ are still cheaper; densify at 13³
            dn, occ = sparse_to_dense(down2)
            (down3, occ3), _ = DenseResBlock(
                c, height_pooling=True, compute_dtype=dt)(dn, occ)
            down4 = DenseReconBlock(c, dt)(down3, occ3)
            a = dense_masked_max(down3, occ3)
            b = dense_masked_max(down4, occ3)
        else:
            lk2 = build_lookup(down2)
            down3, _ = ResBlock(c, height_pooling=True, compute_dtype=dt,
                                remat=rm)(down2, lk2)
            lk3 = build_lookup(down3)
            down4 = ReconBlock(c, dt, rm)(down3, lk3)
            a = masked_max(down3)  # (B, 4·init)
            b = masked_max(down4)
        return jnp.concatenate([a, b], axis=-1)  # (B, 8·init)
