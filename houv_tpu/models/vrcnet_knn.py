"""vrcnet_knn — the champion completion submission (flax).

Reference: completion/models/vrcnet_knn.py + cfgs/vrcnt_knn.yaml
(num_coarse 1024, num_fine 3072, num_native 2048, feature_size 2048,
layers 1,1,1,1, knn_list [16]). Label-conditioned PCN encoder
(completion/models/pcn.py:31-58) + sparse-conv voxel branch
(Asymm_3d_spconv on a 50³ grid) concatenated into a 2048-d global feature
(:466-483); simplified decoder (:362-428): FC coarse (tanh MLP) ->
SA_SKN encoder over coarse+input -> tanh conv fine (3072) -> FPS to 2048
"native" points; loss = sum of 4 CDs (:492-500).

Naming note: the reference decoder returns (coarse, fine, fine, naive) and
the model unpacks them as (coarse, naive, fine, points) — i.e. its 'naive'
loss is on the fine cloud and its 'points' loss on the FPS-native cloud.
We keep the effective loss (CD(coarse) + 2·CD(fine) + CD(native)).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from houv_tpu.metrics import calc_cd
from houv_tpu.metrics.cd import calc_cd_percent_len
from houv_tpu.models.pcn import PCNEncoderLabel
from houv_tpu.models.voxelnet import Asymm3DSpconv
from houv_tpu.models.vrcnet import SASKNResEncoder, saskn_geometry
from houv_tpu.ops.gather import gather_rows
from houv_tpu.ops.sampling import furthest_point_sample

Array = jax.Array


class KNNDecoder(nn.Module):
    """FC coarse -> SA_SKN dense features -> fine + FPS-native points
    (reference vrcnet_knn.py MSAP_SKN_decoder:362-428)."""

    num_native: int = 2048
    num_coarse: int = 1024
    num_fine: int = 3072
    layers: tuple = (1, 1, 1, 1)
    knn_list: tuple = (16,)
    pk: int = 10
    remat: bool = False
    compute_dtype: str | None = None  # bf16 = AMP in the SA-SKN encoder

    @nn.compact
    def __call__(self, global_feat: Array, origin_points: Array,
                 train: bool = False):
        b = global_feat.shape[0]
        h = nn.relu(nn.Dense(1024)(global_feat))
        h = jnp.tanh(nn.Dense(1024)(h))
        coarse = nn.Dense(self.num_coarse * 3)(h).reshape(b, self.num_coarse, 3)

        points = jnp.concatenate([coarse, origin_points], axis=1)
        # remat the WHOLE encoder: its edge-preserve grouping buffers and
        # unit activations dominate HBM at larger batches
        enc_cls = nn.remat(SASKNResEncoder, static_argnums=(2,)) \
            if self.remat else SASKNResEncoder
        pts_num = (
            points.shape[1], points.shape[1] // 2,
            points.shape[1] // 4, points.shape[1] // 8,
        )
        # coordinate-only geometry outside the remat scope: the Pallas
        # kNN/FPS/three-nn results become saved residuals instead of being
        # recomputed by the backward pass (saskn_geometry docstring)
        geo = saskn_geometry(points, pts_num, self.knn_list, self.pk)
        fine_feat = enc_cls(
            ks=self.knn_list, pk=self.pk, output_size=256, layers=self.layers,
            compute_dtype=self.compute_dtype, pts_num=pts_num,
        )(points, train, geo)

        fine = nn.Dense(3)(jnp.tanh(nn.Dense(1024)(fine_feat)))

        idx = furthest_point_sample(fine, self.num_native)
        # (B, 2048) rows from (B, 3072, 1024): one-hot dot beats the XLA
        # gather + scatter-adjoint pair at this size (ops/gather.py)
        native_feat = gather_rows(fine_feat, idx)
        native = nn.Dense(3)(jnp.tanh(nn.Dense(1024)(native_feat)))
        return coarse, fine, native


class VRCNetKNN(nn.Module):
    """Champion completion model (reference vrcnet_knn.py Model:431-516)."""

    num_native: int = 2048
    num_coarse: int = 1024
    num_fine: int = 3072
    feature_size: int = 2048
    global_feature_size: int = 1024
    layers: tuple = (1, 1, 1, 1)
    knn_list: tuple = (16,)
    pk: int = 10
    voxel_grid_size: int = 50
    voxel_init_size: int = 128
    axis_name: str | None = None
    remat: bool = False  # remat the SA-SKN units (2x batch headroom)
    compute_dtype: str | None = None  # bf16 = AMP in the SA-SKN encoder
    # voxel branch compute dtype (see models/voxelnet.Asymm3DSpconv:
    # bf16 is the benchmarked TPU design point; None = f32 gather path)
    voxel_compute_dtype: str | None = "bfloat16"
    # remat the voxel-branch conv bodies (regather in backward). False
    # saves the neighbor tensors — measured faster at B=16 (457 vs 523
    # ms/step) and B=32 (998 vs 1073) on v5e; flip to True only when HBM
    # is the binding constraint.
    voxel_conv_remat: bool = False
    # fuse the train-time 4-CD loss (reference vrcnet_knn.py:492-500
    # computes 4 separate CDs) into ONE chamfer dispatch over batch-
    # stacked clouds: coarse/native padded to num_fine with far-away
    # sentinels (never win the gt->pred argmin) and masked out of their
    # own means. Identical loss value; 1.5x the distance-matrix FLOPs
    # for 1/3 the kernel launches — A/B on chip before promoting.
    fused_cd: bool = False

    @nn.compact
    def __call__(self, x: Array, gt: Array | None = None,
                 label: Array | None = None, coords: Array | None = None,
                 prefix: str = "train"):
        if label is None:
            label = jnp.zeros((x.shape[0],), jnp.int32)
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        feat, point_feat = PCNEncoderLabel(
            self.global_feature_size, dtype=dt)(x, label)

        if coords is not None:
            # Voxel branch: per-point 1024-d features scattered onto the 50³
            # grid (replaces the batch-flattened F.pad(coords) + spconv path,
            # reference :466-481 — batching is native here, no index packing).
            feat_voxel = Asymm3DSpconv(
                self.voxel_init_size, self.voxel_grid_size, self.axis_name,
                compute_dtype=self.voxel_compute_dtype,
                conv_remat=self.voxel_conv_remat,
            )(coords, point_feat, train=(prefix == "train"))
        else:
            feat_voxel = jnp.zeros(
                (feat.shape[0], 8 * self.voxel_init_size), feat.dtype
            )
        feat = jnp.concatenate([feat, feat_voxel], axis=-1)  # (B, 2048)

        coarse, fine, native = KNNDecoder(
            self.num_native, self.num_coarse, self.num_fine,
            self.layers, self.knn_list, self.pk, remat=self.remat,
            compute_dtype=self.compute_dtype,
        )(feat, x, train=(prefix == "train"))

        if prefix == "train":
            # The reference decoder returns fine_points TWICE (naive ==
            # fine, completion/models/vrcnet_knn.py:428), so its loss2 and
            # loss3 are the same CD counted twice; reproduced faithfully
            # (total = loss1 + 2*loss2 + loss4; XLA CSEs the duplicate).
            if self.fused_cd:
                b = coarse.shape[0]
                npad = self.num_fine
                def pad(c):
                    filler = jnp.full(
                        (b, npad - c.shape[1], 3), 1e3, c.dtype)
                    return jnp.concatenate([c, filler], axis=1)
                pred = jnp.concatenate(
                    [pad(coarse), fine, pad(native)], axis=0)
                gt3 = jnp.concatenate([gt, gt, gt], axis=0)
                ar = jnp.arange(npad)
                valid = jnp.concatenate([
                    jnp.broadcast_to(ar < self.num_coarse, (b, npad)),
                    jnp.ones((b, npad), bool),
                    jnp.broadcast_to(ar < self.num_native, (b, npad)),
                ], axis=0)
                cd_p, cd_t = calc_cd_percent_len(
                    pred, gt3, mask_output=valid)
                loss1, loss2, loss4 = cd_p[:b], cd_p[b:2 * b], cd_p[2 * b:]
                loss4_t = cd_t[2 * b:]
            else:
                loss1, _ = calc_cd(coarse, gt)
                loss2, _ = calc_cd(fine, gt)
                loss4, loss4_t = calc_cd(native, gt)
            total = loss1.mean() + 2.0 * loss2.mean() + loss4.mean()
            return {"out2": fine, "loss2": loss4_t, "total_loss": total}
        if prefix == "val":
            cd_p, cd_t, f1 = calc_cd(fine, gt, calc_f1=True)
            return {"out1": coarse, "out2": native, "cd_p": cd_p,
                    "cd_t": cd_t, "f1": f1}
        return {"result": fine}
