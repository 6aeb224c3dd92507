"""Frame-parallel UNet execution: shard the frame rows of ALL context windows
over the mesh.

The window-DP topology (``DenoiseSpec.dp_axis``) parallelizes the VCPD step
over ``n_windows x CFG`` replicas, so chip count is tied to the window plan
(the flagship overlap-8 plan exists only to produce 8 shards). This module
removes that coupling: the denoise step's whole frame-row set — every
(window, cfg, frame) row — is sharded over a ``fp`` mesh axis, so ANY plan
spreads over ALL chips. For the reference-default overlap-4 plan (3 windows
of 12+1 frames, CFG) that is 78 rows over 8 chips = 10 rows/chip instead of
13, a 1.3x per-chip work reduction on exactly the same computation.

Why this maps well to TPU: almost the entire UNet is frame-local (convs,
resnets, spatial GN/LN, cross-attention, FF all act per frame row) and runs
unchanged on local row shards with zero communication. The frame-mixing
remainder becomes three small collective patterns:

  * temporal conv (3-tap over T): ``ppermute`` halo exchange of ONE boundary
    row per direction per group, masked at window edges — exact.
  * temporal attention (per-pixel over T): ``all_to_all`` pivot rows->pixels,
    run the identical pixel-major core on a 1/n pixel slice with ALL frames
    resident, pivot back. 5-D GroupNorm stats ride a tiny ``psum``.
  * ReferenceOnly spatial attention: each window's vision-condition tokens
    are assembled with a one-hot row-selector matmul + ``psum`` (every chip
    gets the (n_windows, HW, C) token block, ~a few MB), then each local row
    concatenates [own; its window's vis tokens] — exact, SPMD-uniform.

CFG uniformity: under CFG the uncond half runs *plain* self-attention while
the cond half runs concat-KV (unet_blocks.reference_self_attention). A mixed
row shard would make the program data-dependent; instead rows are sharded
as two static groups (uncond rows, cond rows), every chip holding an equal
slice of each, so the divergent attention forms are static per-tensor —
one uniform SPMD program, exact semantics.

No reference counterpart: the reference runs windows serially on one GPU
(musev/pipelines/pipeline_controlnet.py:1846-2147). Distribution design per
SURVEY §2.10.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from ..models import unet_blocks as blk
from ..models.common import Params, linear, silu
from ..models.unet3d import (
    UNet3DConfig,
    UNetOps,
    prepare_unet_inputs,
    unet3d_core,
)
from ..ops.index_ops import splice_with_index

# ---------------------------------------------------------------------------
# communication backends


class RealComm:
    """Collectives over a named mesh axis (inside shard_map)."""

    def __init__(self, axis: str):
        self.axis = axis

    def psum(self, x):
        return lax.psum(x, self.axis)

    def ppermute(self, x, shift: int):
        """shift=+1: receive the neighbour-to-the-left's value (rows flow
        forward); shift=-1: receive from the right."""
        n = lax.axis_size(self.axis)
        perm = [(i, (i + shift) % n) for i in range(n)]
        return lax.ppermute(x, self.axis, perm)

    def all_to_all(self, x, split_axis: int, concat_axis: int):
        return lax.all_to_all(
            x, self.axis, split_axis=split_axis, concat_axis=concat_axis,
            tiled=True,
        )

    def axis_index(self):
        return lax.axis_index(self.axis)


class StubComm:
    """Single-device stand-in with collective-shaped data movement.

    Used to measure one chip's share of the frame-parallel step on real
    hardware without n chips: shapes and local FLOPs/HBM traffic match the
    SPMD program exactly; cross-chip values are faked (psum scales by n so
    normalization statistics keep realistic magnitudes), and the ICI time is
    added arithmetically by the bench from the payload model.
    """

    def __init__(self, n: int):
        self.n = n

    def psum(self, x):
        return x * jnp.asarray(self.n, x.dtype)

    def ppermute(self, x, shift: int):
        return x

    def all_to_all(self, x, split_axis: int, concat_axis: int):
        parts = jnp.split(x, self.n, axis=split_axis)
        return jnp.concatenate(parts, axis=concat_axis)

    def axis_index(self):
        return jnp.int32(0)


# ---------------------------------------------------------------------------
# static row-shard metadata


@dataclasses.dataclass(frozen=True)
class GroupMeta:
    """One CFG group's frame rows, flattened (batch-entry-major) and padded
    to the device count."""

    n_batch: int  # window-batch entries in the group
    t: int  # frames per entry (vision-cond frames included)
    n: int  # devices
    use_ref: bool  # concat-KV reference attention for these rows

    @property
    def rows(self) -> int:
        return self.n_batch * self.t

    @property
    def rows_pad(self) -> int:
        return -(-self.rows // self.n) * self.n

    @property
    def local(self) -> int:
        return self.rows_pad // self.n

    @property
    def pad(self) -> int:
        return self.rows_pad - self.rows

    def pad_index(self) -> np.ndarray:
        """Row gather map (rows_pad,) duplicating head rows into the pad."""
        return np.arange(self.rows_pad) % self.rows


@dataclasses.dataclass(frozen=True)
class FPMeta:
    n: int
    groups: Tuple[GroupMeta, ...]
    cond_index: Optional[Tuple[int, ...]]

    @property
    def local_total(self) -> int:
        return sum(g.local for g in self.groups)

    def block_starts(self) -> List[int]:
        starts = [0]
        for g in self.groups:
            starts.append(starts[-1] + g.local)
        return starts

    def batch_starts(self) -> List[int]:
        starts = [0]
        for g in self.groups:
            starts.append(starts[-1] + g.n_batch)
        return starts


def _shard_rows(arr: jnp.ndarray, g: GroupMeta, b_start: int) -> jnp.ndarray:
    """Slice a (B_total*T, ...) row tensor to the group and pad to rows_pad."""
    rows = arr[b_start * g.t:(b_start + g.n_batch) * g.t]
    return rows[g.pad_index()]


def _row_ids(g: GroupMeta, slot_offset: int) -> Dict[str, np.ndarray]:
    """Static per-row bookkeeping arrays for one group (padded length)."""
    idx = g.pad_index()
    win = (np.arange(g.rows) // g.t)[idx].astype(np.int32)
    t_id = (np.arange(g.rows) % g.t)[idx].astype(np.int32)
    valid = (np.arange(g.rows_pad) < g.rows).astype(np.float32)
    return {
        "win": win,
        "t": t_id,
        "slot": (win + slot_offset).astype(np.int32),
        "valid": valid,
        "mask_prev": ((t_id > 0).astype(np.float32) * valid),
        "mask_next": ((t_id < g.t - 1).astype(np.float32) * valid),
    }


# ---------------------------------------------------------------------------
# collective building blocks (operate on concatenated local row tensors)


def _neighbor_shift(x, comm, meta: FPMeta, direction: int):
    """Previous/next-row tensor aligned with the local concat-of-groups rows.

    direction=-1: row i-1 (window-head rows get the wrapped garbage, masked
    by the caller); direction=+1: row i+1.
    """
    starts = meta.block_starts()
    nG = len(meta.groups)
    if direction == -1:
        send_idx = [starts[i + 1] - 1 for i in range(nG)]  # last row per group
        recv = comm.ppermute(x[np.asarray(send_idx)], shift=+1)
        parts = []
        for i in range(nG):
            parts.append(recv[i:i + 1])
            parts.append(x[starts[i]:starts[i + 1] - 1])
        return jnp.concatenate(parts, axis=0)
    send_idx = [starts[i] for i in range(nG)]  # first row per group
    recv = comm.ppermute(x[np.asarray(send_idx)], shift=-1)
    parts = []
    for i in range(nG):
        parts.append(x[starts[i] + 1:starts[i + 1]])
        parts.append(recv[i:i + 1])
    return jnp.concatenate(parts, axis=0)


def _fp_group_norm_video(
    p: Params,
    v: jnp.ndarray,
    comm,
    slot_onehot: jnp.ndarray,
    slot_ids: jnp.ndarray,
    count: int,
    num_groups: int,
    eps: float,
) -> jnp.ndarray:
    """5-D GroupNorm (stats over T,H,W per batch entry) on local row shards.

    v (L, H, W, C); slot_onehot (L, B_total) f32 with pad rows zeroed;
    ``count`` = T*H*W*(C/G) true element count per (entry, group).
    """
    c = v.shape[-1]
    cg = c // num_groups
    onehot_g = (
        (jnp.arange(c)[:, None] // cg) == jnp.arange(num_groups)[None, :]
    ).astype(jnp.float32)
    s1 = jnp.sum(v, axis=(1, 2), dtype=jnp.float32)  # (L, C)
    s2 = jnp.sum(jnp.square(v.astype(jnp.float32)), axis=(1, 2))
    stats = jnp.concatenate([s1, s2], axis=-1)  # one psum for both moments
    stats = comm.psum(slot_onehot.T @ stats)  # (B_total, 2C)
    s1_t, s2_t = jnp.split(stats, 2, axis=-1)
    sum_g = s1_t @ onehot_g  # (B_total, G)
    sq_g = s2_t @ onehot_g
    mean_g = sum_g / count
    var_g = jnp.maximum(sq_g / count - mean_g * mean_g, 0.0)
    inv_g = lax.rsqrt(var_g + eps)
    mean_c = mean_g @ onehot_g.T  # (B_total, C)
    inv_c = inv_g @ onehot_g.T
    scale = inv_c * p["scale"].astype(jnp.float32)[None, :]
    shift = p["bias"].astype(jnp.float32)[None, :] - mean_c * scale
    scale_r = jnp.take(scale, slot_ids, axis=0)  # (L, C)
    shift_r = jnp.take(shift, slot_ids, axis=0)
    y = (
        v.astype(jnp.float32) * scale_r[:, None, None, :]
        + shift_r[:, None, None, :]
    )
    return y.astype(v.dtype)


def _fp_conv_temporal(
    p: Params, v: jnp.ndarray, comm, meta: FPMeta,
    mask_prev: jnp.ndarray, mask_next: jnp.ndarray,
) -> jnp.ndarray:
    """3-tap temporal conv on row shards via halo exchange (exact: the
    window-edge zero padding of models.common.conv_temporal becomes the
    mask_prev/mask_next row masks)."""
    kern = p["kernel"].astype(v.dtype)
    w0, w1, w2 = kern[0, 0], kern[1, 0], kern[2, 0]
    pv = _neighbor_shift(v, comm, meta, -1) * mask_prev[:, None, None, None].astype(v.dtype)
    nx = _neighbor_shift(v, comm, meta, +1) * mask_next[:, None, None, None].astype(v.dtype)
    y = pv @ w0 + v @ w1 + nx @ w2
    if "bias" in p:
        y = y + p["bias"].astype(v.dtype)
    return y


def _fp_gn_pixel_space(
    p: Params, y: jnp.ndarray, comm, count: int, num_groups: int, eps: float
) -> jnp.ndarray:
    """5-D GroupNorm after the pixel pivot: y (B, T, S_local, C), stats over
    (T, S) with the pixel axis sharded -> partial sums + psum. Zero pixel
    padding contributes nothing; ``count`` uses the true pixel count."""
    b, t, s, c = y.shape
    cg = c // num_groups
    onehot_g = (
        (jnp.arange(c)[:, None] // cg) == jnp.arange(num_groups)[None, :]
    ).astype(jnp.float32)
    s1 = jnp.sum(y, axis=(1, 2), dtype=jnp.float32)  # (B, C)
    s2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(1, 2))
    stats = comm.psum(jnp.concatenate([s1, s2], axis=-1))
    s1_t, s2_t = jnp.split(stats, 2, axis=-1)
    sum_g = s1_t @ onehot_g
    sq_g = s2_t @ onehot_g
    mean_g = sum_g / count
    var_g = jnp.maximum(sq_g / count - mean_g * mean_g, 0.0)
    inv_g = lax.rsqrt(var_g + eps)
    mean_c = (mean_g @ onehot_g.T)[:, None, None, :]
    inv_c = (inv_g @ onehot_g.T)[:, None, None, :]
    scale = inv_c * p["scale"].astype(jnp.float32)
    shift = p["bias"].astype(jnp.float32) - mean_c * scale
    return (y.astype(jnp.float32) * scale + shift).astype(y.dtype)


# ---------------------------------------------------------------------------
# the local (per-device) UNet program


def _build_local_fn(
    cfg: UNet3DConfig,
    meta: FPMeta,
    *,
    heads: int,
    groups_n: int,
    ip_adapter_scale: float,
    ip_adapter_face_scale: float,
    use_temporal: bool,
    refer_read: bool,
    self_attn_mask: Optional[str],
    mask_n_near: int,
    controlnet_cfgs: Optional[Sequence[Any]] = None,
    controlnet_scales: Optional[Sequence[float]] = None,
):
    starts = meta.block_starts()
    bstarts = meta.batch_starts()
    n = meta.n
    b_total = bstarts[-1]
    cond_index = meta.cond_index
    n_vc = len(cond_index) if cond_index else 0

    def local_fn(params, group_rows, reps, comm):
        # group_rows: per-group dicts of LOCAL row tensors; reps: replicated.
        def cat(key):
            vals = [g[key] for g in group_rows]
            if any(v is None for v in vals):
                return None
            return jnp.concatenate(vals, axis=0)

        x = cat("x")
        temb = cat("temb")
        text_ctx = cat("text")
        clip_ctx = cat("clip")
        face_ctx = cat("face")
        slot_ids = cat("slot")
        valid = cat("valid")
        mask_prev = cat("mask_prev")
        mask_next = cat("mask_next")
        cond_mask_rows = cat("cond_mask")
        pose_rows = cat("pose")
        cn_rows = None
        if group_rows[0].get("cn_down") is not None:
            n_res = len(group_rows[0]["cn_down"])
            cn_rows = [
                jnp.concatenate([g["cn_down"][i] for g in group_rows], axis=0)
                for i in range(n_res)
            ]
        cn_mid_rows = cat("cn_mid")
        femb = reps.get("femb")
        refer_tokens = reps.get("refer_self_attn")  # list of (B_total, S, C)
        down_refer = reps.get("down_refer")
        mid_refer = reps.get("mid_refer")
        sp_grids = reps.get("sp_grids")  # {(h, w): (hw_pad, D)}

        slot_onehot = (
            jax.nn.one_hot(slot_ids, b_total, dtype=jnp.float32)
            * valid[:, None]
        )

        # ---- frame-mixing ops over local rows
        t_frames = meta.groups[0].t

        def temporal_conv_op(p_, x_):
            identity = x_
            v = x_
            for i in range(4):
                sub = p_[f"conv{i + 1}"]
                h_, w_ = v.shape[1], v.shape[2]
                count = t_frames * h_ * w_ * (v.shape[-1] // groups_n)
                v = _fp_group_norm_video(
                    sub["norm"], v, comm, slot_onehot, slot_ids, count,
                    groups_n, 1e-5,
                )
                v = silu(v)
                v = _fp_conv_temporal(
                    sub["conv"], v, comm, meta, mask_prev, mask_next
                )
            wgt = jnp.abs(p_["temporal_weight"]).astype(v.dtype)[0]
            v = v * cond_mask_rows[:, None, None, None].astype(v.dtype)
            return identity + wgt * v

        def temporal_attn_op(p_, x_):
            residual = x_
            h_, w_, c = x_.shape[1], x_.shape[2], x_.shape[3]
            hw = h_ * w_
            px_pad = (-hw) % n
            hw_pad = hw + px_pad
            px_l = hw_pad // n
            t = meta.groups[0].t
            ys = []
            for gi, g in enumerate(meta.groups):
                xg = x_[starts[gi]:starts[gi + 1]].reshape(g.local, hw, c)
                if px_pad:
                    xg = jnp.pad(xg, ((0, 0), (0, px_pad), (0, 0)))
                yg = comm.all_to_all(xg, split_axis=1, concat_axis=0)
                yg = yg[:g.rows].reshape(g.n_batch, t, px_l, c)
                ys.append(yg)
            y = jnp.concatenate(ys, axis=0)  # (B_total, T, px_l, C)
            count = t * hw * (c // groups_n)
            y = _fp_gn_pixel_space(p_["norm"], y, comm, count, groups_n, 1e-6)
            y = y.transpose(0, 2, 1, 3)  # (B_total, px_l, T, C)
            sp = None
            if sp_grids is not None and (h_, w_) in sp_grids:
                grid = sp_grids[(h_, w_)]  # (hw_pad, D)
                sp = lax.dynamic_slice_in_dim(
                    grid, comm.axis_index() * px_l, px_l, axis=0
                )
            y = blk.temporal_transformer_core(
                p_, y, femb, num_frames=t, heads=heads,
                spatial_position_emb=sp, self_attn_mask=self_attn_mask,
                mask_n_near=mask_n_near,
            )
            y = y.transpose(0, 2, 1, 3)  # (B_total, T, px_l, C)
            outs = []
            for gi, g in enumerate(meta.groups):
                yg = y[bstarts[gi]:bstarts[gi + 1]].reshape(g.rows, px_l, c)
                if g.pad:
                    yg = jnp.concatenate(
                        [yg, jnp.zeros((g.pad, px_l, c), yg.dtype)], axis=0
                    )
                yg = comm.all_to_all(yg, split_axis=0, concat_axis=1)
                outs.append(yg[:, :hw].reshape(g.local, h_, w_, c))
            yv = jnp.concatenate(outs, axis=0)
            wgt = jnp.abs(p_["temporal_weight"]).astype(yv.dtype)[0]
            yv = yv * cond_mask_rows[:, None, None, None].astype(yv.dtype)
            return residual + wgt * yv

        attn_counter = [0]

        def fp_reference_attention(p_attn, norm_h, read_tokens):
            """ReferenceOnly self-attn over local rows: plain groups use
            plain attention; use_ref groups concat [own; window vis tokens;
            refnet tokens] — vis assembled by selector-psum."""
            hw, c = norm_h.shape[1], norm_h.shape[2]
            outs = []
            for gi, g in enumerate(meta.groups):
                rows = norm_h[starts[gi]:starts[gi + 1]]
                if not g.use_ref:
                    outs.append(blk.attention(p_attn, rows, heads=heads))
                    continue
                parts = [rows]
                wi = group_rows[gi]["win"]
                if n_vc and g.t > 1:
                    ti = group_rows[gi]["t"]
                    vv = group_rows[gi]["valid"]
                    # slot k = window * n_vc + position-in-cond_index
                    memb = jnp.zeros_like(vv)
                    pos = jnp.zeros_like(wi)
                    for j, ci in enumerate(cond_index):
                        hit = ti == ci
                        memb = jnp.where(hit, 1.0, memb)
                        pos = jnp.where(hit, j, pos)
                    k_slots = g.n_batch * n_vc
                    sel = (
                        jax.nn.one_hot(wi * n_vc + pos, k_slots, dtype=jnp.float32)
                        * (memb * vv)[:, None]
                    )
                    vis = comm.psum(
                        jnp.einsum(
                            "lk,lsc->ksc", sel.astype(rows.dtype), rows
                        )
                    )
                    vis = vis.reshape(g.n_batch, n_vc * hw, c)
                    parts.append(jnp.take(vis, wi, axis=0))
                if read_tokens is not None:
                    # (B_total, S_ref, C) replicated -> per-row by slot
                    parts.append(
                        jnp.take(read_tokens, group_rows[gi]["slot"], axis=0)
                    )
                if len(parts) == 1:
                    outs.append(blk.attention(p_attn, rows, heads=heads))
                    continue
                kv = jnp.concatenate(parts, axis=1)
                outs.append(blk.attention(p_attn, rows, context=kv, heads=heads))
            return jnp.concatenate(outs, axis=0)

        def spatial_op(layer_p, x_):
            idx = attn_counter[0]
            attn_counter[0] += 1
            read = None
            if refer_read and refer_tokens is not None:
                read = refer_tokens[idx]
            return blk.spatial_transformer(
                layer_p, x_, text_ctx,
                heads=heads, groups=groups_n,
                num_frames=1, cond_index=None, do_cfg=False,
                reference_attn=cfg.reference_attn,
                vision_clip_tokens=clip_ctx,
                ip_adapter_scale=ip_adapter_scale,
                face_tokens=face_ctx,
                ip_adapter_face_scale=ip_adapter_face_scale,
                ref_attn_fn=lambda pa, nh: fp_reference_attention(pa, nh, read),
            )

        def refer_fuse_op(p_, x_, emb):
            # emb (B_total, T2, H2, W2, C) replicated -> per-row tokens
            c = x_.shape[-1]
            hw = x_.shape[1] * x_.shape[2]
            tokens = x_.reshape(x_.shape[0], hw, c)
            ref = emb.reshape(b_total, -1, c)
            ref = jnp.take(ref, slot_ids, axis=0).astype(tokens.dtype)
            kv = jnp.concatenate([ref, tokens], axis=1)
            out = blk.attention(p_, tokens, context=kv, heads=heads)
            return out.reshape(x_.shape) + x_

        # ControlNet trunk on local rows: fully frame-local (2-D per-frame
        # network), so it frame-shards with zero collectives. It consumes
        # exactly the spliced+scaled rows the UNet gets (the reference feeds
        # concat([cond, window]) latents, pipeline_controlnet.py:2022-2038 —
        # identical content to the spliced sample here).
        if controlnet_cfgs is not None and reps.get("cn_params") is not None:
            from ..models.controlnet import controlnet_apply

            cn_ts = reps["cn_timestep"]
            cn_imgs = [cat(f"cn_img{i}") for i in range(len(controlnet_cfgs))]
            for cp, cc, ci, cs in zip(
                reps["cn_params"], controlnet_cfgs, cn_imgs, controlnet_scales
            ):
                d_i, m_i = controlnet_apply(
                    cp, cc, x, cn_ts, text_ctx, ci, conditioning_scale=cs
                )
                if cn_rows is None:
                    cn_rows, cn_mid_rows = list(d_i), m_i
                else:
                    cn_rows = [a + b for a, b in zip(cn_rows, d_i)]
                    cn_mid_rows = cn_mid_rows + m_i

        ops = UNetOps(
            spatial=spatial_op,
            temporal_conv=temporal_conv_op,
            temporal_attn=temporal_attn_op,
            refer_fuse=refer_fuse_op,
            adain=lambda x_: x_,
            use_temporal=use_temporal,
        )
        y = unet3d_core(
            params, cfg, x, temb, ops,
            down_block_refer_embs=down_refer,
            mid_block_refer_emb=mid_refer,
            controlnet_down_residuals=cn_rows,
            controlnet_mid_residual=cn_mid_rows,
            pose_guider_emb=pose_rows,
        )
        return tuple(
            y[starts[gi]:starts[gi + 1]] for gi in range(len(meta.groups))
        )

    return local_fn


# ---------------------------------------------------------------------------
# public entry


def _mesh_axis_size(axis: str) -> int:
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.shape and axis in mesh.shape:
        return mesh.shape[axis]
    raise ValueError(
        f"frame-parallel axis {axis!r} needs an ambient mesh "
        "(jax.set_mesh / `with mesh:`) carrying that axis"
    )


def unet3d_apply_fp(
    params: Params,
    cfg: UNet3DConfig,
    sample: jnp.ndarray,
    timestep: jnp.ndarray,
    text_emb: jnp.ndarray,
    *,
    axis: str = "fp",
    stub_devices: Optional[int] = None,
    condition_latents: Optional[jnp.ndarray] = None,
    gen_index: Optional[Sequence[int]] = None,
    cond_index: Optional[Sequence[int]] = None,
    do_cfg: bool = False,
    motion_speed: float = 8.0,
    skip_temporal: bool = False,
    frame_index: Optional[jnp.ndarray] = None,
    down_block_refer_embs: Optional[List[jnp.ndarray]] = None,
    mid_block_refer_emb: Optional[jnp.ndarray] = None,
    refer_self_attn_embs: Optional[List[jnp.ndarray]] = None,
    refer_self_attn_mode: Optional[str] = None,
    vision_clip_emb: Optional[jnp.ndarray] = None,
    ip_adapter_scale: float = 1.0,
    ip_adapter_face_emb: Optional[jnp.ndarray] = None,
    ip_adapter_face_scale: float = 1.0,
    controlnet_down_residuals: Optional[Sequence[jnp.ndarray]] = None,
    controlnet_mid_residual: Optional[jnp.ndarray] = None,
    pose_guider_emb: Optional[jnp.ndarray] = None,
    controlnet: Optional[Dict[str, Any]] = None,
) -> jnp.ndarray:
    """Drop-in ``unet3d_apply`` with frame rows sharded over mesh axis
    ``axis``. Same signature/semantics; requires an ambient mesh.

    ``stub_devices``: run the per-device program directly on ONE device with
    ``StubComm`` (bench mode) — output values are then only one shard's worth
    and numerically fake at the collective points; timing-faithful otherwise.

    ``controlnet``: run ControlNet trunk(s) frame-sharded INSIDE the SPMD
    program (each chip computes residuals for its own rows only) instead of
    receiving replicated residuals. Dict of ``params``/``cfgs``/``scales``
    lists, ``images`` (list of (B*T, 8H, 8W, 3) row tensors, window-gathered)
    and scalar ``timestep``.
    """
    if cfg.adain_fix:
        raise NotImplementedError("frame-parallel: adain_fix not supported")
    if refer_self_attn_mode == "write":
        raise NotImplementedError(
            "frame-parallel: ReferenceNet write mode runs unsharded"
        )

    if condition_latents is not None:
        assert gen_index is not None and cond_index is not None
        sample = splice_with_index(
            condition_latents, cond_index, sample, gen_index, axis=1
        )
    b, num_frames, h0, w0, cin = sample.shape
    use_temporal = not skip_temporal
    n = stub_devices if stub_devices is not None else _mesh_axis_size(axis)

    temb, femb, text_ctx, clip_ctx, face_ctx, cond_mask = prepare_unet_inputs(
        params, cfg, sample, timestep, text_emb,
        motion_speed=motion_speed, use_temporal=use_temporal,
        frame_index=frame_index, cond_index=cond_index,
        vision_clip_emb=vision_clip_emb,
        ip_adapter_face_emb=ip_adapter_face_emb,
    )

    ci = tuple(int(i) for i in cond_index) if cond_index is not None else None
    base_use_ref = (ci is not None and num_frames > 1) or (
        refer_self_attn_mode == "read" and refer_self_attn_embs is not None
    )
    if do_cfg:
        half = b // 2
        metas = (
            GroupMeta(half, num_frames, n, use_ref=False),
            GroupMeta(half, num_frames, n, use_ref=base_use_ref),
        )
        group_b_starts = (0, half)
    else:
        metas = (GroupMeta(b, num_frames, n, use_ref=base_use_ref),)
        group_b_starts = (0,)
    meta = FPMeta(n=n, groups=metas, cond_index=ci)

    rows_all = sample.reshape(b * num_frames, h0, w0, cin)
    cond_mask_full = (
        cond_mask if cond_mask is not None
        else jnp.ones((num_frames,), rows_all.dtype)
    )

    group_rows = []
    slot_off = 0
    for g, bs in zip(metas, group_b_starts):
        ids = _row_ids(g, slot_off)
        gd: Dict[str, Any] = {
            "x": _shard_rows(rows_all, g, bs),
            "temb": _shard_rows(temb, g, bs),
            "text": _shard_rows(text_ctx, g, bs),
            "clip": _shard_rows(clip_ctx, g, bs) if clip_ctx is not None else None,
            "face": _shard_rows(face_ctx, g, bs) if face_ctx is not None else None,
            "cond_mask": jnp.take(cond_mask_full, jnp.asarray(ids["t"]), axis=0),
            "pose": (
                _shard_rows(pose_guider_emb, g, bs)
                if pose_guider_emb is not None else None
            ),
            "cn_down": (
                [_shard_rows(r, g, bs) for r in controlnet_down_residuals]
                if controlnet_down_residuals is not None else None
            ),
            "cn_mid": (
                _shard_rows(controlnet_mid_residual, g, bs)
                if controlnet_mid_residual is not None else None
            ),
        }
        if controlnet is not None:
            for i, img in enumerate(controlnet["images"]):
                gd[f"cn_img{i}"] = _shard_rows(img, g, bs)
        for k, v in ids.items():
            gd[k] = jnp.asarray(v)
        group_rows.append(gd)
        slot_off += g.n_batch
    group_rows = tuple(group_rows)

    reps: Dict[str, Any] = {}
    if femb is not None:
        reps["femb"] = femb  # (B, T, D) batch order matches slot order
    if refer_self_attn_mode == "read" and refer_self_attn_embs is not None:
        reps["refer_self_attn"] = list(refer_self_attn_embs)
    if down_block_refer_embs is not None:
        reps["down_refer"] = list(down_block_refer_embs)
    if mid_block_refer_emb is not None:
        reps["mid_refer"] = mid_block_refer_emb
    if cfg.need_spatial_position_emb:
        reps["sp_grids"] = _spatial_grids(params, cfg, h0, w0, n, sample.dtype)
    cn_cfgs = cn_scales = None
    if controlnet is not None:
        reps["cn_params"] = list(controlnet["params"])
        reps["cn_timestep"] = controlnet["timestep"]
        cn_cfgs = tuple(controlnet["cfgs"])
        cn_scales = tuple(controlnet["scales"])

    local_fn = _build_local_fn(
        cfg, meta,
        heads=cfg.attention_heads,
        groups_n=cfg.norm_num_groups,
        ip_adapter_scale=ip_adapter_scale,
        ip_adapter_face_scale=ip_adapter_face_scale,
        use_temporal=use_temporal,
        refer_read=refer_self_attn_mode == "read",
        self_attn_mask=cfg.temporal_self_attn_mask,
        mask_n_near=cfg.temporal_attn_n_near,
        controlnet_cfgs=cn_cfgs,
        controlnet_scales=cn_scales,
    )

    if stub_devices is not None:
        comm = StubComm(n)
        local_rows = jax.tree.map(
            lambda a: a[: a.shape[0] // n], group_rows
        )
        outs = local_fn(params, local_rows, reps, comm)
        # one shard's rows, tiled out to the full batch shape so the caller's
        # downstream bookkeeping (scatter-add, CFG combine) runs unmodified —
        # values are bench-mode fakes, the UNet timing is the real shard
        parts = []
        for g, out in zip(metas, outs):
            full = jnp.tile(out, (n, 1, 1, 1))[:g.rows]
            parts.append(full.reshape(g.n_batch, num_frames, h0, w0, -1))
        return jnp.concatenate(parts, axis=0)

    def shard_fn(params_, rows_, reps_):
        return local_fn(params_, rows_, reps_, RealComm(axis))

    row_spec = P(axis)
    fn = jax.shard_map(
        shard_fn,
        in_specs=(P(), row_spec, P()),
        out_specs=tuple(row_spec for _ in metas),
        check_vma=False,
    )
    outs = fn(params, group_rows, reps)

    # reassemble (B, T, H, W, C) in original batch order
    parts = []
    for g, out in zip(metas, outs):
        parts.append(
            out[:g.rows].reshape(g.n_batch, num_frames, h0, w0, -1)
        )
    return jnp.concatenate(parts, axis=0)


def fp_collective_model(
    cfg: UNet3DConfig,
    *,
    t: int,
    h0: int,
    w0: int,
    n: int,
    n_windows: int,
    do_cfg: bool = True,
    n_vc: int = 1,
    itemsize: int = 2,
) -> Dict[str, float]:
    """Arithmetic ICI model for ONE denoise step of the frame-parallel
    program: walks the UNet structure and sums per-device collective payload
    bytes + collective launch count, so the multi-chip projection's
    communication term is derived, not assumed.

    Patterns counted (see module docstring):
      * temporal conv: per site, 4 sublayers x 2 directions ppermutes of one
        boundary row per CFG group, plus 4 GroupNorm stats psums
      * temporal attention: per site, 2 tiled all_to_alls moving
        (n-1)/n of the local rows, plus 1 stats psum
      * ReferenceOnly spatial attention: per site, 1 psum all-reduce of the
        (n_windows, n_vc*HW, C) vision-token block (ring: 2(n-1)/n)
      * the row-sharded UNet output's implicit all-gather for the replicated
        scatter-add/scheduler step

    ``h0/w0`` are LATENT-resolution dims.
    """
    reps = 2 if do_cfg else 1
    rows_g = n_windows * t
    local_g = -(-rows_g // n)
    l_tot = reps * local_g
    L = len(cfg.block_out_channels)
    res = []
    h, w = h0, w0
    for _ in range(L):
        res.append((h, w))
        h, w = -(-h // 2), -(-w // 2)

    sites: List[Tuple[int, str]] = []
    for i, btype in enumerate(cfg.down_block_types):
        for _ in range(cfg.layers_per_block):
            if cfg.temporal_conv:
                sites.append((i, "tconv"))
            if "CrossAttn" in btype:
                if cfg.temporal_transformer:
                    sites.append((i, "tattn"))
                sites.append((i, "spatial"))
    if cfg.temporal_conv:
        sites += [(L - 1, "tconv")] * 2
    if cfg.temporal_transformer:
        sites.append((L - 1, "tattn"))
    sites.append((L - 1, "spatial"))
    for j, btype in enumerate(cfg.up_block_types):
        lev = L - 1 - j
        for _ in range(cfg.layers_per_block + 1):
            if cfg.temporal_conv:
                sites.append((lev, "tconv"))
            if "CrossAttn" in btype:
                if cfg.temporal_transformer:
                    sites.append((lev, "tattn"))
                sites.append((lev, "spatial"))
    if cfg.need_transformer_in and cfg.temporal_transformer:
        sites.append((0, "tattn"))

    halo = a2a = vis = gn = 0.0
    # launch counts by collective kind, validated against the real shard_map
    # lowering by tests/test_frame_parallel.py::
    # test_fp_collective_counts_match_lowering (counts of stablehlo ops in
    # jit(...).lower().as_text()): ppermutes run per sublayer x direction
    # (group halos move in one call), GN-stats psums run once per site over
    # stats stacked across CFG groups, but the pixel pivot all_to_alls run
    # inside each group's local computation, hence x reps.
    counts = {"collective_permute": 0, "all_reduce": 0, "all_to_all": 0}
    ring = 2.0 * (n - 1) / n  # all-reduce bytes factor
    ag = (n - 1) / n  # all-gather / all_to_all bytes factor
    for lev, kind in sites:
        hh, ww = res[lev]
        c = cfg.block_out_channels[lev]
        row_b = hh * ww * c * itemsize
        if kind == "tconv":
            halo += 4 * 2 * reps * row_b  # 1 boundary row/group/dir/sublayer
            gn += 4 * ring * (reps * n_windows) * 2 * c * 4  # f32 moments
            counts["collective_permute"] += 4 * 2
            counts["all_reduce"] += 4
        elif kind == "tattn":
            hw_pad = -(-hh * ww // n) * n
            a2a += 2 * ag * l_tot * hw_pad * c * itemsize
            gn += ring * (reps * n_windows) * 2 * c * 4
            counts["all_to_all"] += 2 * reps
            counts["all_reduce"] += 1
        elif kind == "spatial" and n_vc > 0 and t > 1:
            vis += ring * n_windows * n_vc * hh * ww * c * itemsize
            counts["all_reduce"] += 1
    # output rows all-gather for the replicated overlap scatter-add (happens
    # at the sharded output's replicated consumption point, outside the
    # lowered shard_map body — GSPMD inserts it at compile time, so it does
    # not appear in the pre-optimization StableHLO the op-count test checks)
    out_gather = ag * reps * rows_g * h0 * w0 * cfg.out_channels * itemsize
    counts["all_gather"] = 1
    n_coll = sum(counts.values())
    total = halo + a2a + vis + gn + out_gather
    return {
        "bytes_per_step": total,
        "halo_bytes": halo,
        "a2a_bytes": a2a,
        "vis_psum_bytes": vis,
        "gn_psum_bytes": gn,
        "out_gather_bytes": out_gather,
        "collectives_per_step": n_coll,
        "counts_by_kind": counts,
        "local_rows": l_tot,
    }


def _spatial_grids(params, cfg, h0, w0, n, dtype):
    """Per-resolution sincos grids padded to the sharded pixel count."""
    from ..models.embeddings import get_2d_sincos_pos_embed, timestep_embedding

    grids = {}
    h, w = h0, w0
    for _ in range(len(cfg.block_out_channels)):
        grid = get_2d_sincos_pos_embed(
            cfg.block_out_channels[0] * 2, h, w,
            norm_length=cfg.norm_spatial_length,
            max_length=cfg.spatial_max_length,
        )
        sp = jnp.asarray(grid, dtype)
        if "spatial_position_embedding" in params:
            sp = timestep_embedding(params["spatial_position_embedding"], sp)
        pad = (-(h * w)) % n
        if pad:
            sp = jnp.pad(sp, ((0, pad), (0, 0)))
        grids[(h, w)] = sp
        h, w = -(-h // 2), -(-w // 2)
    return grids
