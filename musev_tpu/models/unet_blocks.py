"""SD1.5 UNet blocks, inflated to video, as pure functions.

Behavioral reference (re-designed, not translated):
  * ResnetBlock2D / Downsample2D / Upsample2D: diffusers-as-used-by
    musev/models/unet_3d_blocks.py (op order at :684-712)
  * spatial Transformer2DModel + BasicTransformerBlock with ReferenceOnly
    self-attention: musev/models/transformer_2d.py, attention.py:172-431,
    attention_processor.py:363-546 (NonParamT2ISelfReferenceXFormersAttnProcessor)
    and :162-359 (T2IReferencenetIPAdapterXFormersAttnProcessor)
  * TemporalConvLayer: musev/models/resnet.py:33-135
  * TransformerTemporalModel: musev/models/temporal_transformer.py:57-308

Layout: spatial ops take ``(B*T, H, W, C)`` (frames folded into batch, NHWC);
temporal ops take the same and reshape internally. When classifier-free
guidance is active the leading batch is ``[uncond; cond]`` halves and the
ReferenceOnly self-attention gives the uncond half a plain self-attention
(reference attention.py:319-334) — implemented here as two attention calls on
static halves instead of a recompute-and-overwrite.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.adain import adain_to_condition_frames
from ..ops.attention import sdpa, training_active
from .common import (
    Params,
    conv2d,
    conv_temporal,
    geglu_ff,
    group_norm,
    init_conv,
    init_geglu_ff,
    init_linear,
    init_norm,
    layer_norm,
    linear,
    silu,
)

# ---------------------------------------------------------------------------
# resnet / resampling


def init_resnet_block(
    key, in_c: int, out_c: int, temb_dim: int, dtype=jnp.float32
) -> Params:
    ks = jax.random.split(key, 4)
    p = {
        "norm1": init_norm(in_c),
        "conv1": init_conv(ks[0], in_c, out_c, 3, dtype=dtype),
        "time_emb_proj": init_linear(ks[1], temb_dim, out_c, dtype=dtype),
        "norm2": init_norm(out_c),
        "conv2": init_conv(ks[2], out_c, out_c, 3, dtype=dtype),
    }
    if in_c != out_c:
        p["conv_shortcut"] = init_conv(ks[3], in_c, out_c, 1, dtype=dtype)
    return p


def resnet_block(
    p: Params,
    x: jnp.ndarray,
    temb: jnp.ndarray,
    *,
    groups: int = 32,
    eps: float = 1e-5,
    skip_time_act: bool = False,
) -> jnp.ndarray:
    """x (N, H, W, C), temb (N, temb_dim)."""
    h = group_norm(p["norm1"], x, num_groups=groups, eps=eps)
    h = silu(h)
    h = conv2d(p["conv1"], h, padding=1)
    t = temb if skip_time_act else silu(temb)
    h = h + linear(p["time_emb_proj"], t)[:, None, None, :]
    h = group_norm(p["norm2"], h, num_groups=groups, eps=eps)
    h = silu(h)
    h = conv2d(p["conv2"], h, padding=1)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def init_downsample(key, c: int, dtype=jnp.float32) -> Params:
    return {"conv": init_conv(key, c, c, 3, dtype=dtype)}


def downsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return conv2d(p["conv"], x, stride=2, padding=1)


def init_upsample(key, c: int, dtype=jnp.float32) -> Params:
    return {"conv": init_conv(key, c, c, 3, dtype=dtype)}


def upsample(p: Params, x: jnp.ndarray, out_hw: Optional[Tuple[int, int]] = None):
    n, h, w, c = x.shape
    if out_hw is None:
        out_hw = (h * 2, w * 2)
    if out_hw == (h * 2, w * 2):
        # exact 2x nearest as broadcast+reshape: avoids the gather that
        # jax.image.resize can lower to on TPU (pure layout op, HBM-speed)
        y = jnp.broadcast_to(
            x[:, :, None, :, None, :], (n, h, 2, w, 2, c)
        ).reshape(n, h * 2, w * 2, c)
    else:
        y = jax.image.resize(x, (n, *out_hw, c), method="nearest")
    return conv2d(p["conv"], y, padding=1)


# ---------------------------------------------------------------------------
# attention cores


def _heads_split(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    n, s, c = x.shape
    return x.reshape(n, s, heads, c // heads)


def _heads_merge(x: jnp.ndarray) -> jnp.ndarray:
    n, s, h, d = x.shape
    return x.reshape(n, s, h * d)


def init_attention(
    key,
    query_dim: int,
    kv_dim: Optional[int] = None,
    out_bias: bool = True,
    dtype=jnp.float32,
    zero_out: bool = False,
    ip_kv_dim: Optional[int] = None,
    ip_face_kv_dim: Optional[int] = None,
) -> Params:
    kv_dim = kv_dim or query_dim
    ks = jax.random.split(key, 6)
    p = {
        "to_q": init_linear(ks[0], query_dim, query_dim, use_bias=False, dtype=dtype),
        "to_k": init_linear(ks[1], kv_dim, query_dim, use_bias=False, dtype=dtype),
        "to_v": init_linear(ks[2], kv_dim, query_dim, use_bias=False, dtype=dtype),
        "to_out": init_linear(
            ks[3], query_dim, query_dim, use_bias=out_bias, dtype=dtype,
            zero_init=zero_out,
        ),
    }
    if ip_kv_dim is not None:
        k_a, k_b = jax.random.split(ks[4])
        p["to_k_ip"] = init_linear(k_a, ip_kv_dim, query_dim, use_bias=False, dtype=dtype)
        p["to_v_ip"] = init_linear(k_b, ip_kv_dim, query_dim, use_bias=False, dtype=dtype)
    if ip_face_kv_dim is not None:
        k_a, k_b = jax.random.split(ks[5])
        p["to_k_ip_face"] = init_linear(
            k_a, ip_face_kv_dim, query_dim, use_bias=False, dtype=dtype
        )
        p["to_v_ip_face"] = init_linear(
            k_b, ip_face_kv_dim, query_dim, use_bias=False, dtype=dtype
        )
    return p


def attention(
    p: Params,
    x: jnp.ndarray,
    context: Optional[jnp.ndarray] = None,
    heads: int = 8,
    ip_context: Optional[jnp.ndarray] = None,
    ip_scale: float = 1.0,
    ip_face_context: Optional[jnp.ndarray] = None,
    ip_face_scale: float = 1.0,
    bias: Optional[jnp.ndarray] = None,
    kv_len: Optional[int] = None,
) -> jnp.ndarray:
    """Multi-head attention (N, S, C) with optional IP-Adapter dual-KV branch.

    The IP branch reproduces T2IReferencenetIPAdapterXFormersAttnProcessor
    (attention_processor.py:267-339): extra attention over projected image
    tokens, scaled and added to the text-attention output.
    ``bias``: additive attention bias broadcastable to (N, H, Sq, Sk) —
    used for the sparse-causal temporal mask.
    ``kv_len``: valid leading self-attention positions when S is padded to a
    sublane multiple (the temporal path pads T so XLA keeps bitcast
    reshapes); padded keys are masked out, padded-query outputs are garbage.
    """
    from ..parallel.context import mesh_active

    ctx = x if context is None else context
    # fused projections: q/k/v kernels are bias-free, so self-attention is
    # ONE (S, C) x (C, 3C) matmul and cross-attention fuses k|v — bigger MXU
    # tiles, fewer HBM round trips. The weight concat is scan-invariant and
    # hoisted by XLA. Skipped under an active mesh: it would re-layout the
    # tp-sharded kernels.
    fuse_ok = (
        not mesh_active()
        and "bias" not in p["to_q"]
        and p["to_k"]["kernel"].shape == p["to_v"]["kernel"].shape
    )
    if fuse_ok and context is None:
        wqkv = jnp.concatenate(
            [p["to_q"]["kernel"], p["to_k"]["kernel"], p["to_v"]["kernel"]],
            axis=1,
        ).astype(x.dtype)
        qp, kp, vp = jnp.split(x @ wqkv, 3, axis=-1)
    elif fuse_ok and p["to_k"]["kernel"].shape[0] == ctx.shape[-1]:
        qp = linear(p["to_q"], x)
        wkv = jnp.concatenate(
            [p["to_k"]["kernel"], p["to_v"]["kernel"]], axis=1
        ).astype(ctx.dtype)
        kp, vp = jnp.split(ctx @ wkv, 2, axis=-1)
    else:
        qp = linear(p["to_q"], x)
        kp = linear(p["to_k"], ctx)
        vp = linear(p["to_v"], ctx)

    if (
        context is None
        and ip_context is None
        and ip_face_context is None
        and bias is None
        and x.shape[1] <= 64
        and qp.shape[-1] % heads == 0
        # C < one lane tile: Mosaic pads every (N,T,C) buffer to C=128,
        # inflating VMEM 128/C x (tiny configs scoped-vmem OOM at C=16) and
        # wasting the lanes the packing exists to fill — XLA path wins there
        and qp.shape[-1] >= 128
        and jax.default_backend() not in ("cpu", "gpu")
        and not mesh_active()  # pallas custom calls can't be SPMD-partitioned
        and not training_active()  # no VJP on the pallas kernel
    ):
        # temporal rows (short T): packed-lane pallas kernel — q/k/v stay
        # (N, T, C), all heads computed in-kernel; 5.8-9.8x faster on v5e
        # than the head-split XLA path (no (N,H,T,D) transpose copies)
        from musev_tpu.ops.pallas.short_attention import short_attention_packed

        return linear(
            p["to_out"], short_attention_packed(qp, kp, vp, heads, kv_len=kv_len)
        )
    q = _heads_split(qp, heads)
    k = _heads_split(kp, heads)
    v = _heads_split(vp, heads)
    if kv_len is not None and kv_len < k.shape[1]:
        pad_bias = jnp.where(
            jnp.arange(k.shape[1]) < kv_len, 0.0, -jnp.inf
        ).astype(jnp.float32)[None, None, None, :]
        bias = pad_bias if bias is None else bias + pad_bias
    out = sdpa(q, k, v, bias=bias)
    if ip_context is not None and "to_k_ip" in p and ip_scale > 0:
        ip_k = _heads_split(linear(p["to_k_ip"], ip_context), heads)
        ip_v = _heads_split(linear(p["to_v_ip"], ip_context), heads)
        out = out + ip_scale * sdpa(q, ip_k, ip_v)
    if ip_face_context is not None and "to_k_ip_face" in p and ip_face_scale > 0:
        f_k = _heads_split(linear(p["to_k_ip_face"], ip_face_context), heads)
        f_v = _heads_split(linear(p["to_v_ip_face"], ip_face_context), heads)
        out = out + ip_face_scale * sdpa(q, f_k, f_v)
    return linear(p["to_out"], _heads_merge(out))


def reference_self_attention(
    p: Params,
    norm_h: jnp.ndarray,
    *,
    heads: int,
    num_frames: int,
    cond_index: Optional[Sequence[int]],
    do_cfg: bool,
    refer_tokens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """ReferenceOnly self-attention over (B*T, HW, C).

    Cond rows attend to [own frame tokens; all vision-condition frame tokens;
    optional ReferenceNet tokens] (attention_processor.py:430-494). Under CFG
    the uncond half gets plain self-attention (attention.py:319-334) — here a
    separate attention call on the static half instead of recompute+overwrite.

    refer_tokens: (B, S_ref, C) ReferenceNet tokens, broadcast to every frame.
    """
    bt, hw, c = norm_h.shape
    b = bt // num_frames
    use_ref = (cond_index is not None and num_frames > 1) or refer_tokens is not None

    def plain(rows):
        return attention(p, rows, heads=heads)

    if not use_ref:
        return plain(norm_h)

    def with_reference(rows_btc, refer_rows):
        # rows_btc: (b', T, HW, C)
        bb = rows_btc.shape[0]
        parts = [rows_btc]
        if cond_index is not None and num_frames > 1:
            vis = jnp.take(rows_btc, jnp.asarray(cond_index, jnp.int32), axis=1)
            vis = vis.reshape(bb, 1, -1, c)
            vis = jnp.broadcast_to(vis, (bb, num_frames, vis.shape[2], c))
            parts.append(vis)
        if refer_rows is not None:
            ref = refer_rows[:, None]  # (b', 1, S_ref, C)
            ref = jnp.broadcast_to(
                ref, (bb, num_frames, refer_rows.shape[1], c)
            )
            parts.append(ref)
        kv = jnp.concatenate(parts, axis=2)
        q_rows = rows_btc.reshape(bb * num_frames, hw, c)
        kv_rows = kv.reshape(bb * num_frames, -1, c)
        return attention(p, q_rows, context=kv_rows, heads=heads)

    x_btc = norm_h.reshape(b, num_frames, hw, c)
    if do_cfg:
        half = b // 2
        out_u = plain(norm_h.reshape(b, num_frames, hw, c)[:half].reshape(-1, hw, c))
        ref_c = refer_tokens[half:] if refer_tokens is not None else None
        out_c = with_reference(x_btc[half:], ref_c)
        out = jnp.concatenate(
            [out_u.reshape(half, num_frames, hw, c), out_c.reshape(half, num_frames, hw, c)],
            axis=0,
        )
        return out.reshape(bt, hw, c)
    return with_reference(x_btc, refer_tokens).reshape(bt, hw, c)


# ---------------------------------------------------------------------------
# spatial transformer (Transformer2DModel with MuseV BasicTransformerBlock)


def init_transformer_block(
    key,
    dim: int,
    cross_dim: int,
    dtype=jnp.float32,
    ip_adapter: bool = False,
    ip_dim: int = 768,
    ip_face: bool = False,
    ip_face_dim: int = 768,
) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "norm1": init_norm(dim),
        "attn1": init_attention(ks[0], dim, dtype=dtype),
        "norm2": init_norm(dim),
        "attn2": init_attention(
            ks[1], dim, cross_dim, dtype=dtype,
            ip_kv_dim=ip_dim if ip_adapter else None,
            ip_face_kv_dim=ip_face_dim if ip_face else None,
        ),
        "norm3": init_norm(dim),
        "ff": init_geglu_ff(ks[2], dim, dtype=dtype),
    }


def transformer_block_spatial(
    p: Params,
    x: jnp.ndarray,
    text_ctx: jnp.ndarray,
    *,
    heads: int,
    num_frames: int,
    cond_index: Optional[Sequence[int]],
    do_cfg: bool,
    reference_attn: bool,
    refer_tokens: Optional[jnp.ndarray] = None,
    vision_clip_tokens: Optional[jnp.ndarray] = None,
    ip_adapter_scale: float = 1.0,
    face_tokens: Optional[jnp.ndarray] = None,
    ip_adapter_face_scale: float = 1.0,
    self_attn_out: Optional[List] = None,
    self_attn_idx: Optional[int] = None,
    ref_attn_fn=None,
) -> jnp.ndarray:
    """One BasicTransformerBlock over token rows (B*T, HW, C).

    ``self_attn_out``: when given, the normalized hidden states are appended
    (ReferenceNet write mode, attention.py:242-259).
    ``ref_attn_fn``: override for the ReferenceOnly self-attention —
    ``(attn1_params, norm_h) -> out``. Used by the frame-parallel executor,
    whose vision-condition KV tokens come from a cross-device gather instead
    of an in-batch index.
    """
    norm_h = layer_norm(p["norm1"], x)
    if self_attn_out is not None and self_attn_idx is not None:
        self_attn_out[self_attn_idx] = norm_h
    if reference_attn and ref_attn_fn is not None:
        attn_out = ref_attn_fn(p["attn1"], norm_h)
    elif reference_attn:
        attn_out = reference_self_attention(
            p["attn1"],
            norm_h,
            heads=heads,
            num_frames=num_frames,
            cond_index=cond_index,
            do_cfg=do_cfg,
            refer_tokens=refer_tokens,
        )
    else:
        attn_out = attention(p["attn1"], norm_h, heads=heads)
    x = x + attn_out
    norm_h = layer_norm(p["norm2"], x)
    x = x + attention(
        p["attn2"],
        norm_h,
        context=text_ctx,
        heads=heads,
        ip_context=vision_clip_tokens,
        ip_scale=ip_adapter_scale,
        ip_face_context=face_tokens,
        ip_face_scale=ip_adapter_face_scale,
    )
    x = x + geglu_ff(p["ff"], layer_norm(p["norm3"], x))
    return x


def init_spatial_transformer(
    key,
    channels: int,
    cross_dim: int,
    dtype=jnp.float32,
    ip_adapter: bool = False,
    ip_dim: int = 768,
    ip_face: bool = False,
    ip_face_dim: int = 768,
) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "norm": init_norm(channels),
        "proj_in": init_conv(ks[0], channels, channels, 1, dtype=dtype),
        "block": init_transformer_block(
            ks[1], channels, cross_dim, dtype=dtype, ip_adapter=ip_adapter,
            ip_dim=ip_dim, ip_face=ip_face, ip_face_dim=ip_face_dim,
        ),
        "proj_out": init_conv(ks[2], channels, channels, 1, dtype=dtype),
    }


def spatial_transformer(
    p: Params,
    x: jnp.ndarray,
    text_ctx: jnp.ndarray,
    *,
    heads: int,
    groups: int = 32,
    **block_kwargs,
) -> jnp.ndarray:
    """Transformer2DModel: GN -> 1x1 conv -> block -> 1x1 conv + residual.

    x: (B*T, H, W, C); text_ctx: (B*T, S, cross_dim).
    """
    n, h, w, c = x.shape
    residual = x
    y = group_norm(p["norm"], x, num_groups=groups, eps=1e-6)
    y = conv2d(p["proj_in"], y, padding=0)
    y = y.reshape(n, h * w, c)
    y = transformer_block_spatial(p["block"], y, text_ctx, heads=heads, **block_kwargs)
    y = y.reshape(n, h, w, c)
    y = conv2d(p["proj_out"], y, padding=0)
    return y + residual


# ---------------------------------------------------------------------------
# temporal conv layer (reference resnet.py:33-135)


def init_temporal_conv(key, dim: int, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    p = {}
    for i in range(4):
        conv = init_conv(
            ks[i], dim, dim, (3, 1), dtype=dtype, zero_init=(i == 3)
        )
        p[f"conv{i + 1}"] = {"norm": init_norm(dim), "conv": conv}
    p["temporal_weight"] = jnp.asarray([1e-5], dtype=jnp.float32)
    return p


def temporal_conv_layer(
    p: Params,
    x: jnp.ndarray,
    *,
    num_frames: int,
    cond_mask: Optional[jnp.ndarray] = None,
    groups: int = 32,
) -> jnp.ndarray:
    """x (B*T, H, W, C) -> same. 4x (GN -> SiLU -> time-conv), residual scaled
    by |temporal_weight|, optionally masked to zero on condition frames
    (keep_content_condition, resnet.py:114-132).
    """
    bt, h, w, c = x.shape
    b = bt // num_frames
    v = x.reshape(b, num_frames, h, w, c)
    identity = v
    for i in range(4):
        sub = p[f"conv{i + 1}"]
        v = group_norm(sub["norm"], v, num_groups=groups)
        v = silu(v)
        v = conv_temporal(sub["conv"], v)
    wgt = jnp.abs(p["temporal_weight"]).astype(v.dtype)[0]
    if cond_mask is not None:
        v = v * cond_mask[None, :, None, None, None].astype(v.dtype)
    v = identity + wgt * v
    return v.reshape(bt, h, w, c)


# ---------------------------------------------------------------------------
# temporal transformer (reference temporal_transformer.py:57-308)


def init_temporal_transformer(
    key,
    channels: int,
    heads: int,
    femb_dim: int,
    dtype=jnp.float32,
    need_spatial_position_emb: bool = False,
) -> Params:
    ks = jax.random.split(key, 6)
    inner = channels  # heads * (channels // heads)
    p_extra = {}
    if need_spatial_position_emb:
        p_extra["spatial_emb_proj"] = init_linear(ks[5], femb_dim, inner, dtype=dtype)
    return {
        **p_extra,
        "norm": init_norm(channels),
        "proj_in": init_linear(ks[0], channels, inner, dtype=dtype),
        "femb_proj": init_linear(ks[1], femb_dim, inner, dtype=dtype),
        "block": {
            "norm1": init_norm(inner),
            "attn1": init_attention(ks[2], inner, dtype=dtype),
            "norm2": init_norm(inner),
            # double_self_attention=True: attn2 is a second self-attention
            "attn2": init_attention(ks[3], inner, dtype=dtype),
            "norm3": init_norm(inner),
            "ff": init_geglu_ff(ks[4], inner, dtype=dtype),
        },
        "proj_out": init_linear(ks[0], inner, channels, dtype=dtype, zero_init=True),
        "temporal_weight": jnp.asarray([1e-5], dtype=jnp.float32),
    }


def temporal_transformer_core(
    p: Params,
    y: jnp.ndarray,
    femb: jnp.ndarray,
    *,
    num_frames: int,
    heads: int,
    femb_nonlinear: bool = True,
    spatial_position_emb: Optional[jnp.ndarray] = None,
    self_attn_mask: Optional[str] = None,
    mask_n_near: int = 1,
) -> jnp.ndarray:
    """Pixel-major temporal transformer: proj_in -> attn1/attn2/ff -> proj_out.

    y: (B, S, T, C) pixel-major rows (already group-normalized); femb
    (B, T, femb_dim); spatial_position_emb, when given, covers exactly the
    ``S`` pixels of ``y`` (the frame-parallel executor passes each device's
    pixel slice). Returns (B, S, T, C); the caller applies temporal_weight /
    cond-mask / residual and any layout pivots.
    """
    b, s, t, c = y.shape
    # pad T to a sublane multiple: with T=25 rows every feeding matmul's
    # (N*T, C) <-> (N, T, C) reshape re-tiles (2nd-minor dim not
    # 8-divisible), costing ~1 GB/step of XLA copies at L0; with T=32 the
    # reshapes are bitcasts. Padded keys are masked in attention; padded
    # rows are sliced away before the residual.
    t_pad = (-num_frames) % 8
    tp = num_frames + t_pad
    if t_pad:
        y = jnp.pad(y, ((0, 0), (0, 0), (0, t_pad), (0, 0)))
    f = silu(femb) if femb_nonlinear else femb
    f = linear(p["femb_proj"], f)  # (b, T, inner)
    if t_pad:
        f = jnp.pad(f, ((0, 0), (0, t_pad), (0, 0)))
    y = linear(p["proj_in"], y)
    y = y + f[:, None, :, :].astype(y.dtype)
    if spatial_position_emb is not None and "spatial_emb_proj" in p:
        # (S, femb_dim) sincos grid projected and added per pixel row
        sp = linear(p["spatial_emb_proj"], spatial_position_emb.astype(y.dtype))
        y = y + sp[None, :, None, :]
    rows = y.reshape(b * s, tp, -1)
    attn_bias = None
    if self_attn_mask is not None:
        from ..ops.attention_mask import sparse_causal_mask

        mask = sparse_causal_mask(
            num_frames, n_near=mask_n_near,
            attend_first=(self_attn_mask == "sparse_causal"),
        )
        mask = np.asarray(mask)
        if t_pad:
            # padded kv columns -inf; padded q rows attend everything valid
            # (their outputs are discarded)
            full = np.full((tp, tp), -np.inf, mask.dtype)
            full[:num_frames, :num_frames] = mask
            full[num_frames:, :num_frames] = 0.0
            mask = full
        attn_bias = jnp.asarray(mask)[None, None]  # (1, 1, T, T)
    kvl = num_frames if (t_pad and attn_bias is None) else None
    blk = p["block"]
    rows = rows + attention(
        blk["attn1"], layer_norm(blk["norm1"], rows), heads=heads,
        bias=attn_bias, kv_len=kvl,
    )
    rows = rows + attention(
        blk["attn2"], layer_norm(blk["norm2"], rows), heads=heads,
        bias=attn_bias, kv_len=kvl,
    )
    rows = rows + geglu_ff(blk["ff"], layer_norm(blk["norm3"], rows))
    y = rows.reshape(b, s, tp, -1)
    y = linear(p["proj_out"], y)
    if t_pad:
        y = y[:, :, :num_frames]
    return y


def temporal_transformer(
    p: Params,
    x: jnp.ndarray,
    femb: jnp.ndarray,
    *,
    num_frames: int,
    heads: int,
    cond_mask: Optional[jnp.ndarray] = None,
    groups: int = 32,
    femb_nonlinear: bool = True,
    spatial_position_emb: Optional[jnp.ndarray] = None,
    self_attn_mask: Optional[str] = None,
    mask_n_near: int = 1,
) -> jnp.ndarray:
    """Attention over time per pixel: rows are (B*H*W, T, C).

    x (B*T, H, W, C); femb (B, T, femb_dim). GN runs per batch element over
    the (T, H, W, C) video (matching the reference's 5-D GroupNorm at
    temporal_transformer.py:117-119, :239).

    ``self_attn_mask``: "sparse_causal" (band + first frame) or
    "sparse_causal_near" (band only) restricts which frames each frame
    attends to (reference attention_util.py:29-74 — declared upstream at
    temporal_transformer.py:101 but never applied; wired here).
    """
    bt, h, w, c = x.shape
    b = bt // num_frames
    v = x.reshape(b, num_frames, h, w, c)
    residual = v
    y = group_norm(p["norm"], v, num_groups=groups, eps=1e-6)
    # (b, T, H, W, C) -> (b, H*W, T, C)
    y = y.transpose(0, 2, 3, 1, 4).reshape(b, h * w, num_frames, c)
    y = temporal_transformer_core(
        p, y, femb, num_frames=num_frames, heads=heads,
        femb_nonlinear=femb_nonlinear,
        spatial_position_emb=spatial_position_emb,
        self_attn_mask=self_attn_mask, mask_n_near=mask_n_near,
    )
    y = y.reshape(b, h, w, num_frames, c).transpose(0, 3, 1, 2, 4)
    wgt = jnp.abs(p["temporal_weight"]).astype(y.dtype)[0]
    if cond_mask is not None:
        y = y * cond_mask[None, :, None, None, None].astype(y.dtype)
    out = residual + wgt * y
    return out.reshape(bt, h, w, c)


# ---------------------------------------------------------------------------
# ReferenceNet block-emb fusion (reference ReferEmbFuseAttention,
# attention_processor.py:557-750)


def init_refer_fuse_attention(key, dim: int, dtype=jnp.float32) -> Params:
    return init_attention(key, dim, dtype=dtype, zero_out=True)


def refer_emb_fuse(
    p: Params,
    x: jnp.ndarray,
    refer_emb: jnp.ndarray,
    *,
    num_frames: int,
    heads: int,
) -> jnp.ndarray:
    """Fuse ReferenceNet features into latents by attention.

    x: (B*T, H, W, C); refer_emb: (B, T2, H2, W2, C). KV = [refer tokens;
    own tokens]; to_out is zero-init so fusion starts as identity.
    """
    bt, h, w, c = x.shape
    b = bt // num_frames
    residual = x
    tokens = x.reshape(bt, h * w, c)
    ref = refer_emb.reshape(b, -1, c)
    ref = jnp.repeat(ref, num_frames, axis=0)  # (B*T, S_ref, C)
    kv = jnp.concatenate([ref.astype(tokens.dtype), tokens], axis=1)
    out = attention(p, tokens, context=kv, heads=heads)
    return out.reshape(bt, h, w, c) + residual
