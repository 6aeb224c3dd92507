"""The MuseV 3D UNet as one pure function over a params pytree.

Behavioral reference: musev/models/unet_3d_condition.py (structure :212-610,
forward :773-1280) and unet_3d_blocks.py. Re-designed for TPU:

  * channels-last NHWC everywhere, frames folded into the batch for spatial
    ops — XLA tiles convs/matmuls straight onto the MXU
  * all frame-index bookkeeping (vision-condition splicing, masks) is static:
    the same jitted function serves every denoise step
  * "modes" that the reference toggles by mutation (skip_temporal_layers,
    write/read refer embs) are static python args → separate XLA programs
  * CFG runs as [uncond; cond] batch halves; the ReferenceOnly uncond-fix is
    a static split, not a recompute

Note on AdaIN: the reference enables ``need_adain_temporal_cond`` for every
preset, but its ``batch_adain_conditioned_tensor`` discards the result for
4-D inputs (data_util.py:600-601 rearranges ``tensor`` instead of ``src``),
so block-level AdaIN is a no-op in the released models. ``adain_fix=False``
(default) reproduces that (and skips the compute); set True for real AdaIN.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.adain import adain_to_condition_frames
from ..ops.index_ops import frame_mask, splice_with_index
from . import unet_blocks as blk
from .common import Params, conv2d, group_norm, init_conv, init_norm, silu
from .embeddings import (
    init_timestep_embedding,
    sinusoidal_embedding,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "DownBlock3D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock3D",
        "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D",
    )
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_heads: int = 8
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    temporal_conv: bool = True
    temporal_transformer: bool = True
    need_transformer_in: bool = True
    reference_attn: bool = True  # NonParam ReferenceOnly self-attn (musev presets)
    need_adain_temporal_cond: bool = True
    adain_fix: bool = False  # see module docstring
    keep_vision_condition: bool = False
    use_anivv1_cfg: bool = False
    resnet_skip_time_act: bool = False
    need_refer_emb: bool = False  # ReferenceNet block-emb fusion
    ip_adapter_cross_attn: bool = False
    ip_adapter_dim: int = 768  # clip image emb dim after projection
    need_ip_adapter_face: bool = False  # IPAdapterFaceID branch (t2i attn2)
    ip_adapter_face_dim: int = 768
    keep_content_condition: bool = False  # temporal-layer condition-frame mask
    need_spatial_position_emb: bool = False  # hw sincos emb in temporal rows
    # sparse-causal mask on temporal self-attention: None | "sparse_causal"
    # (band of n_near previous frames + the first frame) | "sparse_causal_near"
    # (band only). The reference declares this option (temporal_transformer.py
    # :101, attention_util.py:29-74) but never applies it; here it is wired.
    temporal_self_attn_mask: Optional[str] = None
    temporal_attn_n_near: int = 1
    norm_spatial_length: bool = False
    spatial_max_length: int = 2048

    @property
    def temb_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @property
    def femb_dim(self) -> int:
        return self.block_out_channels[0] * 4


def musev_config(**overrides) -> UNet3DConfig:
    """The ``musev`` preset (unet_loader.py:232-242)."""
    return UNet3DConfig(**overrides)


def musev_referencenet_config(**overrides) -> UNet3DConfig:
    """The ``musev_referencenet[_pose]`` preset (unet_loader.py:243-268)."""
    kw: Dict[str, Any] = dict(
        need_transformer_in=False,
        use_anivv1_cfg=True,
        resnet_skip_time_act=True,
        keep_vision_condition=True,
        need_refer_emb=True,
        ip_adapter_cross_attn=True,
    )
    kw.update(overrides)
    return UNet3DConfig(**kw)


# ---------------------------------------------------------------------------
# init


def _is_cross(name: str) -> bool:
    return "CrossAttn" in name


def init_unet3d(key, cfg: UNet3DConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 256))
    nxt = lambda: next(ks)  # noqa: E731
    ch0 = cfg.block_out_channels[0]
    p: Params = {
        "conv_in": init_conv(nxt(), cfg.in_channels, ch0, 3, dtype=dtype),
        "time_embedding": init_timestep_embedding(nxt(), ch0, cfg.temb_dim, dtype=dtype),
    }
    if cfg.temporal_transformer:
        p["frame_embedding"] = init_timestep_embedding(
            nxt(), ch0, cfg.femb_dim, dtype=dtype
        )
    if cfg.need_transformer_in and cfg.temporal_transformer:
        p["transformer_in"] = blk.init_temporal_transformer(
            nxt(), ch0, cfg.attention_heads, cfg.femb_dim, dtype=dtype,
            need_spatial_position_emb=cfg.need_spatial_position_emb,
        )
    if cfg.need_spatial_position_emb:
        p["spatial_position_embedding"] = init_timestep_embedding(
            nxt(), ch0 * 2, cfg.femb_dim, dtype=dtype
        )
    if cfg.need_refer_emb:
        p["first_refer_emb_attns"] = blk.init_refer_fuse_attention(nxt(), ch0, dtype)
        p["mid_block_refer_emb_attns"] = blk.init_refer_fuse_attention(
            nxt(), cfg.block_out_channels[-1], dtype
        )

    def temporal_pair(c, with_attn=True):
        # plain DownBlock3D/UpBlock3D carry temp_convs but no temporal
        # transformers (unet_3d_blocks.py:775-984, :1254+)
        sub = {}
        if cfg.temporal_conv:
            sub["temp_conv"] = blk.init_temporal_conv(nxt(), c, dtype=dtype)
        if cfg.temporal_transformer and with_attn:
            sub["temp_attn"] = blk.init_temporal_transformer(
                nxt(), c, cfg.attention_heads, cfg.femb_dim, dtype=dtype,
                need_spatial_position_emb=cfg.need_spatial_position_emb,
            )
        return sub

    skip_channels = [ch0]
    down_blocks = []
    out_c = ch0
    for i, btype in enumerate(cfg.down_block_types):
        in_c = out_c
        out_c = cfg.block_out_channels[i]
        is_final = i == len(cfg.block_out_channels) - 1
        layers = []
        for j in range(cfg.layers_per_block):
            layer = {
                "resnet": blk.init_resnet_block(
                    nxt(), in_c if j == 0 else out_c, out_c, cfg.temb_dim, dtype
                ),
                **temporal_pair(out_c, with_attn=_is_cross(btype)),
            }
            if _is_cross(btype):
                layer["attn"] = blk.init_spatial_transformer(
                    nxt(), out_c, cfg.cross_attention_dim, dtype,
                    ip_adapter=cfg.ip_adapter_cross_attn,
                    ip_dim=cfg.ip_adapter_dim,
                    ip_face=cfg.need_ip_adapter_face,
                    ip_face_dim=cfg.ip_adapter_face_dim,
                )
            layers.append(layer)
            skip_channels.append(out_c)
        block = {"layers": layers}
        if not is_final:
            block["downsample"] = blk.init_downsample(nxt(), out_c, dtype)
            skip_channels.append(out_c)
        if cfg.need_refer_emb:
            n_fuse = len(layers) + (0 if is_final else 1)
            block["refer_emb_attns"] = [
                blk.init_refer_fuse_attention(nxt(), out_c, dtype)
                for _ in range(n_fuse)
            ]
        down_blocks.append(block)
    p["down_blocks"] = down_blocks

    # mid block: resnets [0, 1], temp_convs [0, 1], one attn, one temp_attn
    # (reference UNetMidBlock3DCrossAttn, unet_3d_blocks.py:286-361; forward
    # order resnet0 -> temp_conv0 -> attn -> temp_attn -> resnet1 -> temp_conv1)
    mid_c = cfg.block_out_channels[-1]
    mid: Params = {
        "resnet_0": blk.init_resnet_block(nxt(), mid_c, mid_c, cfg.temb_dim, dtype),
        "attn": blk.init_spatial_transformer(
            nxt(), mid_c, cfg.cross_attention_dim, dtype,
            ip_adapter=cfg.ip_adapter_cross_attn,
            ip_dim=cfg.ip_adapter_dim,
            ip_face=cfg.need_ip_adapter_face,
            ip_face_dim=cfg.ip_adapter_face_dim,
        ),
        "resnet_1": blk.init_resnet_block(nxt(), mid_c, mid_c, cfg.temb_dim, dtype),
    }
    if cfg.temporal_conv:
        mid["temp_conv_0"] = blk.init_temporal_conv(nxt(), mid_c, dtype=dtype)
        mid["temp_conv_1"] = blk.init_temporal_conv(nxt(), mid_c, dtype=dtype)
    if cfg.temporal_transformer:
        mid["temp_attn"] = blk.init_temporal_transformer(
            nxt(), mid_c, cfg.attention_heads, cfg.femb_dim, dtype=dtype,
            need_spatial_position_emb=cfg.need_spatial_position_emb,
        )
    p["mid_block"] = mid

    up_blocks = []
    rev = list(reversed(cfg.block_out_channels))
    prev_out = rev[0]
    for i, btype in enumerate(cfg.up_block_types):
        out_c = rev[i]
        is_final = i == len(cfg.up_block_types) - 1
        layers = []
        for j in range(cfg.layers_per_block + 1):
            skip_c = skip_channels.pop()
            res_in = (prev_out if j == 0 else out_c) + skip_c
            layer = {
                "resnet": blk.init_resnet_block(nxt(), res_in, out_c, cfg.temb_dim, dtype),
                **temporal_pair(out_c, with_attn=_is_cross(btype)),
            }
            if _is_cross(btype):
                layer["attn"] = blk.init_spatial_transformer(
                    nxt(), out_c, cfg.cross_attention_dim, dtype,
                    ip_adapter=cfg.ip_adapter_cross_attn,
                    ip_dim=cfg.ip_adapter_dim,
                    ip_face=cfg.need_ip_adapter_face,
                    ip_face_dim=cfg.ip_adapter_face_dim,
                )
            layers.append(layer)
        block = {"layers": layers}
        if not is_final:
            block["upsample"] = blk.init_upsample(nxt(), out_c, dtype)
        up_blocks.append(block)
        prev_out = out_c
    p["up_blocks"] = up_blocks

    p["conv_norm_out"] = init_norm(ch0)
    p["conv_out"] = init_conv(nxt(), ch0, cfg.out_channels, 3, dtype=dtype)
    return p


# ---------------------------------------------------------------------------
# apply


def _maybe_adain(cfg, x, num_frames, gen_index, cond_index):
    if (
        cfg.need_adain_temporal_cond
        and cfg.adain_fix
        and num_frames > 1
        and gen_index is not None
        and cond_index is not None
    ):
        bt, h, w, c = x.shape
        b = bt // num_frames
        v = x.reshape(b, num_frames, h, w, c)
        v = adain_to_condition_frames(v, gen_index, cond_index)
        return v.reshape(bt, h, w, c)
    return x


@dataclasses.dataclass
class UNetOps:
    """Strategy hooks for the block-loop core (``unet3d_core``).

    The core loop only knows about frame-local row tensors ``(N, H, W, C)``;
    everything that mixes frames or needs global batch structure goes through
    these hooks. The default instance (built by ``unet3d_apply``) implements
    single-program execution with frames folded into the batch; the
    frame-parallel executor (``parallel.frame_parallel``) swaps in
    collective-backed implementations over row shards.
    """

    spatial: Any  # (layer_params, x) -> x
    temporal_conv: Any  # (temp_conv_params, x) -> x
    temporal_attn: Any  # (temp_attn_params, x) -> x
    refer_fuse: Any  # (fuse_params, x, refer_emb) -> x
    adain: Any  # (x) -> x
    use_temporal: bool = True


def prepare_unet_inputs(
    params: Params,
    cfg: UNet3DConfig,
    sample: jnp.ndarray,
    timestep: jnp.ndarray,
    text_emb: jnp.ndarray,
    *,
    motion_speed: float,
    use_temporal: bool,
    frame_index: Optional[jnp.ndarray],
    cond_index: Optional[Sequence[int]],
    vision_clip_emb: Optional[jnp.ndarray],
    ip_adapter_face_emb: Optional[jnp.ndarray],
):
    """Embedding/context prep shared by the folded and frame-parallel paths.

    Returns ``(temb, femb, text_ctx, clip_ctx, face_ctx, cond_mask)`` where
    row tensors are aligned to the ``(B*T, ...)`` frame-row flattening of
    ``sample`` and ``femb`` stays ``(B, T, femb_dim)``.
    """
    b, num_frames = sample.shape[:2]
    compute_dtype = sample.dtype

    # --- time embedding -> per-frame rows (B*T, temb_dim)
    ts = jnp.asarray(timestep)
    if ts.ndim == 0:
        ts = ts[None]
    ts = jnp.broadcast_to(ts, (b,))
    temb = sinusoidal_embedding(ts, cfg.block_out_channels[0])
    temb = timestep_embedding(params["time_embedding"], temb.astype(compute_dtype))
    if cfg.use_anivv1_cfg:
        temb = silu(temb)
    temb = jnp.repeat(temb, num_frames, axis=0)  # (B*T, D)
    if (
        cfg.keep_vision_condition
        and use_temporal
        and num_frames > 1
        and cond_index is not None
    ):
        keep_mask = frame_mask(num_frames, cond_index, dtype=temb.dtype)
        temb = temb * jnp.tile(keep_mask, (b,))[:, None]

    # --- frame embedding (B, T, femb_dim)
    femb = None
    if cfg.temporal_transformer and use_temporal:
        if frame_index is None:
            fidx = jnp.arange(num_frames, dtype=jnp.float32)
            if cfg.use_anivv1_cfg:
                fidx = jnp.floor(fidx * motion_speed)
            femb = sinusoidal_embedding(fidx, cfg.block_out_channels[0])
            femb = jnp.broadcast_to(femb[None], (b, num_frames, femb.shape[-1]))
        else:
            femb = jax.vmap(
                lambda f: sinusoidal_embedding(f, cfg.block_out_channels[0])
            )(frame_index.astype(jnp.float32))
        femb = timestep_embedding(
            params["frame_embedding"], femb.astype(compute_dtype)
        )
        if cfg.use_anivv1_cfg:
            femb = silu(femb)

    # --- text context rows (B*T, S, D)
    if text_emb.ndim == 3:
        text_ctx = jnp.repeat(text_emb, num_frames, axis=0)
    else:
        text_ctx = text_emb.reshape(-1, *text_emb.shape[2:])
    clip_ctx = None
    if vision_clip_emb is not None and cfg.ip_adapter_cross_attn:
        clip_ctx = vision_clip_emb
        if clip_ctx.ndim == 3:
            clip_ctx = jnp.repeat(clip_ctx, num_frames, axis=0)
        else:
            clip_ctx = clip_ctx.reshape(-1, *clip_ctx.shape[2:])
    face_ctx = None
    if ip_adapter_face_emb is not None and cfg.need_ip_adapter_face:
        face_ctx = ip_adapter_face_emb
        if face_ctx.ndim == 3:
            face_ctx = jnp.repeat(face_ctx, num_frames, axis=0)
        else:
            face_ctx = face_ctx.reshape(-1, *face_ctx.shape[2:])

    # condition-frame mask for temporal residuals (keep_content_condition)
    cond_mask = None
    if (
        cfg.keep_content_condition
        and use_temporal
        and num_frames > 1
        and cond_index is not None
    ):
        cond_mask = frame_mask(num_frames, cond_index)

    return temb, femb, text_ctx, clip_ctx, face_ctx, cond_mask


def unet3d_core(
    params: Params,
    cfg: UNet3DConfig,
    x: jnp.ndarray,
    temb: jnp.ndarray,
    ops: UNetOps,
    *,
    down_block_refer_embs: Optional[List[jnp.ndarray]] = None,
    mid_block_refer_emb: Optional[jnp.ndarray] = None,
    controlnet_down_residuals: Optional[Sequence[jnp.ndarray]] = None,
    controlnet_mid_residual: Optional[jnp.ndarray] = None,
    pose_guider_emb: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """The UNet block loop over frame rows ``x (N, H, W, C)``.

    Frame-local compute (convs, resnets, head) is inlined; frame-mixing and
    attention ops dispatch through ``ops`` so the same loop serves both the
    batch-folded and the frame-parallel execution strategies.
    """
    groups = cfg.norm_num_groups
    eps = cfg.norm_eps

    x = conv2d(params["conv_in"], x, padding=1)
    if pose_guider_emb is not None:
        x = x + pose_guider_emb.astype(x.dtype)
    if cfg.need_transformer_in and cfg.temporal_transformer and ops.use_temporal:
        x = ops.temporal_attn(params["transformer_in"], x)
    if (
        cfg.need_refer_emb
        and down_block_refer_embs is not None
        and "first_refer_emb_attns" in params
    ):
        x = ops.refer_fuse(
            params["first_refer_emb_attns"], x, down_block_refer_embs[0]
        )

    def run_temporal(layer_p, x):
        if ops.use_temporal and "temp_conv" in layer_p:
            x = ops.temporal_conv(layer_p["temp_conv"], x)
        return x

    def run_temporal_attn(layer_p, x):
        if ops.use_temporal and "temp_attn" in layer_p:
            x = ops.temporal_attn(layer_p["temp_attn"], x)
        return x

    # --- down
    skips = [x]
    refer_pos = 1  # index into down_block_refer_embs (0 consumed at the stem)
    for i_block, block in enumerate(params["down_blocks"]):
        btype = cfg.down_block_types[i_block]
        fuse_refer = (
            cfg.need_refer_emb
            and down_block_refer_embs is not None
            and "refer_emb_attns" in block
        )
        for j_layer, layer in enumerate(block["layers"]):
            x = blk.resnet_block(
                layer["resnet"], x, temb, groups=groups, eps=eps,
                skip_time_act=cfg.resnet_skip_time_act,
            )
            x = run_temporal(layer, x)
            if _is_cross(btype):
                x = ops.spatial(layer["attn"], x)
            x = run_temporal_attn(layer, x)
            x = ops.adain(x)
            if fuse_refer:
                x = ops.refer_fuse(
                    block["refer_emb_attns"][j_layer], x,
                    down_block_refer_embs[refer_pos + j_layer],
                )
            skips.append(x)
        if "downsample" in block:
            x = blk.downsample(block["downsample"], x)
            x = ops.adain(x)
            if fuse_refer:
                x = ops.refer_fuse(
                    block["refer_emb_attns"][len(block["layers"])], x,
                    down_block_refer_embs[refer_pos + len(block["layers"])],
                )
            skips.append(x)
        if fuse_refer:
            refer_pos += len(block["refer_emb_attns"])

    if controlnet_down_residuals is not None:
        skips = [s + r.astype(s.dtype) for s, r in zip(skips, controlnet_down_residuals)]
        x = skips[-1]

    # --- mid
    mid = params["mid_block"]
    x = blk.resnet_block(
        mid["resnet_0"], x, temb, groups=groups, eps=eps,
        skip_time_act=cfg.resnet_skip_time_act,
    )
    if ops.use_temporal and "temp_conv_0" in mid:
        x = ops.temporal_conv(mid["temp_conv_0"], x)
    x = ops.spatial(mid["attn"], x)
    x = run_temporal_attn(mid, x)
    x = blk.resnet_block(
        mid["resnet_1"], x, temb, groups=groups, eps=eps,
        skip_time_act=cfg.resnet_skip_time_act,
    )
    if ops.use_temporal and "temp_conv_1" in mid:
        x = ops.temporal_conv(mid["temp_conv_1"], x)
    x = ops.adain(x)
    if (
        cfg.need_refer_emb
        and mid_block_refer_emb is not None
        and "mid_block_refer_emb_attns" in params
    ):
        x = ops.refer_fuse(
            params["mid_block_refer_emb_attns"], x, mid_block_refer_emb
        )
    if controlnet_mid_residual is not None:
        x = x + controlnet_mid_residual.astype(x.dtype)

    # --- up
    for i_block, block in enumerate(params["up_blocks"]):
        btype = cfg.up_block_types[i_block]
        for layer in block["layers"]:
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = blk.resnet_block(
                layer["resnet"], x, temb, groups=groups, eps=eps,
                skip_time_act=cfg.resnet_skip_time_act,
            )
            x = run_temporal(layer, x)
            if _is_cross(btype):
                x = ops.spatial(layer["attn"], x)
            x = run_temporal_attn(layer, x)
            x = ops.adain(x)
        if "upsample" in block:
            out_hw = skips[-1].shape[1:3] if skips else None
            x = blk.upsample(block["upsample"], x, out_hw=out_hw)

    # --- head
    x = group_norm(params["conv_norm_out"], x, num_groups=groups, eps=eps)
    x = silu(x)
    x = conv2d(params["conv_out"], x, padding=1)
    return x


def unet3d_apply(
    params: Params,
    cfg: UNet3DConfig,
    sample: jnp.ndarray,
    timestep: jnp.ndarray,
    text_emb: jnp.ndarray,
    *,
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
) -> jnp.ndarray:
    """Predict noise for a window of frames.

    Args:
      sample: (B, T_gen, H, W, C) noisy latents (generated frames only).
      timestep: scalar or (B,) diffusion timestep.
      text_emb: (B, S, cross_dim) or (B, T, S, cross_dim) prompt embeddings.
      condition_latents: (B, n_vc, H, W, C) clean vision-condition latents,
        spliced into the sample at ``cond_index`` (forward :875-882).
      gen_index / cond_index: static frame indices in the combined video.
      do_cfg: leading batch is [uncond; cond] halves.
      refer_self_attn_embs/mode: "write" collects normalized self-attn inputs
        (ReferenceNet side), "read" injects them as extra KV tokens.
      vision_clip_emb: (B, S_ip, D) projected IP-Adapter image tokens.

    Returns:
      (B, T_total, H, W, C) noise prediction over the *spliced* video
      (condition frames included, as in the reference; the pipeline drops
      them, pipeline_controlnet.py:2068-2071).
    """
    if condition_latents is not None:
        assert gen_index is not None and cond_index is not None
        sample = splice_with_index(
            condition_latents, cond_index, sample, gen_index, axis=1
        )
    b, num_frames, h0, w0, _ = sample.shape
    compute_dtype = sample.dtype
    use_temporal = not skip_temporal

    temb, femb, text_ctx, clip_ctx, face_ctx, cond_mask = prepare_unet_inputs(
        params, cfg, sample, timestep, text_emb,
        motion_speed=motion_speed, use_temporal=use_temporal,
        frame_index=frame_index, cond_index=cond_index,
        vision_clip_emb=vision_clip_emb,
        ip_adapter_face_emb=ip_adapter_face_emb,
    )

    groups = cfg.norm_num_groups
    heads = cfg.attention_heads

    spatial_kwargs = dict(
        heads=heads,
        groups=groups,
        num_frames=num_frames,
        cond_index=cond_index if use_temporal else None,
        do_cfg=do_cfg,
        ip_adapter_scale=ip_adapter_scale,
        ip_adapter_face_scale=ip_adapter_face_scale,
    )

    self_attn_counter = [0]

    def run_spatial(layer_p, x):
        idx = self_attn_counter[0]
        self_attn_counter[0] += 1
        write_list = None
        read_tokens = None
        if refer_self_attn_embs is not None:
            if refer_self_attn_mode == "write":
                write_list = refer_self_attn_embs
            elif refer_self_attn_mode == "read":
                read_tokens = refer_self_attn_embs[idx]
        return blk.spatial_transformer(
            layer_p,
            x,
            text_ctx,
            reference_attn=cfg.reference_attn,
            refer_tokens=read_tokens,
            vision_clip_tokens=clip_ctx,
            face_tokens=face_ctx,
            self_attn_out=write_list,
            self_attn_idx=idx,
            **spatial_kwargs,
        )

    spatial_pos_embs: Dict[Tuple[int, int], jnp.ndarray] = {}

    def get_spatial_emb(hh, ww):
        # per-resolution sincos grid (unet_3d_condition.py:955-971 +
        # resize_spatial_position_emb — recomputed per scale instead of
        # resized, which is exact for sincos grids)
        if not cfg.need_spatial_position_emb:
            return None
        if (hh, ww) not in spatial_pos_embs:
            from .embeddings import get_2d_sincos_pos_embed

            grid = get_2d_sincos_pos_embed(
                cfg.block_out_channels[0] * 2, hh, ww,
                norm_length=cfg.norm_spatial_length,
                max_length=cfg.spatial_max_length,
            )
            sp = jnp.asarray(grid, compute_dtype)
            sp = timestep_embedding(params["spatial_position_embedding"], sp) \
                if "spatial_position_embedding" in params else sp
            spatial_pos_embs[(hh, ww)] = sp
        return spatial_pos_embs[(hh, ww)]

    ops = UNetOps(
        spatial=run_spatial,
        temporal_conv=lambda p_, x_: blk.temporal_conv_layer(
            p_, x_, num_frames=num_frames, cond_mask=cond_mask, groups=groups
        ),
        temporal_attn=lambda p_, x_: blk.temporal_transformer(
            p_, x_, femb, num_frames=num_frames, heads=heads,
            cond_mask=cond_mask, groups=groups,
            spatial_position_emb=get_spatial_emb(x_.shape[1], x_.shape[2]),
            self_attn_mask=cfg.temporal_self_attn_mask,
            mask_n_near=cfg.temporal_attn_n_near,
        ),
        refer_fuse=lambda p_, x_, e_: blk.refer_emb_fuse(
            p_, x_, e_, num_frames=num_frames, heads=heads
        ),
        adain=lambda x_: _maybe_adain(cfg, x_, num_frames, gen_index, cond_index),
        use_temporal=use_temporal,
    )

    x = sample.reshape(b * num_frames, h0, w0, -1)
    x = unet3d_core(
        params, cfg, x, temb, ops,
        down_block_refer_embs=down_block_refer_embs,
        mid_block_refer_emb=mid_block_refer_emb,
        controlnet_down_residuals=controlnet_down_residuals,
        controlnet_mid_residual=controlnet_mid_residual,
        pose_guider_emb=pose_guider_emb,
    )
    return x.reshape(b, num_frames, h0, w0, -1)
