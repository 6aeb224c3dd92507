"""ONNX graph executor lowering to JAX (XLA/TPU-compilable).

TPU-native replacement for the reference's onnxruntime host stage
(dwpose detection + pose estimation, README.md:295-303): instead of a CPU
inference engine, the ONNX graph is lowered op-by-op to jax.numpy / lax and
jitted, so detector/pose models run on the same TPU as the diffusion UNet.

Supported op subset = what torchvision/mmpose-style CNN exports use (Conv,
BN, activations, pooling, resize, shape algebra, matmul/gemm, softmax,
reductions, slicing/concat). Shape-algebra chains (Shape -> Gather ->
Concat -> Reshape) fold at trace time: any value whose inputs are all
static numpy arrays is computed in numpy, keeping every jitted shape static.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .proto import Graph, Model, load_model

_STATIC = (np.ndarray, np.generic, int, float, bool)


def _is_static(x) -> bool:
    return isinstance(x, _STATIC)


def _np(x):
    return np.asarray(x)


def _pair(v, rank: int):
    v = list(v)
    if len(v) == rank:
        return v
    return v * rank


def _conv_pads(attrs, spatial: int, x_shape, k_shape, strides, dilations):
    auto = attrs.get("auto_pad", b"NOTSET")
    auto = auto.decode() if isinstance(auto, bytes) else auto
    if auto in ("NOTSET", ""):
        pads = attrs.get("pads", [0] * (2 * spatial))
        return [(int(pads[i]), int(pads[i + spatial])) for i in range(spatial)]
    if auto == "VALID":
        return [(0, 0)] * spatial
    # SAME_UPPER / SAME_LOWER
    out = []
    for i in range(spatial):
        in_dim = x_shape[2 + i]
        k = (k_shape[2 + i] - 1) * dilations[i] + 1
        out_dim = -(-in_dim // strides[i])
        pad = max(0, (out_dim - 1) * strides[i] + k - in_dim)
        lo = pad // 2 if auto == "SAME_UPPER" else pad - pad // 2
        out.append((lo, pad - lo))
    return out


def _op_conv(attrs, x, w, b=None):
    spatial = x.ndim - 2
    strides = [int(s) for s in _pair(attrs.get("strides", [1]), spatial)]
    dilations = [int(d) for d in _pair(attrs.get("dilations", [1]), spatial)]
    groups = int(attrs.get("group", 1))
    pads = _conv_pads(attrs, spatial, x.shape, w.shape, strides, dilations)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape,
        ("NCHW", "OIHW", "NCHW") if spatial == 2 else ("NCW", "OIW", "NCW"),
    )
    y = jax.lax.conv_general_dilated(
        x, w, strides, pads, rhs_dilation=dilations, dimension_numbers=dn,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + jnp.reshape(b, (1, -1) + (1,) * spatial)
    return y


def _op_conv_transpose(attrs, x, w, b=None):
    spatial = x.ndim - 2
    strides = [int(s) for s in _pair(attrs.get("strides", [1]), spatial)]
    pads = attrs.get("pads", [0] * (2 * spatial))
    pads = [(int(pads[i]), int(pads[i + spatial])) for i in range(spatial)]
    groups = int(attrs.get("group", 1))
    if groups != 1:
        raise NotImplementedError("grouped ConvTranspose")
    # onnx W layout: (C_in, C_out/groups, kH, kW); lax gradient-style
    # transpose conv = dilated conv with flipped kernel
    k_spatial = w.shape[2:]
    w_flip = jnp.flip(w, axis=tuple(range(2, w.ndim)))
    w_t = jnp.swapaxes(w_flip, 0, 1)  # (C_out, C_in, ...)
    lax_pads = [
        (k_spatial[i] - 1 - pads[i][0], k_spatial[i] - 1 - pads[i][1])
        for i in range(spatial)
    ]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w_t.shape, ("NCHW", "OIHW", "NCHW")
    )
    y = jax.lax.conv_general_dilated(
        x, w_t, [1] * spatial, lax_pads, lhs_dilation=strides,
        dimension_numbers=dn,
    )
    if b is not None:
        y = y + jnp.reshape(b, (1, -1) + (1,) * spatial)
    return y


def _pool(attrs, x, reducer, init, avg=False):
    spatial = x.ndim - 2
    kshape = [int(k) for k in attrs["kernel_shape"]]
    strides = [int(s) for s in _pair(attrs.get("strides", [1] * spatial), spatial)]
    pads = attrs.get("pads", [0] * (2 * spatial))
    pads = [(int(pads[i]), int(pads[i + spatial])) for i in range(spatial)]
    if int(attrs.get("ceil_mode", 0)):
        new_pads = []
        for i in range(spatial):
            in_dim = x.shape[2 + i] + pads[i][0] + pads[i][1]
            rem = (in_dim - kshape[i]) % strides[i]
            extra = (strides[i] - rem) % strides[i] if rem else 0
            new_pads.append((pads[i][0], pads[i][1] + extra))
        pads = new_pads
    window = (1, 1, *kshape)
    strides_full = (1, 1, *strides)
    pads_full = ((0, 0), (0, 0), *pads)
    y = jax.lax.reduce_window(x, init, reducer, window, strides_full, pads_full)
    if avg:
        ones = jnp.ones(x.shape[:1] + (1,) + x.shape[2:], x.dtype)
        if int(attrs.get("count_include_pad", 0)):
            denom = float(np.prod(kshape))
            y = y / denom
        else:
            counts = jax.lax.reduce_window(
                ones, 0.0, jax.lax.add, window, strides_full, pads_full
            )
            y = y / counts
    return y


def _resize_coords(out_len, in_len, ctm):
    """ONNX output->input coordinate mapping per coordinate_transformation_mode."""
    xo = jnp.arange(out_len, dtype=jnp.float32)
    scale = out_len / in_len
    if ctm in ("half_pixel", "tf_half_pixel_for_nn"):
        return (xo + 0.5) / scale - 0.5
    if ctm == "pytorch_half_pixel":
        return (xo + 0.5) / scale - 0.5 if out_len > 1 else jnp.zeros_like(xo)
    if ctm == "asymmetric":
        return xo / scale
    if ctm == "align_corners":
        if out_len == 1:
            return jnp.zeros_like(xo)
        return xo * ((in_len - 1) / (out_len - 1))
    raise NotImplementedError(f"Resize coordinate_transformation_mode {ctm}")


def _op_resize(attrs, x, *rest):
    # inputs (opset 11+): X, roi, scales, sizes ; (opset 10): X, scales
    roi = rest[0] if len(rest) > 0 else None
    scales = rest[1] if len(rest) > 1 else (rest[0] if rest else None)
    sizes = rest[2] if len(rest) > 2 else None
    del roi
    mode = attrs.get("mode", b"nearest")
    mode = mode.decode() if isinstance(mode, bytes) else mode
    ctm = attrs.get("coordinate_transformation_mode", b"half_pixel")
    ctm = ctm.decode() if isinstance(ctm, bytes) else ctm
    nearest_mode = attrs.get("nearest_mode", b"round_prefer_floor")
    nearest_mode = (
        nearest_mode.decode() if isinstance(nearest_mode, bytes) else nearest_mode
    )
    if sizes is not None and np.size(sizes):
        out_shape = [int(s) for s in np.asarray(sizes)]
    else:
        sc = np.asarray(scales)
        out_shape = [int(np.floor(x.shape[i] * sc[i])) for i in range(x.ndim)]
    if mode == "cubic":
        if ctm not in ("half_pixel", "pytorch_half_pixel"):
            raise NotImplementedError(f"Resize cubic with ctm {ctm}")
        return jax.image.resize(x, tuple(out_shape), method="bicubic")
    if not (mode.startswith("nearest") or mode in ("linear", "bilinear")):
        raise NotImplementedError(f"Resize mode {mode}")
    # separable axis-by-axis gather honouring the exact onnx coordinate
    # conventions (jax.image.resize is hardwired to half_pixel, which
    # silently shifts asymmetric/align_corners exports like yolox upsamples)
    y = x
    for ax, out_len in enumerate(out_shape):
        in_len = y.shape[ax]
        if out_len == in_len:
            continue
        coords = _resize_coords(out_len, in_len, ctm)
        if mode.startswith("nearest"):
            if nearest_mode == "round_prefer_floor":
                idx = jnp.ceil(coords - 0.5)
            elif nearest_mode == "round_prefer_ceil":
                idx = jnp.floor(coords + 0.5)
            elif nearest_mode == "floor":
                idx = jnp.floor(coords)
            elif nearest_mode == "ceil":
                idx = jnp.ceil(coords)
            else:
                raise NotImplementedError(f"Resize nearest_mode {nearest_mode}")
            idx = jnp.clip(idx.astype(jnp.int32), 0, in_len - 1)
            y = jnp.take(y, idx, axis=ax)
        else:
            lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, in_len - 1)
            hi = jnp.clip(lo + 1, 0, in_len - 1)
            w = jnp.clip(coords - lo.astype(jnp.float32), 0.0, 1.0)
            shape = [1] * y.ndim
            shape[ax] = out_len
            w = w.reshape(shape).astype(y.dtype)
            y = jnp.take(y, lo, axis=ax) * (1 - w) + jnp.take(y, hi, axis=ax) * w
    return y


def _axes_tuple(axes, rank):
    return tuple(int(a) % rank for a in axes)


def _op_slice(node_attrs, data, starts=None, ends=None, axes=None, steps=None):
    if starts is None:  # opset 9 attribute form
        starts = node_attrs["starts"]
        ends = node_attrs["ends"]
        axes = node_attrs.get("axes")
    starts = [int(s) for s in np.asarray(starts).reshape(-1)]
    ends = [int(e) for e in np.asarray(ends).reshape(-1)]
    axes = (
        list(range(len(starts)))
        if axes is None
        else [int(a) for a in np.asarray(axes).reshape(-1)]
    )
    steps = (
        [1] * len(starts)
        if steps is None
        else [int(s) for s in np.asarray(steps).reshape(-1)]
    )
    slices = [slice(None)] * data.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = ax % data.ndim
        # onnx clamps INT_MAX/MIN sentinels
        dim = data.shape[ax]
        if st > dim:
            st = dim
        if en > dim:
            en = dim
        if st < -dim:
            st = -dim
        if en < -(dim + 1):
            en = -(dim + 1) if sp < 0 else -dim
        slices[ax] = slice(st, en, sp)
    return data[tuple(slices)]


class OnnxModel:
    """Parsed + lowered ONNX model. ``run(feeds)`` jit-compiles per input
    shape signature and executes on the default JAX backend."""

    def __init__(self, model: Model):
        self.model = model
        self.graph: Graph = model.graph
        init_names = set(self.graph.initializers)
        self.input_names = [
            n for n, _ in self.graph.inputs if n not in init_names
        ]
        self.output_names = list(self.graph.outputs)
        self._jit_cache: Dict = {}

    @classmethod
    def from_file(cls, path: str) -> "OnnxModel":
        return cls(load_model(path))

    # -- execution -----------------------------------------------------------

    def _execute(self, feeds: Dict[str, jnp.ndarray]) -> List[jnp.ndarray]:
        env: Dict[str, object] = dict(self.graph.initializers)
        env[""] = None  # optional (omitted) inputs
        env.update(feeds)
        for node in self.graph.nodes:
            ins = [env[i] for i in node.inputs]
            outs = self._run_node(node.op_type, node.attrs, ins)
            if not isinstance(outs, (list, tuple)):
                outs = [outs]
            for name, val in zip(node.outputs, outs):
                if name:
                    env[name] = val
        return [env[o] for o in self.output_names]

    def run(self, feeds: Dict[str, np.ndarray]) -> List[np.ndarray]:
        sig = tuple(
            (k, tuple(np.shape(v)), np.asarray(v).dtype.str)
            for k, v in sorted(feeds.items())
        )
        fn = self._jit_cache.get(sig)
        if fn is None:
            names = sorted(feeds)

            @jax.jit
            def fn(*vals):
                return self._execute(dict(zip(names, vals)))

            self._jit_cache[sig] = fn
        out = fn(*[jnp.asarray(feeds[k]) for k in sorted(feeds)])
        return [np.asarray(o) for o in out]

    def __call__(self, **feeds):
        return self.run(feeds)

    # -- op lowering -----------------------------------------------------------

    def _run_node(self, op: str, attrs: Dict, ins: List):
        fn = getattr(self, f"_lower_{op}", None)
        if fn is None:
            raise NotImplementedError(
                f"ONNX op {op!r} not supported by musev_tpu.onnx.runtime"
            )
        # constant folding of shape algebra happens inside each _lower_*
        # via _is_static checks (numpy in, numpy out) — no dispatch needed
        return fn(attrs, *ins)

    # elementwise ------------------------------------------------------------
    def _lower_Add(self, a, x, y):
        return x + y

    def _lower_Sub(self, a, x, y):
        return x - y

    def _lower_Mul(self, a, x, y):
        return x * y

    def _lower_Div(self, a, x, y):
        if _is_static(x) and _is_static(y) and np.issubdtype(
            _np(x).dtype, np.integer
        ) and np.issubdtype(_np(y).dtype, np.integer):
            return _np(x) // _np(y)
        return x / y

    def _lower_Pow(self, a, x, y):
        return x**y

    def _lower_Neg(self, a, x):
        return -x

    def _lower_Abs(self, a, x):
        return jnp.abs(x) if not _is_static(x) else np.abs(x)

    def _lower_Exp(self, a, x):
        return jnp.exp(x)

    def _lower_Log(self, a, x):
        return jnp.log(x)

    def _lower_Sqrt(self, a, x):
        return jnp.sqrt(x)

    def _lower_Erf(self, a, x):
        return jax.lax.erf(x)

    def _lower_Floor(self, a, x):
        return jnp.floor(x) if not _is_static(x) else np.floor(_np(x))

    def _lower_Ceil(self, a, x):
        return jnp.ceil(x) if not _is_static(x) else np.ceil(_np(x))

    def _lower_Relu(self, a, x):
        return jnp.maximum(x, 0)

    def _lower_LeakyRelu(self, a, x):
        alpha = a.get("alpha", 0.01)
        return jnp.where(x >= 0, x, alpha * x)

    def _lower_PRelu(self, a, x, slope):
        return jnp.where(x >= 0, x, slope * x)

    def _lower_Elu(self, a, x):
        alpha = a.get("alpha", 1.0)
        return jnp.where(x >= 0, x, alpha * (jnp.exp(x) - 1.0))

    def _lower_Sigmoid(self, a, x):
        return jax.nn.sigmoid(x)

    def _lower_HardSigmoid(self, a, x):
        alpha = a.get("alpha", 0.2)
        beta = a.get("beta", 0.5)
        return jnp.clip(alpha * x + beta, 0.0, 1.0)

    def _lower_HardSwish(self, a, x):
        return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)

    def _lower_Tanh(self, a, x):
        return jnp.tanh(x)

    def _lower_Softplus(self, a, x):
        return jax.nn.softplus(x)

    def _lower_Clip(self, a, x, lo=None, hi=None):
        if lo is None:
            lo = a.get("min")
        if hi is None:
            hi = a.get("max")
        if lo is not None:
            x = jnp.maximum(x, jnp.asarray(lo, dtype=x.dtype if hasattr(x, "dtype") else None))
        if hi is not None:
            x = jnp.minimum(x, jnp.asarray(hi, dtype=x.dtype if hasattr(x, "dtype") else None))
        return x

    def _lower_Min(self, a, *xs):
        return functools.reduce(jnp.minimum, xs)

    def _lower_Max(self, a, *xs):
        return functools.reduce(jnp.maximum, xs)

    def _lower_Where(self, a, c, x, y):
        return jnp.where(c, x, y)

    def _lower_Equal(self, a, x, y):
        return x == y

    def _lower_Greater(self, a, x, y):
        return x > y

    def _lower_Less(self, a, x, y):
        return x < y

    def _lower_Not(self, a, x):
        return jnp.logical_not(x)

    def _lower_And(self, a, x, y):
        return jnp.logical_and(x, y)

    def _lower_Or(self, a, x, y):
        return jnp.logical_or(x, y)

    # matmul / norm -----------------------------------------------------------
    def _lower_MatMul(self, a, x, y):
        return jnp.matmul(x, y)

    def _lower_Gemm(self, a, x, y, c=None):
        alpha = a.get("alpha", 1.0)
        beta = a.get("beta", 1.0)
        if int(a.get("transA", 0)):
            x = jnp.swapaxes(x, -1, -2)
        if int(a.get("transB", 0)):
            y = jnp.swapaxes(y, -1, -2)
        out = alpha * jnp.matmul(x, y)
        if c is not None:
            out = out + beta * c
        return out

    def _lower_BatchNormalization(self, a, x, scale, bias, mean, var):
        eps = a.get("epsilon", 1e-5)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps).astype(x.dtype)
        return (x - mean.reshape(shape)) * (inv * scale).reshape(
            shape
        ) + bias.reshape(shape)

    def _lower_InstanceNormalization(self, a, x, scale, bias):
        eps = a.get("epsilon", 1e-5)
        axes = tuple(range(2, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        return (x - mean) * jax.lax.rsqrt(var + eps) * scale.reshape(
            shape
        ) + bias.reshape(shape)

    def _lower_LayerNormalization(self, a, x, scale, bias=None):
        axis = int(a.get("axis", -1))
        eps = a.get("epsilon", 1e-5)
        axes = tuple(range(axis % x.ndim, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps) * scale
        if bias is not None:
            y = y + bias
        return y

    def _lower_Softmax(self, a, x):
        return jax.nn.softmax(x, axis=int(a.get("axis", -1)))

    # conv / pool / resize ------------------------------------------------------
    def _lower_Conv(self, a, x, w, b=None):
        return _op_conv(a, x, w, b)

    def _lower_ConvTranspose(self, a, x, w, b=None):
        return _op_conv_transpose(a, x, w, b)

    def _lower_MaxPool(self, a, x):
        return _pool(a, x, jax.lax.max, -jnp.inf)

    def _lower_AveragePool(self, a, x):
        return _pool(a, x, jax.lax.add, 0.0, avg=True)

    def _lower_GlobalAveragePool(self, a, x):
        return jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)

    def _lower_GlobalMaxPool(self, a, x):
        return jnp.max(x, axis=tuple(range(2, x.ndim)), keepdims=True)

    def _lower_Resize(self, a, x, *rest):
        return _op_resize(a, x, *rest)

    def _lower_Upsample(self, a, x, scales=None):
        if scales is None:
            scales = a["scales"]
        return _op_resize({"mode": a.get("mode", b"nearest")}, x, None, scales)

    def _lower_Pad(self, a, x, pads=None, value=None, axes=None):
        if pads is None:
            pads = a["pads"]
        pads = [int(p) for p in np.asarray(pads).reshape(-1)]
        rank = x.ndim
        if axes is not None:
            ax = [int(v) % rank for v in np.asarray(axes).reshape(-1)]
        else:
            ax = list(range(rank))
        width = [(0, 0)] * rank
        half = len(pads) // 2
        for j, axis in enumerate(ax):
            width[axis] = (pads[j], pads[j + half])
        mode = a.get("mode", b"constant")
        mode = mode.decode() if isinstance(mode, bytes) else mode
        cval = 0.0 if value is None else float(np.asarray(value).reshape(()))
        if mode == "constant":
            return jnp.pad(x, width, constant_values=cval)
        return jnp.pad(x, width, mode={"reflect": "reflect", "edge": "edge"}[mode])

    # shape algebra ---------------------------------------------------------------
    def _lower_Shape(self, a, x):
        shape = np.asarray(np.shape(x), dtype=np.int64)
        start = int(a.get("start", 0))
        end = a.get("end")
        return shape[start : int(end) if end is not None else None]

    def _lower_Size(self, a, x):
        return np.asarray(int(np.prod(np.shape(x))), dtype=np.int64)

    def _lower_Reshape(self, a, x, shape):
        shape = [int(s) for s in np.asarray(shape).reshape(-1)]
        if not int(a.get("allowzero", 0)):
            shape = [
                x.shape[i] if s == 0 else s for i, s in enumerate(shape)
            ]
        return (
            _np(x).reshape(shape) if _is_static(x) else jnp.reshape(x, shape)
        )

    def _lower_Transpose(self, a, x):
        perm = a.get("perm")
        if perm is None:
            perm = list(range(x.ndim))[::-1]
        return jnp.transpose(x, [int(p) for p in perm])

    def _lower_Flatten(self, a, x):
        axis = int(a.get("axis", 1)) % (x.ndim + 1)
        lead = int(np.prod(x.shape[:axis])) if axis else 1
        return jnp.reshape(x, (lead, -1))

    def _lower_Squeeze(self, a, x, axes=None):
        if axes is None:
            axes = a.get("axes")
        if axes is None:
            axes = [i for i, s in enumerate(np.shape(x)) if s == 1]
        axes = _axes_tuple(np.asarray(axes).reshape(-1), np.ndim(x))
        return (
            np.squeeze(_np(x), axis=axes)
            if _is_static(x)
            else jnp.squeeze(x, axis=axes)
        )

    def _lower_Unsqueeze(self, a, x, axes=None):
        if axes is None:
            axes = a["axes"]
        out_rank = np.ndim(x) + len(np.asarray(axes).reshape(-1))
        axes = sorted(int(v) % out_rank for v in np.asarray(axes).reshape(-1))
        y = _np(x) if _is_static(x) else x
        for ax in axes:
            y = (
                np.expand_dims(y, ax)
                if _is_static(y)
                else jnp.expand_dims(y, ax)
            )
        return y

    def _lower_Concat(self, a, *xs):
        axis = int(a["axis"])
        if all(_is_static(x) for x in xs):
            return np.concatenate([_np(x) for x in xs], axis=axis)
        return jnp.concatenate(xs, axis=axis)

    def _lower_Split(self, a, x, split=None):
        axis = int(a.get("axis", 0)) % x.ndim
        if split is None:
            split = a.get("split")
        if split is None:
            n = int(a.get("num_outputs", 2))
            sizes = [x.shape[axis] // n] * n
        else:
            sizes = [int(s) for s in np.asarray(split).reshape(-1)]
        idx = np.cumsum(sizes)[:-1]
        return jnp.split(x, idx, axis=axis)

    def _lower_Gather(self, a, x, idx):
        axis = int(a.get("axis", 0))
        if _is_static(x) and _is_static(idx):
            return np.take(_np(x), _np(idx).astype(np.int64), axis=axis)
        return jnp.take(x, jnp.asarray(idx), axis=axis)

    def _lower_GatherElements(self, a, x, idx):
        axis = int(a.get("axis", 0))
        return jnp.take_along_axis(x, jnp.asarray(idx), axis=axis)

    def _lower_Slice(self, a, *ins):
        return _op_slice(a, *ins)

    def _lower_Expand(self, a, x, shape):
        shape = [int(s) for s in np.asarray(shape).reshape(-1)]
        target = list(np.broadcast_shapes(tuple(np.shape(x)), tuple(shape)))
        return jnp.broadcast_to(x, target)

    def _lower_Tile(self, a, x, reps):
        return jnp.tile(x, [int(r) for r in np.asarray(reps).reshape(-1)])

    def _lower_Cast(self, a, x):
        from .proto import TENSOR_DTYPES

        dt = TENSOR_DTYPES[int(a["to"])]
        return _np(x).astype(dt) if _is_static(x) else x.astype(dt)

    def _lower_Identity(self, a, x):
        return x

    def _lower_Constant(self, a):
        if "value" in a:
            return a["value"]
        if "value_float" in a:
            return np.float32(a["value_float"])
        if "value_int" in a:
            return np.int64(a["value_int"])
        if "value_floats" in a:
            return np.asarray(a["value_floats"], np.float32)
        if "value_ints" in a:
            return np.asarray(a["value_ints"], np.int64)
        raise NotImplementedError("Constant without tensor value")

    def _lower_ConstantOfShape(self, a, shape):
        val = a.get("value")
        fill = val.reshape(-1)[0] if isinstance(val, np.ndarray) else 0.0
        dt = val.dtype if isinstance(val, np.ndarray) else np.float32
        return np.full([int(s) for s in np.asarray(shape).reshape(-1)], fill, dt)

    def _lower_Range(self, a, start, limit, delta):
        if all(_is_static(v) for v in (start, limit, delta)):
            return np.arange(
                _np(start).item(), _np(limit).item(), _np(delta).item()
            )
        return jnp.arange(start, limit, delta)

    # reductions -------------------------------------------------------------------
    def _reduce(self, fn, a, x, axes=None):
        if axes is None:
            axes = a.get("axes")
        keep = bool(int(a.get("keepdims", 1)))
        if axes is None:
            if int(a.get("noop_with_empty_axes", 0)):
                return x
            ax = None
        else:
            ax = _axes_tuple(np.asarray(axes).reshape(-1), x.ndim)
        return fn(x, axis=ax, keepdims=keep)

    def _lower_ReduceMean(self, a, x, axes=None):
        return self._reduce(jnp.mean, a, x, axes)

    def _lower_ReduceSum(self, a, x, axes=None):
        return self._reduce(jnp.sum, a, x, axes)

    def _lower_ReduceMax(self, a, x, axes=None):
        return self._reduce(jnp.max, a, x, axes)

    def _lower_ReduceMin(self, a, x, axes=None):
        return self._reduce(jnp.min, a, x, axes)

    def _lower_ReduceProd(self, a, x, axes=None):
        return self._reduce(jnp.prod, a, x, axes)

    def _lower_ReduceL2(self, a, x, axes=None):
        return jnp.sqrt(self._reduce(jnp.sum, a, x * x, axes))

    def _lower_ArgMax(self, a, x):
        axis = int(a.get("axis", 0))
        keep = bool(int(a.get("keepdims", 1)))
        out = jnp.argmax(x, axis=axis)
        if keep:
            out = jnp.expand_dims(out, axis)
        return out.astype(jnp.int64)

    def _lower_ArgMin(self, a, x):
        axis = int(a.get("axis", 0))
        keep = bool(int(a.get("keepdims", 1)))
        out = jnp.argmin(x, axis=axis)
        if keep:
            out = jnp.expand_dims(out, axis)
        return out.astype(jnp.int64)


