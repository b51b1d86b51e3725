"""Execute ONNX graphs as JAX functions (the TPU replacement for the
reference's onnxruntime C++ sessions, SURVEY.md §2.4 item 1).

The reference runs two opaque ONNX graphs on CPU/CUDA via onnxruntime:
`campplus.onnx`/`speaker_embed.onnx` (CAM++ 192-d x-vector,
/root/reference/taste_speech/processing_taste.py:295-310) and
`speech_tokenizer_v1.onnx` (S3 tokenizer, :312-324).  Here the graph parsed
by `onnx_import.load_onnx` is interpreted node-by-node with JAX primitives,
so the whole preprocessing net jits, fuses, and runs on TPU.

Shape machinery (Shape -> Gather -> Concat -> Reshape chains emitted by
exporters) stays concrete: `Shape` returns a host numpy array, and JAX ops
over non-tracer values execute eagerly, so reshape/slice targets are always
static by the time they are consumed — no dynamic shapes reach XLA.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from taste_spokenlm_tpu.frontend.onnx_import import (_ONNX_DTYPES, OnnxGraph,
                                                     OnnxNode, load_onnx)

_OPS: Dict[str, Callable] = {}


def _op(name):
    def deco(fn):
        _OPS[name] = fn
        return fn
    return deco


def _ints(v, default=None):
    if v is None:
        return default
    if isinstance(v, (list, tuple)):
        return [int(x) for x in v]
    return [int(v)]


def _host(x) -> np.ndarray:
    """Concretize a value that must be static (shape/axes/pad operands)."""
    return np.asarray(x)


# ---------------------------------------------------------------------------
# elementwise / unary
# ---------------------------------------------------------------------------

_UNARY = {
    "Relu": jax.nn.relu, "Sigmoid": jax.nn.sigmoid, "Tanh": jnp.tanh,
    "Exp": jnp.exp, "Log": jnp.log, "Sqrt": jnp.sqrt, "Neg": jnp.negative,
    "Abs": jnp.abs, "Floor": jnp.floor, "Ceil": jnp.ceil,
    "Round": jnp.round, "Erf": jax.lax.erf, "Sign": jnp.sign,
    "Reciprocal": lambda x: 1.0 / x, "Not": jnp.logical_not,
    "Softplus": jax.nn.softplus, "Identity": lambda x: x,
    "Sin": jnp.sin, "Cos": jnp.cos,
}
for _name, _fn in _UNARY.items():
    _OPS[_name] = (lambda f: lambda node, v: f(v[0]))(_fn)

_BINARY = {
    "Add": jnp.add, "Sub": jnp.subtract, "Mul": jnp.multiply,
    "Div": jnp.divide, "Pow": jnp.power, "Equal": jnp.equal,
    "Less": jnp.less, "LessOrEqual": jnp.less_equal,
    "Greater": jnp.greater, "GreaterOrEqual": jnp.greater_equal,
    "And": jnp.logical_and, "Or": jnp.logical_or,
    "Max": jnp.maximum, "Min": jnp.minimum, "Mod": jnp.mod,
}
for _name, _fn in _BINARY.items():
    _OPS[_name] = (lambda f: lambda node, v: f(*v))(_fn)


@_op("LeakyRelu")
def _leaky_relu(node, v):
    return jax.nn.leaky_relu(v[0], node.attributes.get("alpha", 0.01))


@_op("Elu")
def _elu(node, v):
    return jax.nn.elu(v[0], node.attributes.get("alpha", 1.0))


@_op("HardSigmoid")
def _hard_sigmoid(node, v):
    a = node.attributes.get("alpha", 0.2)
    b = node.attributes.get("beta", 0.5)
    return jnp.clip(a * v[0] + b, 0.0, 1.0)


@_op("Gelu")
def _gelu(node, v):
    approx = node.attributes.get("approximate", b"none") == b"tanh"
    return jax.nn.gelu(v[0], approximate=approx)


@_op("Clip")
def _clip(node, v):
    lo = v[1] if len(v) > 1 and v[1] is not None else node.attributes.get("min")
    hi = v[2] if len(v) > 2 and v[2] is not None else node.attributes.get("max")
    out = v[0]
    if lo is not None:
        out = jnp.maximum(out, lo)
    if hi is not None:
        out = jnp.minimum(out, hi)
    return out


@_op("Where")
def _where(node, v):
    return jnp.where(v[0], v[1], v[2])


@_op("Cast")
def _cast(node, v):
    return v[0].astype(_ONNX_DTYPES[int(node.attributes["to"])])


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------


def _reduce(fn):
    def impl(node, v):
        axes = _ints(node.attributes.get("axes"))
        if axes is None and len(v) > 1 and v[1] is not None:  # opset >= 18
            axes = [int(a) for a in _host(v[1]).reshape(-1)]
        keep = bool(node.attributes.get("keepdims", 1))
        axes_t = tuple(axes) if axes is not None else None
        return fn(v[0], axis=axes_t, keepdims=keep)
    return impl


_OPS["ReduceMean"] = _reduce(jnp.mean)
_OPS["ReduceSum"] = _reduce(jnp.sum)
_OPS["ReduceMax"] = _reduce(jnp.max)
_OPS["ReduceMin"] = _reduce(jnp.min)
_OPS["ReduceProd"] = _reduce(jnp.prod)
_OPS["ReduceL2"] = _reduce(
    lambda x, axis, keepdims: jnp.sqrt(jnp.sum(x * x, axis=axis,
                                               keepdims=keepdims)))


@_op("ArgMax")
def _argmax(node, v):
    axis = int(node.attributes.get("axis", 0))
    out = jnp.argmax(v[0], axis=axis).astype(jnp.int32)
    if node.attributes.get("keepdims", 1):
        out = jnp.expand_dims(out, axis)
    return out


@_op("ArgMin")
def _argmin(node, v):
    axis = int(node.attributes.get("axis", 0))
    out = jnp.argmin(v[0], axis=axis).astype(jnp.int32)
    if node.attributes.get("keepdims", 1):
        out = jnp.expand_dims(out, axis)
    return out


@_op("TopK")
def _topk(node, v):
    k = int(_host(v[1]).reshape(()))
    axis = int(node.attributes.get("axis", -1))
    x = jnp.moveaxis(v[0], axis, -1)
    vals, idx = jax.lax.top_k(x, k)
    return [jnp.moveaxis(vals, -1, axis),
            jnp.moveaxis(idx.astype(jnp.int32), -1, axis)]


# ---------------------------------------------------------------------------
# tensor manipulation
# ---------------------------------------------------------------------------


@_op("Shape")
def _shape(node, v):
    shape = np.asarray(v[0].shape, np.int64)
    start = int(node.attributes.get("start", 0))
    end = node.attributes.get("end")
    return shape[start:(int(end) if end is not None else None)]


@_op("Size")
def _size(node, v):
    return np.asarray(int(np.prod(v[0].shape)), np.int64)


@_op("Reshape")
def _reshape(node, v):
    target = [int(s) for s in _host(v[1]).reshape(-1)]
    if not node.attributes.get("allowzero", 0):
        target = [v[0].shape[i] if s == 0 else s for i, s in enumerate(target)]
    return jnp.reshape(v[0], target)


@_op("Transpose")
def _transpose(node, v):
    perm = _ints(node.attributes.get("perm"))
    if perm is None:
        perm = list(range(v[0].ndim))[::-1]
    return jnp.transpose(v[0], perm)


@_op("Concat")
def _concat(node, v):
    return jnp.concatenate(v, axis=int(node.attributes["axis"]))


@_op("Split")
def _split(node, v):
    axis = int(node.attributes.get("axis", 0))
    if len(v) > 1 and v[1] is not None:
        sizes = [int(s) for s in _host(v[1]).reshape(-1)]
    elif "split" in node.attributes:
        sizes = _ints(node.attributes["split"])
    else:
        n = int(node.attributes.get("num_outputs", len(node.outputs)))
        d = v[0].shape[axis]
        chunk = -(-d // n)
        sizes = [chunk] * (d // chunk) + ([d % chunk] if d % chunk else [])
    bounds = np.cumsum(sizes)[:-1].tolist()
    return list(jnp.split(v[0], bounds, axis=axis))


@_op("Slice")
def _slice(node, v):
    x = v[0]
    if len(v) > 1:  # opset >= 10: operands
        starts = [int(s) for s in _host(v[1]).reshape(-1)]
        ends = [int(s) for s in _host(v[2]).reshape(-1)]
        axes = ([int(s) for s in _host(v[3]).reshape(-1)]
                if len(v) > 3 and v[3] is not None else list(range(len(starts))))
        steps = ([int(s) for s in _host(v[4]).reshape(-1)]
                 if len(v) > 4 and v[4] is not None else [1] * len(starts))
    else:  # opset 1: attributes
        starts = _ints(node.attributes["starts"])
        ends = _ints(node.attributes["ends"])
        axes = _ints(node.attributes.get("axes"),
                     list(range(len(starts))))
        steps = [1] * len(starts)
    idx = [slice(None)] * x.ndim
    big = 1 << 62
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        dim = x.shape[ax]
        if st < 0:
            st += dim
        if -big < en < 0:
            en += dim
        if sp > 0:
            idx[ax] = slice(int(np.clip(st, 0, dim)),
                            int(np.clip(en, 0, dim)), sp)
        else:
            # en == INT64_MIN (or still negative) means "through element 0"
            stop = None if en < 0 else int(np.clip(en, 0, dim))
            idx[ax] = slice(int(np.clip(st, 0, dim - 1)), stop, sp)
    return x[tuple(idx)]


@_op("Gather")
def _gather(node, v):
    axis = int(node.attributes.get("axis", 0))
    if isinstance(v[0], np.ndarray) and isinstance(v[1], np.ndarray):
        return np.take(v[0], v[1].astype(np.int64), axis=axis)
    return jnp.take(v[0], jnp.asarray(v[1]).astype(jnp.int32), axis=axis)


@_op("GatherElements")
def _gather_elements(node, v):
    axis = int(node.attributes.get("axis", 0))
    return jnp.take_along_axis(v[0], jnp.asarray(v[1]).astype(jnp.int32),
                               axis=axis)


@_op("Unsqueeze")
def _unsqueeze(node, v):
    axes = _ints(node.attributes.get("axes"))
    if axes is None:
        axes = [int(a) for a in _host(v[1]).reshape(-1)]
    out = v[0]
    rank = out.ndim + len(axes)
    for ax in sorted(a % rank for a in axes):
        out = jnp.expand_dims(out, ax) if not isinstance(out, np.ndarray) \
            else np.expand_dims(out, ax)
    return out


@_op("Squeeze")
def _squeeze(node, v):
    axes = _ints(node.attributes.get("axes"))
    if axes is None and len(v) > 1 and v[1] is not None:
        axes = [int(a) for a in _host(v[1]).reshape(-1)]
    if axes is None:
        axes = [i for i, s in enumerate(v[0].shape) if s == 1]
    out = v[0]
    for ax in sorted((a % out.ndim for a in axes), reverse=True):
        out = out.squeeze(ax)
    return out


@_op("Flatten")
def _flatten(node, v):
    axis = int(node.attributes.get("axis", 1))
    lead = int(np.prod(v[0].shape[:axis], dtype=np.int64)) if axis else 1
    return jnp.reshape(v[0], (lead, -1))


@_op("Expand")
def _expand(node, v):
    target = tuple(int(s) for s in _host(v[1]).reshape(-1))
    shape = np.broadcast_shapes(v[0].shape, target)
    return jnp.broadcast_to(v[0], shape)


@_op("Tile")
def _tile(node, v):
    return jnp.tile(v[0], [int(s) for s in _host(v[1]).reshape(-1)])


@_op("Pad")
def _pad(node, v):
    mode = node.attributes.get("mode", b"constant").decode() \
        if isinstance(node.attributes.get("mode"), bytes) else "constant"
    if len(v) > 1 and v[1] is not None:
        pads = [int(p) for p in _host(v[1]).reshape(-1)]
    else:
        pads = _ints(node.attributes["pads"])
    const = 0.0
    if len(v) > 2 and v[2] is not None:
        const = float(_host(v[2]).reshape(()))
    n = v[0].ndim
    widths = [(pads[i], pads[i + n]) for i in range(n)]
    if mode == "constant":
        return jnp.pad(v[0], widths, constant_values=const)
    return jnp.pad(v[0], widths, mode={"reflect": "reflect",
                                       "edge": "edge"}[mode])


@_op("Constant")
def _constant(node, v):
    for key in ("value", "value_float", "value_int", "value_floats",
                "value_ints"):
        if key in node.attributes:
            a = node.attributes[key]
            if isinstance(a, tuple) and a[0] == "tensor":
                return np.asarray(a[1])
            return np.asarray(a)
    raise ValueError(f"Constant node without value: {node.name}")


@_op("ConstantOfShape")
def _constant_of_shape(node, v):
    shape = tuple(int(s) for s in _host(v[0]).reshape(-1))
    a = node.attributes.get("value")
    fill = np.asarray(a[1]) if isinstance(a, tuple) else np.zeros(1, np.float32)
    return np.full(shape, fill.reshape(-1)[0], fill.dtype)


@_op("Range")
def _range(node, v):
    start, limit, delta = (np.asarray(_host(x)).reshape(()) for x in v)
    return np.arange(start, limit, delta)


@_op("Einsum")
def _einsum(node, v):
    return jnp.einsum(node.attributes["equation"].decode(), *v)


@_op("CumSum")
def _cumsum(node, v):
    return jnp.cumsum(v[0], axis=int(_host(v[1]).reshape(())))


# ---------------------------------------------------------------------------
# neural network ops
# ---------------------------------------------------------------------------


@_op("MatMul")
def _matmul(node, v):
    return jnp.matmul(v[0], v[1], preferred_element_type=jnp.float32
                      ).astype(jnp.result_type(v[0], v[1]))


@_op("Gemm")
def _gemm(node, v):
    a, b = v[0], v[1]
    if node.attributes.get("transA", 0):
        a = a.T
    if node.attributes.get("transB", 0):
        b = b.T
    out = node.attributes.get("alpha", 1.0) * (a @ b)
    if len(v) > 2 and v[2] is not None:
        out = out + node.attributes.get("beta", 1.0) * v[2]
    return out


@_op("Softmax")
def _softmax(node, v):
    return jax.nn.softmax(v[0], axis=int(node.attributes.get("axis", -1)))


@_op("LogSoftmax")
def _log_softmax(node, v):
    return jax.nn.log_softmax(v[0], axis=int(node.attributes.get("axis", -1)))


def _conv_padding(node, x, w, strides, dilations):
    """ONNX pads [b0, b1, ..., e0, e1, ...] -> lax [(b, e), ...]."""
    spatial = x.ndim - 2
    auto = node.attributes.get("auto_pad", b"NOTSET")
    if isinstance(auto, bytes):
        auto = auto.decode()
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        pads = []
        for i in range(spatial):
            eff_k = (w.shape[2 + i] - 1) * dilations[i] + 1
            out = -(-x.shape[2 + i] // strides[i])
            total = max(0, (out - 1) * strides[i] + eff_k - x.shape[2 + i])
            half = total // 2
            pads.append((half, total - half) if auto == "SAME_UPPER"
                        else (total - half, half))
        return pads
    p = _ints(node.attributes.get("pads"), [0] * (2 * spatial))
    return [(p[i], p[i + spatial]) for i in range(spatial)]


@_op("Conv")
def _conv(node, v):
    x, w = v[0], v[1]
    spatial = x.ndim - 2
    strides = _ints(node.attributes.get("strides"), [1] * spatial)
    dilations = _ints(node.attributes.get("dilations"), [1] * spatial)
    groups = int(node.attributes.get("group", 1))
    pads = _conv_padding(node, x, w, strides, dilations)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape,
        ("NC" + "DHW"[-spatial:], "OI" + "DHW"[-spatial:],
         "NC" + "DHW"[-spatial:]))
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pads,
        rhs_dilation=dilations, dimension_numbers=dn,
        feature_group_count=groups)
    if len(v) > 2 and v[2] is not None:
        out = out + v[2].reshape((1, -1) + (1,) * spatial)
    return out


@_op("ConvTranspose")
def _conv_transpose(node, v):
    x, w = v[0], v[1]  # w: [Cin, Cout/groups, *K]
    spatial = x.ndim - 2
    strides = _ints(node.attributes.get("strides"), [1] * spatial)
    dilations = _ints(node.attributes.get("dilations"), [1] * spatial)
    groups = int(node.attributes.get("group", 1))
    assert groups == 1, "grouped ConvTranspose not supported"
    p = _ints(node.attributes.get("pads"), [0] * (2 * spatial))
    out_pad = _ints(node.attributes.get("output_padding"), [0] * spatial)
    # lax: gradient-style transposed conv via lhs_dilation
    pads = []
    for i in range(spatial):
        eff_k = (w.shape[2 + i] - 1) * dilations[i] + 1
        pads.append((eff_k - 1 - p[i], eff_k - 1 - p[i + spatial] + out_pad[i]))
    w_flip = jnp.flip(w, axis=tuple(range(2, 2 + spatial)))
    w_t = jnp.swapaxes(w_flip, 0, 1)  # [Cout, Cin, *K]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w_t.shape,
        ("NC" + "DHW"[-spatial:], "OI" + "DHW"[-spatial:],
         "NC" + "DHW"[-spatial:]))
    out = jax.lax.conv_general_dilated(
        x, w_t, window_strides=[1] * spatial, padding=pads,
        lhs_dilation=strides, rhs_dilation=dilations, dimension_numbers=dn)
    if len(v) > 2 and v[2] is not None:
        out = out + v[2].reshape((1, -1) + (1,) * spatial)
    return out


@_op("BatchNormalization")
def _batch_norm(node, v):
    x, scale, bias, mean, var = v[:5]
    eps = node.attributes.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = scale.reshape(shape) / jnp.sqrt(var.reshape(shape) + eps)
    return x * inv + (bias.reshape(shape) - mean.reshape(shape) * inv)


@_op("LayerNormalization")
def _layer_norm(node, v):
    axis = int(node.attributes.get("axis", -1))
    eps = node.attributes.get("epsilon", 1e-5)
    axes = tuple(range(axis % v[0].ndim, v[0].ndim))
    mean = jnp.mean(v[0], axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(v[0] - mean), axis=axes, keepdims=True)
    out = (v[0] - mean) / jnp.sqrt(var + eps)
    out = out * v[1]
    if len(v) > 2 and v[2] is not None:
        out = out + v[2]
    return out


@_op("InstanceNormalization")
def _instance_norm(node, v):
    eps = node.attributes.get("epsilon", 1e-5)
    axes = tuple(range(2, v[0].ndim))
    mean = jnp.mean(v[0], axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(v[0] - mean), axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (v[0].ndim - 2)
    return (v[0] - mean) / jnp.sqrt(var + eps) * v[1].reshape(shape) \
        + v[2].reshape(shape)


def _pool(node, v, reducer, init, average=False):
    x = v[0]
    spatial = x.ndim - 2
    kernel = _ints(node.attributes["kernel_shape"])
    strides = _ints(node.attributes.get("strides"), [1] * spatial)
    p = _ints(node.attributes.get("pads"), [0] * (2 * spatial))
    pads = [(0, 0), (0, 0)] + [(p[i], p[i + spatial]) for i in range(spatial)]
    dims = (1, 1) + tuple(kernel)
    strd = (1, 1) + tuple(strides)
    out = jax.lax.reduce_window(x, init, reducer, dims, strd, pads)
    if average:
        if node.attributes.get("count_include_pad", 0):
            denom = float(np.prod(kernel))
        else:
            ones = jnp.ones(x.shape, x.dtype)
            denom = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strd,
                                          pads)
        out = out / denom
    return out


@_op("MaxPool")
def _max_pool(node, v):
    return _pool(node, v, jax.lax.max, -jnp.inf)


@_op("AveragePool")
def _avg_pool(node, v):
    return _pool(node, v, jax.lax.add, 0.0, average=True)


@_op("GlobalAveragePool")
def _global_avg_pool(node, v):
    return jnp.mean(v[0], axis=tuple(range(2, v[0].ndim)), keepdims=True)


@_op("GlobalMaxPool")
def _global_max_pool(node, v):
    return jnp.max(v[0], axis=tuple(range(2, v[0].ndim)), keepdims=True)


# ---------------------------------------------------------------------------
# the executor
# ---------------------------------------------------------------------------


class OnnxJaxFunction:
    """A parsed ONNX graph as a callable JAX function.

    >>> fn = OnnxJaxFunction.from_file("campplus.onnx")
    >>> emb = jax.jit(fn)(fbank)          # runs on TPU

    Positional args map to the graph's non-initializer inputs in order;
    keyword args map by input name.  Returns a single array or a list in
    graph-output order.
    """

    def __init__(self, graph: OnnxGraph):
        self.graph = graph
        self.weights = {k: np.asarray(w) for k, w in graph.initializers.items()}
        self.input_names = [n for n in graph.inputs if n not in self.weights]

    @classmethod
    def from_file(cls, path_or_bytes) -> "OnnxJaxFunction":
        return cls(load_onnx(path_or_bytes))

    def __call__(self, *args, **kwargs):
        values: Dict[str, Any] = dict(self.weights)
        for name, arg in zip(self.input_names, args):
            values[name] = arg
        for name, arg in kwargs.items():
            values[name] = arg
        missing = [n for n in self.input_names if n not in values]
        if missing:
            raise ValueError(f"missing graph inputs: {missing}")

        pending: List[OnnxNode] = list(self.graph.nodes)
        while pending:
            progressed = False
            rest = []
            for node in pending:
                if all((not i) or i in values for i in node.inputs):
                    self._run_node(node, values)
                    progressed = True
                else:
                    rest.append(node)
            if not progressed:
                unmet = {i for n in rest for i in n.inputs
                         if i and i not in values}
                raise ValueError(f"graph is not resolvable; unmet: {unmet}")
            pending = rest

        outs = [values[o] for o in self.graph.outputs]
        return outs[0] if len(outs) == 1 else outs

    def _run_node(self, node: OnnxNode, values: Dict[str, Any]):
        fn = _OPS.get(node.op_type)
        if fn is None:
            raise NotImplementedError(
                f"ONNX op '{node.op_type}' (node '{node.name}') is not "
                f"supported; supported: {sorted(_OPS)}")
        ins = [values[i] if i else None for i in node.inputs]
        out = fn(node, ins)
        if isinstance(out, (list, tuple)):
            for name, val in zip(node.outputs, out):
                values[name] = val
        else:
            values[node.outputs[0]] = out


def supported_ops() -> List[str]:
    return sorted(_OPS)


def audit_ops(graph_or_blob) -> Dict[str, Any]:
    """Inventory a graph's ops BEFORE execution.

    Use this on a freshly downloaded campplus.onnx / speech_tokenizer_v1.onnx
    to learn up front whether `OnnxJaxFunction` can run it (instead of
    hitting NotImplementedError mid-graph).  Accepts an OnnxGraph, .onnx
    bytes, or a path.

    Returns {"op_counts": {op: n}, "unsupported": [op...], "ok": bool,
    "num_nodes": int, "num_initializers": int}.
    """
    from collections import Counter
    g = (graph_or_blob if isinstance(graph_or_blob, OnnxGraph)
         else load_onnx(graph_or_blob))
    counts = Counter(n.op_type for n in g.nodes)
    unsupported = sorted(set(counts) - set(_OPS))
    return {
        "op_counts": dict(sorted(counts.items())),
        "unsupported": unsupported,
        "ok": not unsupported,
        "num_nodes": len(g.nodes),
        "num_initializers": len(g.initializers),
    }
