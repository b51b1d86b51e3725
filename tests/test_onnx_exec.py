"""ONNX->JAX executor tests: writer/reader round trip, torch-golden CNN and
attention graphs, exporter-style shape pipelines, jit integration.

This is the TPU replacement for the reference's onnxruntime sessions
(/root/reference/taste_speech/processing_taste.py:286-324) — the graphs
tested here exercise the op set of campplus.onnx / speech_tokenizer_v1.onnx
(convs, norms, pooling, matmul attention, shape machinery).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from taste_spokenlm_tpu.frontend import onnx_build as B
from taste_spokenlm_tpu.frontend.onnx_exec import OnnxJaxFunction, supported_ops
from taste_spokenlm_tpu.frontend.onnx_import import load_onnx


def _fn(nodes, inputs, outputs, initializers=None):
    return OnnxJaxFunction.from_file(B.build(nodes, inputs, outputs,
                                             initializers))


def test_writer_reader_roundtrip():
    w = np.random.RandomState(0).randn(3, 4).astype(np.float32)
    blob = B.build(
        [B.node("Gemm", ["x", "w"], ["y"], alpha=2.0, transB=1),
         B.node("Concat", ["y", "y"], ["z"], axis=-1)],
        ["x"], ["z"], {"w": w})
    g = load_onnx(blob)
    assert [n.op_type for n in g.nodes] == ["Gemm", "Concat"]
    assert g.nodes[0].attributes["alpha"] == pytest.approx(2.0)
    assert g.nodes[0].attributes["transB"] == 1
    assert g.nodes[1].attributes["axis"] == -1          # negative int survives
    np.testing.assert_array_equal(g.initializers["w"], w)
    assert g.inputs == ["x"] and g.outputs == ["z"]


def test_negative_int64_tensor_roundtrip():
    axes = np.asarray([-1, 2], np.int64)
    blob = B.build([B.node("Identity", ["a"], ["b"])], ["a"], ["b"],
                   {"a": axes})
    g = load_onnx(blob)
    np.testing.assert_array_equal(g.initializers["a"], axes)


def test_cnn_matches_torch():
    """CAM++-style stack: Conv1d(group/dilation) + BN + ReLU + pools + Gemm."""
    torch.manual_seed(0)
    conv1 = torch.nn.Conv1d(4, 8, 5, stride=2, padding=2)
    bn = torch.nn.BatchNorm1d(8).eval()
    bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
    bn.weight.data.normal_(); bn.bias.data.normal_()
    conv2 = torch.nn.Conv1d(8, 8, 3, padding=2, dilation=2, groups=2)
    fc = torch.nn.Linear(8, 6)

    x = torch.randn(2, 4, 32)
    with torch.no_grad():
        t = conv1(x)
        t = torch.relu(bn(t))
        t = conv2(t)
        t = torch.nn.functional.avg_pool1d(t, 2, 2)
        t = t.mean(dim=2)                  # global average pool + squeeze
        want = fc(t).numpy()

    nodes = [
        B.node("Conv", ["x", "w1", "b1"], ["c1"], kernel_shape=[5],
               strides=[2], pads=[2, 2]),
        B.node("BatchNormalization",
               ["c1", "bn_s", "bn_b", "bn_m", "bn_v"], ["n1"], epsilon=1e-5),
        B.node("Relu", ["n1"], ["r1"]),
        B.node("Conv", ["r1", "w2", "b2"], ["c2"], kernel_shape=[3],
               pads=[2, 2], dilations=[2], group=2),
        B.node("AveragePool", ["c2"], ["p1"], kernel_shape=[2], strides=[2]),
        B.node("GlobalAveragePool", ["p1"], ["g1"]),
        B.node("Squeeze", ["g1"], ["s1"], axes=[2]),
        B.node("Gemm", ["s1", "fw", "fb"], ["y"], transB=1),
    ]
    init = {
        "w1": conv1.weight.detach().numpy(), "b1": conv1.bias.detach().numpy(),
        "bn_s": bn.weight.detach().numpy(), "bn_b": bn.bias.detach().numpy(),
        "bn_m": bn.running_mean.numpy(), "bn_v": bn.running_var.numpy(),
        "w2": conv2.weight.detach().numpy(), "b2": conv2.bias.detach().numpy(),
        "fw": fc.weight.detach().numpy(), "fb": fc.bias.detach().numpy(),
    }
    fn = _fn(nodes, ["x"], ["y"], init)
    got = np.asarray(fn(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv2d_and_maxpool_match_torch():
    torch.manual_seed(1)
    conv = torch.nn.Conv2d(3, 5, (3, 3), stride=(2, 1), padding=(1, 0))
    x = torch.randn(2, 3, 12, 9)
    with torch.no_grad():
        want = torch.nn.functional.max_pool2d(conv(x), (2, 2), (2, 2)).numpy()
    nodes = [
        B.node("Conv", ["x", "w", "b"], ["c"], kernel_shape=[3, 3],
               strides=[2, 1], pads=[1, 0, 1, 0]),
        B.node("MaxPool", ["c"], ["y"], kernel_shape=[2, 2], strides=[2, 2]),
    ]
    fn = _fn(nodes, ["x"], ["y"],
             {"w": conv.weight.detach().numpy(),
              "b": conv.bias.detach().numpy()})
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(x.numpy()))), want,
                               rtol=1e-4, atol=1e-5)


def test_conv_transpose_matches_torch():
    torch.manual_seed(2)
    ct = torch.nn.ConvTranspose1d(6, 4, 4, stride=2, padding=1)
    x = torch.randn(2, 6, 10)
    with torch.no_grad():
        want = ct(x).numpy()
    nodes = [B.node("ConvTranspose", ["x", "w", "b"], ["y"],
                    kernel_shape=[4], strides=[2], pads=[1, 1])]
    fn = _fn(nodes, ["x"], ["y"],
             {"w": ct.weight.detach().numpy(),
              "b": ct.bias.detach().numpy()})
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(x.numpy()))), want,
                               rtol=1e-4, atol=1e-5)


def test_attention_block_matches_torch():
    """Whisper-encoder-ish block: LayerNorm -> QKV matmuls -> scaled softmax
    attention -> projection, with exporter-style Shape/Gather/Concat/Reshape
    chains for the head split."""
    torch.manual_seed(3)
    b, t, d, h = 2, 7, 16, 4
    wq, wk, wv, wo = (torch.randn(d, d) * 0.2 for _ in range(4))
    g, bias = torch.randn(d), torch.randn(d)
    x = torch.randn(b, t, d)

    with torch.no_grad():
        xn = torch.nn.functional.layer_norm(x, (d,), g, bias)
        q = (xn @ wq).reshape(b, t, h, d // h).transpose(1, 2)
        k = (xn @ wk).reshape(b, t, h, d // h).transpose(1, 2)
        v = (xn @ wv).reshape(b, t, h, d // h).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) / (d // h) ** 0.5, dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, t, d)
        want = (o @ wo).numpy()

    def head_split(src, dst):
        # Shape -> Gather(0/1) -> Concat with [h, dh] -> Reshape -> Transpose
        return [
            B.node("Shape", [src], [f"{dst}_shape"]),
            B.node("Gather", [f"{dst}_shape", "zero"], [f"{dst}_b"], axis=0),
            B.node("Gather", [f"{dst}_shape", "one"], [f"{dst}_t"], axis=0),
            B.node("Unsqueeze", [f"{dst}_b"], [f"{dst}_b1"], axes=[0]),
            B.node("Unsqueeze", [f"{dst}_t"], [f"{dst}_t1"], axes=[0]),
            B.node("Concat", [f"{dst}_b1", f"{dst}_t1", "hd"],
                   [f"{dst}_tgt"], axis=0),
            B.node("Reshape", [src, f"{dst}_tgt"], [f"{dst}_4d"]),
            B.node("Transpose", [f"{dst}_4d"], [dst], perm=[0, 2, 1, 3]),
        ]

    nodes = [
        B.node("LayerNormalization", ["x", "g", "bias"], ["xn"],
               axis=-1, epsilon=1e-5),
        B.node("MatMul", ["xn", "wq"], ["q2"]),
        B.node("MatMul", ["xn", "wk"], ["k2"]),
        B.node("MatMul", ["xn", "wv"], ["v2"]),
        *head_split("q2", "q"),
        *head_split("k2", "k"),
        *head_split("v2", "v"),
        B.node("Transpose", ["k"], ["kT"], perm=[0, 1, 3, 2]),
        B.node("MatMul", ["q", "kT"], ["scores"]),
        B.node("Div", ["scores", "scale"], ["scaled"]),
        B.node("Softmax", ["scaled"], ["attn"], axis=-1),
        B.node("MatMul", ["attn", "v"], ["ctx"]),
        B.node("Transpose", ["ctx"], ["ctxT"], perm=[0, 2, 1, 3]),
        B.node("Shape", ["x"], ["xshape"]),
        B.node("Reshape", ["ctxT", "xshape"], ["merged"]),
        B.node("MatMul", ["merged", "wo"], ["y"]),
    ]
    init = {
        "g": g.numpy(), "bias": bias.numpy(),
        "wq": wq.numpy(), "wk": wk.numpy(), "wv": wv.numpy(),
        "wo": wo.numpy(),
        "zero": np.asarray(0, np.int64), "one": np.asarray(1, np.int64),
        "hd": np.asarray([h, d // h], np.int64),
        "scale": np.asarray((d // h) ** 0.5, np.float32),
    }
    fn = _fn(nodes, ["x"], ["y"], init)
    got = np.asarray(fn(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_misc_tensor_ops():
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    nodes = [
        B.node("Slice", ["x", "st", "en", "ax", "sp"], ["s"]),
        B.node("Pad", ["s", "pads"], ["p"]),
        B.node("Split", ["p"], ["a", "b"], axis=2, num_outputs=2),
        B.node("ReduceMean", ["a"], ["m"], axes=[1], keepdims=0),
        B.node("Expand", ["m", "eshape"], ["e"]),
        B.node("Where", ["cond", "e", "b0"], ["y"]),
        B.node("ReduceSum", ["b"], ["bsum"], axes=[0, 1, 2], keepdims=0),
    ]
    init = {
        "st": np.asarray([1], np.int64), "en": np.asarray([100], np.int64),
        "ax": np.asarray([2], np.int64), "sp": np.asarray([2], np.int64),
        "pads": np.asarray([0, 0, 0, 0, 0, 2], np.int64),
        "eshape": np.asarray([2, 2, 2], np.int64),
        "cond": np.asarray(True),
        "b0": np.zeros((2, 2, 2), np.float32),
    }
    fn = _fn(nodes, ["x"], ["y", "bsum"], init)
    y, bsum = fn(jnp.asarray(x))

    s = x[:, :, 1::2]                       # slice
    p = np.pad(s, ((0, 0), (0, 0), (0, 2)))  # pad tail to width 4
    a, b = p[:, :, :2], p[:, :, 2:]
    m = a.mean(axis=1)
    want = np.broadcast_to(m, (2, 2, 2))   # ONNX Expand = standard broadcast
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5)
    np.testing.assert_allclose(float(bsum), b.sum(), rtol=1e-5)


def test_argmax_topk_and_cast():
    x = np.asarray([[0.1, 2.0, -1.0, 0.5]], np.float32)
    nodes = [
        B.node("ArgMax", ["x"], ["am"], axis=-1, keepdims=0),
        B.node("Cast", ["am"], ["amf"], to=1),
        B.node("TopK", ["x", "k"], ["tv", "ti"], axis=-1),
    ]
    fn = _fn(nodes, ["x"], ["amf", "tv", "ti"],
             {"k": np.asarray([2], np.int64)})
    amf, tv, ti = fn(jnp.asarray(x))
    assert float(amf[0]) == 1.0
    np.testing.assert_allclose(np.asarray(tv)[0], [2.0, 0.5])
    assert np.asarray(ti)[0].tolist() == [1, 3]


def test_jit_and_unsupported_op_error():
    nodes = [B.node("Gemm", ["x", "w"], ["h"], transB=1),
             B.node("Erf", ["h"], ["y"])]
    w = np.random.RandomState(0).randn(5, 3).astype(np.float32)
    fn = _fn(nodes, ["x"], ["y"], {"w": w})
    x = np.random.RandomState(1).randn(4, 3).astype(np.float32)
    jitted = jax.jit(fn)
    got = np.asarray(jitted(jnp.asarray(x)))
    want = np.asarray(jax.lax.erf(jnp.asarray(x @ w.T)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    bad = _fn([B.node("NonsenseOp", ["x"], ["y"])], ["x"], ["y"])
    with pytest.raises(NotImplementedError, match="NonsenseOp"):
        bad(jnp.zeros((1,)))
    assert "Conv" in supported_ops()


def test_processor_hooks_from_onnx():
    """speaker_embedder_from_onnx / s3_tokenizer_from_onnx adapters follow the
    reference session I/O contracts (processing_taste.py:304-323)."""
    from taste_spokenlm_tpu.frontend.processor import (
        s3_tokenizer_from_onnx, speaker_embedder_from_onnx)

    # campplus-shaped graph: [B, T, 80] fbank -> mean over T -> Gemm -> [B, 192]
    rng = np.random.RandomState(0)
    w = rng.randn(192, 80).astype(np.float32) * 0.1
    spk_blob = B.build(
        [B.node("ReduceMean", ["feats"], ["m"], axes=[1], keepdims=0),
         B.node("Gemm", ["m", "w"], ["xvec"], transB=1)],
        ["feats"], ["xvec"], {"w": w})
    embed = speaker_embedder_from_onnx(spk_blob)
    feats = rng.randn(1, 50, 80).astype(np.float32)
    xvec = embed(feats)
    assert xvec.shape == (192,)
    np.testing.assert_allclose(xvec, feats.mean(axis=1)[0] @ w.T,
                               rtol=1e-4, atol=1e-5)

    # s3-shaped graph: (mel [1, 128, T], len int32[1]) -> conv stride 2 ->
    # argmax over a projection -> [1, T//2] ids
    cw = rng.randn(16, 128, 3).astype(np.float32) * 0.1
    pw = rng.randn(16, 64).astype(np.float32)
    s3_blob = B.build(
        [B.node("Conv", ["mel", "cw"], ["h"], kernel_shape=[3], strides=[2],
                pads=[1, 1]),
         B.node("Transpose", ["h"], ["ht"], perm=[0, 2, 1]),
         B.node("MatMul", ["ht", "pw"], ["logits"]),
         B.node("ArgMax", ["logits"], ["ids"], axis=-1, keepdims=0),
         B.node("Cast", ["ids"], ["ids64"], to=7)],
        ["mel", "mel_len"], ["ids64"], {"cw": cw, "pw": pw})
    tokenize = s3_tokenizer_from_onnx(s3_blob)
    mel = rng.randn(1, 128, 200).astype(np.float32)
    ids = tokenize(mel, 120)     # only the valid 120 frames are consumed
    assert ids.shape == (60,)
    assert ids.dtype == np.int32
    assert (ids >= 0).all() and (ids < 64).all()
