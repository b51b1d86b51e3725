"""Architecture-shaped ONNX graphs through the JAX executor.

The two real graphs the reference feeds to onnxruntime
(/root/reference/taste_speech/processing_taste.py:286-324) are not
downloadable offline, so these tests build synthetic graphs with the SAME
architectural op patterns and golden-check them against torch:

  * campplus.onnx  — CAM++ x-vector: Conv1d stem, D-TDNN dense blocks
    (BatchNorm->ReLU->Conv1d, dense Concat), context-aware masking
    (segment pooling + Sigmoid gate), temporal statistics pooling
    (mean/std via ReduceMean/Sub/Mul/Sqrt), Gemm head.
    Expected op inventory: Conv, BatchNormalization, Relu, Concat, Sigmoid,
    ReduceMean, Sub, Mul, Add, Sqrt, Gemm, AveragePool/GlobalAveragePool.
  * speech_tokenizer_v1.onnx — S3 tokenizer: whisper-style Conv stem with
    erf-GELU, a transformer block exported as primitive ops (decomposed
    LayerNorm via ReduceMean/Sub/Pow/Sqrt, MatMul attention with
    Transpose/Reshape/Split and Softmax), then VQ nearest-codebook lookup
    (squared-distance MatMul trick + ArgMin casts + Gather).

`audit_ops` must declare both graphs fully supported before execution.
"""

import numpy as np
import pytest
import torch

from taste_spokenlm_tpu.frontend import onnx_build as B
from taste_spokenlm_tpu.frontend.onnx_exec import OnnxJaxFunction, audit_ops
from taste_spokenlm_tpu.frontend.onnx_import import load_onnx


def _bn_params(c, rng):
    return {"scale": rng.randn(c).astype(np.float32),
            "bias": rng.randn(c).astype(np.float32),
            "mean": rng.randn(c).astype(np.float32),
            "var": rng.uniform(0.5, 2.0, c).astype(np.float32)}


def _torch_bn(x, p):
    return (x - torch.from_numpy(p["mean"])[:, None]) \
        / torch.sqrt(torch.from_numpy(p["var"])[:, None] + 1e-5) \
        * torch.from_numpy(p["scale"])[:, None] \
        + torch.from_numpy(p["bias"])[:, None]


def test_campplus_shaped_dtdnn():
    """CAM++-shaped graph: stem conv -> 2 dense D-TDNN layers with CAM
    sigmoid gating -> stats pooling -> embedding Gemm."""
    rng = np.random.RandomState(0)
    C0, C, G, E, T = 8, 12, 6, 16, 40
    x = rng.randn(1, C0, T).astype(np.float32)

    w_stem = rng.randn(C, C0, 5).astype(np.float32) * 0.3
    b_stem = rng.randn(C).astype(np.float32) * 0.1
    bn1 = _bn_params(C, rng)
    w_d1 = rng.randn(G, C, 3).astype(np.float32) * 0.3
    b_d1 = rng.randn(G).astype(np.float32) * 0.1
    bn2 = _bn_params(C + G, rng)
    w_d2 = rng.randn(G, C + G, 3).astype(np.float32) * 0.3
    b_d2 = rng.randn(G).astype(np.float32) * 0.1
    cin = C + 2 * G
    # CAM gate: global context -> per-channel sigmoid mask
    w_cam = rng.randn(cin, cin).astype(np.float32) * 0.2
    b_cam = rng.randn(cin).astype(np.float32) * 0.1
    w_emb = rng.randn(2 * cin, E).astype(np.float32) * 0.2
    b_emb = rng.randn(E).astype(np.float32) * 0.1

    nodes = [
        B.node("Conv", ["x", "w_stem", "b_stem"], ["h0"], kernel_shape=[5],
               strides=[1], pads=[2, 2]),
        # dense block 1: BN -> ReLU -> Conv, concat with input
        B.node("BatchNormalization",
               ["h0", "bn1_scale", "bn1_bias", "bn1_mean", "bn1_var"],
               ["n1"], epsilon=1e-5),
        B.node("Relu", ["n1"], ["r1"]),
        B.node("Conv", ["r1", "w_d1", "b_d1"], ["d1"], kernel_shape=[3],
               pads=[1, 1]),
        B.node("Concat", ["h0", "d1"], ["cat1"], axis=1),
        # dense block 2
        B.node("BatchNormalization",
               ["cat1", "bn2_scale", "bn2_bias", "bn2_mean", "bn2_var"],
               ["n2"], epsilon=1e-5),
        B.node("Relu", ["n2"], ["r2"]),
        B.node("Conv", ["r2", "w_d2", "b_d2"], ["d2"], kernel_shape=[3],
               pads=[1, 1], dilations=[1]),
        B.node("Concat", ["cat1", "d2"], ["feat"], axis=1),
        # context-aware masking: global mean -> linear -> sigmoid -> gate
        B.node("ReduceMean", ["feat"], ["ctx"], axes=[2], keepdims=0),
        B.node("Gemm", ["ctx", "w_cam", "b_cam"], ["cam_lin"]),
        B.node("Sigmoid", ["cam_lin"], ["gate"]),
        B.node("Unsqueeze", ["gate", "u_axes"], ["gate3"]),
        B.node("Mul", ["feat", "gate3"], ["gated"]),
        # temporal statistics pooling: [mean, std]
        B.node("ReduceMean", ["gated"], ["mu"], axes=[2], keepdims=1),
        B.node("Sub", ["gated", "mu"], ["cent"]),
        B.node("Mul", ["cent", "cent"], ["sq"]),
        B.node("ReduceMean", ["sq"], ["var"], axes=[2], keepdims=0),
        B.node("Sqrt", ["var"], ["std"]),
        B.node("ReduceMean", ["gated"], ["mu2"], axes=[2], keepdims=0),
        B.node("Concat", ["mu2", "std"], ["stats"], axis=1),
        B.node("Gemm", ["stats", "w_emb", "b_emb"], ["emb"]),
    ]
    inits = {"w_stem": w_stem, "b_stem": b_stem,
             "bn1_scale": bn1["scale"], "bn1_bias": bn1["bias"],
             "bn1_mean": bn1["mean"], "bn1_var": bn1["var"],
             "bn2_scale": bn2["scale"], "bn2_bias": bn2["bias"],
             "bn2_mean": bn2["mean"], "bn2_var": bn2["var"],
             "w_d1": w_d1, "b_d1": b_d1, "w_d2": w_d2, "b_d2": b_d2,
             "w_cam": w_cam, "b_cam": b_cam, "w_emb": w_emb, "b_emb": b_emb,
             "u_axes": np.asarray([2], np.int64)}
    blob = B.build(nodes, ["x"], ["emb"], inits)

    report = audit_ops(blob)
    assert report["ok"], report
    assert report["unsupported"] == []
    assert report["op_counts"]["Conv"] == 3
    assert report["op_counts"]["BatchNormalization"] == 2

    # torch golden
    with torch.no_grad():
        xt = torch.from_numpy(x)
        h0 = torch.nn.functional.conv1d(xt, torch.from_numpy(w_stem),
                                        torch.from_numpy(b_stem), padding=2)
        r1 = torch.relu(_torch_bn(h0, bn1))
        d1 = torch.nn.functional.conv1d(r1, torch.from_numpy(w_d1),
                                        torch.from_numpy(b_d1), padding=1)
        cat1 = torch.cat([h0, d1], dim=1)
        r2 = torch.relu(_torch_bn(cat1, bn2))
        d2 = torch.nn.functional.conv1d(r2, torch.from_numpy(w_d2),
                                        torch.from_numpy(b_d2), padding=1)
        feat = torch.cat([cat1, d2], dim=1)
        gate = torch.sigmoid(feat.mean(dim=2) @ torch.from_numpy(w_cam)
                             + torch.from_numpy(b_cam))
        gated = feat * gate[:, :, None]
        mu = gated.mean(dim=2)
        std = torch.sqrt(((gated - mu[:, :, None]) ** 2).mean(dim=2))
        stats = torch.cat([mu, std], dim=1)
        want = (stats @ torch.from_numpy(w_emb)
                + torch.from_numpy(b_emb)).numpy()

    fn = OnnxJaxFunction.from_file(blob)
    got = np.asarray(fn(x))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_s3_tokenizer_shaped_encoder_vq():
    """S3-tokenizer-shaped graph: conv stem + erf-GELU, decomposed-LayerNorm
    MatMul attention block, nearest-codebook VQ (distance trick + ArgMin +
    Gather) -> token ids."""
    rng = np.random.RandomState(1)
    M, D, T, H, K = 10, 16, 24, 2, 32
    x = rng.randn(1, M, T).astype(np.float32)

    w_c1 = rng.randn(D, M, 3).astype(np.float32) * 0.3
    b_c1 = rng.randn(D).astype(np.float32) * 0.1
    w_c2 = rng.randn(D, D, 3).astype(np.float32) * 0.3
    b_c2 = rng.randn(D).astype(np.float32) * 0.1
    ln_g = rng.randn(D).astype(np.float32)
    ln_b = rng.randn(D).astype(np.float32)
    w_qkv = rng.randn(D, 3 * D).astype(np.float32) * 0.2
    w_o = rng.randn(D, D).astype(np.float32) * 0.2
    codebook = rng.randn(K, D).astype(np.float32)

    def gelu_erf_nodes(src, dst, tag):
        return [
            B.node("Div", [src, f"{tag}_sqrt2"], [f"{tag}_d"]),
            B.node("Erf", [f"{tag}_d"], [f"{tag}_e"]),
            B.node("Add", [f"{tag}_e", f"{tag}_one"], [f"{tag}_a"]),
            B.node("Mul", [src, f"{tag}_a"], [f"{tag}_m"]),
            B.node("Mul", [f"{tag}_m", f"{tag}_half"], [dst]),
        ]

    nodes = [
        # whisper-style stem: conv(pad 1) -> gelu -> conv(stride 2) -> gelu
        B.node("Conv", ["x", "w_c1", "b_c1"], ["c1"], kernel_shape=[3],
               pads=[1, 1]),
        *gelu_erf_nodes("c1", "g1", "gelu1"),
        B.node("Conv", ["g1", "w_c2", "b_c2"], ["c2"], kernel_shape=[3],
               strides=[2], pads=[1, 1]),
        *gelu_erf_nodes("c2", "g2", "gelu2"),
        B.node("Transpose", ["g2"], ["seq"], perm=[0, 2, 1]),   # [1, T', D]
        # decomposed LayerNorm (exporter pattern)
        B.node("ReduceMean", ["seq"], ["ln_mu"], axes=[-1], keepdims=1),
        B.node("Sub", ["seq", "ln_mu"], ["ln_c"]),
        B.node("Pow", ["ln_c", "two"], ["ln_sq"]),
        B.node("ReduceMean", ["ln_sq"], ["ln_var"], axes=[-1], keepdims=1),
        B.node("Add", ["ln_var", "ln_eps"], ["ln_ve"]),
        B.node("Sqrt", ["ln_ve"], ["ln_std"]),
        B.node("Div", ["ln_c", "ln_std"], ["ln_n"]),
        B.node("Mul", ["ln_n", "ln_g"], ["ln_s"]),
        B.node("Add", ["ln_s", "ln_b"], ["normed"]),
        # attention: fused qkv matmul, split, per-head via reshape/transpose
        B.node("MatMul", ["normed", "w_qkv"], ["qkv"]),
        B.node("Split", ["qkv"], ["q", "k", "vv"], axis=-1, num_outputs=3),
        B.node("Reshape", ["q", "head_shape"], ["q4"]),
        B.node("Reshape", ["k", "head_shape"], ["k4"]),
        B.node("Reshape", ["vv", "head_shape"], ["v4"]),
        B.node("Transpose", ["q4"], ["qh"], perm=[0, 2, 1, 3]),
        B.node("Transpose", ["k4"], ["kh"], perm=[0, 2, 3, 1]),
        B.node("Transpose", ["v4"], ["vh"], perm=[0, 2, 1, 3]),
        B.node("MatMul", ["qh", "kh"], ["scores_raw"]),
        B.node("Mul", ["scores_raw", "scale"], ["scores"]),
        B.node("Softmax", ["scores"], ["probs"], axis=-1),
        B.node("MatMul", ["probs", "vh"], ["ctx4"]),
        B.node("Transpose", ["ctx4"], ["ctx_t"], perm=[0, 2, 1, 3]),
        B.node("Reshape", ["ctx_t", "flat_shape"], ["ctx"]),
        B.node("MatMul", ["ctx", "w_o"], ["attn_out"]),
        B.node("Add", ["seq", "attn_out"], ["enc"]),
        # VQ nearest codebook: ||e - c||^2 = e.e - 2 e.c + c.c
        B.node("Mul", ["enc", "enc"], ["e_sq"]),
        B.node("ReduceSum", ["e_sq"], ["e_ss"], axes=[-1], keepdims=1),
        B.node("Transpose", ["codebook"], ["cb_t"], perm=[1, 0]),
        B.node("MatMul", ["enc", "cb_t"], ["ec"]),
        B.node("Mul", ["ec", "minus_two"], ["m2ec"]),
        B.node("Mul", ["codebook", "codebook"], ["c_sq"]),
        B.node("ReduceSum", ["c_sq"], ["c_ss"], axes=[-1], keepdims=0),
        B.node("Add", ["e_ss", "m2ec"], ["dist_p"]),
        B.node("Add", ["dist_p", "c_ss"], ["dist"]),
        B.node("ArgMin", ["dist"], ["ids64"], axis=-1, keepdims=0),
        B.node("Cast", ["ids64"], ["token_ids"], to=6),   # int32
        B.node("Gather", ["codebook", "ids64"], ["quantized"], axis=0),
    ]
    tp = T // 2
    inits = {
        "w_c1": w_c1, "b_c1": b_c1, "w_c2": w_c2, "b_c2": b_c2,
        "ln_g": ln_g, "ln_b": ln_b, "w_qkv": w_qkv, "w_o": w_o,
        "codebook": codebook,
        "two": np.asarray(2.0, np.float32),
        "ln_eps": np.asarray(1e-5, np.float32),
        "scale": np.asarray(1.0 / np.sqrt(D // H), np.float32),
        "minus_two": np.asarray(-2.0, np.float32),
        "head_shape": np.asarray([1, tp, H, D // H], np.int64),
        "flat_shape": np.asarray([1, tp, D], np.int64),
        "gelu1_sqrt2": np.asarray(np.sqrt(2.0), np.float32),
        "gelu1_one": np.asarray(1.0, np.float32),
        "gelu1_half": np.asarray(0.5, np.float32),
        "gelu2_sqrt2": np.asarray(np.sqrt(2.0), np.float32),
        "gelu2_one": np.asarray(1.0, np.float32),
        "gelu2_half": np.asarray(0.5, np.float32),
    }
    blob = B.build(nodes, ["x"], ["token_ids", "quantized"], inits)

    report = audit_ops(blob)
    assert report["ok"], report
    for op in ("Conv", "Erf", "Softmax", "ArgMin", "Gather", "Split"):
        assert op in report["op_counts"], op

    # torch golden
    with torch.no_grad():
        xt = torch.from_numpy(x)
        c1 = torch.nn.functional.conv1d(xt, torch.from_numpy(w_c1),
                                        torch.from_numpy(b_c1), padding=1)
        g1 = torch.nn.functional.gelu(c1)
        c2 = torch.nn.functional.conv1d(g1, torch.from_numpy(w_c2),
                                        torch.from_numpy(b_c2), stride=2,
                                        padding=1)
        g2 = torch.nn.functional.gelu(c2)
        seq = g2.transpose(1, 2)
        normed = torch.nn.functional.layer_norm(
            seq, (D,), torch.from_numpy(ln_g), torch.from_numpy(ln_b))
        qkv = normed @ torch.from_numpy(w_qkv)
        q, k, v = qkv.chunk(3, dim=-1)

        def heads(t):
            return t.reshape(1, tp, H, D // H).transpose(1, 2)
        scores = heads(q) @ heads(k).transpose(-1, -2) / np.sqrt(D // H)
        ctx = (torch.softmax(scores, -1) @ heads(v)).transpose(1, 2) \
            .reshape(1, tp, D)
        enc = seq + ctx @ torch.from_numpy(w_o)
        dist = torch.cdist(enc[0], torch.from_numpy(codebook)) ** 2
        want_ids = dist.argmin(-1).numpy()
        want_q = codebook[want_ids]

    fn = OnnxJaxFunction.from_file(blob)
    ids, quant = fn(x)
    np.testing.assert_array_equal(np.asarray(ids)[0], want_ids)
    np.testing.assert_allclose(np.asarray(quant)[0], want_q, atol=1e-4)
    assert np.asarray(ids).dtype == np.int32


def test_audit_reports_unsupported():
    blob = B.build([B.node("LSTM", ["x", "w"], ["y"])], ["x"], ["y"],
                   {"w": np.zeros((2, 2), np.float32)})
    report = audit_ops(blob)
    assert not report["ok"]
    assert report["unsupported"] == ["LSTM"]
    # audit accepts a pre-parsed graph too
    assert audit_ops(load_onnx(blob))["unsupported"] == ["LSTM"]
