#!/usr/bin/env python
"""Tower (whisper-large encoder) wall-time attribution on the real chip.

Times the 32L/1280d encoder alone at the bench shape (B=1, mel T=3000)
under bf16, with the Pallas flash kernel vs the XLA einsum attention
(TASTE_DISABLE_FLASH=1), to locate the tower's MFU gap (stage `tower`
was ~10% MFU in BENCH_r02)."""
import functools, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")

import jax
import jax.numpy as jnp
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
sys.path.insert(0, "/root/repo")
from bench import _fill_variables
from taste_spokenlm_tpu.config import WhisperConfig
from taste_spokenlm_tpu.models.whisper import WhisperEncoder

cfg = WhisperConfig()   # large-v3 32L/1280d
n_layers = int(os.environ.get("PT_LAYERS", "32"))
cfg = cfg.replace(encoder_layers=n_layers)
mel = jnp.asarray(np.random.RandomState(0).randn(1, cfg.n_mels, 3000) * 0.3,
                  jnp.float32)
model = WhisperEncoder(cfg, dtype=jnp.bfloat16)
shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), mel)
variables = _fill_variables(shapes, jnp.bfloat16)

@jax.jit
def run(v, m):
    return model(m) if False else model.apply(v, m)["last_hidden"]

mels = [mel + jnp.float32(1e-4 * (i + 1)) for i in range(4)]
jax.block_until_ready(mels)
t0 = time.perf_counter()
# warmup on the BASE mel so no timed call repeats its (executable, args)
# pair — the tunnel memoizes identical calls (CLAUDE.md)
out = run(variables, mel); float(jnp.sum(out.astype(jnp.float32)))
print(f"compile+first: {time.perf_counter()-t0:.1f}s")
walls = []
for m in mels:
    t0 = time.perf_counter()
    out = run(variables, m); float(jnp.sum(out.astype(jnp.float32)))
    walls.append(time.perf_counter() - t0)
w = min(walls)
flops = 2 * 635e6 * 1500 * 2  # ~fwd flops est (2*params*T)
mode = ("XLA-attn" if os.environ.get("TASTE_DISABLE_FLASH") == "1" else "flash") + f"/{n_layers}L"
print(f"encoder [{mode}]: {w*1e3:.1f} ms  (~{flops/w/197e12*100:.0f}% MFU est)")
