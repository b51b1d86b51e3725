#!/usr/bin/env python
"""Build a randomly-initialized composite TASTE model and save it.

Equivalent of /root/reference/scripts/create_seed_model.py:6-18 (which
random-inits from configs/model/taslm.json and save_pretrained's it).

Usage:
  python scripts/create_seed_model.py --output ./seed_model [--tiny]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output", required=True)
    p.add_argument("--tiny", action="store_true",
                   help="toy-sized config (tests/dev)")
    p.add_argument("--config", default=None,
                   help="optional config JSON (TasteConfig.to_json format)")
    p.add_argument("--platform", default=None,
                   help="cpu | tpu | default (sitecustomize-proof)")
    args = p.parse_args()

    from taste_spokenlm_tpu.utils.platform import force_platform
    force_platform(args.platform)

    import jax
    import numpy as np
    import jax.numpy as jnp
    from taste_spokenlm_tpu.config import TasteConfig
    from taste_spokenlm_tpu.models.taste import TasteForCausalLM
    from taste_spokenlm_tpu.utils.checkpoint import save_params

    if args.config:
        cfg = TasteConfig.from_dict(json.load(open(args.config)))
    else:
        cfg = TasteConfig.tiny() if args.tiny else TasteConfig.full()
    model = TasteForCausalLM(cfg)

    b, t_tok, t_sp, t_llm = 1, 8, 12, 8
    rng = np.random.RandomState(0)
    variables = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        jnp.asarray(rng.randn(b, cfg.speech_decoder.spk_embed_dim), jnp.float32),
        jnp.asarray(rng.randint(5, 100, (b, t_tok))),
        jnp.asarray([t_tok]),
        jnp.asarray((np.arange(t_tok) // 2)[None]),
        jnp.asarray(rng.randn(b, cfg.audio_tower.whisper.n_mels,
                              cfg.audio_tower.whisper.max_source_positions * 2),
                    jnp.float32),
        jnp.asarray(rng.randint(0, cfg.speech_decoder.speech_token_size,
                                (b, t_sp))),
        jnp.asarray([t_sp]),
        jnp.asarray(rng.randint(2, 100, (b, t_llm))),
        jnp.asarray([t_llm]),
        jnp.asarray((np.arange(t_llm) // 2)[None]),
        method=TasteForCausalLM.init_all)

    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "config.json"), "w") as f:
        f.write(cfg.to_json())
    save_params(os.path.join(args.output, "params"), jax.device_get(variables))
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"seed model saved to {args.output} ({n/1e6:.1f}M params)")


if __name__ == "__main__":
    main()
