"""Regenerate tests/fixtures/golden_e2e.json (run from the repo root).

Only do this when an INTENTIONAL behavior change invalidates the committed
golden outputs; review the diff before committing.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from tests.golden_e2e_common import compute_outputs

out = compute_outputs()
path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "golden_e2e.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {path}")
