"""Committed golden end-to-end fixtures: deterministic tiny-seed-model
reconstruction + completion outputs, pinned so refactors can't silently
change behavior (the reference's equivalent anchors are the committed
examples/generated_cases/*.json + examples/orig/*.wav).

Regenerate intentionally with:
    python tests/fixtures/regen_golden.py
"""

import json
import os

import numpy as np

from tests.golden_e2e_common import compute_outputs

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_e2e.json")


def test_e2e_outputs_match_committed_fixture():
    with open(FIXTURE) as f:
        want = json.load(f)
    got = compute_outputs()

    # discrete outputs: exact
    for key in ("speech_token_ids", "speech_token_length", "waveform_length",
                "completion_token_ids", "completion_word_ids",
                "completion_taste", "vq_llm_indices"):
        assert got[key] == want[key], (
            f"{key} drifted — if intentional, regenerate via "
            f"tests/fixtures/regen_golden.py\n got={got[key]}\n "
            f"want={want[key]}")

    # continuous outputs: tight tolerance (fp reassociation headroom)
    np.testing.assert_allclose(got["waveform_rms"], want["waveform_rms"],
                               rtol=1e-4)
    np.testing.assert_allclose(got["waveform_head"], want["waveform_head"],
                               rtol=1e-3, atol=1e-6)
