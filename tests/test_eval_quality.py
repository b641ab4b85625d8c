"""tools/eval_quality.py end-to-end on a tiny reference-layout checkpoint.

Builds the *reference torch* tiny LM + codec (tests/ref_harness — the same
machinery that generates the committed parity goldens), saves their weights
in the reference's on-disk formats (safetensors dir + config.json; codec
.pth with the "generator." prefix), and runs the quality harness: the
convert stage must ingest them, the greedy stage must match the reference
loop token-for-token, and the codec stage must hit mel parity.
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

pytestmark = pytest.mark.skipif(
    not Path("/root/reference").exists(),
    reason="reference tree not present")


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    from safetensors.numpy import save_file

    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from ref_harness import state_dict_numpy
    from ref_harness.codec_builder import build_reference_dac
    from ref_harness.lm_builder import build_reference_dual_ar
    from fish_speech_tpu.codec import tiny_codec_config

    d = tmp_path_factory.mktemp("ckpt")
    cfg = tiny_dual_ar_config()
    lm = build_reference_dual_ar(cfg)
    sd = state_dict_numpy(lm)
    save_file({k: np.asarray(v, np.float32) for k, v in sd.items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(
        {k: v for k, v in dataclasses.asdict(cfg).items()
         if not isinstance(v, (dict, list, tuple)) or v is None}))

    codec = build_reference_dac(tiny_codec_config())
    csd = {"generator." + k: torch.from_numpy(np.asarray(v, np.float32))
           for k, v in state_dict_numpy(codec).items()}
    torch.save(csd, d / "codec.pth")
    return d


def test_eval_quality_end_to_end(tiny_checkpoint, capsys):
    import eval_quality

    rc = eval_quality.main([
        "--lm-checkpoint", str(tiny_checkpoint),
        "--codec-checkpoint", str(tiny_checkpoint / "codec.pth"),
        "--codec-config", "tiny",
        "--batch", "2", "--prompt-len", "12", "--steps", "2",
        "--cache-len", "64", "--greedy-tokens", "8", "--frames", "6",
        # tiny random weights have near-flat logits: the QUANT_DRIFT go
        # bounds (meant for the 4B serving configs on real weights) would
        # make the smoke flaky — relax them here; the gate mechanics are
        # asserted below
        "--drift-max-dlogit", "50", "--drift-mean-dlogit", "50",
        "--drift-min-top5", "0.0",
    ])
    out = capsys.readouterr().out
    lines = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    stages = {l.get("stage"): l for l in lines if "stage" in l}
    assert rc == 0, lines
    assert stages["convert"]["ok"]
    assert stages["reference_greedy"]["ok"], stages["reference_greedy"]
    assert stages["reference_greedy"]["match_fraction"] == 1.0
    assert stages["codec"]["ok"], stages["codec"]
    assert stages["codec"]["max_abs_dmel"] < 0.5
    assert stages["summary"]["ok"]
    # the drift stage must carry its CI gate (bounds + verdict)
    assert stages["quant_drift"]["ok"]
    assert "bounds" in stages["quant_drift"]
    assert "worst_top1_in_ref_top5" in stages["quant_drift"]


def test_eval_quality_skips_without_checkpoint(capsys):
    import eval_quality

    rc = eval_quality.main([])
    out = capsys.readouterr().out
    assert rc == 0
    assert "skip" in out
