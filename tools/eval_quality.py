"""Trained-weights quality harness (one command per weights drop).

Given a reference-layout checkpoint dir (and optionally the codec .pth),
runs, in order:

  1. **convert** — ingest the checkpoint through the production loaders
     (`utils/checkpoint.load_torch_lm_checkpoint` +
     `models/init.convert_dual_ar_state_dict`; codec via
     `codec/convert.convert_dac_state_dict`), reporting parameter counts.
  2. **reference greedy parity** — load the same weights into the *actual
     reference implementation* (torch-CPU via tests/ref_harness, the
     machinery that generates the committed parity goldens) and compare its
     greedy `decode_one_token_ar` token stream
     (/root/reference/fish_speech/models/text2semantic/inference.py:241-359)
     against our jitted greedy `models/decode.generate` — token-for-token.
  3. **quant drift on real weights** — teacher-forced logit drift of each
     serving quantization config vs the bf16 baseline (the measured
     QUANT_DRIFT.md bounds were on random weights; this reruns them on the
     real distribution).
  4. **codec parity** — decode a fixed code sequence with the converted
     codec vs the torch reference codec; reports max |Δwav| and log-mel
     drift with the reference's exact mel parameters
     (`utils/spectrogram.py`, ref fish_speech/utils/spectrogram.py:62).

Skips gracefully (exit 0, one JSON "skip" line) when no checkpoint is
present, so it can sit in CI and fire the moment a weights drop lands:

  python tools/eval_quality.py --lm-checkpoint /path/to/openaudio-s2-mini \
      --codec-checkpoint /path/to/codec.pth

Tested end-to-end with tiny reference-layout weights in
tests/test_eval_quality.py.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO / "tests"))

from fish_speech_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def emit(obj):
    print(json.dumps(obj), flush=True)
    return obj


def reference_available() -> bool:
    if not Path("/root/reference").exists():
        return False
    try:
        import torch  # noqa: F401
        return True
    except ImportError:
        return False


def stage_convert(args):
    """Checkpoint dir -> (cfg, jax params bf16, torch-name state dict)."""
    import jax.numpy as jnp
    import numpy as np

    from fish_speech_tpu.models.config import DualARConfig
    from fish_speech_tpu.models.init import convert_dual_ar_state_dict
    from fish_speech_tpu.utils.checkpoint import load_torch_lm_checkpoint

    cfg = DualARConfig.from_json(args.lm_checkpoint)
    if args.cache_len:
        import dataclasses
        cfg = dataclasses.replace(cfg, max_seq_len=args.cache_len)
    sd = load_torch_lm_checkpoint(args.lm_checkpoint)
    params = convert_dual_ar_state_dict(sd, cfg, dtype=jnp.bfloat16)
    n_params = int(sum(np.prod(v.shape) for v in sd.values()))
    emit({"stage": "convert", "ok": True, "torch_tensors": len(sd),
          "n_params": n_params, "model_type": cfg.model_type,
          "n_layer": cfg.n_layer, "dim": cfg.dim})
    return cfg, params, sd


def stage_reference_greedy(args, cfg, sd):
    """Reference torch greedy loop vs our jitted greedy decode.

    Both sides run f32 so the comparison isolates implementation parity
    (the serving bf16/quantized error budget is the drift stage's job —
    near-tie logits would otherwise diverge the streams on rounding alone).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fish_speech_tpu.models.decode import SamplingConfig, generate
    from fish_speech_tpu.models.init import convert_dual_ar_state_dict
    from fish_speech_tpu.ops.sampling import semantic_logit_bias
    from quant_drift import make_teacher_forced_inputs

    import torch
    from ref_harness.lm_builder import (
        build_reference_dual_ar,
        reference_greedy_decode,
    )

    params = convert_dual_ar_state_dict(sd, cfg, dtype=jnp.float32)

    prompt, _ = make_teacher_forced_inputs(cfg, 1, args.prompt_len, 1,
                                           seed=7)
    im_end = args.im_end_id

    ref_model = build_reference_dual_ar(cfg)
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    ref_stream = reference_greedy_decode(ref_model, prompt[0],
                                         args.greedy_tokens, im_end)

    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, im_end)
    codes, lengths = generate(
        params, cfg, jnp.asarray(prompt), jnp.zeros((1,), jnp.int32),
        jax.random.key(0), SamplingConfig.create(), bias,
        max_new_tokens=args.greedy_tokens, im_end_id=im_end, greedy=True)
    ours = np.asarray(codes)[0]

    n = min(ref_stream.shape[1], ours.shape[1])
    match = ours[:, :n] == ref_stream[:, :n]
    # first row (semantic token) is the AR-visible stream; full-column match
    # is the strict criterion
    col_match = match.all(axis=0)
    first_div = int(np.argmin(col_match)) if not col_match.all() else n
    return emit({
        "stage": "reference_greedy", "ok": bool(col_match.all()),
        "tokens_compared": int(n),
        "match_fraction": round(float(col_match.mean()), 4),
        "first_divergence": first_div,
        "state_dict_missing": len(missing),
        "state_dict_unexpected": len(unexpected),
    })


def stage_quant_drift(args, cfg, params):
    """Teacher-forced serving-config drift on the real weights."""
    import dataclasses

    import jax

    from fish_speech_tpu.models.config import apply_pallas_attn_mode
    from fish_speech_tpu.ops.fast_fused import enable_fused_fast_head
    from fish_speech_tpu.ops.quant import quantize_lm_params
    from quant_drift import (
        drift_stats,
        make_teacher_forced_inputs,
        run_teacher_forced,
    )

    on_tpu = jax.default_backend() == "tpu"
    prompt, forced = make_teacher_forced_inputs(cfg, args.batch,
                                                args.prompt_len, args.steps)
    s = args.cache_len or 256
    ref = run_teacher_forced(cfg, params, prompt, forced, s, fused=False)
    params_q = jax.jit(quantize_lm_params)(params)

    results = {}
    got = run_teacher_forced(cfg, params_q, prompt, forced, s, fused=False)
    results["int8_weights"] = [
        drift_stats("int8_weights/prefill", ref[0], got[0]),
        drift_stats("int8_weights/decode_slow", ref[1], got[1]),
        drift_stats("int8_weights/decode_fast", ref[2], got[2])]

    cfg_w = dataclasses.replace(cfg, w8a8_matmuls=True,
                                kv_cache_dtype="int8")
    got = run_teacher_forced(cfg_w, params_q, prompt, forced, s, fused=False)
    results["w8a8_int8kv"] = [
        drift_stats("w8a8_int8kv/prefill", ref[0], got[0]),
        drift_stats("w8a8_int8kv/decode_slow", ref[1], got[1]),
        drift_stats("w8a8_int8kv/decode_fast", ref[2], got[2])]

    if on_tpu:
        # stream kernel + fused fast head are TPU-only (Mosaic)
        cfg_full = dataclasses.replace(
            cfg, w8a8_matmuls=True, kv_cache_dtype="int8",
            kv_cache_layout="pos", unroll_fast_sweeps=True)
        cfg_full = apply_pallas_attn_mode(cfg_full, "stream")
        params_f = enable_fused_fast_head(dict(params_q))
        got = run_teacher_forced(cfg_full, params_f, prompt, forced, s,
                                 fused=True)
        results["serving_full"] = [
            drift_stats("serving_full/prefill", ref[0], got[0]),
            drift_stats("serving_full/decode_slow", ref[1], got[1]),
            drift_stats("serving_full/decode_fast", ref[2], got[2])]
    worst = max(r["max_abs_dlogit"] for rs in results.values() for r in rs)
    worst_mean = max(r["mean_abs_dlogit"] for rs in results.values()
                     for r in rs)
    top5 = min(r["top1_in_ref_top5"] for rs in results.values() for r in rs)
    # gate on the QUANT_DRIFT.md go/no-go bounds (measured on the int8
    # serving configs): a drop whose real-weight drift blows them must
    # fail CI, not just print numbers
    ok = (worst <= args.drift_max_dlogit
          and worst_mean <= args.drift_mean_dlogit
          and top5 >= args.drift_min_top5)
    return emit({"stage": "quant_drift", "ok": bool(ok),
                 "configs": list(results), "worst_max_abs_dlogit": worst,
                 "worst_mean_abs_dlogit": worst_mean,
                 "worst_top1_in_ref_top5": top5,
                 "bounds": {"max": args.drift_max_dlogit,
                            "mean": args.drift_mean_dlogit,
                            "top5": args.drift_min_top5}})


def stage_codec(args, use_reference: bool):
    """Converted codec vs the torch reference codec (wav + log-mel drift)."""
    import numpy as np

    if not args.codec_checkpoint:
        return emit({"stage": "codec", "skipped": "no --codec-checkpoint"})
    import jax.numpy as jnp

    from fish_speech_tpu.codec.config import s2_pro_codec_config
    from fish_speech_tpu.codec.convert import convert_dac_state_dict
    from fish_speech_tpu.codec.model import dac_from_indices
    from fish_speech_tpu.utils.checkpoint import load_torch_codec_checkpoint
    from fish_speech_tpu.utils.spectrogram import log_mel_spectrogram

    ccfg = (s2_pro_codec_config() if args.codec_config == "s2_pro"
            else _tiny_codec_cfg())
    csd = load_torch_codec_checkpoint(args.codec_checkpoint)
    cparams = convert_dac_state_dict(csd, ccfg)

    rng = np.random.default_rng(11)
    n_q = ccfg.rvq.total_codebooks
    codes = np.concatenate(
        [rng.integers(0, ccfg.rvq.semantic_codebook_size,
                      (1, 1, args.frames)),
         rng.integers(0, ccfg.rvq.codebook_size,
                      (1, n_q - 1, args.frames))], axis=1).astype(np.int32)
    ours = np.asarray(dac_from_indices(cparams, ccfg,
                                       jnp.asarray(codes))).astype(np.float32)

    out = {"stage": "codec", "ok": True, "frames": args.frames,
           "wav_samples": int(ours.shape[-1])}
    if use_reference:
        import torch

        from ref_harness import state_dict_numpy  # noqa: F401
        from ref_harness.codec_builder import build_reference_dac

        ref_model = build_reference_dac(ccfg)
        missing, unexpected = ref_model.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in csd.items()},
            strict=False)
        with torch.no_grad():
            ref_wav = ref_model.from_indices(
                torch.from_numpy(codes).long()).numpy()[:, 0]
        n = min(ref_wav.shape[-1], ours.shape[-1])
        dwav = np.abs(ref_wav[..., :n] - ours[..., :n])
        mel_ref = log_mel_spectrogram(ref_wav[0, :n])
        mel_got = log_mel_spectrogram(ours[0, :n])
        dmel = np.abs(mel_ref - mel_got)
        out.update({
            "max_abs_dwav": round(float(dwav.max()), 6),
            "mean_abs_dwav": round(float(dwav.mean()), 7),
            "max_abs_dmel": round(float(dmel.max()), 5),
            "mean_abs_dmel": round(float(dmel.mean()), 6),
            "state_dict_missing": len(missing),
            "state_dict_unexpected": len(unexpected),
        })
        out["ok"] = bool(dmel.max() < args.mel_tol)
    else:
        out["note"] = "reference tree/torch unavailable: decode-only check"
    return emit(out)


def _tiny_codec_cfg():
    from fish_speech_tpu.codec import tiny_codec_config

    return tiny_codec_config()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lm-checkpoint", default=None,
                    help="reference-layout checkpoint dir (config.json + "
                         "safetensors/.pth)")
    ap.add_argument("--codec-checkpoint", default=None,
                    help="codec .pth (generator state dict)")
    ap.add_argument("--codec-config", choices=["s2_pro", "tiny"],
                    default="s2_pro")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--cache-len", type=int, default=256)
    ap.add_argument("--greedy-tokens", type=int, default=24)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--im-end-id", type=int, default=4)
    ap.add_argument("--drift-max-dlogit", type=float, default=1.0,
                    help="QUANT_DRIFT.md go bound: max |dlogit| over the "
                         "sampling support across serving quant configs")
    ap.add_argument("--drift-mean-dlogit", type=float, default=0.10)
    ap.add_argument("--drift-min-top5", type=float, default=0.99,
                    help="min fraction of quantized top-1 tokens inside "
                         "the bf16 top-5")
    ap.add_argument("--mel-tol", type=float, default=0.5,
                    help="max |dlog-mel| vs the torch reference decode "
                         "(bf16-vs-f32 arithmetic headroom included)")
    ap.add_argument("--skip-reference", action="store_true",
                    help="skip the torch-reference comparisons")
    ap.add_argument("--skip-drift", action="store_true")
    args = ap.parse_args(argv)

    if not args.lm_checkpoint and not args.codec_checkpoint:
        emit({"skip": "no checkpoint given; pass --lm-checkpoint DIR "
                      "(and optionally --codec-checkpoint PTH) when a "
                      "weights drop lands"})
        return 0
    use_ref = (not args.skip_reference) and reference_available()
    ok = True
    if args.lm_checkpoint:
        if not Path(args.lm_checkpoint).exists():
            emit({"skip": f"lm checkpoint {args.lm_checkpoint} not found"})
            return 0
        cfg, params, sd = stage_convert(args)
        if use_ref:
            r = stage_reference_greedy(args, cfg, sd)
            ok &= r["ok"]
        else:
            emit({"stage": "reference_greedy",
                  "skipped": "reference tree/torch unavailable or "
                             "--skip-reference"})
        if not args.skip_drift:
            r = stage_quant_drift(args, cfg, params)
            ok &= r["ok"]
    r = stage_codec(args, use_ref)
    ok &= r.get("ok", True)
    emit({"stage": "summary", "ok": bool(ok)})
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
