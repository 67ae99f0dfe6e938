"""HBM roofline accounting for the flagship decode step (VERDICT r4 item 2).

Decode is memory-bound: each beam step must read the decoder weights, the
full cross-attention K/V, and the full self-attention cache from HBM. This
script computes that logical traffic from the model config + quantization
knobs, optionally pairs it with the measured effective bandwidth
(benchmarks/hbm_probe.py) and the measured step time
(benchmarks/step_probe.py), and prints where the time goes vs where the
bytes say it COULD go.

Pure host arithmetic — run anywhere:
    python benchmarks/roofline.py                 # traffic model only
    STEP_MS=7.4 HBM_GBS=600 python benchmarks/roofline.py   # + interpretation
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flagship_traffic(model_name=None, batch=None, beam=None, max_new=None,
                     quant=None, kv=None) -> dict:
    from whisperx_tpu.models.configs import get_whisper_config

    model_name = model_name or os.environ.get("BENCH_MODEL", "large-v2")
    B = batch or int(os.environ.get("BENCH_BATCH", "8"))
    K = beam or int(os.environ.get("BENCH_BEAM", "5"))
    max_new = max_new or int(os.environ.get("BENCH_MAX_NEW", "112"))
    quant = quant if quant is not None else os.environ.get("BENCH_QUANT", "int8")
    kv = kv or os.environ.get("BENCH_KV", "int8")
    cfg = get_whisper_config(model_name)

    D = cfg.n_text_state
    Dff = 4 * D
    L = cfg.n_text_layer
    V = cfg.n_vocab
    S = cfg.n_audio_ctx  # 1500 encoder frames
    prompt = 4
    T = min(448, -(-(prompt + max_new) // 64) * 64)  # engine._cache_len

    wbytes = {"int8": 1, "int4": 0.5}.get(quant, 2)
    kvbytes = {"int8": 1, "int4": 0.5}.get(kv, 2)

    # Per-step decoder weight reads (every weight touched once per token):
    # self qkv+out (4 D^2) + cross q,out (2 D^2; cross k/v are precomputed
    # per-batch cache) + MLP (2 D*Dff) per layer, plus the tied
    # token-embedding/logits matrix (V*D).
    w_params = L * (6 * D * D + 2 * D * Dff) + V * D
    w_gb = w_params * wbytes / 1e9

    # Cross K/V: per batch element (beams share), read fully every step.
    cross_gb = 2 * B * S * D * kvbytes * L / 1e9

    # Self cache: B*K lanes, full T buffer read by attention every step.
    self_gb = 2 * B * K * T * D * kvbytes * L / 1e9

    # Unconditional beam reorder: read+write of the gathered prefix. With
    # the bucketed prefix gather (granule g), the average gathered rows over
    # the horizon ~ sum of bucket sizes / steps; approximate with the mean
    # bucket covering prompt+step.
    g = int(os.environ.get("WHISPERX_REORDER_PREFIX", "32") or 0)
    if g > 0:
        rows = [min(-(-(prompt + s + 1) // g) * g, T) for s in range(max_new)]
        avg_rows = sum(rows) / len(rows)
    else:
        avg_rows = T
    reorder_gb = 2 * 2 * B * K * avg_rows * D * kvbytes * L / 1e9  # rd+wr

    total_gb = w_gb + cross_gb + self_gb + reorder_gb
    out = {
        "model": model_name, "batch": B, "beam": K, "cache_T": T,
        "quant": quant or "bf16", "kv": kv,
        "weights_gb_per_step": round(w_gb, 3),
        "cross_kv_gb_per_step": round(cross_gb, 3),
        "self_kv_gb_per_step": round(self_gb, 3),
        "reorder_gb_per_step": round(reorder_gb, 3),
        "reorder_avg_rows": round(avg_rows, 1),
        "total_gb_per_step": round(total_gb, 3),
    }

    step_ms = float(os.environ.get("STEP_MS", "0") or 0)
    hbm_gbs = float(os.environ.get("HBM_GBS", "0") or 0)
    if step_ms:
        out["measured_step_ms"] = step_ms
        out["achieved_gbs"] = round(total_gb / (step_ms / 1e3), 1)
    if hbm_gbs:
        out["effective_hbm_gbs"] = hbm_gbs
        out["roofline_step_ms"] = round(total_gb / hbm_gbs * 1e3, 2)
        if step_ms:
            out["fraction_of_roofline"] = round(
                (total_gb / hbm_gbs * 1e3) / step_ms, 3
            )
    return out


if __name__ == "__main__":
    print(json.dumps(flagship_traffic(), indent=2))
