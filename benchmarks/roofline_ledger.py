"""Byte-exact roofline ledger for the promoted flagship recipe (VERDICT r3 #2).

For every component of the production pretrain step (bs8, 2 views -> 16 images
@ 1520x912, 16 texts @ 256 tokens, promoted slim recipe, remat OFF) this
tabulates the LOGICAL bytes that must cross HBM, the implied floor at the
v5e-1's ~819 GB/s HBM bandwidth (MXU-floor for BERT, which is compute-bound),
and compares to the measured per-component times from the r3 promoted profile
(BASELINE.md; captured via benchmarks/component_profile.py on the real chip).
The output answers: what is the B5-class ceiling on this chip, and what would
reaching the 108 img/s north star (3x the A100 estimate) actually require?

Byte model — the MINIMUM traffic, i.e. every materialized tensor is written
once and read once per consumer, with everything fusible fused:

* conv forward: read input + write output (BN + activation fused into the
  epilogue; stats reductions ride the output write).
* conv backward = 2x forward bytes: the input-grad conv reads d_out and
  writes d_in; the weight-grad conv reads the SAVED input and d_out again
  (weight-sized tensors are noise at these shapes). Remat is off in the
  flagship recipe, so saved activations are read, not recomputed.
* depthwise: same rule (read expanded in, write expanded out).
* SE: the global-pool read of the dw output is counted; the KB-scale pooled
  chain is not; the gate multiply is assumed fused into the projection's
  input read (that is what the MINIMUM means — measured gaps quantify what
  XLA does not fuse).
* residual add: read shortcut + read projection + write sum forward; the
  backward pass-through is fused into the producers (d_a = d_b = d_c).
* augmentation: uint8 reads + one bf16 intermediate (two-pass warp) + bf16
  write + the fp32 elastic field. The MEASURED warp moves ~20x this floor —
  the two-pass shifted-copy design deliberately trades passes for
  gather-freedom (gathers lower catastrophically on this toolchain:
  BASELINE.md r1, ops/warp.py docstring); its absolute cost is 13 ms.
* optimizer: AdamW reads {p, g, m, v} and writes {p, m, v} per fp32 param.

Run anywhere (pure arithmetic): python benchmarks/roofline_ledger.py
Results + the ceiling statement are recorded in BASELINE.md (r4).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_BYTES_PER_S = 819e9  # v5e HBM bandwidth (public spec ~819 GB/s)
MXU_FLOPS = 197e12       # v5e dense bf16 peak (public spec ~197 TFLOPS)
N_VIEWS = 16             # bs8 x 2 views
H, W = 1520, 912
BF = 2                   # bf16 activation bytes

# Measured per-component device time (ms) and xprof logical GiB/s from the r3
# promoted-recipe profile (BASELINE.md "promoted-recipe per-component
# profile"; 238.4 ms device self time at bench 234.4 ms/step).
MEASURED = {
    "aug": (13.1, 753), "front": (31.3, 607), "stage3": (47.2, 607),
    "stage4": (27.8, 764), "stage5": (36.4, 564), "stage6": (27.0, 590),
    "stage7": (12.8, None), "head": (1.1, None), "bert": (22.3, None),
    "other": (19.2, None),
}


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def block_fwd_bytes(a, h: int, w: int) -> int:
    """Minimum forward HBM bytes for one MBConv block at input resolution
    (h, w) across N_VIEWS images (byte model in the module docstring)."""
    ho, wo = ceil_div(h, a.stride), ceil_div(w, a.stride)
    I = N_VIEWS * h * w * a.in_filters * BF
    O = N_VIEWS * ho * wo * a.out_filters * BF
    if a.expand_ratio == 1 and not a.expand_filters:
        e_out = N_VIEWS * ho * wo * a.in_filters * BF
        # dw(read I, write e_out) + SE pool(read) + project(read, write O)
        fwd = I + e_out * 3 + O
    else:
        E = a.expanded
        e_in = N_VIEWS * h * w * E * BF
        e_out = N_VIEWS * ho * wo * E * BF
        # expand(read I, write e_in) + dw(read e_in, write e_out)
        # + SE pool(read e_out) + project(read e_out, write O)
        fwd = I + 2 * e_in + 3 * e_out + O
    if a.stride == 1 and a.in_filters == a.out_filters:
        fwd += 3 * O  # residual: read shortcut + read projection + write sum
    return fwd


def main() -> None:
    from mammo_clip_tpu.models.efficientnet import tpu_optimized_block_args

    args, _ = tpu_optimized_block_args(
        "b5", slim_stage3=256, slim_stage5=768, slim_stage6=1536,
        slim_stage4=512)
    stage_blocks = [5, 7, 7, 9, 3]  # b5 deep stages 3..7 (sum = 31)
    assert sum(stage_blocks) == len(args)

    ledger: dict[str, float] = {}

    # --- augmentation (two-pass warp + normalize, bf16 out) ---------------
    u8 = N_VIEWS * H * W  # uint8 input
    full_bf16 = N_VIEWS * H * W * BF
    field_f32 = N_VIEWS * H * W * 2 * 4  # fp32 (dx, dy) upsampled elastic field
    ledger["aug"] = (u8  # read raw
                     + 2 * full_bf16  # pass-1 write + pass-2 read
                     + full_bf16      # final write
                     + field_f32)     # field read (its synthesis is low-res)

    # --- s2d front: reshape + stem conv + 2 e=1 C128 blocks @ 1/4 ---------
    h4, w4 = H // 4, W // 4
    c128 = N_VIEWS * h4 * w4 * 128 * BF  # the 1/4-res C=128 map (354.8 MB)
    front_fwd = (2 * full_bf16          # s2d reshape read + write
                 + full_bf16 + c128)    # stem conv read + write
    from mammo_clip_tpu.models.efficientnet import BlockArgs
    front_block = BlockArgs(kernel=3, stride=1, expand_ratio=1,
                            in_filters=128, out_filters=128, se_ratio=0.25)
    front_fwd += 2 * block_fwd_bytes(front_block, h4, w4)
    ledger["front"] = front_fwd

    # --- deep stages -------------------------------------------------------
    h_cur, w_cur = h4, w4
    i = 0
    for s, n_blocks in enumerate(stage_blocks, start=3):
        total = 0
        for _ in range(n_blocks):
            a = args[i]
            total += block_fwd_bytes(a, h_cur, w_cur)
            h_cur, w_cur = ceil_div(h_cur, a.stride), ceil_div(w_cur, a.stride)
            i += 1
        ledger[f"stage{s}"] = total
    # backward = 2x forward for the whole conv pipeline (model above)
    for k in ("front", "stage3", "stage4", "stage5", "stage6", "stage7"):
        ledger[k] *= 3

    # --- head conv (512 -> 2048) + pool + projection -----------------------
    head_in = N_VIEWS * h_cur * w_cur * 512 * BF
    head_out = N_VIEWS * h_cur * w_cur * 2048 * BF
    ledger["head"] = 3 * (head_in + head_out)

    # --- BERT: compute-bound -> MXU floor, not a byte floor ----------------
    # BERT-base, L=12 H=768 FF=3072, 16 seqs x 256 tokens, train = 3x fwd
    T, Hd, FF, L = 256, 768, 3072, 12
    per_layer = (4 * T * Hd * Hd * 2      # QKV + output projections
                 + 2 * T * T * Hd * 2     # scores + apply
                 + 2 * T * Hd * FF * 2)   # FFN
    bert_flops = 3 * 16 * L * per_layer
    bert_floor_ms = bert_flops / MXU_FLOPS * 1e3

    # --- optimizer: AdamW over all fp32 params -----------------------------
    n_params = 22_803_200 + 108_900_000 + 600_000  # image + BERT-base + heads
    ledger["other"] = 7 * 4 * n_params  # read p,g,m,v; write p,m,v

    # --- table --------------------------------------------------------------
    # meas/floor decomposes as (xprof bytes / min bytes) x (819 / xprof GiB/s):
    # 'passes' = traffic XLA moves beyond the fully-fused minimum;
    # 'bw' = physical streaming shortfall at the measured layouts.
    print(f"{'component':8s} {'min GB':>8s} {'floor ms':>9s} {'meas ms':>8s} "
          f"{'meas GB':>8s} {'passes':>7s} {'bw':>6s} {'meas/floor':>10s}")
    floor_total = 0.0
    meas_total = 0.0
    order = ["aug", "front", "stage3", "stage4", "stage5", "stage6", "stage7",
             "head", "bert", "other"]
    for k in order:
        meas_ms, gibs = MEASURED[k]
        if k == "bert":
            floor_ms = bert_floor_ms
            gb = bert_flops / 1e12  # TFLOP, printed in the GB column slot
            print(f"{k:8s} {gb:7.2f}T {floor_ms:9.2f} {meas_ms:8.1f} "
                  f"{'—':>8s} {'—':>7s} {'MXU':>6s} {meas_ms / floor_ms:10.2f}")
        else:
            gb = ledger[k] / 1e9
            floor_ms = ledger[k] / HBM_BYTES_PER_S * 1e3
            if gibs:
                meas_gb = meas_ms / 1e3 * gibs * 1.0737 * 1e9 / 1e9
                passes = meas_gb / gb
                bw = gibs * 1.0737e9 / HBM_BYTES_PER_S
                print(f"{k:8s} {gb:8.2f} {floor_ms:9.2f} {meas_ms:8.1f} "
                      f"{meas_gb:8.2f} {passes:6.2f}x {bw:5.0%} "
                      f"{meas_ms / floor_ms:10.2f}")
            else:
                print(f"{k:8s} {gb:8.2f} {floor_ms:9.2f} {meas_ms:8.1f} "
                      f"{'—':>8s} {'—':>7s} {'—':>6s} {meas_ms / floor_ms:10.2f}")
        floor_total += floor_ms
        meas_total += meas_ms
    print(f"{'TOTAL':8s} {'':8s} {floor_total:9.2f} {meas_total:8.1f} "
          f"{'':8s} {'':7s} {'':6s} {meas_total / floor_total:10.2f}")
    for eff in (1.0, 0.85, 0.75):
        step = floor_total / eff
        print(f"ceiling @ {eff:.0%} of floor: {step:6.1f} ms/step = "
              f"{N_VIEWS / step * 1e3:5.1f} img/s/chip "
              f"({N_VIEWS / step * 1e3 / 36.0:.2f}x A100 est.)")


if __name__ == "__main__":
    main()
