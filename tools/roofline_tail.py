"""Analytic per-op roofline for the SceneSeg decoder (UNeck + SegHead).

VERDICT r2 item 10 asks for per-op HBM traffic numbers behind the
decoder-tail bandwidth claim (docs/SCALING.md). This tool walks the
decode path of SceneSegNetwork (models/components.py UNeck:71-99,
SegHead:102-122 — the TPU rebuild of the reference's
scene_neck.py:26-61 + scene_seg_head.py:21-45) and prints, for every
op: FLOPs, HBM bytes moved (activations in+out plus weights, bf16),
arithmetic intensity, the roofline-predicted time on the bench chip
(v5e: 197 bf16 TFLOP/s MXU, 819 GB/s HBM), and which wall it hits.

The model intentionally charges every op's full input+output tensor to
HBM — i.e. it assumes NO cross-op fusion. Where XLA fuses (elementwise
gelu/add into convs, and anything that fits VMEM), the real traffic is
lower; the table is therefore an UPPER bound on tail traffic and the
fused-measured gap quantifies how much XLA fusion already recovers.

Usage: python tools/roofline_tail.py [--hw 320 640] [--json]
"""
from __future__ import annotations

import argparse
import json

BF16 = 2  # bytes
PEAK_FLOPS = 197e12  # v5e bf16 MXU
PEAK_BW = 819e9      # v5e HBM bytes/s


def conv(name, h, w, cin, cout, k):
    """3x3/1x1 SAME conv at output map (h, w)."""
    flops = 2 * h * w * k * k * cin * cout
    bytes_ = BF16 * (h * w * cin + h * w * cout + k * k * cin * cout)
    return dict(op=name, shape=f"{h}x{w} {cin}->{cout} {k}x{k}",
                flops=flops, bytes=bytes_)


def convT(name, h, w, cin, cout):
    """2x2 stride-2 ConvTranspose from (h, w) to (2h, 2w): each output
    pixel is produced by exactly one input pixel and one 2x2-quadrant
    weight slice -> cin*cout MACs per output pixel."""
    flops = 2 * (2 * h) * (2 * w) * cin * cout
    bytes_ = BF16 * (h * w * cin + 4 * h * w * cout + 4 * cin * cout)
    return dict(op=name, shape=f"{h}x{w}->{2*h}x{2*w} {cin}->{cout} CT2x2",
                flops=flops, bytes=bytes_)


def decode_path_ops(H, W):
    """UNeck + SegHead ops for an HxW input (encoder taps at strides
    2/4/8/16/32 with B0 channels 32/24/40/80/1280)."""
    s32, s16, s8, s4, s2 = ((H // 32, W // 32), (H // 16, W // 16),
                            (H // 8, W // 8), (H // 4, W // 4),
                            (H // 2, W // 2))
    ops = [
        convT("neck.up0", *s32, 1280, 1280),
        conv("neck.skip0", *s16, 80, 1280, 1),
        conv("neck.dec0", *s16, 1280, 768, 3),
        conv("neck.dec1", *s16, 768, 768, 3),
        convT("neck.up1", *s16, 768, 768),
        conv("neck.skip1", *s8, 40, 768, 1),
        conv("neck.dec2", *s8, 768, 512, 3),
        conv("neck.dec3", *s8, 512, 512, 3),
        convT("neck.up2", *s8, 512, 512),
        conv("neck.skip2", *s4, 24, 512, 1),
        conv("neck.dec4", *s4, 512, 512, 3),
        conv("neck.dec5", *s4, 512, 256, 3),
        convT("head.up3", *s4, 256, 256),
        conv("head.skip3", *s2, 32, 256, 1),
        conv("head.dec6", *s2, 256, 256, 3),
        conv("head.dec7", *s2, 256, 128, 3),
        convT("head.up4", *s2, 128, 128),
        conv("head.dec8", H, W, 128, 128, 3),
        conv("head.dec9", H, W, 128, 64, 3),
        conv("head.dec10", H, W, 64, 3, 3),
    ]
    for o in ops:
        t_c = o["flops"] / PEAK_FLOPS
        t_b = o["bytes"] / PEAK_BW
        o["ai"] = o["flops"] / o["bytes"]
        o["roofline_us"] = max(t_c, t_b) * 1e6
        o["wall"] = "HBM" if t_b > t_c else "MXU"
    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", nargs=2, type=int, default=(320, 640))
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    ops = decode_path_ops(*args.hw)

    if args.json:
        print(json.dumps(ops))
        return

    print(f"SceneSeg decode path @ {args.hw[0]}x{args.hw[1]}, bf16, B=1 "
          f"(v5e roofline: {PEAK_FLOPS/1e12:.0f} TFLOP/s, "
          f"{PEAK_BW/1e9:.0f} GB/s; unfused upper bound)\n")
    print(f"{'op':<12} {'shape':<28} {'GFLOP':>7} {'MB':>7} "
          f"{'FLOP/B':>7} {'us':>7}  wall")
    for o in ops:
        print(f"{o['op']:<12} {o['shape']:<28} {o['flops']/1e9:>7.2f} "
              f"{o['bytes']/1e6:>7.1f} {o['ai']:>7.0f} "
              f"{o['roofline_us']:>7.1f}  {o['wall']}")
    tf = sum(o["flops"] for o in ops)
    tb = sum(o["bytes"] for o in ops)
    tt = sum(o["roofline_us"] for o in ops)
    hbm_t = sum(o["roofline_us"] for o in ops if o["wall"] == "HBM")
    print(f"\ntotal: {tf/1e9:.1f} GFLOP, {tb/1e6:.1f} MB, "
          f"roofline {tt/1e3:.3f} ms ({hbm_t/tt*100:.0f}% of that on the "
          f"HBM wall)")
    print("compute-only floor:  %.3f ms" % (tf / PEAK_FLOPS * 1e3))
    print("bandwidth-only floor: %.3f ms" % (tb / PEAK_BW * 1e3))


if __name__ == "__main__":
    main()
