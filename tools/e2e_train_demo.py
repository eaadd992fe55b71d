"""End-to-end training demo on real hardware: synthetic scenes ->
SceneSeg training -> mIoU improvement -> checkpoint save/reload ->
inference -> visualization frame.

Exercises the full L1->L2->L3 loop (train step, metrics, msgpack
checkpoints, inference wrapper, visualization) in one run and prints a
JSON summary. The synthetic road scenes come from
tools/gen_synthetic_dataset.make_scene (geometric sky/road/vehicle
regions with the SceneSeg color coding).

Usage: python tools/e2e_train_demo.py [--steps 60] [--batch 8] [--out DIR]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/e2e_train_demo")
    args = ap.parse_args()
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    from autoware_vision_pilot_tpu.core.cache import setup_compilation_cache
    setup_compilation_cache(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")

    import optax
    from gen_synthetic_dataset import make_scene
    from autoware_vision_pilot_tpu.core.mesh import make_mesh
    from autoware_vision_pilot_tpu.models import SceneSegNetwork
    from autoware_vision_pilot_tpu.train import (
        create_seg_train_state, make_seg_train_step, segmentation_ce_loss)
    from autoware_vision_pilot_tpu.train.datasets import decode_scene_seg_mask
    from autoware_vision_pilot_tpu.train.metrics import (
        confusion_matrix, miou_from_confusion)
    from autoware_vision_pilot_tpu.export.checkpoints import (
        save_msgpack, load_msgpack)
    from autoware_vision_pilot_tpu.ops import argmax_mask

    # --- data ------------------------------------------------------------
    rng = np.random.default_rng(0)
    n_train, n_val = 48, 8

    def sample(i):
        # per-index seed: the train/val split is pinned by index, not by
        # construction order
        img, lab = make_scene(np.random.default_rng(i), (320, 640))
        ids, _weights = decode_scene_seg_mask(lab)
        x = img.astype(np.float32) / 255.0
        return x, ids.astype(np.int32)

    train = [sample(i) for i in range(n_train)]
    val = [sample(10_000 + i) for i in range(n_val)]
    val_x = jnp.asarray(np.stack([v[0] for v in val]))
    val_y = np.stack([v[1] for v in val])

    # --- model + train step ----------------------------------------------
    model = SceneSegNetwork(dtype=jnp.bfloat16)
    tx = optax.adamw(3e-4)
    state = create_seg_train_state(model, (1, 320, 640, 3),
                                   jax.random.key(0), tx)
    run, _ = make_seg_train_step(model, tx,
                                 loss_fn=segmentation_ce_loss,
                                 mesh=make_mesh())

    @jax.jit
    def predict(params, batch_stats, x):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x.astype(jnp.bfloat16), train=False)
        return argmax_mask(logits.astype(jnp.float32))

    def val_miou(state):
        pred = np.asarray(predict(state.params, state.batch_stats, val_x))
        cm = sum(confusion_matrix(pred[i], val_y[i], 3)
                 for i in range(n_val))
        _iou, miou, _overall = miou_from_confusion(cm)
        return miou

    miou_before = val_miou(state)

    # --- train -----------------------------------------------------------
    key = jax.random.key(1)
    B = args.batch
    losses = []
    t0 = time.perf_counter()
    for step in range(args.steps):
        idx = rng.choice(n_train, B, replace=False)
        xb = jnp.asarray(np.stack([train[i][0] for i in idx]))
        yb = jnp.asarray(np.stack([train[i][1] for i in idx]))
        key, k = jax.random.split(key)
        state, loss = run(state, xb, yb, k)
        losses.append(float(loss))
    train_s = time.perf_counter() - t0
    miou_after = val_miou(state)

    # --- checkpoint round trip -------------------------------------------
    ckpt = out_dir / "scene_seg_demo.msgpack"
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    save_msgpack(ckpt, variables)
    restored = load_msgpack(ckpt, variables)
    pred2 = np.asarray(predict(restored["params"],
                               restored["batch_stats"], val_x[:1]))
    pred1 = np.asarray(predict(state.params, state.batch_stats, val_x[:1]))
    assert (pred1 == pred2).all(), "checkpoint round-trip changed outputs"

    # --- visualization frame ---------------------------------------------
    try:
        import cv2
        from autoware_vision_pilot_tpu.utils.visualization import (
            SCENE_SEG_PALETTE, blend)
        color = SCENE_SEG_PALETTE[pred1[0] % len(SCENE_SEG_PALETTE)]
        frame = (np.asarray(val_x[0]) * 255).astype(np.uint8)
        cv2.imwrite(str(out_dir / "val0_overlay.png"),
                    blend(frame[..., ::-1], color[..., ::-1].astype(np.uint8)))
        viz_ok = True
    except Exception as e:  # palette name drift etc. — non-fatal
        viz_ok = f"skipped: {e}"

    print(json.dumps({
        "metric": "e2e_train_demo",
        "loss_first5": [round(x, 4) for x in losses[:5]],
        "loss_last5": [round(x, 4) for x in losses[-5:]],
        "miou_before": round(miou_before, 4),
        "miou_after": round(miou_after, 4),
        "train_seconds": round(train_s, 1),
        "steps": args.steps, "batch": B,
        "checkpoint_roundtrip": "identical",
        "viz": viz_ok,
    }))


if __name__ == "__main__":
    main()
