"""QAT-to-deployment closure on the headline trunk (VERDICT r2 item 4).

Reproduces the reference's QAT INT8 deployment flow end-to-end
(Models/exports/README.md:19-55 + exports/benchmark_onnx_models.py, which
publishes accuracy-parity tables for the QAT'd INT8 exports):

1. float-train SceneSeg on synthetic scenes (tools/e2e_train_demo recipe)
2. QAT fine-tune (train/qat.py: STE weight fake-quant + intercepted
   activation fake-quant, observers sown)
3. export via int8_variables_from_qat -> native int8 MXU conv format
4. A/B the int8 program against the bf16 program on held-out frames:
   argmax agreement + mIoU of both vs GT.

Prints one JSON line. Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/qat_closure.py
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--float-steps", type=int, default=80)
    ap.add_argument("--qat-steps", type=int, default=80)
    ap.add_argument("--observe-steps", type=int, default=None,
                    help="dynamic-observer steps before freezing "
                         "(default qat_steps//2)")
    ap.add_argument("--distill", type=float, default=0.0,
                    help="weight of the self-distillation KL term "
                         "(teacher = float forward of the same params); "
                         "directly optimizes int8-vs-bf16 agreement")
    ap.add_argument("--qat-lr", type=float, default=5e-5)
    # 128 matches the deployed int8 perf config (bench.py --int8
    # quantizes only >=128-ch convs: smaller ones are dispatch-bound and
    # int8 there only adds error) — QAT numerics must mirror deployment
    ap.add_argument("--min-ch", type=int, default=128)
    ap.add_argument("--per-ch-act", action="store_true",
                    help="per-input-channel activation scales (observed "
                         "per channel, folded into the int8 weights at "
                         "export) instead of per-tensor")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/qat_closure")
    args = ap.parse_args()
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    from autoware_vision_pilot_tpu.core.cache import setup_compilation_cache
    setup_compilation_cache(
        pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")

    import optax
    from gen_synthetic_dataset import make_scene
    from autoware_vision_pilot_tpu.core.mesh import make_mesh
    from autoware_vision_pilot_tpu.models import SceneSegNetwork
    from autoware_vision_pilot_tpu.train import (
        create_seg_train_state, make_seg_train_step, segmentation_ce_loss)
    from autoware_vision_pilot_tpu.train.datasets import decode_scene_seg_mask
    from autoware_vision_pilot_tpu.train.metrics import (
        confusion_matrix, miou_from_confusion)
    from autoware_vision_pilot_tpu.train.qat import (
        make_qat_loss, collect_act_scales, int8_variables_from_qat,
        distillation_kl)
    from autoware_vision_pilot_tpu.export.checkpoints import save_msgpack
    from autoware_vision_pilot_tpu.ops import argmax_mask

    # --- data (e2e_train_demo recipe: index-pinned split) ------------------
    rng = np.random.default_rng(0)
    n_train, n_val = 48, 16

    def sample(i):
        img, lab = make_scene(np.random.default_rng(i), (320, 640))
        ids, _ = decode_scene_seg_mask(lab)
        return img.astype(np.float32) / 255.0, ids.astype(np.int32)

    train = [sample(i) for i in range(n_train)]
    val = [sample(10_000 + i) for i in range(n_val)]
    val_x = jnp.asarray(np.stack([v[0] for v in val]))
    val_y = np.stack([v[1] for v in val])

    model = SceneSegNetwork(dtype=jnp.bfloat16)
    tx = optax.adamw(3e-4)
    print("[qat_closure] init...", flush=True)
    state = create_seg_train_state(model, (1, 320, 640, 3),
                                   jax.random.key(0), tx)
    run, _ = make_seg_train_step(model, tx, loss_fn=segmentation_ce_loss,
                                 mesh=make_mesh())

    # --- phase 1: float training -------------------------------------------
    key = jax.random.key(1)
    B = args.batch
    t0 = time.perf_counter()
    for _ in range(args.float_steps):
        idx = rng.choice(n_train, B, replace=False)
        xb = jnp.asarray(np.stack([train[i][0] for i in idx]))
        yb = jnp.asarray(np.stack([train[i][1] for i in idx]))
        key, k = jax.random.split(key)
        state, loss = run(state, xb, yb, k)
    float_s = time.perf_counter() - t0
    float_loss = float(loss)
    print(f"[qat_closure] float phase done ({float_s:.0f}s)", flush=True)

    # --- phase 2: QAT fine-tune, two sub-phases (reference PT2E flow:
    # observers active, then observers FROZEN — exports/README.md:19-55).
    # 2a trains with dynamic per-batch activation scales and records the
    # running amax; 2b trains against the frozen static scales — the
    # exact numerics (same x_scale values) of the deployed int8 program.
    qat_tx = optax.adamw(args.qat_lr)  # low-LR adaptation, reference QAT style
    qat_opt = qat_tx.init(state.params)

    # Distillation teacher = SNAPSHOT of the converged float model.
    # (A self-referential teacher — float forward of the current params —
    # diverges: stop_gradient blocks the gradient but the teacher's VALUE
    # drifts with every update, and student/teacher co-adapt away from
    # the task. Measured: distill=1.0 self-teacher collapsed to
    # agreement 0.839 / qat_loss 9.6.)
    teacher_params = jax.tree.map(jnp.copy, state.params)
    teacher_bs = jax.tree.map(jnp.copy, state.batch_stats)

    def make_step(static_scales):
        # frozen phase also freezes BN (eval-mode running stats) — the
        # reference's full "observer freezing, batch norm freezing"
        # recipe (exports/README.md:23)
        @jax.jit
        def qat_step(params, bs, opt, x, y, k):
            def lf(p):
                if args.distill > 0.0:
                    # teacher = frozen float forward (the deployment bf16
                    # reference point); the KL term trains the quantized
                    # forward to reproduce its decisions.
                    teacher = model.apply(
                        {"params": teacher_params,
                         "batch_stats": teacher_bs}, x, train=False)

                    def base(out, tgt):
                        return (segmentation_ce_loss(out, tgt)
                                + args.distill * distillation_kl(teacher,
                                                                 out))
                else:
                    def base(out, tgt):
                        return segmentation_ce_loss(out, tgt)
                qat_loss = make_qat_loss(
                    model, base,
                    min_channels=args.min_ch, static_scales=static_scales,
                    freeze_bn=static_scales is not None,
                    per_channel_act=args.per_ch_act)
                (l, mut) = qat_loss(p, bs, x, y, rngs={"dropout": k})
                return l, mut
            (l, mut), grads = jax.value_and_grad(lf, has_aux=True)(params)
            updates, opt = qat_tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            return (params, mut["batch_stats"], opt, l,
                    mut["intermediates"])
        return qat_step

    params, bs = state.params, state.batch_stats
    act_running: dict = {}
    t0 = time.perf_counter()
    observe_steps = (args.observe_steps if args.observe_steps is not None
                     else args.qat_steps // 2)
    step_fn = make_step(None)
    for phase_step in range(args.qat_steps):
        if phase_step == observe_steps:  # freeze observers
            print(f"[qat_closure] freezing observers at step "
                  f"{phase_step}", flush=True)
            step_fn = make_step(dict(act_running))
        idx = rng.choice(n_train, B, replace=False)
        xb = jnp.asarray(np.stack([train[i][0] for i in idx]))
        yb = jnp.asarray(np.stack([train[i][1] for i in idx]))
        key, k = jax.random.split(key)
        params, bs, qat_opt, qloss, inter = step_fn(
            params, bs, qat_opt, xb, yb, k)
        if phase_step < observe_steps:
            for path, s in collect_act_scales(inter).items():
                prev = act_running.get(path)
                act_running[path] = (s if prev is None
                                     else np.maximum(prev, s))
    qat_s = time.perf_counter() - t0
    qat_loss_v = float(qloss)
    print(f"[qat_closure] qat phase done ({qat_s:.0f}s)", flush=True)

    variables = {"params": params, "batch_stats": bs}
    int8_vars = int8_variables_from_qat(variables, act_running,
                                        min_channels=args.min_ch)
    save_msgpack(out_dir / "scene_seg_qat_int8.msgpack", int8_vars)

    # --- phase 3: A/B deployment programs ------------------------------------
    @jax.jit
    def predict_bf16(x):
        logits = model.apply(variables, x.astype(jnp.bfloat16), train=False)
        return argmax_mask(logits.astype(jnp.float32))

    @jax.jit
    def predict_int8(x):
        logits = model.apply(int8_vars, x.astype(jnp.bfloat16), train=False)
        return argmax_mask(logits.astype(jnp.float32))

    # control: how much does the bf16 deployment itself disagree with a
    # f32 forward of the SAME weights? This is the numerics noise floor
    # any deployment config carries; int8-vs-bf16 agreement should be
    # judged against it, not against 1.0.
    @jax.jit
    def predict_f32(x):
        logits = model.apply(variables, x.astype(jnp.float32), train=False)
        return argmax_mask(logits.astype(jnp.float32))

    pred_bf16 = np.asarray(predict_bf16(val_x))
    print("[qat_closure] bf16 predict done", flush=True)
    pred_int8 = np.asarray(predict_int8(val_x))
    print("[qat_closure] int8 predict done", flush=True)
    pred_f32 = np.asarray(predict_f32(val_x))
    print("[qat_closure] f32 control done", flush=True)
    agreement = float((pred_bf16 == pred_int8).mean())
    control = float((pred_bf16 == pred_f32).mean())

    def miou(pred):
        cm = sum(confusion_matrix(pred[i], val_y[i], 3)
                 for i in range(n_val))
        return miou_from_confusion(cm)[1]

    print(json.dumps({
        "metric": "qat_int8_closure",
        "float_steps": args.float_steps, "qat_steps": args.qat_steps,
        "float_loss": round(float_loss, 4),
        "qat_loss": round(qat_loss_v, 4),
        "argmax_agreement_int8_vs_bf16": round(agreement, 5),
        "control_agreement_bf16_vs_f32": round(control, 5),
        "miou_bf16": round(miou(pred_bf16), 4),
        "miou_int8": round(miou(pred_int8), 4),
        "miou_f32": round(miou(pred_f32), 4),
        "n_quantized_convs": len(act_running),
        "min_ch": args.min_ch, "distill": args.distill,
        "per_ch_act": bool(args.per_ch_act),
        "observe_steps": observe_steps, "qat_lr": args.qat_lr,
        "float_train_s": round(float_s, 1), "qat_train_s": round(qat_s, 1),
    }))


if __name__ == "__main__":
    main()
