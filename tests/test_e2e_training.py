"""End-to-end training integration: synthetic unified dataset -> legacy
trainer -> mIoU improves -> checkpoint loads into the inference wrapper."""
import sys
import pathlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))


@pytest.mark.slow
def test_legacy_train_on_synthetic_improves_miou(tmp_path):
    from gen_synthetic_dataset import main as gen_main
    gen_main([str(tmp_path / "ds"), "--n", "30", "--hw", "64", "128"])

    from autoware_vision_pilot_tpu.train import (
        SceneSegDataset, LegacySegTrainer, LegacyTrainerConfig,
        confusion_matrix, miou_from_confusion)
    from autoware_vision_pilot_tpu.train.datasets import batched_loader
    import flax.linen as fnn

    class SmallSeg(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            h = fnn.Conv(24, (5, 5), padding=2)(x)
            h = fnn.relu(h)
            h = fnn.BatchNorm(use_running_average=not train)(h)
            h = fnn.Conv(24, (3, 3), padding=1)(h)
            h = fnn.relu(h)
            return fnn.Conv(3, (3, 3), padding=1)(h)

    ds = SceneSegDataset(str(tmp_path / "ds" / "images"),
                         str(tmp_path / "ds" / "labels"), dataset="OTHER")
    cfg = LegacyTrainerConfig(num_epochs=3, lr=5e-3, val_every=0,
                              hw=(64, 128), batch_schedule=(8, 8, 8),
                              ckpt_dir=str(tmp_path / "runs"),
                              log_every=10**9)
    tr = LegacySegTrainer(SmallSeg(), [ds], cfg)

    def miou_now():
        cm = None
        for imgs, labs, _ in batched_loader(ds, range(ds.item_count()[1]),
                                            4, (64, 128), train=False):
            c = tr._val_step(tr.params, tr.batch_stats,
                             jnp.asarray(imgs), jnp.asarray(labs))
            cm = c if cm is None else cm + c
        return miou_from_confusion(cm)[1]

    before = miou_now()
    tr.train(max_samples=81)
    after = miou_now()
    assert after > before + 0.05, (before, after)

    # checkpoint saves and reloads
    res = tr.validate_and_save(epoch=0)
    ckpts = list((tmp_path / "runs").glob("*.msgpack"))
    assert ckpts
    from autoware_vision_pilot_tpu.export import load_msgpack
    restored = load_msgpack(
        ckpts[0], {"params": tr.params, "batch_stats": tr.batch_stats})
    assert "params" in restored
