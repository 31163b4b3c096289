"""Train a NeRF from a transforms.json dataset and save nerf.msgpack.

Functional port of the reference volume/train.py (which drives upstream
instant-ngp's pyngp): same stop criteria (loss < 0.00175 or 10000 steps)
and same output location.

Usage: python -m nerf_glasses_tpu.apps.train_app <dataset_dir_or_json>
"""

from __future__ import annotations

import os
import sys

TARGET_LOSS = 0.00175
MAX_TRAINING_STEPS = 10000


def main(argv=None):
    argv = argv or sys.argv
    dataset_path = argv[1]

    from nerf_glasses_tpu.io.dataset import load_transforms_json
    from nerf_glasses_tpu.train.trainer import Trainer

    ds = load_transforms_json(dataset_path, load_images=True)
    trainer = Trainer(ds)
    loss = trainer.train_until(TARGET_LOSS, MAX_TRAINING_STEPS)
    print("\nTraining complete with loss", loss)

    snapshot_path = dataset_path
    if not os.path.isdir(snapshot_path):
        snapshot_path = os.path.dirname(snapshot_path)
    snapshot_path = os.path.join(snapshot_path, "nerf.msgpack")
    trainer.save_snapshot(snapshot_path)
    print("saved", snapshot_path)


if __name__ == "__main__":
    main()
