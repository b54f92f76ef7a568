"""Data pipeline layer (L4): dataset registry + loader factory.

Mirrors the reference registry (data/__init__.py:6-49): datasets resolved by
--dataset_mode string, loaders shuffled unless serial_batches, drop_last in
train.
"""

from __future__ import annotations

from gfla_tpu.data.animation_data import (
    DanceDataset,
    FaceDataset,
    SyntheticVideoDataset,
)
from gfla_tpu.data.keypoint_data import KeypointDataset, KeypointTestDataset
from gfla_tpu.data.loader import DataLoader, collate, infinite
from gfla_tpu.data.paired_dataset import (
    FashionDataset,
    MarketDataset,
    SyntheticPoseDataset,
)
from gfla_tpu.data.pose_utils import encode_heatmaps
from gfla_tpu.data.shapenet_data import ShapeNetDataset

DATASETS = {
    "fashion": FashionDataset,
    "market": MarketDataset,
    "synthetic": SyntheticPoseDataset,
    "dance": DanceDataset,
    "face": FaceDataset,
    "synthetic_video": SyntheticVideoDataset,
    "shapenet": ShapeNetDataset,
    "keypoint": KeypointDataset,
    "keypointtest": KeypointTestDataset,
}


def register_dataset(name: str, cls) -> None:
    DATASETS[name] = cls


def get_dataset_class(name: str):
    if name not in DATASETS:
        raise KeyError(f"unknown dataset_mode '{name}'; have {sorted(DATASETS)}")
    return DATASETS[name]


def apply_dataset_defaults(opt, is_train: bool):
    cls = get_dataset_class(opt.dataset_mode)
    if hasattr(cls, "apply_defaults"):
        return cls.apply_defaults(opt, is_train)
    return opt


def create_dataloader(opt) -> DataLoader:
    dataset = get_dataset_class(opt.dataset_mode)(opt)
    is_train = getattr(opt, "isTrain", True) and opt.phase == "train"
    serial = getattr(opt, "serial_batches", False)
    # Multi-host training: every process computes the same shuffled epoch
    # order (shared seed) and takes a disjoint strided slice, so the global
    # batch assembled by shard_batch is P different local shards — not P
    # copies of the same samples.
    shard = None
    if is_train:
        try:
            import jax

            if jax.process_count() > 1:
                shard = (jax.process_index(), jax.process_count())
        except Exception:
            pass
    return DataLoader(
        dataset,
        batch_size=opt.batchSize,
        shuffle=not serial,
        drop_last=is_train,
        num_workers=getattr(opt, "nThreads", 2),
        seed=getattr(opt, "seed", 0),
        shard=shard,
    )


__all__ = [
    "DataLoader",
    "collate",
    "infinite",
    "encode_heatmaps",
    "create_dataloader",
    "apply_dataset_defaults",
    "register_dataset",
    "get_dataset_class",
    "DATASETS",
]
