"""CLI option system — argparse surface kept compatible with the reference
(options/base_options.py, train_options.py, test_options.py, val_options.py)
so reference command lines run unchanged. Three-phase composition: base
flags → task modify_options → dataset defaults.
"""

from gfla_tpu.options.options import (
    BaseOptions,
    StoreDictKeyPair,
    StoreList,
    TestOptions,
    TrainOptions,
    ValOptions,
)

__all__ = [
    "BaseOptions",
    "TrainOptions",
    "TestOptions",
    "ValOptions",
    "StoreList",
    "StoreDictKeyPair",
]
