"""Option parsing with the reference's flag surface.

Flags, defaults, and the custom list/dict argparse actions
(--attn_layer=2,3 / --kernel_size=2=5,3=3) match options/base_options.py,
options/train_options.py and util/util.py:271-283 of the reference; GPU-only
flags (--gpu_ids) are accepted for compatibility and ignored (device
placement is JAX's job).
"""

from __future__ import annotations

import argparse
import os
import sys


class StoreDictKeyPair(argparse.Action):
    def __call__(self, parser, namespace, values, option_string=None):
        d = {}
        for kv in values.split(","):
            k, v = kv.split("=")
            d[k] = int(v)
        setattr(namespace, self.dest, d)


class StoreList(argparse.Action):
    def __call__(self, parser, namespace, values, option_string=None):
        setattr(namespace, self.dest, [int(x) for x in values.split(",")])


class StoreRange(argparse.Action):
    """Reference --angle/--shift/--scale (data/base_dataset.py:21-23;
    market defaults at data/market_dataset.py:17-19): default off, datasets
    install (lo, hi) tuples. Accept 'False'/'none' (off), 'lo,hi', or a
    single magnitude M (→ (-M, M)) on the command line."""

    def __call__(self, parser, namespace, values, option_string=None):
        v = values.strip().lower()
        if v in ("false", "none", "0", ""):
            # explicit off (reference default False) — distinct from unset
            # (None), which lets dataset defaults install their ranges
            setattr(namespace, self.dest, False)
            return
        parts = [float(x) for x in values.split(",")]
        if len(parts) == 1:
            parts = [-abs(parts[0]), abs(parts[0])]
        setattr(namespace, self.dest, tuple(parts[:2]))


def add_spect_d_flags(parser):
    """Discriminator spectral-norm flags with the reference's semantics:
    --use_spect_d is action='store_false' with default True
    (model/pose_model.py:40,44) — passing it DISABLES spectral norm.
    --no_spect_d is kept as this repo's explicit alias (same effect)."""
    parser.add_argument("--use_spect_d", dest="use_spect_d",
                        action="store_false", default=True,
                        help="disable spectral norm in D (reference "
                        "store_false semantics)")
    parser.add_argument("--no_spect_d", dest="use_spect_d",
                        action="store_false",
                        help="alias for --use_spect_d (disables spectral "
                        "norm in D)")
    return parser


def resolve_use_spect_d(opt) -> bool:
    """True ⇔ D uses spectral norm. Accepts both the parsed flag
    (use_spect_d) and programmatic namespaces that only carry the legacy
    no_spect_d boolean (tests, __graft_entry__)."""
    v = getattr(opt, "use_spect_d", None)
    if v is not None:
        return bool(v)
    return not getattr(opt, "no_spect_d", False)


class BaseOptions:
    isTrain = False

    def __init__(self):
        self.parser = argparse.ArgumentParser()
        self.initialized = False

    def initialize(self, parser):
        parser.add_argument("--name", type=str, default="experiment_name")
        parser.add_argument("--model", type=str, default="pose")
        parser.add_argument("--checkpoints_dir", type=str, default="./result")
        parser.add_argument("--which_iter", type=str, default="latest")
        parser.add_argument("--gpu_ids", "--gpu_id", dest="gpu_ids",
                            type=str, default="0",
                            help="accepted for compatibility (the reference "
                            "README spells it --gpu_id); ignored on TPU")
        parser.add_argument("--phase", type=str, default="train")
        parser.add_argument("--continue_train", action="store_true")

        parser.add_argument("--batchSize", type=int, default=8)
        parser.add_argument("--old_size", type=int, default=None)
        parser.add_argument("--load_size", type=int, default=256)
        parser.add_argument("--structure_nc", type=int, default=18)
        parser.add_argument("--image_nc", type=int, default=3)

        parser.add_argument("--dataroot", type=str, default="./dataset/fashion/")
        parser.add_argument("--dataset_mode", type=str, default="fashion")
        parser.add_argument("--fid_gt_path", type=str)
        parser.add_argument("--serial_batches", action="store_true")
        parser.add_argument("--nThreads", default=2, type=int)
        parser.add_argument("--max_dataset_size", type=int, default=sys.maxsize)

        parser.add_argument("--display_winsize", type=int, default=256)
        parser.add_argument("--display_freq", type=int, default=1000)
        parser.add_argument("--results_dir", type=str, default="./eval_results")

        # random-affine augmentation ranges (reference registers these in
        # BaseDataset.modify_commandline_options, data/base_dataset.py:21-23;
        # dataset defaults — e.g. market train (-5,5)/(-5,5)/(0.95,1.05) —
        # are applied by apply_dataset_defaults when unset)
        parser.add_argument("--angle", action=StoreRange, default=None,
                            metavar="LO,HI",
                            help="rotation range in degrees, or False")
        parser.add_argument("--shift", action=StoreRange, default=None,
                            metavar="LO,HI",
                            help="translation range in pixels, or False")
        parser.add_argument("--scale", action=StoreRange, default=None,
                            metavar="LO,HI",
                            help="scale factor range, or False")
        # reference dataset/debug flags accepted at the base level so the
        # documented command lines parse (animation_dataset.py:31,
        # keypointtest_dataset.py:26)
        parser.add_argument("--debug", action="store_true", default=False)
        parser.add_argument("--eval_set", type=str, default="train",
                            help="train | test | val (keypoint testing)")
        # visdom-era display flags (options/base_options.py:43-46):
        # accepted for compatibility; TensorBoard replaces visdom here
        parser.add_argument("--display_port", type=int, default=8096,
                            help="ignored (TensorBoard replaces visdom)")
        parser.add_argument("--display_single_pane_ncols", type=int,
                            default=0,
                            help="ignored (TensorBoard replaces visdom)")
        parser.add_argument("--display_env", type=str, default=None,
                            help="ignored (TensorBoard replaces visdom)")

        # TPU-native additions
        parser.add_argument("--compute_dtype", type=str, default="float32",
                            choices=["float32", "bfloat16"],
                            help="activation dtype for the compute path")
        parser.add_argument("--mesh_devices", type=int, default=0,
                            help="data-parallel mesh size; 0 = all devices")
        parser.add_argument("--spatial", type=int, default=1,
                            help="spatial mesh axis size: shard image ROWS "
                            "over a second ('data', 'spatial') mesh axis. "
                            "Convolutions get GSPMD halo exchange; the "
                            "attention block gathers run halo-sharded via "
                            "shard_map+ppermute (see --halo). Requires "
                            "batchSize %% (devices/spatial) == 0 and "
                            "H %% spatial == 0; scales one large image when "
                            "batch parallelism runs out")
        parser.add_argument("--halo", type=int, default=8,
                            help="halo rows exchanged per neighbour for the "
                            "spatially-sharded attention gathers; flows "
                            "with |flow_y| + k//2 > halo clamp at the halo "
                            "window edge (train.py logs the observed max "
                            "|flow_y| at eval so you can size it)")
        parser.add_argument("--distributed", action="store_true",
                            default=False,
                            help="multi-host: call jax.distributed."
                            "initialize() before mesh creation (TPU pods "
                            "auto-discover the coordinator; elsewhere set "
                            "JAX coordinator env vars). The mesh then spans "
                            "jax.devices() across all hosts and each host "
                            "feeds its local shard of the batch.")
        parser.add_argument("--remat", action="store_true", default=False,
                            help="rematerialize the generator in backward "
                            "(saves activation HBM traffic/memory); for the "
                            "recurrent animation models this checkpoints "
                            "each FRAME of the scan — peak activation "
                            "memory O(T) → O(1), fits reference-sized "
                            "chunks (batch 4 × 6 frames @256²) on one chip")
        parser.add_argument("--seed", type=int, default=0)
        return parser

    def gather_options(self):
        import gfla_tpu.data as data_mod
        import gfla_tpu.tasks as tasks_mod

        if not self.initialized:
            parser = self.initialize(self.parser)
            self.initialized = True
        opt, _ = parser.parse_known_args()

        task_cls = tasks_mod.get_task_class(opt.model)
        parser = task_cls.modify_options(parser, self.isTrain)
        # third phase: dataset-specific flags (reference
        # modify_commandline_options, base_options.py:63-64)
        ds_cls = data_mod.get_dataset_class(opt.dataset_mode)
        if hasattr(ds_cls, "modify_options"):
            parser = ds_cls.modify_options(parser, self.isTrain)
        opt = parser.parse_args()
        opt = data_mod.apply_dataset_defaults(opt, self.isTrain)
        return opt

    def parse(self, save: bool = True):
        opt = self.gather_options()
        opt.isTrain = self.isTrain
        if opt.display_port != 8096 or opt.display_env is not None or \
                opt.display_single_pane_ncols:
            print("[options] --display_port/--display_env/"
                  "--display_single_pane_ncols are visdom flags; this build "
                  "logs to TensorBoard + HTML instead (flags ignored).")
        if opt.phase != "val":
            self.print_options(opt, save=save)
        self.opt = opt
        return opt

    @staticmethod
    def print_options(opt, save: bool = True):
        print("--------------Options--------------")
        for k, v in sorted(vars(opt).items()):
            print(f"{k}: {v}")
        print("----------------End----------------")
        if not save:
            return
        expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
        os.makedirs(expr_dir, exist_ok=True)
        fname = "train_opt.txt" if opt.isTrain else "test_opt.txt"
        with open(os.path.join(expr_dir, fname), "wt") as f:
            f.write("--------------Options--------------\n")
            for k, v in sorted(vars(opt).items()):
                f.write(f"{k}: {v}\n")
            f.write("----------------End----------------\n")


class TrainOptions(BaseOptions):
    isTrain = True

    def initialize(self, parser):
        parser = BaseOptions.initialize(self, parser)
        parser.add_argument("--iter_count", type=int, default=1)
        parser.add_argument("--niter", type=int, default=5_000_000)
        parser.add_argument("--niter_decay", type=int, default=0)
        parser.add_argument("--max_iters", type=int, default=0,
                            help="stop after this many iterations (0 = run by niter epochs)")

        parser.add_argument("--lr_policy", type=str, default="lambda")
        parser.add_argument("--lr", type=float, default=1e-4)
        parser.add_argument("--gan_mode", type=str, default="lsgan",
                            choices=["wgan-gp", "hinge", "lsgan"])

        parser.add_argument("--display_id", type=int, default=1)
        parser.add_argument("--eval_iters_freq", type=int, default=15000)
        parser.add_argument("--print_freq", type=int, default=1000)
        parser.add_argument("--save_latest_freq", type=int, default=1000)
        parser.add_argument("--save_iters_freq", type=int, default=10000)
        parser.add_argument("--no_html", action="store_true")
        parser.add_argument("--iters_per_epoch", type=int, default=0,
                            help="0 = derive from dataset size (epoch-based LR schedule)")
        parser.add_argument("--profile_iters", type=int, default=0,
                            help="capture a JAX profiler trace of this many "
                            "steps (after warmup) into "
                            "{checkpoints_dir}/{name}/profile/")
        return parser


class TestOptions(BaseOptions):
    isTrain = False

    def initialize(self, parser):
        parser = BaseOptions.initialize(self, parser)
        parser.set_defaults(serial_batches=True)
        parser.set_defaults(batchSize=1)
        parser.set_defaults(phase="test")
        return parser


class ValOptions(BaseOptions):
    isTrain = False

    def initialize(self, parser):
        parser = BaseOptions.initialize(self, parser)
        parser.set_defaults(serial_batches=True)
        parser.set_defaults(batchSize=1)
        parser.set_defaults(phase="val")
        return parser
