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
        parser.add_argument("--gpu_ids", type=str, default="0",
                            help="accepted for compatibility; ignored on TPU")
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

        # TPU-native additions
        parser.add_argument("--compute_dtype", type=str, default="float32",
                            choices=["float32", "bfloat16"],
                            help="activation dtype for the compute path")
        parser.add_argument("--mesh_devices", type=int, default=0,
                            help="data-parallel mesh size; 0 = all devices")
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
